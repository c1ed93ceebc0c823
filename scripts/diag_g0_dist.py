"""Measure the step-0 gradient distribution for the full-scale twins.

For each of CE / cutmix / FLYP at the test_torch_twin_fullscale fixture:
  - per tensor: median/max |g0| (torch first-step gradient)
  - for every element violating the 2%+2ULP delta rule: its |g0| and the
    ratio to the tensor's median |g0|
Used to pick the noise threshold tau for the gradient-conditioned
 tolerance model (VERDICT r5 item 1).
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax
import jax.numpy as jnp
import numpy as np
import torch

jax.config.update("jax_platforms", "cpu")

import test_torch_twin_fullscale as tw
from test_torch_oracle import (make_oracle_sd, oracle_encode_image,
                               oracle_encode_text)
from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.kernels import augment as aug
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.loader import torch_state_dict_to_params
from swat_tpu.train import steps as steps_mod
from swat_tpu.train.state import create_train_state

CFG, V, T = tw.CFG, tw.V, tw.T
B, C, N_STEPS, WARM = tw.B, tw.C, tw.N_STEPS, tw.WARM
LR_HEAD, LR_BB, LR_PROJ, WD = tw.LR_HEAD, tw.LR_BB, tw.LR_PROJ, tw.WD

sd0 = make_oracle_sd(
    seed=17, w=V.width, layers=V.layers, embed=CFG.embed_dim,
    patch=V.patch_size, img=V.image_size, ctx=T.context_length,
    vocab=T.vocab_size, text_w=T.width, text_layers=T.layers)
g = torch.Generator().manual_seed(23)
images = torch.randn(B, V.image_size, V.image_size, 3, generator=g)
labels = torch.randint(0, C, (B,), generator=g)
head0 = torch.randn(C, CFG.embed_dim, generator=g) * 0.05


def torch_ce_like(batches, record_g0):
    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis.append(v)
    head = head0.clone().detach().requires_grad_(True)
    ls = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis, "lr": LR_BB}, {"params": [head, ls],
                                        "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    g0 = {}
    for i, (imgs, y_a, y_b, lam) in enumerate(batches):
        for grp, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            grp["lr"] = tw._ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, imgs, layers=V.layers,
                                    n_heads=V.heads, patch=V.patch_size)
        logits = ls.exp() * (feats @ head.T)
        loss = (lam * torch.nn.functional.cross_entropy(logits, y_a)
                + (1 - lam) * torch.nn.functional.cross_entropy(logits, y_b))
        loss.backward()
        if i == 0 and record_g0:
            for k, v in sd.items():
                if v.grad is not None:
                    g0[k] = v.grad.detach().clone().numpy()
        opt.step()
    return {k: v.detach().numpy() for k, v in sd.items()}, g0


def jax_run(method, batches_or_batch, mixing):
    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=V.layers, text_layers=CFG.text.layers)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), method, lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD, logit_scale=ls0,
        warmup_iter=WARM)
    if mixing:
        step = steps_mod.make_mixing_step(model, tx, "cutmix", mix_prob=1.0,
                                          image_size=V.image_size)
    else:
        step = steps_mod.make_ce_step(model, tx, image_size=V.image_size)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "source": jnp.zeros((B,), jnp.int32)}
    for k in batches_or_batch:
        state, _ = step(state, batch, k)
    return tw._jax_sd(state)


def report(name, t_sd, j_sd, g0):
    print(f"\n===== {name} =====")
    total_bad = total_hard = 0
    for k in t_sd:
        if not k.startswith("visual.") or k not in g0:
            continue
        init = sd0[k].numpy()
        ref, got = t_sd[k], j_sd[k]
        d_ref, d_got = ref - init, got - init
        g0k = np.abs(g0[k])
        if k.endswith("attn.in_proj_bias"):
            d = init.shape[0] // 3
            sel = np.r_[0:d, 2 * d:3 * d]
            d_ref, d_got, init_c, g0k = (d_ref[sel], d_got[sel], init[sel],
                                         g0k[sel])
        else:
            init_c = init
        scale = np.abs(d_ref).max()
        if scale == 0:
            continue
        ulp = float(np.spacing(np.float32(np.abs(init_c).max() + scale)))
        bad = np.abs(d_got - d_ref) > 2e-2 * scale + 2 * ulp
        nb = int(bad.sum())
        if nb == 0:
            continue
        med = float(np.median(g0k))
        mx = float(g0k.max())
        bad_g0 = g0k[bad]
        total_bad += nb
        for tau in (1e-2, 1e-3, 1e-4):
            hard = int((bad_g0 > tau * med).sum())
            if tau == 1e-3:
                total_hard += hard
        print(f"{k:55s} bad={nb:5d}/{bad.size:9d} med|g0|={med:.2e} "
              f"max|g0|={mx:.2e} bad|g0|max={bad_g0.max():.2e} "
              f"bad|g0|/med max={bad_g0.max() / med:.2e} "
              f"hard@1e-2/1e-3/1e-4="
              f"{int((bad_g0 > 1e-2 * med).sum())}/"
              f"{int((bad_g0 > 1e-3 * med).sum())}/"
              f"{int((bad_g0 > 1e-4 * med).sum())}")
    print(f"TOTAL bad={total_bad} hard@tau=1e-3: {total_hard}")


# CE
batches = [(images, labels, labels, 1.0)] * N_STEPS
t_sd, g0 = torch_ce_like(batches, True)
j_sd = jax_run("finetune", [jax.random.PRNGKey(0)] * N_STEPS, False)
report("CE", t_sd, j_sd, g0)

# cutmix
step_keys = [jax.random.fold_in(jax.random.PRNGKey(29), i)
             for i in range(N_STEPS)]
j_images = jnp.asarray(images.numpy())
j_labels = jnp.asarray(labels.numpy())
mix_batches = []
for k in step_keys:
    k_mix = jax.random.split(k, 3)[2]
    mixed, y_a, y_b, lam = aug.cutmix(j_images, j_labels, k_mix, 1.0, 1.0)
    mix_batches.append((torch.from_numpy(np.array(mixed)),
                        torch.from_numpy(np.array(y_a)).long(),
                        torch.from_numpy(np.array(y_b)).long(), float(lam)))
t_sd, g0 = torch_ce_like(mix_batches, True)
j_sd = jax_run("cutmix", step_keys, True)
report("CUTMIX", t_sd, j_sd, g0)
