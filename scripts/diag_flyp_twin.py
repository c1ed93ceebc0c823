"""Diagnose the full-scale FLYP twin failure (VERDICT r5 item 1).

Runs the exact fixture from tests/test_torch_twin_fullscale.py's FLYP
trajectory twin, records torch's PER-STEP PER-ELEMENT gradients for the
offending tensor(s), and classifies every delta mismatch: does the
element carry a real gradient (=> genuine JAX-vs-torch backward
divergence) or a rounding-zero one (=> Adam random-walk artifact the
tolerance model must account for)?
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
from test_torch_oracle import make_oracle_sd, oracle_encode_image, \
    oracle_encode_text
from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.loader import torch_state_dict_to_params
from swat_tpu.train import steps as steps_mod
from swat_tpu.train.state import create_train_state

CFG, V, T = tw.CFG, tw.V, tw.T
B, N_STEPS, WARM = tw.B, tw.N_STEPS, tw.WARM
LR_HEAD, LR_BB, LR_PROJ, WD = tw.LR_HEAD, tw.LR_BB, tw.LR_PROJ, tw.WD

sd0 = make_oracle_sd(
    seed=17, w=V.width, layers=V.layers, embed=CFG.embed_dim,
    patch=V.patch_size, img=V.image_size, ctx=T.context_length,
    vocab=T.vocab_size, text_w=T.width, text_layers=T.layers)
g = torch.Generator().manual_seed(23)
images = torch.randn(B, V.image_size, V.image_size, 3, generator=g)
_ = torch.randint(0, 10, (B,), generator=g)
head0 = torch.randn(10, CFG.embed_dim, generator=g) * 0.05
g2 = torch.Generator().manual_seed(41)
tokens = torch.randint(1, T.vocab_size - 1, (B, T.context_length),
                       generator=g2)
tokens[:, -2] = T.vocab_size - 1

# ---- torch twin with per-step grad recording -------------------------------
sd = {k: v.clone().detach() for k, v in sd0.items()}
backbone, projectors = [], []
for k, v in sd.items():
    if k == "logit_scale":
        continue
    v.requires_grad_(True)
    (projectors if k in ("visual.proj", "text_projection")
     else backbone).append(v)
logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
opt = torch.optim.AdamW(
    [{"params": backbone, "lr": LR_BB},
     {"params": projectors, "lr": LR_PROJ},
     {"params": [logit_scale], "lr": LR_HEAD}],
    betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)

grad_hist = {}   # name -> [grads per step]
for i in range(N_STEPS):
    for group, base in zip(opt.param_groups, (LR_BB, LR_PROJ, LR_HEAD)):
        group["lr"] = tw._ref_lr(i, base)
    opt.zero_grad()
    img_f = oracle_encode_image(sd, images, layers=V.layers,
                                n_heads=V.heads, patch=V.patch_size)
    txt_f = oracle_encode_text(sd, tokens, layers=T.layers, n_heads=T.heads)
    logits = logit_scale.exp() * (img_f @ txt_f.T)
    labels = torch.arange(B)
    loss = 0.5 * (torch.nn.functional.cross_entropy(logits, labels)
                  + torch.nn.functional.cross_entropy(logits.T, labels))
    loss.backward()
    for k, v in sd.items():
        if v.grad is not None:
            grad_hist.setdefault(k, []).append(v.grad.detach().clone())
    opt.step()
t_sd = {k: v.detach().numpy() for k, v in sd.items()}

# ---- jax twin ---------------------------------------------------------------
params, ls0 = torch_state_dict_to_params(
    {k: v.clone() for k, v in sd0.items()},
    vision_layers=V.layers, text_layers=T.layers)
model = CLIPModel(CFG, precision=FP32_PRECISION)
state, tx = create_train_state(
    params, head0.numpy(), "FLYP", lr_classifier=LR_HEAD,
    lr_backbone=LR_BB, lr_projector=LR_PROJ, total_iter=N_STEPS,
    wd=WD, logit_scale=ls0, warmup_iter=WARM)
step = steps_mod.make_flyp_step(model, tx, image_size=V.image_size)
batch = {"images": jnp.asarray(images.numpy()),
         "prompt_tokens": jnp.asarray(tokens.numpy()),
         "source": jnp.zeros((B,), jnp.int32)}
for _ in range(N_STEPS):
    state, loss = step(state, batch, jax.random.PRNGKey(0))
j_sd = tw._jax_sd(state)

# ---- classify every mismatch across ALL tensors -----------------------------
print(f"{'tensor':55s} {'bad':>4s} {'size':>9s} "
      f"{'gmax_bad/gmax_tensor':>22s}")
total_bad = 0
for k in t_sd:
    if k == "logit_scale":
        continue
    init = sd0[k].numpy()
    ref, got = t_sd[k], j_sd[k]
    d_ref, d_got = ref - init, got - init
    if k.endswith("attn.in_proj_bias"):
        d = init.shape[0] // 3
        d_ref = np.concatenate([d_ref[:d], d_ref[2 * d:]])
        d_got = np.concatenate([d_got[:d], d_got[2 * d:]])
        init_c = np.concatenate([init[:d], init[2 * d:]])
        gh = [np.concatenate([gr.numpy()[:d], gr.numpy()[2 * d:]])
              for gr in grad_hist.get(k, [])]
    else:
        init_c = init
        gh = [gr.numpy() for gr in grad_hist.get(k, [])]
    scale = np.abs(d_ref).max()
    if scale == 0:
        continue
    ulp = float(np.spacing(np.float32(np.abs(init_c).max() + scale)))
    bad = np.abs(d_got - d_ref) > 2e-2 * scale + 2 * ulp
    nb = int(bad.sum())
    if nb == 0:
        continue
    total_bad += nb
    gmax = np.maximum.reduce([np.abs(g_) for g_ in gh]) if gh else None
    idxs = np.argwhere(bad)
    gm_t = float(gmax.max()) if gmax is not None else float("nan")
    gm_med = float(np.median(gmax)) if gmax is not None else float("nan")
    print(f"{k:55s} {nb:4d} {bad.size:9d}")
    for idx in idxs[:10]:
        ii = tuple(idx)
        gvals = [float(g_[ii]) for g_ in gh] if gh else []
        print(f"   idx={ii} d_ref={d_ref[ii]:+.3e} d_got={d_got[ii]:+.3e}"
              f" |g|steps={[f'{abs(v):.2e}' for v in gvals]}"
              f" gmax_tensor={gm_t:.2e} gmed_tensor={gm_med:.2e}")
print("total bad elements:", total_bad)
