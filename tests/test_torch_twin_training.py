"""Training-trajectory parity vs torch (asset-free accuracy evidence).

The strongest composed check this environment allows toward the +-0.5%
accuracy-reproduction bar (VERDICT r2 "Missing #1", reference
plots_tables/fig2_domain_gap/benchmark.py:123-135): an independent torch
twin of the reference finetune loop (oracle CLIP forward from
test_torch_oracle + torch.autograd + torch.optim.AdamW param groups +
the reference's per-iteration warmup->cosine schedule, reference
utils/training.py:296-412 and utils/optimizers.py:22-146) is trained on
the EXACT same weights/data as the production `make_ce_step` path, and
the two must agree on:

  * the per-step loss trajectory (through warmup AND the cosine phase),
  * every visual-tower weight after N steps,
  * head and logit_scale after N steps,
  * the text tower staying bit-frozen (lock_text_tower, :12-19).

This exercises the full composed training dynamics end-to-end — forward,
autodiff, param-group lrs, decoupled weight decay incl. logit_scale,
schedule/optimizer-step alignment — not just the pieces that
tests/test_train.py verifies in isolation.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.loader import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from swat_tpu.train import steps as steps_mod
from swat_tpu.train.state import create_train_state

from test_torch_oracle import (
    CFG,
    CTX,
    EMBED,
    IMG,
    LAYERS,
    VOCAB,
    make_oracle_sd,
    oracle_encode_image,
    oracle_encode_text,
)

C = 5          # classes
B = 8          # batch
N_STEPS = 8    # spans warmup (0..2) and cosine (3..7)
WARM = 3
LR_HEAD, LR_BB, WD = 1e-4, 1e-6, 1e-2
WARMUP_LR = 1e-6   # default_warmup_lr(lr_backbone=1e-6)
ETA_MIN = 1e-9


def _ref_lr(i: int, base: float) -> float:
    """Reference LinearWarmupScheduler semantics (utils/optimizers.py:
    31-35,183-206): optimizer step i uses warmup_lr at i==0, base*i/W
    during warmup, then cosine stepped s=i-(W-1) over total_iter."""
    if i == 0:
        return WARMUP_LR
    if i < WARM:
        return base * i / WARM
    s = i - (WARM - 1)
    return ETA_MIN + (base - ETA_MIN) * 0.5 * (
        1.0 + math.cos(math.pi * s / N_STEPS))


def _fixtures():
    sd0 = make_oracle_sd(seed=11)
    g = torch.Generator().manual_seed(21)
    images = torch.randn(B, IMG, IMG, 3, generator=g)
    labels = torch.randint(0, C, (B,), generator=g)
    head0 = torch.randn(C, EMBED, generator=g) * 0.05
    return sd0, images, labels, head0


def _train_torch_twin(sd0, images, labels, head0, optim="AdamW"):
    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)

    # reference param groups: visual tower at lr_backbone, head +
    # logit_scale at lr_classifier, text tower excluded (frozen);
    # AdamW decoupled wd / SGD momentum-0.9 L2-coupled wd on every
    # group (utils/optimizers.py:38-81,131-146)
    groups = [{"params": vis_params, "lr": LR_BB},
              {"params": [head, logit_scale], "lr": LR_HEAD}]
    if optim == "AdamW":
        opt = torch.optim.AdamW(groups, betas=(0.9, 0.999), eps=1e-8,
                                weight_decay=WD)
    else:
        opt = torch.optim.SGD(groups, momentum=0.9, weight_decay=WD)

    losses = []
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, images)
        logits = logit_scale.exp() * (feats @ head.T)
        loss = torch.nn.functional.cross_entropy(logits, labels)
        loss.backward()
        opt.step()
        losses.append(loss.item())

    final_sd = {k: v.detach().numpy() for k, v in sd.items()}
    return losses, final_sd, head.detach().numpy(), logit_scale.item()


def _train_ours(sd0, images, labels, head0, optim="AdamW"):
    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "finetune", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM, optim_type=optim)
    step = steps_mod.make_ce_step(model, tx, image_size=IMG)
    batch = {
        "images": jnp.asarray(images.numpy()),
        "labels": jnp.asarray(labels.numpy()),
        "source": jnp.zeros((B,), jnp.int32),
    }
    key = jax.random.PRNGKey(0)   # unused: batch carries images directly
    losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, key)
        losses.append(float(loss))
    model_np = jax.tree_util.tree_map(np.asarray, jax.device_get(state.model))
    final_sd = params_to_torch_state_dict(model_np,
                                          float(state.logit_scale))
    return losses, final_sd, np.asarray(state.head), float(state.logit_scale)


@pytest.mark.parametrize("optim", ["AdamW", "SGD"])
def test_training_trajectory_matches_torch(optim):
    sd0, images, labels, head0 = _fixtures()
    t_losses, t_sd, t_head, t_ls = _train_torch_twin(
        sd0, images, labels, head0, optim)
    j_losses, j_sd, j_head, j_ls = _train_ours(
        sd0, images, labels, head0, optim)

    # the trajectory must actually train (warmup ramps lr up from 1e-6)
    assert t_losses[-1] < t_losses[0]

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(j_ls, t_ls, rtol=0, atol=1e-5)
    np.testing.assert_allclose(j_head, t_head, rtol=0, atol=2e-5)

    # every visual-tower weight moved identically; the text tower is
    # bit-frozen in both frameworks
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        got = j_sd[k]
        if k.startswith("visual."):
            np.testing.assert_allclose(
                got, ref, rtol=0, atol=2e-5, err_msg=k)
            # and it genuinely trained (not equal to the init)
            if k.endswith(("proj", "weight")) and "ln" not in k:
                assert np.abs(ref - sd0[k].numpy()).max() > 0, k
        else:
            np.testing.assert_array_equal(got, sd0[k].numpy(), err_msg=k)


# ---------------------------------------------------------------------------
# probing (stage-2 / REAL-Linear core): pre-extracted features, head-only
# AdamW at lr_classifier, logit_scale FIXED at ln(100) — not a param
# (reference train_probing utils/training.py:47-161, set_params :53-59)


def test_probing_trajectory_matches_torch():
    g = torch.Generator().manual_seed(41)
    feats = torch.randn(B, EMBED, generator=g)
    feats = feats / feats.norm(dim=-1, keepdim=True)
    labels = torch.randint(0, C, (B,), generator=g)
    head0 = torch.randn(C, EMBED, generator=g) * 0.05

    head = head0.clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW([{"params": [head], "lr": LR_HEAD}],
                            betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    t_losses = []
    for i in range(N_STEPS):
        opt.param_groups[0]["lr"] = _ref_lr(i, LR_HEAD)
        opt.zero_grad()
        logits = math.exp(math.log(100.0)) * (feats @ head.T)
        loss = torch.nn.functional.cross_entropy(logits, labels)
        loss.backward()
        opt.step()
        t_losses.append(loss.item())

    sd0 = make_oracle_sd(seed=11)
    params, _ = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "probing", lr_classifier=LR_HEAD,
        total_iter=N_STEPS, wd=WD, warmup_iter=WARM)
    assert float(state.logit_scale) == pytest.approx(math.log(100.0))
    step = steps_mod.make_probing_step(model, tx, pre_extracted=True)
    batch = {"features": jnp.asarray(feats.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(state.head),
                               head.detach().numpy(), rtol=0, atol=2e-5)
    # logit_scale stays pinned; the whole model tree stays bit-frozen
    assert float(state.logit_scale) == pytest.approx(math.log(100.0))
    for a, b in zip(jax.tree_util.tree_leaves(state.model),
                    jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# cutmix (the SWAT stage-1 flagship): CE twin + box-mixed batches +
# lam-weighted mixup criterion (reference train_cutmix utils/training.py:
# 1422-1556, mixup_criterion :1157-1158). The mixing itself comes from
# `aug.cutmix` (separately verified: rand_bbox distribution, pixel-ratio
# lambda — tests/test_augment.py); this twin proves the COMPOSED training
# dynamics on mixed batches — torch oracle forward/backward + the
# two-term weighted loss + AdamW param groups — match the production
# `make_mixing_step("cutmix")` path step for step.


def test_cutmix_trajectory_matches_torch():
    from swat_tpu.kernels import augment as aug

    sd0, images, labels, head0 = _fixtures()

    # replicate the step's internal key discipline to hand the torch twin
    # the exact mixed batches the jax step will see:
    # step splits key -> (k_aug, k_aug2, k_mix) and mixes with k_mix
    step_keys = [jax.random.fold_in(jax.random.PRNGKey(7), i)
                 for i in range(N_STEPS)]
    j_images = jnp.asarray(images.numpy())
    j_labels = jnp.asarray(labels.numpy())
    mixes = []
    for k in step_keys:
        k_mix = jax.random.split(k, 3)[2]
        mixed, y_a, y_b, lam = aug.cutmix(j_images, j_labels, k_mix,
                                          1.0, 1.0)
        mixes.append((torch.from_numpy(np.array(mixed)),
                      torch.from_numpy(np.array(y_a)).long(),
                      torch.from_numpy(np.array(y_b)).long(),
                      float(lam)))
    # the mixing must actually engage somewhere in the trajectory
    assert min(m[3] for m in mixes) < 0.95
    assert any((m[1] != m[2]).any() for m in mixes)

    # -- torch twin on the fixed mixed batches
    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    t_losses = []
    for i, (mx, y_a, y_b, lam) in enumerate(mixes):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, mx)
        logits = logit_scale.exp() * (feats @ head.T)
        loss = (lam * torch.nn.functional.cross_entropy(logits, y_a)
                + (1.0 - lam)
                * torch.nn.functional.cross_entropy(logits, y_b))
        loss.backward()
        opt.step()
        t_losses.append(loss.item())
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    # -- production jax path
    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "cutmix", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_mixing_step(model, tx, "cutmix",
                                      mix_prob=1.0, image_size=IMG)
    batch = {"images": j_images, "labels": j_labels,
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses = []
    for k in step_keys:
        state, loss = step(state, batch, k)
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(state.logit_scale), logit_scale.item(),
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.head),
                               head.detach().numpy(), rtol=0, atol=2e-5)
    model_np = jax.tree_util.tree_map(np.asarray,
                                      jax.device_get(state.model))
    j_sd = params_to_torch_state_dict(model_np, float(state.logit_scale))
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        if k.startswith("visual."):
            np.testing.assert_allclose(j_sd[k], ref, rtol=0, atol=2e-5,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(j_sd[k], sd0[k].numpy(),
                                          err_msg=k)


# ---------------------------------------------------------------------------
# CMLP (cross-modal linear probing): image features + a text-feature bank
# concatenated with shared labels, head-only AdamW, logit_scale pinned at
# ln(100) (reference train_CMLP utils/training.py:164-293, set_params
# :53-59).


def test_cmlp_trajectory_matches_torch():
    g = torch.Generator().manual_seed(51)
    img_f = torch.randn(B, EMBED, generator=g)
    img_f = img_f / img_f.norm(dim=-1, keepdim=True)
    txt_f = torch.randn(B + 2, EMBED, generator=g)
    txt_f = txt_f / txt_f.norm(dim=-1, keepdim=True)
    img_y = torch.randint(0, C, (B,), generator=g)
    txt_y = torch.randint(0, C, (B + 2,), generator=g)
    head0 = torch.randn(C, EMBED, generator=g) * 0.05

    head = head0.clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW([{"params": [head], "lr": LR_HEAD}],
                            betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    feats = torch.cat([img_f, txt_f], dim=0)
    labels = torch.cat([img_y, txt_y], dim=0)
    t_losses = []
    for i in range(N_STEPS):
        opt.param_groups[0]["lr"] = _ref_lr(i, LR_HEAD)
        opt.zero_grad()
        logits = 100.0 * (feats @ head.T)
        loss = torch.nn.functional.cross_entropy(logits, labels)
        loss.backward()
        opt.step()
        t_losses.append(loss.item())

    sd0 = make_oracle_sd(seed=11)
    params, _ = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "CMLP", lr_classifier=LR_HEAD,
        total_iter=N_STEPS, wd=WD, warmup_iter=WARM)
    assert float(state.logit_scale) == pytest.approx(math.log(100.0))
    step = steps_mod.make_cmlp_step(model, tx, pre_extracted=True)
    batch = {"features": jnp.asarray(img_f.numpy()),
             "labels": jnp.asarray(img_y.numpy()),
             "text_features": jnp.asarray(txt_f.numpy()),
             "text_labels": jnp.asarray(txt_y.numpy())}
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(state.head),
                               head.detach().numpy(), rtol=0, atol=2e-5)
    assert float(state.logit_scale) == pytest.approx(math.log(100.0))


# ---------------------------------------------------------------------------
# saliencymix: per-image boxes + per-image lambdas through the SUMMED
# lam-vector criterion (reference mixup_criterion_lam_list
# utils/training.py:1160-1162 sums per-sample CE — a ~bsz-times larger
# gradient scale than the mean criteria; deliberately preserved).  The
# mixing comes from `aug.saliencymix` (unit-verified peak/box semantics);
# this twin proves the composed SUM-criterion training dynamics.


def test_saliencymix_trajectory_matches_torch():
    from swat_tpu.kernels import augment as aug

    sd0, images, labels, head0 = _fixtures()
    step_keys = [jax.random.fold_in(jax.random.PRNGKey(13), i)
                 for i in range(N_STEPS)]
    j_images = jnp.asarray(images.numpy())
    j_labels = jnp.asarray(labels.numpy())
    mixes = []
    for k in step_keys:
        k_mix = jax.random.split(k, 3)[2]
        mixed, y_a, y_b, lam_vec = aug.saliencymix(j_images, j_labels,
                                                   k_mix, 1.0, 1.0)
        mixes.append((torch.from_numpy(np.array(mixed)),
                      torch.from_numpy(np.array(y_a)).long(),
                      torch.from_numpy(np.array(y_b)).long(),
                      torch.from_numpy(np.array(lam_vec))))
    assert min(float(m[3].min()) for m in mixes) < 0.95

    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    t_losses = []
    for i, (mx, y_a, y_b, lam) in enumerate(mixes):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, mx)
        logits = logit_scale.exp() * (feats @ head.T)
        ce_a = torch.nn.functional.cross_entropy(logits, y_a,
                                                 reduction="none")
        ce_b = torch.nn.functional.cross_entropy(logits, y_b,
                                                 reduction="none")
        loss = (lam * ce_a + (1.0 - lam) * ce_b).sum()  # SUM, not mean
        loss.backward()
        opt.step()
        t_losses.append(loss.item())
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "saliencymix", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_mixing_step(model, tx, "saliencymix",
                                      mix_prob=1.0, image_size=IMG)
    batch = {"images": j_images, "labels": j_labels,
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses = []
    for k in step_keys:
        state, loss = step(state, batch, k)
        j_losses.append(float(loss))

    # the summed criterion's losses are ~bsz x larger — rtol only
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(state.head),
                               head.detach().numpy(), rtol=0, atol=3e-5)
    j_sd = params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, jax.device_get(state.model)),
        float(state.logit_scale))
    for k, ref in t_sd.items():
        if k.startswith("visual."):
            np.testing.assert_allclose(j_sd[k], ref, rtol=0, atol=3e-5,
                                       err_msg=k)


# ---------------------------------------------------------------------------
# finetune-multitask: class head (scaled logits) + binary dataset-source
# head (UNSCALED — the reference comments the scaling out,
# utils/training.py:1035-1036), weighted sum loss, all heads +
# logit_scale at lr_classifier, visual at lr_backbone (set_params
# :76-81).


def test_multitask_trajectory_matches_torch():
    DS_WD = 0.7
    sd0, images, labels, head0 = _fixtures()
    g = torch.Generator().manual_seed(71)
    source = torch.randint(0, 2, (B,), generator=g)
    ds_head0 = torch.randn(2, EMBED, generator=g) * 0.05

    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    ds_head = ds_head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, ds_head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    t_losses = []
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, images)
        logits = logit_scale.exp() * (feats @ head.T)
        ds_logits = feats @ ds_head.T
        loss = (torch.nn.functional.cross_entropy(logits, labels)
                + DS_WD * torch.nn.functional.cross_entropy(
                    ds_logits, source))
        loss.backward()
        opt.step()
        t_losses.append(loss.item())
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, {"cls": head0.numpy(), "dataset": ds_head0.numpy()},
        "finetune-multitask", lr_classifier=LR_HEAD, lr_backbone=LR_BB,
        total_iter=N_STEPS, wd=WD, logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_multitask_step(model, tx, dataset_wd=DS_WD,
                                         image_size=IMG)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "source": jnp.asarray(source.numpy())}
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(state.logit_scale),
                               logit_scale.item(), rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.head["cls"]),
                               head.detach().numpy(), rtol=0, atol=2e-5)
    np.testing.assert_allclose(np.asarray(state.head["dataset"]),
                               ds_head.detach().numpy(), rtol=0, atol=2e-5)
    j_sd = params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, jax.device_get(state.model)),
        float(state.logit_scale))
    for k, ref in t_sd.items():
        if k.startswith("visual."):
            np.testing.assert_allclose(j_sd[k], ref, rtol=0, atol=2e-5,
                                       err_msg=k)


# ---------------------------------------------------------------------------
# FixMatch: labeled CE + confidence-masked consistency on weak/strong
# unlabeled views (reference train_fixmatch utils/training.py:820-983).
# Both losses use UNSCALED logits (:893-908 — the scaled pseudo-label
# variant is commented out), so logit_scale never receives a torch grad
# and AdamW skips it: it must stay BIT-CONSTANT at ln(1/0.07) in both
# frameworks (regression for phantom weight decay on a zero-grad param).


def test_fixmatch_trajectory_matches_torch():
    THRESH = 0.15   # tiny random model: real 0.95 would mask everything
    sd0, images, labels, head0 = _fixtures()
    g = torch.Generator().manual_seed(61)
    images_w = torch.randn(B, IMG, IMG, 3, generator=g)
    images_s = images_w + 0.3 * torch.randn(B, IMG, IMG, 3, generator=g)

    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    t_losses, t_masks = [], []
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        all_images = torch.cat([images, images_w, images_s], dim=0)
        feats = oracle_encode_image(sd, all_images)
        logits = feats @ head.T
        logits_l = logits[:B]
        logits_u_w, logits_u_s = logits[B:].chunk(2)
        loss_l = torch.nn.functional.cross_entropy(logits_l, labels)
        pseudo = torch.softmax(logits_u_w, dim=-1)
        max_p, targets = torch.max(pseudo, dim=-1)
        mask = max_p.ge(THRESH).float()
        loss_u = (torch.nn.functional.cross_entropy(
            logits_u_s, targets, reduction="none") * mask).mean()
        loss = loss_l + 1.0 * loss_u
        loss.backward()
        opt.step()
        t_losses.append(loss.item())
        t_masks.append(mask.mean().item())
    # torch AdamW skipped the grad-less logit_scale entirely
    assert logit_scale.item() == sd0["logit_scale"].item()
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "fixmatch", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_fixmatch_step(model, tx, threshold=THRESH,
                                        lambda_u=1.0, image_size=IMG,
                                        aux=True)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "images_w": jnp.asarray(images_w.numpy()),
             "images_s": jnp.asarray(images_s.numpy()),
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses, j_masks = [], []
    for _ in range(N_STEPS):
        state, (loss, mask_rate, _) = step(state, batch,
                                           jax.random.PRNGKey(0))
        j_losses.append(float(loss))
        j_masks.append(float(mask_rate))

    # the consistency branch must actually engage
    assert max(t_masks) > 0
    np.testing.assert_allclose(j_masks, t_masks, rtol=0, atol=0)
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    # logit_scale bit-constant on our side too (it is in the reference's
    # optimizer but never gets a grad; torch skips None-grad params)
    assert float(state.logit_scale) == pytest.approx(ls0, abs=0)
    np.testing.assert_allclose(np.asarray(state.head),
                               head.detach().numpy(), rtol=0, atol=2e-5)
    j_sd = params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, jax.device_get(state.model)),
        float(state.logit_scale))
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        if k.startswith("visual."):
            np.testing.assert_allclose(j_sd[k], ref, rtol=0, atol=2e-5,
                                       err_msg=k)
        else:
            np.testing.assert_array_equal(j_sd[k], sd0[k].numpy(),
                                          err_msg=k)


# ---------------------------------------------------------------------------
# FLYP: bidirectional InfoNCE, BOTH towers train, projectors at
# lr_projector, logit_scale at lr_classifier, head NOT in the optimizer
# (reference train_flyp utils/training.py:415-552, set_params :83-120)

LR_PROJ = 5e-5


def _train_torch_flyp(sd0, images, tokens, locked_text=False):
    """locked_text mirrors the reference quirk exactly: lock_text_tower
    freezes the whole text tower INCLUDING text_projection, but the FLYP
    branch then re-enables both projectors and appends them at
    lr_projector (utils/optimizers.py:103-120) — so text_projection
    trains even when the tower is locked."""
    sd = {k: v.clone().detach() for k, v in sd0.items()}
    backbone, projectors = [], []
    for k, v in sd.items():
        if k == "logit_scale":
            continue
        if k in ("visual.proj", "text_projection"):
            v.requires_grad_(True)
            projectors.append(v)
            continue
        if locked_text and not k.startswith("visual."):
            continue  # frozen text tower
        v.requires_grad_(True)
        backbone.append(v)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)

    opt = torch.optim.AdamW(
        [{"params": backbone, "lr": LR_BB},
         {"params": projectors, "lr": LR_PROJ},
         {"params": [logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)

    losses = []
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_PROJ, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        img_f = oracle_encode_image(sd, images)
        txt_f = oracle_encode_text(sd, tokens)
        logits = logit_scale.exp() * (img_f @ txt_f.T)
        labels = torch.arange(img_f.shape[0])
        loss = 0.5 * (torch.nn.functional.cross_entropy(logits, labels)
                      + torch.nn.functional.cross_entropy(logits.T, labels))
        loss.backward()
        opt.step()
        losses.append(loss.item())

    final_sd = {k: v.detach().numpy() for k, v in sd.items()}
    return losses, final_sd, logit_scale.item()


def _train_ours_flyp(sd0, images, tokens, head0, locked_text=False):
    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "FLYP", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, lr_projector=LR_PROJ, total_iter=N_STEPS,
        wd=WD, logit_scale=ls0, warmup_iter=WARM,
        locked_text=locked_text)
    step = steps_mod.make_flyp_step(model, tx, image_size=IMG)
    batch = {
        "images": jnp.asarray(images.numpy()),
        "prompt_tokens": jnp.asarray(tokens.numpy()),
        "source": jnp.zeros((B,), jnp.int32),
    }
    key = jax.random.PRNGKey(0)
    losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, key)
        losses.append(float(loss))
    model_np = jax.tree_util.tree_map(np.asarray, jax.device_get(state.model))
    final_sd = params_to_torch_state_dict(model_np,
                                          float(state.logit_scale))
    return losses, final_sd, float(state.logit_scale), np.asarray(state.head)


@pytest.mark.parametrize("locked_text", [False, True])
def test_flyp_trajectory_matches_torch(locked_text):
    sd0, images, _, head0 = _fixtures()
    g = torch.Generator().manual_seed(33)
    tokens = torch.randint(1, VOCAB - 1, (B, CTX), generator=g)
    tokens[:, CTX - 2] = VOCAB - 1   # EOT = highest id, fixed position

    t_losses, t_sd, t_ls = _train_torch_flyp(sd0, images, tokens,
                                             locked_text)
    j_losses, j_sd, j_ls, j_head = _train_ours_flyp(
        sd0, images, tokens, head0, locked_text)

    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(j_ls, t_ls, rtol=0, atol=1e-5)

    # both towers AND both projectors moved identically
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        np.testing.assert_allclose(j_sd[k], ref, rtol=0, atol=2e-5,
                                   err_msg=k)
    # text_projection trains even with the tower locked (the reference
    # re-enables both projectors after lock_text_tower, :103-120)
    for k in ("visual.proj", "text_projection", "visual.conv1.weight"):
        assert np.abs(t_sd[k] - sd0[k].numpy()).max() > 0, k
    if locked_text:
        np.testing.assert_array_equal(
            t_sd["token_embedding.weight"],
            sd0["token_embedding.weight"].numpy())
    else:
        assert np.abs(t_sd["token_embedding.weight"]
                      - sd0["token_embedding.weight"].numpy()).max() > 0

    # the head is NOT an optimizer param in FLYP: it must stay
    # bit-identical (no phantom weight decay)
    np.testing.assert_array_equal(j_head, head0.numpy())


# ---------------------------------------------------------------------------
# Remaining mixing-family trajectories.  Same twin scheme as cutmix: the
# jax augment op is replayed with the step's exact k_mix to hand the torch
# twin the identical mixed batches, then both frameworks train end-to-end
# and must agree on losses and every trained weight.
#
# mixup      reference train_mixup      utils/training.py:1164-1278
# resizemix  reference train_resizemix  :2309-2455
# mixup-fs   reference train_mixup_fs   :1281-1401 (0-or-1 lambda: with
#            prob mix_prob the few-shot batch replaces the retrieved one)
# CMO        reference train_CMO        :1865-2005 (box pasted from the
#            inverse-frequency-sampled second batch)
# All use the MEAN mixup_criterion (utils/training.py:1157-1158).


def _train_torch_mixing_twin(sd0, head0, mixes):
    """Torch finetune loop on pre-mixed batches: visual@lr_backbone,
    head+logit_scale@lr_classifier (set_params utils/optimizers.py:62-81),
    mean mixup_criterion."""
    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    losses = []
    for i, (mx, y_a, y_b, lam) in enumerate(mixes):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, mx)
        logits = logit_scale.exp() * (feats @ head.T)
        loss = (lam * torch.nn.functional.cross_entropy(logits, y_a)
                + (1.0 - lam)
                * torch.nn.functional.cross_entropy(logits, y_b))
        loss.backward()
        opt.step()
        losses.append(loss.item())
    return (losses, {k: v.detach().numpy() for k, v in sd.items()},
            head.detach().numpy(), logit_scale.item())


def _assert_mixing_twin(method, state, j_losses, t_losses, t_sd, t_head,
                        t_ls, sd0):
    np.testing.assert_allclose(j_losses, t_losses, rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(float(state.logit_scale), t_ls,
                               rtol=0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(state.head), t_head,
                               rtol=0, atol=2e-5)
    model_np = jax.tree_util.tree_map(np.asarray,
                                      jax.device_get(state.model))
    j_sd = params_to_torch_state_dict(model_np, float(state.logit_scale))
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        if k.startswith("visual."):
            np.testing.assert_allclose(j_sd[k], ref, rtol=0, atol=2e-5,
                                       err_msg=f"{method}: {k}")
        else:   # text tower bit-frozen (lock_text_tower)
            np.testing.assert_array_equal(j_sd[k], sd0[k].numpy(),
                                          err_msg=f"{method}: {k}")


@pytest.mark.parametrize("method", ["mixup", "resizemix"])
def test_scalar_mixing_trajectory_matches_torch(method):
    from swat_tpu.kernels import augment as aug

    sd0, images, labels, head0 = _fixtures()
    step_keys = [jax.random.fold_in(jax.random.PRNGKey(17), i)
                 for i in range(N_STEPS)]
    j_images = jnp.asarray(images.numpy())
    j_labels = jnp.asarray(labels.numpy())
    # mix_prob=0.5 exercises BOTH gate branches across the trajectory
    mixes = []
    for k in step_keys:
        k_mix = jax.random.split(k, 3)[2]
        if method == "mixup":
            mixed, y_a, y_b, lam = aug.mixup(j_images, j_labels, k_mix,
                                             1.0, 0.5)
        else:
            mixed, y_a, y_b, lam = aug.resizemix(j_images, j_labels,
                                                 k_mix, 0.5)
        mixes.append((torch.from_numpy(np.array(mixed)),
                      torch.from_numpy(np.array(y_a)).long(),
                      torch.from_numpy(np.array(y_b)).long(),
                      float(lam)))
    lams = [m[3] for m in mixes]
    assert min(lams) < 0.95, "mixing never engaged"
    assert max(lams) == 1.0, "identity branch never taken"

    t_losses, t_sd, t_head, t_ls = _train_torch_mixing_twin(
        sd0, head0, mixes)

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), method, lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_mixing_step(model, tx, method,
                                      mix_prob=0.5, image_size=IMG)
    batch = {"images": j_images, "labels": j_labels,
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses = []
    for k in step_keys:
        state, loss = step(state, batch, k)
        j_losses.append(float(loss))

    _assert_mixing_twin(method, state, j_losses, t_losses, t_sd,
                        t_head, t_ls, sd0)


@pytest.mark.parametrize("method", ["mixup-fs", "CMO"])
def test_twinbatch_mixing_trajectory_matches_torch(method):
    from swat_tpu.kernels import augment as aug

    sd0, images, labels, head0 = _fixtures()
    g = torch.Generator().manual_seed(55)
    images_fs = torch.randn(B, IMG, IMG, 3, generator=g)
    labels_fs = torch.randint(0, C, (B,), generator=g)
    j_images = jnp.asarray(images.numpy())
    j_labels = jnp.asarray(labels.numpy())
    j_images_fs = jnp.asarray(images_fs.numpy())
    j_labels_fs = jnp.asarray(labels_fs.numpy())

    step_keys = [jax.random.fold_in(jax.random.PRNGKey(23), i)
                 for i in range(N_STEPS)]
    mixes = []
    for k in step_keys:
        k_mix = jax.random.split(k, 3)[2]
        if method == "mixup-fs":
            mixed, y_a, y_b, lam = aug.mixup_fs(
                j_images, j_labels, j_images_fs, j_labels_fs, k_mix,
                1.0, 0.5)
        else:
            mixed, y_a, y_b, lam = aug.cutmix_from(
                j_images, j_labels, j_images_fs, j_labels_fs, k_mix,
                1.0, 0.5)
        mixes.append((torch.from_numpy(np.array(mixed)),
                      torch.from_numpy(np.array(y_a)).long(),
                      torch.from_numpy(np.array(y_b)).long(),
                      float(lam)))
    lams = [m[3] for m in mixes]
    assert min(lams) < 0.95, "twin-batch mixing never engaged"
    assert max(lams) == 1.0, "identity branch never taken"

    t_losses, t_sd, t_head, t_ls = _train_torch_mixing_twin(
        sd0, head0, mixes)

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), method, lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_mixing_step(model, tx, method,
                                      mix_prob=0.5, image_size=IMG)
    batch = {"images": j_images, "labels": j_labels,
             "source": jnp.zeros((B,), jnp.int32),
             "images_fs": j_images_fs, "labels_fs": j_labels_fs,
             "source_fs": jnp.ones((B,), jnp.int32)}
    j_losses = []
    for k in step_keys:
        state, loss = step(state, batch, k)
        j_losses.append(float(loss))

    _assert_mixing_twin(method, state, j_losses, t_losses, t_sd,
                        t_head, t_ls, sd0)


# ---------------------------------------------------------------------------
# finetune-mixed + WeightedCE: retrieved batch concatenated with the cycled
# few-shot twin batch, per-sample CE scaled by the source flag
# (fewshot_weight for source==1, 1.0 for retrieved) and MEAN-reduced over
# the CONCATENATED batch (reference train_ce_mixed utils/training.py:
# 692-816, WeightedCELoss utils/losses.py:74-96).


def test_ce_mixed_weightedce_trajectory_matches_torch():
    from swat_tpu.train.losses import make_weighted_ce

    FS_W = 2.0
    sd0, images, labels, head0 = _fixtures()
    g = torch.Generator().manual_seed(77)
    images_fs = torch.randn(B, IMG, IMG, 3, generator=g)
    labels_fs = torch.randint(0, C, (B,), generator=g)

    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    cat_images = torch.cat([images, images_fs], dim=0)
    cat_labels = torch.cat([labels, labels_fs], dim=0)
    weights = torch.cat([torch.ones(B), torch.full((B,), FS_W)])
    t_losses = []
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, cat_images)
        logits = logit_scale.exp() * (feats @ head.T)
        per = torch.nn.functional.cross_entropy(logits, cat_labels,
                                                reduction="none")
        loss = (per * weights).mean()
        loss.backward()
        opt.step()
        t_losses.append(loss.item())
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "finetune-mixed", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_ce_step(model, tx, loss=make_weighted_ce(FS_W),
                                  concat_fs=True, image_size=IMG)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "source": jnp.zeros((B,), jnp.int32),
             "images_fs": jnp.asarray(images_fs.numpy()),
             "labels_fs": jnp.asarray(labels_fs.numpy()),
             "source_fs": jnp.ones((B,), jnp.int32)}
    key = jax.random.PRNGKey(0)   # unused: batch carries images directly
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, key)
        j_losses.append(float(loss))

    _assert_mixing_twin("finetune-mixed", state, j_losses, t_losses,
                        t_sd, head.detach().numpy(), logit_scale.item(),
                        sd0)


# ---------------------------------------------------------------------------
# dataset-cls: binary retrieved-vs-fewshot classification — the SOURCE flag
# is the label, logits ARE scaled by logit_scale.exp() (reference
# train_dataset_cls utils/training.py:609-614), visual tower +
# 2-class head + logit_scale trained as usual.


def test_dataset_cls_trajectory_matches_torch():
    sd0, images, _, _ = _fixtures()
    g = torch.Generator().manual_seed(99)
    source = torch.randint(0, 2, (B,), generator=g)
    head0 = torch.randn(2, EMBED, generator=g) * 0.05
    assert source.min() == 0 and source.max() == 1

    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)
    t_losses = []
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, images)
        logits = logit_scale.exp() * (feats @ head.T)
        loss = torch.nn.functional.cross_entropy(logits, source)
        loss.backward()
        opt.step()
        t_losses.append(loss.item())
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "dataset-cls", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_dataset_cls_step(model, tx, image_size=IMG)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.zeros((B,), jnp.int32),   # unused by the step
             "source": jnp.asarray(source.numpy())}
    key = jax.random.PRNGKey(0)
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, key)
        j_losses.append(float(loss))

    _assert_mixing_twin("dataset-cls", state, j_losses, t_losses,
                        t_sd, head.detach().numpy(), logit_scale.item(),
                        sd0)


# ---------------------------------------------------------------------------
# cutmix-fs (reference train_cutmix_fs2 utils/training.py:1701-1862): the
# few-shot batch is CONCATENATED onto the retrieved batch and a single
# cutmix runs over the combined batch — scalar lambda, MEAN criterion
# (unlike CMO, which pastes FROM the second batch).


def test_cutmix_fs_trajectory_matches_torch():
    from swat_tpu.kernels import augment as aug

    sd0, images, labels, head0 = _fixtures()
    g = torch.Generator().manual_seed(91)
    images_fs = torch.randn(B, IMG, IMG, 3, generator=g)
    labels_fs = torch.randint(0, C, (B,), generator=g)
    j_cat_images = jnp.concatenate([jnp.asarray(images.numpy()),
                                    jnp.asarray(images_fs.numpy())], axis=0)
    j_cat_labels = jnp.concatenate([jnp.asarray(labels.numpy()),
                                    jnp.asarray(labels_fs.numpy())], axis=0)

    step_keys = [jax.random.fold_in(jax.random.PRNGKey(29), i)
                 for i in range(N_STEPS)]
    mixes = []
    for k in step_keys:
        k_mix = jax.random.split(k, 3)[2]
        mixed, y_a, y_b, lam = aug.cutmix(j_cat_images, j_cat_labels,
                                          k_mix, 1.0, 0.5)
        mixes.append((torch.from_numpy(np.array(mixed)),
                      torch.from_numpy(np.array(y_a)).long(),
                      torch.from_numpy(np.array(y_b)).long(),
                      float(lam)))
    lams = [m[3] for m in mixes]
    assert min(lams) < 0.95, "cutmix over the concat batch never engaged"
    assert max(lams) == 1.0, "identity branch never taken"

    t_losses, t_sd, t_head, t_ls = _train_torch_mixing_twin(
        sd0, head0, mixes)

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "cutmix-fs", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_mixing_step(model, tx, "cutmix-fs",
                                      mix_prob=0.5, image_size=IMG)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "source": jnp.zeros((B,), jnp.int32),
             "images_fs": jnp.asarray(images_fs.numpy()),
             "labels_fs": jnp.asarray(labels_fs.numpy()),
             "source_fs": jnp.ones((B,), jnp.int32)}
    j_losses = []
    for k in step_keys:
        state, loss = step(state, batch, k)
        j_losses.append(float(loss))

    _assert_mixing_twin("cutmix-fs", state, j_losses, t_losses, t_sd,
                        t_head, t_ls, sd0)


# ---------------------------------------------------------------------------
# attentivemix (reference train_attentivemix2 utils/training.py:2672-2831):
# boxes centered on the peak of a model heatmap, per-image lambdas, SUMMED
# lam-vector criterion.  The heatmap comes from the LIVE training model
# (the TPU-native GEM replacement, swat_tpu/eval/heatmap.py), so the twin
# runs in lockstep: each step's mixed batch is recorded from the current
# jax params (exactly what the jitted step computes internally, behind
# stop_gradient) and the torch twin trains on those recorded batches.


def test_attentivemix_trajectory_matches_torch():
    from swat_tpu.eval.heatmap import clip_attention_heatmap
    from swat_tpu.kernels import augment as aug

    sd0, images, labels, head0 = _fixtures()
    j_images = jnp.asarray(images.numpy())
    j_labels = jnp.asarray(labels.numpy())
    step_keys = [jax.random.fold_in(jax.random.PRNGKey(37), i)
                 for i in range(N_STEPS)]

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=LAYERS, text_layers=LAYERS)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "attentivemix", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)

    def heatmap_fn(p, x, y=None):
        return clip_attention_heatmap(model, p, x)

    step = steps_mod.make_mixing_step(model, tx, "attentivemix",
                                      mix_prob=1.0, heatmap_fn=heatmap_fn,
                                      image_size=IMG)
    batch = {"images": j_images, "labels": j_labels,
             "source": jnp.zeros((B,), jnp.int32)}

    sd = {k: v.clone().detach() for k, v in sd0.items()}
    vis_params = []
    for k, v in sd.items():
        if k.startswith("visual."):
            v.requires_grad_(True)
            vis_params.append(v)
    head = head0.clone().detach().requires_grad_(True)
    logit_scale = sd["logit_scale"].clone().detach().requires_grad_(True)
    opt = torch.optim.AdamW(
        [{"params": vis_params, "lr": LR_BB},
         {"params": [head, logit_scale], "lr": LR_HEAD}],
        betas=(0.9, 0.999), eps=1e-8, weight_decay=WD)

    j_losses, t_losses = [], []
    min_lam = 1.0
    for i, k in enumerate(step_keys):
        k_mix = jax.random.split(k, 3)[2]
        hm = heatmap_fn(jax.device_put(state.model), j_images)
        mixed, y_a, y_b, lam_vec = aug.attentivemix(
            j_images, j_labels, hm, k_mix, 1.0, 1.0)
        mx = torch.from_numpy(np.array(mixed))
        ty_a = torch.from_numpy(np.array(y_a)).long()
        ty_b = torch.from_numpy(np.array(y_b)).long()
        tlam = torch.from_numpy(np.array(lam_vec))
        min_lam = min(min_lam, float(tlam.min()))

        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, mx)
        logits = logit_scale.exp() * (feats @ head.T)
        ce_a = torch.nn.functional.cross_entropy(logits, ty_a,
                                                 reduction="none")
        ce_b = torch.nn.functional.cross_entropy(logits, ty_b,
                                                 reduction="none")
        t_loss = (tlam * ce_a + (1.0 - tlam) * ce_b).sum()  # SUM, not mean
        t_loss.backward()
        opt.step()
        t_losses.append(t_loss.item())

        state, loss = step(state, batch, k)
        j_losses.append(float(loss))

    assert min_lam < 0.95, "attentive boxes never engaged"
    t_sd = {k: v.detach().numpy() for k, v in sd.items()}

    # summed criterion: losses ~bsz x larger — rtol only
    np.testing.assert_allclose(j_losses, t_losses, rtol=3e-4)
    np.testing.assert_allclose(np.asarray(state.head),
                               head.detach().numpy(), rtol=0, atol=3e-5)
    j_sd = params_to_torch_state_dict(
        jax.tree_util.tree_map(np.asarray, jax.device_get(state.model)),
        float(state.logit_scale))
    for k, ref in t_sd.items():
        if k.startswith("visual."):
            np.testing.assert_allclose(j_sd[k], ref, rtol=0, atol=3e-5,
                                       err_msg=k)
