"""FULL-SCALE ViT-B/32 training-trajectory twin (VERDICT r3 item 1).

The tiny twins (test_torch_twin_training.py) prove the composed training
dynamics for every reference method, but at 2-layer / width-64 shapes —
they cannot catch real-dimension bugs: the 7x7+1 pos-embed grid, the
32x32x3->768 patch-conv layout, head packing at head_dim 64, LN at width
768.  This test runs the SAME torch-twin protocol at the flagship config
the paper trains (OpenCLIP ViT-B/32: 224^2 images, 12 layers, width 768,
12 heads, embed 512 — reference utils/extras.py:97-114) under the fp32
parity policy: per-step losses, the head, logit_scale, and the
*weight deltas* of every visual-tower parameter must match torch's
autograd+AdamW trajectory (reference train_ce utils/training.py:296-412,
optimizer semantics utils/optimizers.py:22-146).

Deltas, not absolute weights: at lr_backbone=1e-6 the per-step updates
are ~1e-6 — comparing absolute weights would hide real divergence inside
an init-sized tolerance.  CE on straight batches and cutmix on box-mixed
batches (the SWAT stage-1 flagship) are both covered.

Runtime: ~2-4 min on 1 CPU core (bsz 4 x 3 steps x two frameworks, plus
one jit compile) — the largest asset-free step toward the +-0.5%
accuracy-reproduction bar.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import MODEL_REGISTRY
from swat_tpu.models.loader import (
    params_to_torch_state_dict,
    torch_state_dict_to_params,
)
from swat_tpu.train import steps as steps_mod
from swat_tpu.train.state import create_train_state

from test_torch_oracle import (
    make_oracle_sd,
    oracle_encode_image,
    oracle_encode_text,
)

CFG = MODEL_REGISTRY["vitb32_openclip_laion400m"]
V = CFG.vision
B, C = 4, 10
N_STEPS, WARM = 3, 2          # step 0: warmup_lr, 1: ramp, 2: cosine
LR_HEAD, LR_BB, WD = 1e-4, 1e-6, 1e-2
WARMUP_LR, ETA_MIN = 1e-6, 1e-9


def _ref_lr(i: int, base: float) -> float:
    """Reference LinearWarmupScheduler (utils/optimizers.py:31-35,183-206)."""
    if i == 0:
        return WARMUP_LR
    if i < WARM:
        return base * i / WARM
    s = i - (WARM - 1)
    return ETA_MIN + (base - ETA_MIN) * 0.5 * (
        1.0 + math.cos(math.pi * s / N_STEPS))


@pytest.fixture(scope="module")
def fullscale_fixtures():
    sd0 = make_oracle_sd(
        seed=17, w=V.width, layers=V.layers, embed=CFG.embed_dim,
        patch=V.patch_size, img=V.image_size,
        ctx=CFG.text.context_length, vocab=CFG.text.vocab_size,
        text_w=CFG.text.width, text_layers=CFG.text.layers)
    g = torch.Generator().manual_seed(23)
    images = torch.randn(B, V.image_size, V.image_size, 3, generator=g)
    labels = torch.randint(0, C, (B,), generator=g)
    head0 = torch.randn(C, CFG.embed_dim, generator=g) * 0.05
    return sd0, images, labels, head0


def _torch_twin(sd0, batches, head0):
    """batches: list of (images, y_a, y_b, lam) — lam=1, y_a==y_b for CE.
    Returns (losses, final_sd, head, logit_scale, g0) where g0 is the
    FIRST-step gradient per visual tensor — the quantity the tolerance
    model conditions on (see _delta_check)."""
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
    g0 = {}
    for i, (imgs, y_a, y_b, lam) in enumerate(batches):
        for group, base in zip(opt.param_groups, (LR_BB, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        feats = oracle_encode_image(sd, imgs, layers=V.layers,
                                    n_heads=V.heads, patch=V.patch_size)
        logits = logit_scale.exp() * (feats @ head.T)
        loss = (lam * torch.nn.functional.cross_entropy(logits, y_a)
                + (1.0 - lam)
                * torch.nn.functional.cross_entropy(logits, y_b))
        loss.backward()
        if i == 0:
            g0 = {k: v.grad.detach().clone().numpy()
                  for k, v in sd.items() if v.grad is not None}
        opt.step()
        losses.append(loss.item())
    return (losses, {k: v.detach().numpy() for k, v in sd.items()},
            head.detach().numpy(), logit_scale.item(), g0)


def _lr_sum(base: float) -> float:
    return sum(_ref_lr(i, base) for i in range(N_STEPS))


def _delta_check(k, init, ref, got, g0, lr_sum):
    """Delta-protocol comparison for ONE trained tensor; returns 1 if it
    carried a real gradient (moved), 0 otherwise.

    Tolerance model (r5, measured by scripts/diag_g0_dist.py /
    diag_flyp_twin.py): Adam's FIRST step is +-lr * sign(g0) for every
    element regardless of |g0| (m_hat/sqrt(v_hat) = sign at t=0), so an
    element whose first-step gradient is pure cancellation noise takes a
    full warmup_lr step whose SIGN depends on the framework's fp32
    reduction order — a persistent +-lr offset that no backward fix can
    remove.  Measured: every mismatching element across CE/cutmix/FLYP
    full-scale twins has |g0| <= 2.4e-3 x median|g0| of its tensor, and at
    tau = 1e-2 x median|g0| ZERO gradient-carrying elements mismatch.  So:
      * elements with |g0| > tau must ALL satisfy the 2% + 2ULP rule
        (no flat count floor — r4's floor of 2 was the miscalibration
        that made this host-CPU-dependent);
      * noise elements may diverge, but only within the Adam random walk
        (2 x sum of per-step lr) plus the shared tolerance.
    """
    d_ref = ref - init
    d_got = got - init
    if k.endswith("attn.in_proj_bias"):
        # the K-bias third has EXACTLY zero gradient (adding a
        # constant to every key shifts each query's scores
        # uniformly — softmax is shift-invariant), so both
        # frameworks feed Adam pure rounding noise there and the
        # resulting +-lr random walks cannot match.  Bound its
        # magnitude (|delta| <= steps x lr + decay) and compare
        # only the Q/V thirds, which carry real gradients.
        d = init.shape[0] // 3
        bound = N_STEPS * LR_BB * 1.5
        assert np.abs(d_ref[d:2 * d]).max() <= bound, k
        assert np.abs(d_got[d:2 * d]).max() <= bound, k
        sel = np.r_[0:d, 2 * d:3 * d]
        d_ref, d_got, init, g0 = d_ref[sel], d_got[sel], init[sel], g0[sel]
    scale = np.abs(d_ref).max()
    if scale == 0:
        np.testing.assert_array_equal(got, ref, err_msg=k)
        return 0
    # deltas agree to <2% of the largest per-tensor update —
    # plus a 2-ULP floor at the PARAMETER's magnitude: the
    # delta is (final - init) of fp32 weights, so for LN
    # scales near 1.0 (ULP ~1.2e-7) the entire lr=1e-6
    # trajectory spans only ~19 representable values and a
    # 1-ULP rounding difference is 5% of the delta (measured
    # on ln_pre).
    ulp = float(np.spacing(
        np.float32(np.abs(init).max() + np.abs(scale))))
    tol = 2e-2 * scale + 2 * ulp
    diff = np.abs(d_got - d_ref)
    bad = diff > tol
    # median over NONZERO first-step gradients: embedding tables get
    # structurally-exact-zero grads on untouched vocab rows (FLYP touches
    # ~308/49408), and an exact-zero grad means a deterministic
    # decay-only trajectory in BOTH frameworks — those elements stay in
    # the strict class, and must not drag the noise threshold to zero.
    g0_abs = np.abs(g0)
    g0_nz = g0_abs[g0_abs > 0]
    assert g0_nz.size > 0, f"{k}: no first-step gradient anywhere"
    g0_med = float(np.median(g0_nz))
    noise = (g0_abs > 0) & (g0_abs <= 1e-2 * g0_med)
    hard = bad & ~noise
    assert hard.sum() == 0, (
        f"{k}: {hard.sum()}/{hard.size} gradient-carrying delta "
        f"mismatches (max diff {diff[hard].max() if hard.any() else 0:.3e}"
        f" vs tol {tol:.3e}) — genuine backward divergence")
    if bad.any():
        walk = 2.05 * lr_sum + tol
        assert diff[bad].max() <= walk, (
            f"{k}: noise-g0 element diverged {diff[bad].max():.3e} beyond "
            f"the Adam walk bound {walk:.3e}")
    return 1


def _compare(sd0, t, j):
    t_losses, t_sd, t_head, t_ls, g0 = t
    j_losses, j_sd, j_head, j_ls = j
    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(j_ls, t_ls, rtol=0, atol=1e-5)
    np.testing.assert_allclose(j_head, t_head, rtol=0, atol=2e-5)
    moved = 0
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        init = sd0[k].numpy()
        if k.startswith("visual."):
            moved += _delta_check(k, init, ref, j_sd[k], g0[k],
                                  _lr_sum(LR_BB))
        else:
            np.testing.assert_array_equal(j_sd[k], init, err_msg=k)
    # the trajectory genuinely trained: most visual tensors moved
    assert moved > 100, f"only {moved} visual tensors moved"


def _jax_sd(state):
    model_np = jax.tree_util.tree_map(np.asarray, jax.device_get(state.model))
    return params_to_torch_state_dict(model_np, float(state.logit_scale))


def test_fullscale_ce_trajectory_matches_torch(fullscale_fixtures):
    sd0, images, labels, head0 = fullscale_fixtures
    batches = [(images, labels, labels, 1.0)] * N_STEPS
    t = _torch_twin(sd0, batches, head0)
    assert t[0][-1] < t[0][0]          # it actually trains

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=V.layers, text_layers=CFG.text.layers)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "finetune", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_ce_step(model, tx, image_size=V.image_size)
    batch = {"images": jnp.asarray(images.numpy()),
             "labels": jnp.asarray(labels.numpy()),
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        j_losses.append(float(loss))
    _compare(sd0, t, (j_losses, _jax_sd(state),
                      np.asarray(state.head), float(state.logit_scale)))


def test_fullscale_cutmix_trajectory_matches_torch(fullscale_fixtures):
    """The SWAT stage-1 flagship (reference train_cutmix
    utils/training.py:1422-1556) at real shapes: box-mixed 224^2 batches
    through the production make_mixing_step vs the torch twin on the
    exact same mixed pixels."""
    from swat_tpu.kernels import augment as aug

    sd0, images, labels, head0 = fullscale_fixtures
    step_keys = [jax.random.fold_in(jax.random.PRNGKey(29), i)
                 for i in range(N_STEPS)]
    j_images = jnp.asarray(images.numpy())
    j_labels = jnp.asarray(labels.numpy())
    batches = []
    for k in step_keys:
        k_mix = jax.random.split(k, 3)[2]
        mixed, y_a, y_b, lam = aug.cutmix(j_images, j_labels, k_mix,
                                          1.0, 1.0)
        batches.append((torch.from_numpy(np.array(mixed)),
                        torch.from_numpy(np.array(y_a)).long(),
                        torch.from_numpy(np.array(y_b)).long(),
                        float(lam)))
    assert min(b[3] for b in batches) < 0.95     # mixing engaged

    t = _torch_twin(sd0, batches, head0)

    params, ls0 = torch_state_dict_to_params(
        {k: v.clone() for k, v in sd0.items()},
        vision_layers=V.layers, text_layers=CFG.text.layers)
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    state, tx = create_train_state(
        params, head0.numpy(), "cutmix", lr_classifier=LR_HEAD,
        lr_backbone=LR_BB, total_iter=N_STEPS, wd=WD,
        logit_scale=ls0, warmup_iter=WARM)
    step = steps_mod.make_mixing_step(model, tx, "cutmix", mix_prob=1.0,
                                      image_size=V.image_size)
    batch = {"images": j_images, "labels": j_labels,
             "source": jnp.zeros((B,), jnp.int32)}
    j_losses = []
    for k in step_keys:
        state, loss = step(state, batch, k)
        j_losses.append(float(loss))
    _compare(sd0, t, (j_losses, _jax_sd(state),
                      np.asarray(state.head), float(state.logit_scale)))


# ---------------------------------------------------------------------------
# FLYP at full scale: the only method that trains the TEXT tower, which the
# CE/cutmix twins above leave frozen — so the 77-ctx/49408-vocab token
# embedding, text pos-embed, 512-wide LN, and 8-head packing have training
# (not just forward) coverage at real dimensions.  Reference train_flyp
# utils/training.py:415-552; param groups utils/optimizers.py:83-120
# (projectors at lr_projector, logit_scale at lr_classifier, the
# classifier head NOT in the optimizer).

LR_PROJ = 5e-5
T = CFG.text


def _torch_twin_flyp(sd0, images, tokens):
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
    losses = []
    g0 = {}
    for i in range(N_STEPS):
        for group, base in zip(opt.param_groups, (LR_BB, LR_PROJ, LR_HEAD)):
            group["lr"] = _ref_lr(i, base)
        opt.zero_grad()
        img_f = oracle_encode_image(sd, images, layers=V.layers,
                                    n_heads=V.heads, patch=V.patch_size)
        txt_f = oracle_encode_text(sd, tokens, layers=T.layers,
                                   n_heads=T.heads)
        logits = logit_scale.exp() * (img_f @ txt_f.T)
        labels = torch.arange(img_f.shape[0])
        loss = 0.5 * (torch.nn.functional.cross_entropy(logits, labels)
                      + torch.nn.functional.cross_entropy(logits.T, labels))
        loss.backward()
        if i == 0:
            g0 = {k: v.grad.detach().clone().numpy()
                  for k, v in sd.items() if v.grad is not None}
        opt.step()
        losses.append(loss.item())
    return (losses, {k: v.detach().numpy() for k, v in sd.items()},
            logit_scale.item(), g0)


def test_fullscale_flyp_trajectory_matches_torch(fullscale_fixtures):
    sd0, images, _, head0 = fullscale_fixtures
    g = torch.Generator().manual_seed(41)
    tokens = torch.randint(1, T.vocab_size - 1, (B, T.context_length),
                           generator=g)
    tokens[:, -2] = T.vocab_size - 1   # EOT = highest id, fixed position

    t_losses, t_sd, t_ls, g0 = _torch_twin_flyp(sd0, images, tokens)
    assert t_losses[-1] < t_losses[0]          # it actually trains

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
    j_losses = []
    for _ in range(N_STEPS):
        state, loss = step(state, batch, jax.random.PRNGKey(0))
        j_losses.append(float(loss))

    np.testing.assert_allclose(j_losses, t_losses, rtol=5e-4, atol=5e-5)
    np.testing.assert_allclose(float(state.logit_scale), t_ls,
                               rtol=0, atol=1e-5)
    # the head is NOT an optimizer param in FLYP: no phantom decay
    np.testing.assert_array_equal(np.asarray(state.head), head0.numpy())

    j_sd = _jax_sd(state)
    moved = 0
    for k, ref in t_sd.items():
        if k == "logit_scale":
            continue
        base = (LR_PROJ if k in ("visual.proj", "text_projection")
                else LR_BB)
        moved += _delta_check(k, sd0[k].numpy(), ref, j_sd[k], g0[k],
                              _lr_sum(base))
    # BOTH towers trained: ~16 tensors/block x 24 blocks + embeddings
    assert moved > 250, f"only {moved} tensors moved"
    for k in ("visual.proj", "text_projection", "token_embedding.weight",
              "positional_embedding"):
        assert np.abs(t_sd[k] - sd0[k].numpy()).max() > 0, k
