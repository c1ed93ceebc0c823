"""Losses vs torch, LR schedule vs torch cosine, AdamW parity vs torch,
and tiny end-to-end train steps (probing improves; finetune freezes the
text tower)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.head import init_head_random
from swat_tpu.train import losses as L
from swat_tpu.train.optim import make_lr_schedule
from swat_tpu.train.state import create_train_state
from swat_tpu.train import steps as S

CFG = get_model_config("test_tiny")


# ---------------------------------------------------------------------------
# losses vs torch

def test_losses_match_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(16, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 16)
    source = rng.integers(0, 2, 16)
    tl = torch.tensor(logits)
    ty = torch.tensor(labels)

    np.testing.assert_allclose(
        float(L.cross_entropy(jnp.asarray(logits), jnp.asarray(labels))),
        float(F.cross_entropy(tl, ty)), rtol=1e-5)

    w = torch.tensor(source, dtype=torch.float32) * 2.5 + (
        1 - torch.tensor(source, dtype=torch.float32))
    ref = (F.cross_entropy(tl, ty, reduction="none") * w).mean()
    ours = L.make_weighted_ce(2.5)(
        jnp.asarray(logits), jnp.asarray(labels), jnp.asarray(source))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    ce = F.cross_entropy(tl, ty, reduction="none").clamp(min=1e-8)
    pt = torch.exp(-ce)
    ref = (1.0 * (1 - pt) ** 2.0 * ce).mean()
    ours = L.make_focal(1.0, 2.0)(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)

    counts = rng.integers(1, 100, 10).tolist()
    prior = torch.log(torch.tensor(counts, dtype=torch.float32)
                      / sum(counts)).unsqueeze(0)
    ref = F.cross_entropy(tl + prior, ty)
    ours = L.make_balanced_softmax(counts)(
        jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(ours), float(ref), rtol=1e-5)


def test_mixup_criterion_lam_vector_sums(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(4, 5)).astype(np.float32)
    y_a = rng.integers(0, 5, 4)
    y_b = rng.integers(0, 5, 4)
    lam = rng.uniform(0, 1, 4).astype(np.float32)
    # reference mixup_criterion_lam_list sums per-sample terms
    ref = sum(
        lam[i] * float(F.cross_entropy(torch.tensor(logits[i:i + 1]),
                                       torch.tensor(y_a[i: i + 1])))
        + (1 - lam[i]) * float(F.cross_entropy(torch.tensor(logits[i:i + 1]),
                                               torch.tensor(y_b[i:i + 1])))
        for i in range(4))
    ours = L.mixup_criterion_lam_vector(
        jnp.asarray(logits), jnp.asarray(y_a), jnp.asarray(y_b),
        jnp.asarray(lam))
    np.testing.assert_allclose(float(ours), ref, rtol=1e-5)


# ---------------------------------------------------------------------------
# schedule semantics (reference utils/optimizers.py:22-35,183-206)

def test_lr_schedule_warmup_and_cosine():
    import torch

    base, total, wl = 1e-4, 500, 1e-6
    sched = make_lr_schedule(base, total, 50, wl)
    assert float(sched(0)) == pytest.approx(wl)
    for i in [1, 10, 49]:
        assert float(sched(i)) == pytest.approx(base * i / 50, rel=1e-6)

    # post-warmup must track torch CosineAnnealingLR stepped s=i-49 times
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=base)
    cos = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, total, eta_min=1e-9)
    torch_lrs = {}
    for s in range(0, 200):
        torch_lrs[s] = opt.param_groups[0]["lr"]
        cos.step()
    for i in [50, 60, 120, 200]:
        assert float(sched(i)) == pytest.approx(
            torch_lrs[i - 49], rel=1e-5), i


def test_adamw_matches_torch(rng):
    """optax AdamW chain == torch.optim.AdamW over several steps."""
    import optax
    import torch

    w0 = rng.normal(size=(7, 3)).astype(np.float32)
    grads = [rng.normal(size=(7, 3)).astype(np.float32) for _ in range(5)]
    lr, wd = 1e-3, 1e-2

    tp = torch.nn.Parameter(torch.tensor(w0.copy()))
    topt = torch.optim.AdamW([tp], lr=lr, betas=(0.9, 0.999), eps=1e-8,
                             weight_decay=wd)
    for g in grads:
        tp.grad = torch.tensor(g)
        topt.step()

    tx = optax.adamw(lr, b1=0.9, b2=0.999, eps=1e-8, weight_decay=wd)
    params = jnp.asarray(w0)
    opt_state = tx.init(params)
    for g in grads:
        updates, opt_state = tx.update(jnp.asarray(g), opt_state, params)
        params = params + updates
    np.testing.assert_allclose(np.asarray(params), tp.detach().numpy(),
                               rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# end-to-end tiny train steps

@pytest.fixture(scope="module")
def tiny_model():
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    return model, params


def test_probing_learns(tiny_model, rng):
    model, params = tiny_model
    num_classes, dim = 4, CFG.embed_dim
    # linearly separable synthetic features
    centers = rng.normal(size=(num_classes, dim)).astype(np.float32) * 3
    labels = rng.integers(0, num_classes, 64)
    feats = centers[labels] + rng.normal(size=(64, dim)).astype(np.float32) * .1
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)

    head = init_head_random(jax.random.PRNGKey(1), num_classes, dim)
    state, tx = create_train_state(
        params, head, "probing", lr_classifier=1e-2, total_iter=100)
    step = S.make_probing_step(model, tx, pre_extracted=True)

    batch = {"features": jnp.asarray(feats), "labels": jnp.asarray(labels),
             "source": jnp.full(64, -1)}
    losses_seen = []
    key = jax.random.PRNGKey(0)
    for i in range(30):
        state, loss = step(state, batch, key)
        losses_seen.append(float(loss))
    assert losses_seen[-1] < losses_seen[0] * 0.5
    # frozen method: model params and logit_scale untouched
    assert float(state.logit_scale) == pytest.approx(np.log(100), abs=1e-6)
    l0 = jax.tree_util.tree_leaves(params)[0]
    l1 = jax.tree_util.tree_leaves(state.model)[0]
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_cutmix_step_trains_visual_freezes_text(tiny_model, rng):
    model, params = tiny_model
    num_classes = 4
    head = init_head_random(jax.random.PRNGKey(1), num_classes, CFG.embed_dim)
    state, tx = create_train_state(
        params, head, "cutmix", lr_classifier=1e-3, lr_backbone=1e-4,
        total_iter=10)
    step = S.make_mixing_step(model, tx, "cutmix", image_size=32)

    canvases = rng.integers(0, 255, (8, 40, 40, 3)).astype(np.uint8)
    batch = {
        "canvases": jnp.asarray(canvases),
        "valid_hw": jnp.full((8, 2), 40, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, num_classes, 8)),
        "source": jnp.asarray(rng.integers(0, 2, 8)),
    }
    # patch n_px: tiny model takes 32x32 images
    import swat_tpu.kernels.augment as aug_mod
    state2, loss = step(state, {**batch}, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))

    # text tower frozen, visual tower updated, logit_scale trainable
    t0 = np.asarray(params["text"]["token_embedding"])
    t1 = np.asarray(state2.model["text"]["token_embedding"])
    np.testing.assert_array_equal(t0, t1)
    v0 = np.asarray(params["visual"]["patch_embed"]["kernel"])
    v1 = np.asarray(state2.model["visual"]["patch_embed"]["kernel"])
    assert np.abs(v0 - v1).max() > 0
    assert float(state2.logit_scale) != pytest.approx(float(np.log(1 / .07)))


def test_flyp_step_runs(tiny_model, rng):
    model, params = tiny_model
    head = init_head_random(jax.random.PRNGKey(1), 4, CFG.embed_dim)
    state, tx = create_train_state(
        params, head, "FLYP", lr_classifier=1e-3, lr_backbone=1e-4,
        total_iter=10)
    step = S.make_flyp_step(model, tx)
    toks = np.zeros((8, CFG.text.context_length), np.int32)
    toks[:, 0] = CFG.text.vocab_size - 2
    toks[:, 2] = CFG.text.vocab_size - 1
    batch = {
        "images": jnp.asarray(
            rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
        "prompt_tokens": jnp.asarray(toks),
        "labels": jnp.asarray(rng.integers(0, 4, 8)),
        "source": jnp.asarray(rng.integers(0, 2, 8)),
    }
    state2, loss = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    # FLYP trains the text tower too
    t0 = np.asarray(params["text"]["token_embedding"])
    t1 = np.asarray(state2.model["text"]["token_embedding"])
    assert np.abs(t0 - t1).max() > 0


def test_train_ckpt_resume_roundtrip(tiny_model, rng, tmp_path):
    """Periodic ckpt saves and restores optimizer state (incl. the
    multi_transform masked states) and the resume helper picks it up."""
    import logging

    from swat_tpu.train.checkpoint import load_train_ckpt, save_train_ckpt
    from swat_tpu.train.trainer import try_resume

    model, params = tiny_model
    head = init_head_random(jax.random.PRNGKey(1), 4, CFG.embed_dim)
    state, tx = create_train_state(
        params, head, "cutmix", lr_classifier=1e-3, lr_backbone=1e-4,
        total_iter=10)
    step = S.make_mixing_step(model, tx, "cutmix", image_size=32)
    batch = {
        "canvases": jnp.asarray(
            rng.integers(0, 255, (4, 40, 40, 3)).astype(np.uint8)),
        "valid_hw": jnp.full((4, 2), 40, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 4, 4)),
        "source": jnp.asarray(rng.integers(0, 2, 4)),
    }
    state, _ = step(state, batch, jax.random.PRNGKey(0))
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    path = save_train_ckpt(str(tmp_path), "ep2_it2", state, {"best_val_acc": 1.0})
    assert path.endswith("ckpt_ep2_it2.msgpack")

    # fresh state restores exactly
    state2, tx2 = create_train_state(
        params, head, "cutmix", lr_classifier=1e-3, lr_backbone=1e-4,
        total_iter=10)
    state3, epoch = try_resume(state2, str(tmp_path),
                               logging.getLogger("t"))
    assert epoch == 2
    assert int(np.asarray(state3.step)) == 2
    np.testing.assert_array_equal(
        np.asarray(state3.head), np.asarray(state.head))
    # optimizer moments restored: one more step from both gives same result
    s_a, l_a = step(state, batch, jax.random.PRNGKey(7))
    s_b, l_b = step(state3, batch, jax.random.PRNGKey(7))
    np.testing.assert_allclose(float(l_a), float(l_b), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(s_a.head), np.asarray(s_b.head), rtol=1e-6)


def test_orbax_ckpt_roundtrip(tiny_model, rng, tmp_path):
    from swat_tpu.train.checkpoint import (
        load_train_ckpt_orbax,
        save_train_ckpt_orbax,
    )

    model, params = tiny_model
    head = init_head_random(jax.random.PRNGKey(1), 4, CFG.embed_dim)
    state, tx = create_train_state(params, head, "probing",
                                   lr_classifier=1e-2, total_iter=10)
    path = save_train_ckpt_orbax(str(tmp_path), 0, state)
    state2, _ = create_train_state(params, head, "probing",
                                   lr_classifier=1e-2, total_iter=10)
    restored = load_train_ckpt_orbax(path, state2)
    np.testing.assert_array_equal(np.asarray(restored.head),
                                  np.asarray(state.head))


def test_load_best_model_three_formats(tmp_path):
    """Reference load_model's 3 checkpoint formats (testing.py:85-117)."""
    from swat_tpu.train.checkpoint import load_best_model, save_bundle

    rng_l = np.random.default_rng(0)
    template = {"visual": {"w": rng_l.normal(size=(4, 4))},
                "text": {"w": rng_l.normal(size=(4, 4))}}
    head_t = rng_l.normal(size=(3, 4))

    # format 2: visual-only (SupCon-style)
    p2 = str(tmp_path / "visual_only.msgpack")
    new_visual = {"w": rng_l.normal(size=(4, 4))}
    save_bundle(p2, {"model": {"visual": new_visual}}, meta={"epoch": 7})
    params, head, ls, meta = load_best_model(p2, template, head_t)
    np.testing.assert_array_equal(params["visual"]["w"], new_visual["w"])
    np.testing.assert_array_equal(params["text"]["w"], template["text"]["w"])
    np.testing.assert_array_equal(head, head_t)
    assert abs(ls - np.log(100.0)) < 1e-6

    # format 3: tau-head only
    p3 = str(tmp_path / "tau_only.msgpack")
    tau_head = rng_l.normal(size=(3, 4))
    save_bundle(p3, {"best_tau_head": {"w": tau_head}})
    params, head, ls, _ = load_best_model(p3, template, head_t)
    np.testing.assert_array_equal(head, tau_head)
    np.testing.assert_array_equal(params["visual"]["w"],
                                  template["visual"]["w"])

    # unknown format errors
    p4 = str(tmp_path / "junk.msgpack")
    save_bundle(p4, {"something": {"x": np.zeros(2)}})
    with pytest.raises(ValueError):
        load_best_model(p4, template, head_t)


def test_auto_memory_policy():
    """L/14 single-chip bsz>=64 with --remat/--accum unset: the CE/mixing
    families get gradient accumulation at a <=32-image microbatch (the
    measured fastest feasible policy, 176.8 img/s vs full remat's 159.2);
    coupled losses (FLYP/fixmatch) get full block remat, the only other
    policy the r4 isolated sweep measured to fit one v5e chip. Everything
    else keeps the user's values untouched."""
    from swat_tpu.train.stages import auto_memory_policy

    L14 = "vitl14_openclip_laion400m"

    # accum for the decomposable methods, sized to microbatch <= 32
    assert auto_memory_policy(L14, False, 1, 64, 1, "cutmix") == (False, 2)
    assert auto_memory_policy(L14, False, 1, 128, 1, "finetune") == (False, 4)
    # finetune-mixed concatenates the twin batch -> encode batch 2*bsz
    assert auto_memory_policy(
        L14, False, 1, 64, 1, "finetune-mixed") == (False, 4)

    # coupled losses fall back to full remat
    assert auto_memory_policy(L14, False, 1, 64, 1, "FLYP") == ("full", 1)
    assert auto_memory_policy(L14, False, 1, 64, 1, "fixmatch") == ("full", 1)

    # explicit user choices win (even a remat policy known to OOM:
    # explicit flags are never second-guessed) ...
    assert auto_memory_policy(L14, "dots", 1, 64, 1, "cutmix") == ("dots", 1)
    assert auto_memory_policy(L14, True, 1, 64, 1, "cutmix") == (True, 1)
    assert auto_memory_policy(L14, False, 2, 64, 1, "cutmix") == (False, 2)
    # ... except an explicit accum whose microbatch still cannot fit,
    # which gets remat on top instead of a guaranteed compile-time OOM
    assert auto_memory_policy(
        L14, False, 2, 256, 1, "cutmix") == ("full", 2)

    # the reference's bsz-32 config fits without either lever
    assert auto_memory_policy(L14, False, 1, 32, 1, "cutmix") == (False, 1)
    # sharded runs split activations over the mesh
    assert auto_memory_policy(L14, False, 1, 64, 8, "cutmix") == (False, 1)
    # smaller towers never need it
    assert auto_memory_policy("vitb16_openclip_laion400m",
                              False, 1, 128, 1, "cutmix") == (False, 1)
    assert auto_memory_policy("vitb32_openclip_laion400m",
                              False, 1, 256, 1, "cutmix") == (False, 1)


# ---------------------------------------------------------------------------
# gradient accumulation (--accum): microbatched encode+loss must match the
# single-pass step — the zero-recompute alternative to remat for L/14
# single-chip training


def _state_for(params, method, num_classes, seed=1):
    # SGD, not AdamW: after ONE Adam step the update is exactly
    # ±lr·sign(ghat), so near-zero grads amplify benign reduction-order
    # rounding into ±2·lr param flips (the same artifact the full-scale
    # torch twin documents for zero-grad params).  SGD's update is linear
    # in g — reduction-order noise stays ~1e-7-relative and the
    # comparison actually tests the decomposition, not Adam's sign
    # sensitivity.
    head = init_head_random(jax.random.PRNGKey(seed), num_classes,
                            CFG.embed_dim)
    return create_train_state(params, head, method, lr_classifier=1e-3,
                              lr_backbone=1e-4, total_iter=10,
                              optim_type="SGD")


def _canvas_batch(rng, n, num_classes):
    return {
        "canvases": jnp.asarray(
            rng.integers(0, 255, (n, 40, 40, 3)).astype(np.uint8)),
        "valid_hw": jnp.full((n, 2), 40, jnp.int32),
        "labels": jnp.asarray(rng.integers(0, num_classes, n)),
        "source": jnp.asarray(rng.integers(0, 2, n)),
    }


@pytest.mark.parametrize("method", ["finetune", "cutmix", "saliencymix"])
def test_accum_matches_single_pass(tiny_model, rng, method):
    """accum=2 == accum=1 to reduction-order rounding, for a mean-reduced
    CE step, the scalar-lam mixing criterion, and the SUM-reduced
    lam-vector criterion (saliencymix)."""
    model, params = tiny_model
    num_classes = 4
    batch = _canvas_batch(rng, 8, num_classes)
    key = jax.random.PRNGKey(3)

    def run(accum):
        state, tx = _state_for(params, "cutmix", num_classes)
        if method == "finetune":
            step = S.make_ce_step(model, tx, L.make_weighted_ce(2.0),
                                  False, 32, accum=accum)
        else:
            step = S.make_mixing_step(model, tx, method, image_size=32,
                                      accum=accum)
        state, loss = step(state, dict(batch), key)
        return float(loss), state

    loss1, s1 = run(1)
    loss2, s2 = run(2)
    assert loss2 == pytest.approx(loss1, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainable),
                    jax.tree_util.tree_leaves(s2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_accum_concat_fs_matches(tiny_model, rng):
    """finetune-mixed: the few-shot twin is concatenated BEFORE the
    microbatch split, so accum divides the combined batch."""
    model, params = tiny_model
    num_classes = 4
    batch = _canvas_batch(rng, 4, num_classes)
    twin = _canvas_batch(rng, 4, num_classes)
    batch.update({k + "_fs": v for k, v in twin.items()})
    key = jax.random.PRNGKey(5)

    def run(accum):
        state, tx = _state_for(params, "cutmix", num_classes)
        step = S.make_ce_step(model, tx, concat_fs=True, image_size=32,
                              accum=accum)
        state, loss = step(state, dict(batch), key)
        return float(loss), state

    loss1, s1 = run(1)
    loss2, s2 = run(2)
    assert loss2 == pytest.approx(loss1, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(s1.trainable),
                    jax.tree_util.tree_leaves(s2.trainable)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_accum_rejects_rn50_and_bad_split(tiny_model, rng):
    """Batch-stat BN is not microbatch-decomposable -> ViT only; a batch
    not divisible by accum is a trace-time error, not silent padding."""
    import dataclasses

    from swat_tpu.models.resnet import ResNetConfig

    rn_cfg = dataclasses.replace(
        get_model_config("rn50_openclip_openai"),
        vision=ResNetConfig(image_size=64, width=16, layers=(1, 1, 1, 1),
                            embed_dim=CFG.embed_dim, heads=2))
    rn_model = CLIPModel(rn_cfg, precision=FP32_PRECISION)
    with pytest.raises(ValueError, match="ViT-only"):
        S.make_ce_step(rn_model, None, image_size=64, accum=2)

    model, params = tiny_model
    state, tx = _state_for(params, "cutmix", 4)
    step = S.make_ce_step(model, tx, image_size=32, accum=3)
    with pytest.raises(ValueError, match="divisible"):
        step(state, _canvas_batch(rng, 8, 4), jax.random.PRNGKey(0))
