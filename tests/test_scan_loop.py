"""Resident-data scan execution: the one-dispatch-per-epoch path must agree
with the streaming path (same math, same learning behavior) and ResidentEval
must match the streaming Evaluator exactly."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.data.pipeline import EvalLoader
from swat_tpu.data.splits import Sample
from swat_tpu.eval.validate import Evaluator
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.head import init_head_random
from swat_tpu.train.scan_loop import (
    ResidentData,
    ResidentEval,
    epoch_permutation,
    make_scan_epoch,
    make_scan_eval,
)
from swat_tpu.train.state import create_train_state

CFG = get_model_config("test_tiny")


@pytest.fixture(scope="module")
def samples(tmp_path_factory):
    rng = np.random.default_rng(0)
    root = tmp_path_factory.mktemp("imgs")
    colors = np.asarray([[220, 40, 40], [40, 220, 40], [40, 40, 220]])
    out = []
    for i in range(24):
        label = i % 3
        arr = (colors[label] + rng.integers(-25, 25, (36, 44, 3))
               ).clip(0, 255).astype(np.uint8)
        p = str(root / f"{i}.jpg")
        Image.fromarray(arr).save(p)
        out.append(Sample(p, label, i % 2))
    return out


def test_resident_data_shapes(samples):
    data = ResidentData.from_samples(samples, canvas=48, num_workers=4)
    assert data.canvases.shape == (24, 48, 48, 3)
    assert data.canvases.dtype == jnp.uint8
    assert data.n == 24
    perm = epoch_permutation(np.random.default_rng(0), 24, 8)
    assert perm.shape == (3, 8)
    assert len(set(perm.ravel().tolist())) == 24


def test_scan_epoch_learns(samples):
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)
    state, tx = create_train_state(params, head, "cutmix",
                                   lr_classifier=1e-2, lr_backbone=1e-3,
                                   total_iter=30)
    run = make_scan_epoch(model, tx, "cutmix", image_size=32)
    data = ResidentData.from_samples(samples, canvas=48, num_workers=4)
    rng = np.random.default_rng(0)
    losses = []
    key = jax.random.PRNGKey(0)
    for epoch in range(6):
        key, sub = jax.random.split(key)
        perm = epoch_permutation(rng, data.n, 8)
        state, loss = run(state, data, perm, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_resident_eval_matches_streaming(samples):
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    ev = ResidentEval.from_samples(samples, 3, n_px=32, batch_size=8,
                                   num_workers=4)
    scan_eval = make_scan_eval(model, 3, batch_size=8)
    acc_r, loss_r, cm_r = scan_eval(params, head, np.log(100.0), ev)

    evaluator = Evaluator(model, 3)
    loader = EvalLoader(samples, batch_size=8, n_px=32, num_workers=4)
    acc_s, loss_s, cm_s = evaluator.validate(
        params, head, np.log(100.0), loader, return_confusion=True)

    assert acc_r == pytest.approx(acc_s, abs=1e-4)
    assert loss_r == pytest.approx(loss_s, rel=1e-4)
    np.testing.assert_array_equal(cm_r, cm_s)


def test_scan_epoch_rn50_updates_bn_stats(samples):
    """Resident scan mode must run RN50 batch-stat BN like the streaming
    steps do (review fix): running statistics move after an epoch."""
    from swat_tpu.models.configs import CLIPConfig, TextConfig
    from swat_tpu.models.resnet import ResNetConfig

    tiny = CLIPConfig(
        name="rn-tiny-scan",
        vision=ResNetConfig(image_size=32, width=16, layers=(1, 1, 1, 1),
                            embed_dim=32, heads=4),
        text=TextConfig(context_length=12, vocab_size=64, width=32,
                        layers=1, heads=4, embed_dim=32, quick_gelu=True),
    )
    model = CLIPModel(tiny, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, 32)
    state, tx = create_train_state(params, head, "cutmix",
                                   lr_classifier=1e-2, lr_backbone=1e-3,
                                   total_iter=10)
    run = make_scan_epoch(model, tx, "cutmix", image_size=32)
    data = ResidentData.from_samples(samples, canvas=48, num_workers=4)
    rng = np.random.default_rng(0)
    perm = epoch_permutation(rng, data.n, 8)
    before = np.asarray(state.model["visual"]["bn1"]["mean"])
    state, loss = run(state, data, perm, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss))
    after = np.asarray(state.model["visual"]["bn1"]["mean"])
    assert not np.allclose(before, after)


def test_scan_epoch_bf16_aug_learns(samples):
    """The bf16-policy scan path (aug_dtype=bfloat16, the production
    configuration under --compute_dtype bfloat16) trains: finite,
    decreasing loss on the color-separable set."""
    model = CLIPModel(CFG)  # default bf16 compute policy
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)
    state, tx = create_train_state(params, head, "cutmix",
                                   lr_classifier=1e-2, lr_backbone=1e-3,
                                   total_iter=30)
    run = make_scan_epoch(model, tx, "cutmix", image_size=32,
                          aug_dtype=jnp.bfloat16)
    data = ResidentData.from_samples(samples, canvas=48, num_workers=4)
    rng = np.random.default_rng(0)
    losses = []
    key = jax.random.PRNGKey(0)
    for epoch in range(6):
        key, sub = jax.random.split(key)
        perm = epoch_permutation(rng, data.n, 8)
        state, loss = run(state, data, perm, sub)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


@pytest.mark.parametrize("method", ["finetune", "cutmix", "mixup",
                                    "resizemix", "saliencymix"])
def test_scan_epoch_matches_streaming_steps(samples, method):
    """Trajectory equivalence (VERDICT r4 item 3): a scan epoch over
    resident batches must equal the SAME batches driven through the
    streaming step factories with the same per-step keys — the per-step
    body is shared (steps.make_mix_fn/make_encode_loss), so this pins
    that the lax.scan wrapper (gather, key split, carry) adds nothing.
    Final trainable tree compared leaf-exact to fp32 rounding."""
    from swat_tpu.train import steps as S

    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    data = ResidentData.from_samples(samples, canvas=40, num_workers=4)
    perm = epoch_permutation(np.random.default_rng(3), data.n, 8)
    key = jax.random.PRNGKey(7)

    def mk_state():
        return create_train_state(params, head, method
                                  if method != "finetune" else "finetune",
                                  lr_classifier=1e-3, lr_backbone=1e-4,
                                  total_iter=perm.shape[0])

    # scan path: one dispatch
    state_a, tx_a = mk_state()
    epoch = make_scan_epoch(model, tx_a, method, image_size=32,
                            mix_prob=1.0)
    state_a, loss_a = epoch(state_a, data, perm, key)

    # streaming path: same batches (host gather), same per-step keys
    state_b, tx_b = mk_state()
    if method == "finetune":
        step = S.make_ce_step(model, tx_b, image_size=32)
    else:
        step = S.make_mixing_step(model, tx_b, method, mix_prob=1.0,
                                  image_size=32)
    canv = np.asarray(data.canvases)
    hw = np.asarray(data.valid_hw)
    lab = np.asarray(data.labels)
    src = np.asarray(data.source)
    keys = jax.random.split(key, perm.shape[0])
    losses_b = []
    for i, idx in enumerate(perm):
        batch = {"canvases": jnp.asarray(canv[idx]),
                 "valid_hw": jnp.asarray(hw[idx]),
                 "labels": jnp.asarray(lab[idx]),
                 "source": jnp.asarray(src[idx])}
        state_b, l = step(state_b, batch, keys[i])
        losses_b.append(float(l))

    np.testing.assert_allclose(float(loss_a), np.mean(losses_b),
                               rtol=1e-6, atol=1e-7)
    flat_a = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_a.trainable))[0]
    flat_b = jax.tree_util.tree_leaves(jax.device_get(state_b.trainable))
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))


def test_twin_scan_epoch_matches_streaming_steps(samples):
    """Same equivalence for the TWIN-loader family (cutmix-fs here): the
    scan's second resident dataset + twin permutation must reproduce the
    streaming concat-fs step fed the same *_fs sub-batches."""
    from swat_tpu.train import steps as S

    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)

    data = ResidentData.from_samples(samples[:16], canvas=40, num_workers=4)
    twin = ResidentData.from_samples(samples[16:], canvas=40, num_workers=4)
    rng = np.random.default_rng(5)
    perm = epoch_permutation(rng, data.n, 8)
    tperm = rng.integers(0, twin.n, perm.shape).astype(np.int32)
    key = jax.random.PRNGKey(9)

    def mk_state():
        return create_train_state(params, head, "cutmix",
                                  lr_classifier=1e-3, lr_backbone=1e-4,
                                  total_iter=perm.shape[0])

    state_a, tx_a = mk_state()
    epoch = make_scan_epoch(model, tx_a, "cutmix-fs", image_size=32,
                            mix_prob=1.0)
    state_a, loss_a = epoch(state_a, data, perm, key, twin, tperm)

    state_b, tx_b = mk_state()
    step = S.make_mixing_step(model, tx_b, "cutmix-fs", mix_prob=1.0,
                              image_size=32)
    arr = lambda d: tuple(np.asarray(a) for a in
                          (d.canvases, d.valid_hw, d.labels, d.source))
    (c, h, l, s), (tc, th, tl, ts) = arr(data), arr(twin)
    keys = jax.random.split(key, perm.shape[0])
    losses_b = []
    for i, (idx, tidx) in enumerate(zip(perm, tperm)):
        batch = {"canvases": jnp.asarray(c[idx]),
                 "valid_hw": jnp.asarray(h[idx]),
                 "labels": jnp.asarray(l[idx]),
                 "source": jnp.asarray(s[idx]),
                 "canvases_fs": jnp.asarray(tc[tidx]),
                 "valid_hw_fs": jnp.asarray(th[tidx]),
                 "labels_fs": jnp.asarray(tl[tidx]),
                 "source_fs": jnp.asarray(ts[tidx])}
        state_b, lval = step(state_b, batch, keys[i])
        losses_b.append(float(lval))

    np.testing.assert_allclose(float(loss_a), np.mean(losses_b),
                               rtol=1e-6, atol=1e-7)
    flat_a = jax.tree_util.tree_flatten_with_path(
        jax.device_get(state_a.trainable))[0]
    flat_b = jax.tree_util.tree_leaves(jax.device_get(state_b.trainable))
    for (path, la), lb in zip(flat_a, flat_b):
        np.testing.assert_allclose(
            np.asarray(la), np.asarray(lb), rtol=1e-6, atol=1e-7,
            err_msg=jax.tree_util.keystr(path))
