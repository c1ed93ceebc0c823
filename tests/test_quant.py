"""W8A8 int8 inference quantization (models/quant.py + functional._qdot).

The reference has no quantized path (fp32 torch end to end) — this is the
beyond-parity serving lever for the bulk-inference stages.  Contract:
quantized features stay within PTQ-typical distance of the fp32 features
(cosine), the int8 math matches a numpy oracle exactly, and the quantized
tree drops into the existing inference entry points unchanged.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models import functional as F
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.quant import is_quantized, quantize_tree, quantize_weight

CFG = get_model_config("test_tiny")


@pytest.fixture(scope="module")
def model_and_params():
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, CFG.text.context_length), jnp.int32))["params"]
    return model, params


def test_quantize_weight_roundtrip():
    r = np.random.default_rng(0)
    w = r.normal(size=(16, 8)).astype(np.float32)
    w_q, scale = quantize_weight(w)
    assert w_q.dtype == np.int8 and scale.shape == (8,)
    # per-channel max maps to +-127 exactly; everything within half a bin
    np.testing.assert_allclose(w_q * scale, w, atol=np.max(scale) / 2 + 1e-7)
    assert np.max(np.abs(w_q)) == 127


def test_quantize_weight_stacked_layers():
    """Stacked block leaves [L, in, out] get per-(layer, channel) scales."""
    r = np.random.default_rng(1)
    w = r.normal(size=(3, 16, 8)).astype(np.float32)
    w[1] *= 100.0  # one layer with a wildly different range
    w_q, scale = quantize_weight(w)
    # scale must be per (layer, channel): layer 1's 100x range would
    # otherwise crush layers 0/2 into ~1 bit of resolution
    assert scale.shape == (3, 8)
    for i in range(3):
        np.testing.assert_allclose(
            w_q[i] * scale[i], w[i],
            atol=np.max(scale[i]) / 2 + 1e-6)


def test_qdot_matches_numpy_oracle():
    r = np.random.default_rng(2)
    x = r.normal(size=(4, 5, 16)).astype(np.float32)
    w = r.normal(size=(16, 8)).astype(np.float32)
    w_q, scale = quantize_weight(w)
    q = {"kernel_q": jnp.asarray(w_q), "scale": jnp.asarray(scale)}
    got = np.asarray(F._qdot(jnp.asarray(x), q, FP32_PRECISION,
                             out_dtype=jnp.float32))

    s = np.maximum(np.max(np.abs(x), axis=-1, keepdims=True), 1e-8) / 127.0
    xq = np.clip(np.rint(x / s), -127, 127).astype(np.int8)
    want = (xq.astype(np.int32) @ w_q.astype(np.int32)).astype(np.float32)
    want = want * (s * scale)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def _cosine(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return float(np.mean(np.sum(a * b, -1)
                         / (np.linalg.norm(a, axis=-1)
                            * np.linalg.norm(b, axis=-1))))


def test_quantized_image_features_close(model_and_params, rng):
    model, params = model_and_params
    qparams = quantize_tree(params)
    assert is_quantized(qparams) and not is_quantized(params)
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    ref = F.encode_image(model, params, images, normalize=True,
                         mode="infer")
    got = F.encode_image(model, qparams, images, normalize=True,
                         mode="infer")
    assert _cosine(ref, got) > 0.995


def test_quantized_text_features_close(model_and_params, rng):
    model, params = model_and_params
    qparams = quantize_tree(params)
    toks = np.zeros((6, CFG.text.context_length), np.int32)
    toks[:, 0] = 1
    toks[:, 1:5] = rng.integers(2, CFG.text.vocab_size - 1, (6, 4))
    toks[:, 5] = CFG.text.vocab_size - 1  # eot = argmax
    ref = F.encode_text(model, params, jnp.asarray(toks), normalize=True,
                        mode="infer")
    got = F.encode_text(model, qparams, jnp.asarray(toks), normalize=True,
                        mode="infer")
    assert _cosine(ref, got) > 0.99


def test_quantized_tree_drops_into_evaluator(model_and_params, rng):
    """The eval entry point works on a quantized tree unchanged, and
    predictions overwhelmingly agree with fp32."""
    from swat_tpu.eval.validate import Evaluator
    from swat_tpu.models.head import init_head_random

    model, params = model_and_params
    qparams = quantize_tree(params)
    head = np.asarray(init_head_random(jax.random.PRNGKey(1), 3,
                                       CFG.embed_dim))
    batches = [{
        "images": rng.normal(size=(16, 32, 32, 3)).astype(np.float32),
        "labels": rng.integers(0, 3, 16).astype(np.int32),
        "source": rng.integers(0, 2, 16).astype(np.int32),
        "mask": np.ones(16, bool),
    } for _ in range(2)]
    ev = Evaluator(model, num_classes=3)
    acc_ref, _, _ = ev.validate(params, head, np.log(100.0), batches)
    acc_q, _, _ = ev.validate(qparams, head, np.log(100.0), batches)
    assert abs(acc_ref - acc_q) <= 100 / 16  # at most a few flips


def test_quantized_dp_sharded_matches_single_device(model_and_params, rng):
    """int8 dot_general partitions under GSPMD like any dot: a dp=8
    mesh-sharded quantized eval must equal the single-device one."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swat_tpu.core.mesh import MeshSpec, create_mesh
    from swat_tpu.eval.validate import Evaluator
    from swat_tpu.models.head import init_head_random

    model, params = model_and_params
    qparams = quantize_tree(params)
    head = np.asarray(init_head_random(jax.random.PRNGKey(1), 3,
                                       CFG.embed_dim))

    def batches():
        r = np.random.default_rng(5)
        return [{
            "images": r.normal(size=(16, 32, 32, 3)).astype(np.float32),
            "labels": r.integers(0, 3, 16).astype(np.int32),
            "source": r.integers(0, 2, 16).astype(np.int32),
            "mask": np.ones(16, bool),
        } for _ in range(2)]

    ev1 = Evaluator(model, num_classes=3)
    acc1, loss1, _ = ev1.validate(qparams, head, np.log(100.0), batches(),
                                  return_confusion=True)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    ev8 = Evaluator(model, num_classes=3, mesh=mesh)
    q8 = jax.device_put(qparams, NamedSharding(mesh, P()))
    acc8, loss8, _ = ev8.validate(q8, head, np.log(100.0), batches(),
                                  return_confusion=True)
    assert acc1 == pytest.approx(acc8, abs=1e-9)
    assert loss1 == pytest.approx(loss8, rel=1e-5)


def test_training_on_quantized_tree_rejected(model_and_params):
    """Gradients through the int8 rounding are zero — create_train_state
    must refuse a quantized tree outright."""
    from swat_tpu.models.head import init_head_random
    from swat_tpu.train.state import create_train_state

    _, params = model_and_params
    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)
    with pytest.raises(ValueError, match="int8"):
        create_train_state(quantize_tree(params), head, "finetune",
                           lr_classifier=1e-3, lr_backbone=1e-4,
                           total_iter=10)


def test_convert_cli_int8_bundle(tmp_path, rng):
    """`convert --quantize int8` writes a W8A8 serving bundle: ~4x smaller
    than the fp32 bundle, loads through the standard loader, features stay
    close to fp32, and training warm-start from it is refused."""
    import os

    import torch
    from test_models import _random_torch_sd

    from swat_tpu.cli.convert import convert
    from swat_tpu.models.head import init_head_random
    from swat_tpu.models.loader import load_torch_checkpoint
    from swat_tpu.train.state import create_train_state

    sd_np = _random_torch_sd(np.random.default_rng(9), CFG)
    src = str(tmp_path / "tiny.pt")
    torch.save({k: torch.from_numpy(np.asarray(v, np.float32))
                for k, v in sd_np.items()}, src)

    fp32_out = str(tmp_path / "tiny.msgpack")
    int8_out = str(tmp_path / "tiny_int8.msgpack")
    convert(src, "test_tiny", fp32_out, verify=True)
    report = convert(src, "test_tiny", int8_out, verify=True,
                     quantize="int8")
    assert report["quantize"] == "int8"
    # dense kernels dominate the tree -> the bundle shrinks close to 4x
    ratio = os.path.getsize(fp32_out) / os.path.getsize(int8_out)
    assert ratio > 2.5, ratio

    params, ls = load_torch_checkpoint(fp32_out, CFG.vision.layers,
                                       CFG.text.layers)
    qparams, qls = load_torch_checkpoint(int8_out, CFG.vision.layers,
                                         CFG.text.layers)
    assert is_quantized(qparams) and abs(ls - qls) < 1e-7
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    ref = F.encode_image(model, params, images, normalize=True, mode="infer")
    got = F.encode_image(model, qparams, images, normalize=True,
                         mode="infer")
    assert _cosine(ref, got) > 0.995

    head = init_head_random(jax.random.PRNGKey(1), 3, CFG.embed_dim)
    with pytest.raises(ValueError, match="int8"):
        create_train_state(qparams, head, "finetune", lr_classifier=1e-3,
                           lr_backbone=1e-4, total_iter=10)


def test_rn50_tree_rejected():
    cfg = get_model_config("rn50_clip")
    model = CLIPModel(cfg, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    with pytest.raises(ValueError):
        quantize_tree(params)
