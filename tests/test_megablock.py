"""The block-fused layer megakernel (kernels/megablock.py) must compute
exactly the functional towers' math: forward AND backward, image (non-
causal, padded S) and text (causal) towers, fp32 tight / bf16 loose.

The megakernel is the training hot path on TPU (replaces the reference's
``model.encode_image`` call inside ``train_cutmix``, reference
utils/training.py:1474), so any divergence here is a training-correctness
bug, not a perf detail.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swat_tpu.core.precision import DEFAULT_PRECISION, FP32_PRECISION
from swat_tpu.kernels.megablock import pick_block_imgs
from swat_tpu.models import functional as F
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig

CFG = CLIPConfig(
    name="tiny",
    vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=3,
                        heads=4, embed_dim=48, quick_gelu=True),
    text=TextConfig(context_length=12, vocab_size=100, width=64, layers=2,
                    heads=4, embed_dim=48, quick_gelu=True),
)
# exact-gelu variant exercises the erf forward/backward path
CFG_GELU = CLIPConfig(
    name="tiny-gelu",
    vision=VisionConfig(image_size=32, patch_size=16, width=64, layers=2,
                        heads=4, embed_dim=48, quick_gelu=False),
    text=TextConfig(context_length=12, vocab_size=100, width=64, layers=2,
                    heads=4, embed_dim=48, quick_gelu=False),
)

TOLS = {"fp32": dict(rtol=0, atol=2e-6), "bf16": dict(rtol=0, atol=8e-3)}


def _init(model):
    return model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32))["params"]


@pytest.mark.parametrize("precision", [FP32_PRECISION, DEFAULT_PRECISION],
                         ids=["fp32", "bf16"])
@pytest.mark.parametrize("cfg", [CFG, CFG_GELU], ids=["quickgelu", "gelu"])
def test_image_forward_matches_functional(precision, cfg, request):
    model = CLIPModel(cfg, precision=precision)
    params = _init(model)
    images = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3))
    ref = F.vit_encode_image(params["visual"], images, cfg.vision,
                             precision, normalize=True)
    got = F.vit_encode_image(params["visual"], images, cfg.vision,
                             precision, normalize=True, use_mega=True)
    tol = TOLS[request.node.callspec.params["precision"] is FP32_PRECISION
               and "fp32" or "bf16"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)


@pytest.mark.parametrize("precision", [FP32_PRECISION, DEFAULT_PRECISION],
                         ids=["fp32", "bf16"])
def test_text_forward_matches_functional(precision):
    model = CLIPModel(CFG, precision=precision)
    params = _init(model)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (5, 12), 0, 100)
    tokens = tokens.at[:, 7].set(99)
    ref = F.text_encode(params["text"], tokens, CFG.text, precision,
                        normalize=True)
    got = F.text_encode(params["text"], tokens, CFG.text, precision,
                        normalize=True, use_mega=True)
    tol = TOLS["fp32" if precision is FP32_PRECISION else "bf16"]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), **tol)


@pytest.mark.parametrize("cfg", [CFG, CFG_GELU], ids=["quickgelu", "gelu"])
def test_gradients_match_functional(cfg):
    """Custom-VJP backward == autodiff through the functional path
    (fp32 exact): the training-correctness contract."""
    model = CLIPModel(cfg, precision=FP32_PRECISION)
    params = _init(model)
    images = jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 3))
    head = jax.random.normal(jax.random.PRNGKey(4), (7, cfg.embed_dim))
    labels = jnp.asarray([0, 1, 2, 3])

    def loss(p, mega):
        f = F.vit_encode_image(p["visual"], images, cfg.vision,
                               FP32_PRECISION, normalize=True,
                               use_mega=mega)
        logits = f @ head.T
        return -jnp.mean(jax.nn.log_softmax(logits)[jnp.arange(4), labels])

    v1, g1 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-6)

    def items(g):
        return sorted(
            ((jax.tree_util.keystr(k), a) for k, a in
             jax.tree_util.tree_leaves_with_path(g["visual"])),
            key=lambda t: t[0])

    for (k, a), (_, b) in zip(items(g1), items(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=k)


def test_text_gradients_match_functional():
    """Causal-mask backward path (text tower)."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = _init(model)
    tokens = jax.random.randint(jax.random.PRNGKey(2), (5, 12), 0, 100)
    tokens = tokens.at[:, 7].set(99)

    def loss(p, mega):
        f = F.text_encode(p["text"], tokens, CFG.text, FP32_PRECISION,
                          normalize=True, use_mega=mega)
        return jnp.sum(f * jnp.arange(CFG.embed_dim))

    v1, g1 = jax.value_and_grad(lambda p: loss(p, False))(params)
    v2, g2 = jax.value_and_grad(lambda p: loss(p, True))(params)
    np.testing.assert_allclose(float(v1), float(v2), rtol=1e-5)

    def items(g):
        return sorted(
            ((jax.tree_util.keystr(k), a) for k, a in
             jax.tree_util.tree_leaves_with_path(g["text"])),
            key=lambda t: t[0])

    # the sum-of-features loss amplifies grad magnitudes ~50x vs the CE
    # image test, so tolerate fp32 accumulation-order noise relative to
    # each array's own scale (worst observed: 3e-7 of max|grad|)
    for (k, a), (_, b) in zip(items(g1), items(g2)):
        a, b = np.asarray(a), np.asarray(b)
        tol = 1e-5 * max(1.0, float(np.max(np.abs(a))))
        np.testing.assert_allclose(a, b, rtol=0, atol=tol, err_msg=k)


def test_pick_block_imgs():
    assert pick_block_imgs(256, 56) == 8      # 512//56=9 -> divisor 8
    assert pick_block_imgs(256, 200) == 2     # ViT-B/16 shapes
    assert pick_block_imgs(4, 8) == 4
    assert pick_block_imgs(5, 8) == 5         # any divisor works
    assert pick_block_imgs(1, 264) == 1
    for b, sp in [(256, 56), (96, 80), (7, 8)]:
        bi = pick_block_imgs(b, sp)
        assert b % bi == 0 and bi >= 1


def test_block_imgs_one_matches():
    """bi=1 (no cross-image block packing) must give identical results —
    guards the block-diagonal mask logic."""
    model = CLIPModel(CFG, precision=FP32_PRECISION)
    params = _init(model)
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))
    from swat_tpu.kernels.megablock import fused_transformer

    cfgv = CFG.vision
    x = jax.random.normal(jax.random.PRNGKey(5), (3, 5, 64))
    p = params["visual"]["transformer"]
    a = fused_transformer(p, x, heads=cfgv.heads, layers=cfgv.layers,
                          quick_gelu=True, causal=False,
                          compute_dtype=jnp.float32, block_imgs=1)
    b = fused_transformer(p, x, heads=cfgv.heads, layers=cfgv.layers,
                          quick_gelu=True, causal=False,
                          compute_dtype=jnp.float32, block_imgs=3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-6, atol=1e-6)
