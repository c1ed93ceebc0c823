"""Pallas fused attention vs the XLA reference path: forward and gradients,
causal and bidirectional, unaligned S/D (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.kernels.attention import _attention_xla
from swat_tpu.kernels.flash_attention import flash_attention


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("shape", [(2, 3, 50, 64), (1, 2, 77, 64),
                                   (2, 2, 16, 32)])
def test_forward_matches_xla(rng, causal, shape):
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
               for _ in range(3))
    ref = _attention_xla(q, k, v, causal=causal,
                         matmul_precision="highest")
    out = flash_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("causal", [False, True])
def test_gradients_match_xla(rng, causal):
    shape = (1, 2, 20, 32)
    q, k, v = (jnp.asarray(rng.normal(size=shape).astype(np.float32))
               for _ in range(3))

    def loss_ref(q, k, v):
        return jnp.sum(_attention_xla(
            q, k, v, causal=causal, matmul_precision="highest") ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(flash_attention(
            q, k, v, causal=causal, interpret=True) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_pal, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5, err_msg=name)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("s,heads,hd", [(50, 12, 768), (77, 8, 512)])
def test_mha_packed_matches_xla(causal, s, heads, hd, rng):
    """Packed-layout fused MHA == XLA heads-last attention (fwd + grads)."""
    from swat_tpu.kernels.attention import attention_heads_last
    from swat_tpu.kernels.flash_attention import mha_packed

    b = 3
    head_dim = hd // heads
    q = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)

    def ref_fn(q, k, v):
        hl = lambda t: t.reshape(b, s, heads, head_dim)
        out = attention_heads_last(hl(q), hl(k), hl(v), causal=causal)
        return out.reshape(b, s, hd)

    ref = ref_fn(q, k, v)
    got = mha_packed(q, k, v, heads=heads, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    # gradients through the custom VJP
    def loss_ref(args):
        return jnp.sum(jnp.square(ref_fn(*args)))

    def loss_got(args):
        return jnp.sum(jnp.square(mha_packed(
            *args, heads=heads, causal=causal, interpret=True)))

    g_ref = jax.grad(loss_ref)((q, k, v))
    g_got = jax.grad(loss_got)((q, k, v))
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_mha_packed_hybrid_bwd_matches(rng):
    """Hybrid (pallas fwd + XLA autodiff bwd) == pure XLA, fwd and grads."""
    from swat_tpu.kernels.attention import attention_heads_last
    from swat_tpu.kernels.flash_attention import mha_packed

    b, s, heads, hd = 2, 50, 12, 768
    head_dim = hd // heads
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
               for _ in range(3))

    def ref_fn(q, k, v):
        hl = lambda t: t.reshape(b, s, heads, head_dim)
        return attention_heads_last(hl(q), hl(k), hl(v),
                                    causal=False).reshape(b, s, hd)

    got = mha_packed(q, k, v, heads=heads, interpret=True, bwd="xla")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_fn(q, k, v)),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda a: jnp.sum(jnp.square(ref_fn(*a))))((q, k, v))
    g_got = jax.grad(lambda a: jnp.sum(jnp.square(mha_packed(
        *a, heads=heads, interpret=True, bwd="xla"))))((q, k, v))
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_mha_packed_fused_bwd_matches(rng, causal):
    """Fused-backward route (packed fwd + heads-first bwd kernel)."""
    from swat_tpu.kernels.attention import attention_heads_last
    from swat_tpu.kernels.flash_attention import mha_packed

    b, s, heads, hd = 2, 50, 12, 768
    head_dim = hd // heads
    q, k, v = (jnp.asarray(rng.standard_normal((b, s, hd)), jnp.float32)
               for _ in range(3))

    def ref_fn(q, k, v):
        hl = lambda t: t.reshape(b, s, heads, head_dim)
        return attention_heads_last(hl(q), hl(k), hl(v),
                                    causal=causal).reshape(b, s, hd)

    got = mha_packed(q, k, v, heads=heads, causal=causal, interpret=True,
                     bwd="fused")
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref_fn(q, k, v)),
                               rtol=2e-5, atol=2e-5)

    g_ref = jax.grad(lambda a: jnp.sum(jnp.square(ref_fn(*a))))((q, k, v))
    g_got = jax.grad(lambda a: jnp.sum(jnp.square(mha_packed(
        *a, heads=heads, causal=causal, interpret=True,
        bwd="fused"))))((q, k, v))
    for a, b_ in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_pallas_attention_under_mesh_shard_map():
    """Batch-sharded inference keeps the fused kernel: with an inference
    mesh registered, the pallas path runs per-shard under shard_map and
    must match the XLA path (VERDICT r2 weak #6)."""
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swat_tpu.core.mesh import MeshSpec, create_mesh
    from swat_tpu.core.precision import FP32_PRECISION
    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig

    cfg = CLIPConfig(
        name="tiny-mesh",
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=4, embed_dim=48,
                            quick_gelu=True),
        text=TextConfig(context_length=12, vocab_size=100, width=64,
                        layers=2, heads=4, embed_dim=48, quick_gelu=True),
    )
    model = CLIPModel(cfg, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32))["params"]
    images = jax.random.normal(jax.random.PRNGKey(1), (16, 32, 32, 3))

    ref = F.vit_encode_image(params["visual"], images, cfg.vision,
                             FP32_PRECISION, normalize=True)

    mesh = create_mesh(MeshSpec(data=8, model=1))
    F.set_inference_mesh(mesh)
    try:
        sharded = jax.device_put(
            images, NamedSharding(mesh, P("data", None, None, None)))
        with mesh:
            got = jax.jit(lambda p, x: F.vit_encode_image(
                p, x, cfg.vision, FP32_PRECISION, normalize=True,
                use_pallas=True))(params["visual"], sharded)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)
    finally:
        F.set_inference_mesh(None)


def test_pallas_mesh_odd_batch_falls_back_to_xla():
    """With an inference mesh set, batches that don't divide the data
    axis (e.g. prompt encoding of C*templates rows) must silently use the
    XLA path instead of crashing in shard_map (review fix)."""
    import numpy as np

    from swat_tpu.core.mesh import MeshSpec, create_mesh
    from swat_tpu.core.precision import FP32_PRECISION
    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig

    cfg = CLIPConfig(
        name="tiny-odd",
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=1, heads=4, embed_dim=48,
                            quick_gelu=True),
        text=TextConfig(context_length=12, vocab_size=100, width=64,
                        layers=1, heads=4, embed_dim=48, quick_gelu=True),
    )
    model = CLIPModel(cfg, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3), jnp.float32),
        jnp.zeros((1, 12), jnp.int32))["params"]
    images = jax.random.normal(jax.random.PRNGKey(1), (15, 32, 32, 3))
    ref = F.vit_encode_image(params["visual"], images, cfg.vision,
                             FP32_PRECISION, normalize=True)
    mesh = create_mesh(MeshSpec(data=8, model=1))
    F.set_inference_mesh(mesh)
    try:
        got = F.vit_encode_image(params["visual"], images, cfg.vision,
                                 FP32_PRECISION, normalize=True,
                                 use_pallas=True)   # 15 % 8 != 0 -> XLA
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)
    finally:
        F.set_inference_mesh(None)
