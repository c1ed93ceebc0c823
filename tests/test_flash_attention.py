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
