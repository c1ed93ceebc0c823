"""Precision policy.

The reference forces fp32 everywhere (`model.float()`,
reference utils/extras.py:163).  On TPU the MXU wants bf16 inputs with fp32
accumulation; parameters and optimizer state stay fp32.  ``Precision``
captures that split so every module computes in ``compute_dtype`` while
LayerNorm / softmax / losses run in fp32.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # dot_general accumulation type fed to preferred_element_type
    accum_dtype: jnp.dtype = jnp.float32
    # lax matmul precision: with bf16 inputs this is moot; with fp32 inputs
    # JAX's *default* rounds operands through bf16 passes, so the fp32
    # policy must request 'highest' explicitly for exact fp32 matmuls.
    matmul_precision: str = "default"
    # LayerNorm variance: one-pass E[x^2]-E[x]^2 (fast, fp32-accumulated)
    # for the throughput policy; exact two-pass for the fp32 parity policy.
    ln_fast_variance: bool = True
    # attention softmax storage dtype: bf16 halves the score-tensor HBM
    # traffic (measured 72.0 -> 67.9 ms/step on the ViT-B/32 cutmix step);
    # the fp32 parity policy keeps fp32 softmax.
    softmax_dtype: jnp.dtype = jnp.bfloat16

    def cast(self, x):
        return x.astype(self.compute_dtype)


DEFAULT_PRECISION = Precision()
FP32_PRECISION = Precision(compute_dtype=jnp.float32,
                           matmul_precision="highest",
                           ln_fast_variance=False,
                           softmax_dtype=jnp.float32)
