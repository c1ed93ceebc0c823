"""Multi-head attention compute path.

This is the hot op of the finetune loop (the reference spends its FLOPs in
``model.encode_image`` inside ``train_cutmix``, reference
utils/training.py:1474).  Two implementations behind one signature:

* ``_attention_xla`` — einsum + fp32 softmax; XLA already fuses this well and
  it is the correctness reference (and the CPU-test path).
* ``_attention_pallas`` — fused Pallas TPU kernel (FlashAttention-style
  streaming softmax) for long-sequence / large-batch cases where keeping the
  B·H·S·S score matrix out of HBM matters.

Sequence lengths here are short (50–257 image patches, 77 text tokens), so the
XLA path is the default; the Pallas path is opt-in via ``use_pallas=True`` and
is exercised by the benchmark harness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _attention_xla(q, k, v, *, causal: bool, accum_dtype=jnp.float32,
                   matmul_precision="default"):
    """q,k,v: [B, H, S, D] in compute dtype. Returns [B, H, S, D]."""
    dim = q.shape[-1]
    scale = 1.0 / (dim ** 0.5)
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, precision=matmul_precision,
        preferred_element_type=accum_dtype)
    scores = scores.astype(jnp.float32) * scale
    if causal:
        s = q.shape[-2]
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum(
        "bhqk,bhkd->bhqd", probs, v, precision=matmul_precision,
        preferred_element_type=accum_dtype)
    return out.astype(q.dtype)


def attention_heads_last(q, k, v, *, causal: bool,
                         accum_dtype=jnp.float32,
                         matmul_precision="default",
                         softmax_dtype=jnp.float32):
    """Transpose-free layout: q,k,v [B, S, H, D] -> out [B, S, H, D].
    The head axis stays in place; XLA contracts directly without the
    explicit [B,H,S,D] relayouts.

    softmax_dtype: storage dtype of the score tensor through the softmax.
    bf16 halves the dominant HBM traffic of this op (the [B,H,S,S] scores)
    at ~1e-3 relative probability error over these short sequences; fp32
    is the reference-parity setting."""
    dim = q.shape[-1]
    scale = 1.0 / (dim ** 0.5)
    # fp32 MXU accumulation; the cast to the storage dtype fuses into the
    # matmul epilogue so only softmax_dtype bytes ever hit HBM
    scores = jnp.einsum(
        "bqhd,bkhd->bhqk", q, k, precision=matmul_precision,
        preferred_element_type=accum_dtype)
    scores = scores.astype(softmax_dtype) * jnp.asarray(
        scale, softmax_dtype)
    if causal:
        s = q.shape[1]
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask, scores,
                           jnp.asarray(-3e38, softmax_dtype))
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    probs = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", probs, v, precision=matmul_precision,
        preferred_element_type=accum_dtype)
    return out.astype(q.dtype)


def multi_head_attention(q, k, v, *, causal: bool = False,
                         use_pallas: bool = False,
                         accum_dtype=jnp.float32,
                         matmul_precision="default"):
    """Dispatch to the fused Pallas kernel on TPU or the XLA reference path.

    q, k, v: [B, H, S, D]
    """
    if use_pallas:
        from swat_tpu.kernels.flash_attention import flash_attention

        interpret = jax.default_backend() != "tpu"
        return flash_attention(q, k, v, causal=causal, interpret=interpret)
    return _attention_xla(q, k, v, causal=causal, accum_dtype=accum_dtype,
                          matmul_precision=matmul_precision)
