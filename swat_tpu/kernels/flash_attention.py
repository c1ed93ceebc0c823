"""Fused multi-head attention Pallas TPU kernel.

The attention of the CLIP towers runs at short sequence length (50-257
image tokens, 77 text tokens), so a streaming FlashAttention is
unnecessary — the whole S x S score tile fits comfortably in VMEM.  The
win over unfused XLA is keeping scores/probs out of HBM: one kernel per
(batch, head) computes q@k^T -> masked fp32 softmax -> @v entirely
on-chip, with a custom-VJP backward kernel doing the same for gradients.

Shapes are padded to TPU tile boundaries (sublane 8 / lane 128) with key
masking so padded positions contribute nothing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, seq_len):
    q = q_ref[0].astype(jnp.float32)          # [S, D]
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, precision="highest",
                preferred_element_type=jnp.float32) * scale
    sp = q.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = cols < seq_len
    if causal:
        mask = mask & (cols <= rows)
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = p / denom
    o_ref[0] = jnp.dot(p, v, precision="highest",
                     preferred_element_type=jnp.float32).astype(
        o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                scale, causal, seq_len):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    s = jnp.dot(q, k.T, precision="highest",
                preferred_element_type=jnp.float32) * scale
    sp = q.shape[0]
    rows = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = cols < seq_len
    if causal:
        mask = mask & (cols <= rows)
    s = jnp.where(mask, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)   # [S, S]

    dv = jnp.dot(p.T, do, precision="highest", preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, precision="highest", preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    ds = jnp.where(mask, ds, 0.0)
    dq = jnp.dot(ds, k, precision="highest", preferred_element_type=jnp.float32)
    dk = jnp.dot(ds.T, q, precision="highest", preferred_element_type=jnp.float32)
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _specs(n, sp, dp):
    return pl.BlockSpec((1, sp, dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _attention(q, k, v, causal, seq_len, head_dim, interpret):
    return _attention_fwd(q, k, v, causal, seq_len, head_dim, interpret)[0]


def _attention_fwd(q, k, v, causal, seq_len, head_dim, interpret):
    n, sp, dp = q.shape
    scale = 1.0 / (head_dim ** 0.5)
    kern = functools.partial(_fwd_kernel, scale=scale, causal=causal,
                             seq_len=seq_len)
    out = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[_specs(n, sp, dp)] * 3,
        out_specs=_specs(n, sp, dp),
        out_shape=jax.ShapeDtypeStruct((n, sp, dp), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out, (q, k, v)


def _attention_bwd(causal, seq_len, head_dim, interpret, res, do):
    q, k, v = res
    n, sp, dp = q.shape
    scale = 1.0 / (head_dim ** 0.5)
    kern = functools.partial(_bwd_kernel, scale=scale, causal=causal,
                             seq_len=seq_len)
    dq, dk, dv = pl.pallas_call(
        kern,
        grid=(n,),
        in_specs=[_specs(n, sp, dp)] * 4,
        out_specs=(_specs(n, sp, dp),) * 3,
        out_shape=(jax.ShapeDtypeStruct((n, sp, dp), q.dtype),) * 3,
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


_attention.defvjp(_attention_fwd, _attention_bwd)


def flash_attention(q, k, v, *, causal: bool = False,
                    interpret: bool = False) -> jnp.ndarray:
    """Fused attention. q, k, v: [B, H, S, D] -> [B, H, S, D].

    Pads S to a multiple of 8 and D to a multiple of 128 (TPU tiles);
    padded key positions are masked out, padded D lanes are zero and drop
    out of the matmuls."""
    b, h, s, d = q.shape
    sp = max(_round_up(s, 8), 8)
    dp = max(_round_up(d, 128), 128)

    def prep(t):
        t = _pad_to(_pad_to(t, sp, 2), dp, 3)
        return t.reshape(b * h, sp, dp)

    out = _attention(prep(q), prep(k), prep(v), causal, s, d, interpret)
    return out.reshape(b, h, sp, dp)[:, :, :s, :d]
