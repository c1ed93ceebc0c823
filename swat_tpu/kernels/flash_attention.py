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
                scale, causal, seq_len, keep_dtype=False):
    """keep_dtype=True feeds the MXU the input dtype (bf16 operands,
    fp32 accumulation) instead of fp32-highest — the training-speed
    configuration; softmax statistics stay fp32 either way."""
    if keep_dtype:
        q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
        hp = None
    else:
        q = q_ref[0].astype(jnp.float32)
        k = k_ref[0].astype(jnp.float32)
        v = v_ref[0].astype(jnp.float32)
        do = do_ref[0].astype(jnp.float32)
        hp = "highest"
    s = jnp.dot(q, k.T, precision=hp,
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

    pb = p.astype(q.dtype)
    dv = jnp.dot(pb.T, do, precision=hp, preferred_element_type=jnp.float32)
    dp = jnp.dot(do, v.T, precision=hp, preferred_element_type=jnp.float32)
    delta = jnp.sum(p * dp, axis=-1, keepdims=True)
    ds = p * (dp - delta) * scale
    ds = jnp.where(mask, ds, 0.0).astype(q.dtype)
    dq = jnp.dot(ds, k, precision=hp, preferred_element_type=jnp.float32)
    dk = jnp.dot(ds.T, q, precision=hp, preferred_element_type=jnp.float32)
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


# ---------------------------------------------------------------------------
# packed-layout fused MHA: q,k,v in the NATURAL [B, S, H*D] layout
#
# Profiled on v5e (scripts/ablate_functional.py): the XLA attention path
# costs ~27 ms of a 72 ms ViT-B/32 train step — ~1.3% MFU — because the
# per-head [50,50] matmuls force head transposes and HBM round trips of
# fp32 score tensors.  This kernel takes the qkv Dense output as-is
# (one lane-slice per head, no relayout anywhere), keeps scores/softmax in
# VMEM in fp32, and feeds the MXU bf16 operands with fp32 accumulation.
# One grid cell = one batch element = all heads.


def _mha_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, causal, seq_len,
                    heads, head_dim):
    sp = q_ref.shape[1]
    # fp32 operands need precision='highest' on this stack (the default
    # rounds fp32 matmuls through bf16 passes); bf16 operands accumulate
    # fp32 via preferred_element_type either way
    hp = "highest" if q_ref.dtype == jnp.float32 else None
    rows = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = cols < seq_len
    if causal:
        mask = mask & (cols <= rows)
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        s = jnp.dot(qh, kh.T, precision=hp,
                    preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = jnp.dot(p.astype(qh.dtype), vh, precision=hp,
                    preferred_element_type=jnp.float32)
        o_ref[0, :, sl] = o.astype(o_ref.dtype)


def _mha_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                    scale, causal, seq_len, heads, head_dim):
    sp = q_ref.shape[1]
    hp = "highest" if q_ref.dtype == jnp.float32 else None
    rows = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
    mask = cols < seq_len
    if causal:
        mask = mask & (cols <= rows)
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        qh = q_ref[0, :, sl]
        kh = k_ref[0, :, sl]
        vh = v_ref[0, :, sl]
        do = do_ref[0, :, sl]
        s = jnp.dot(qh, kh.T, precision=hp,
                    preferred_element_type=jnp.float32) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)       # [S, S] fp32

        pb = p.astype(qh.dtype)
        dv = jnp.dot(pb.T, do, precision=hp,
                     preferred_element_type=jnp.float32)
        dp = jnp.dot(do, vh.T, precision=hp,
                     preferred_element_type=jnp.float32)
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        ds = jnp.where(mask, ds, 0.0).astype(qh.dtype)
        dq = jnp.dot(ds, kh, precision=hp,
                     preferred_element_type=jnp.float32)
        dk = jnp.dot(ds.T, qh, precision=hp,
                     preferred_element_type=jnp.float32)
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


def _mha_specs(sp, hd):
    return pl.BlockSpec((1, sp, hd), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _mha(q, k, v, causal, seq_len, heads, head_dim, interpret):
    return _mha_fwd(q, k, v, causal, seq_len, heads, head_dim,
                    interpret)[0]


def _mha_fwd(q, k, v, causal, seq_len, heads, head_dim, interpret):
    b, sp, hd = q.shape
    kern = functools.partial(
        _mha_fwd_kernel, scale=1.0 / (head_dim ** 0.5), causal=causal,
        seq_len=seq_len, heads=heads, head_dim=head_dim)
    out = pl.pallas_call(
        kern, grid=(b,), in_specs=[_mha_specs(sp, hd)] * 3,
        out_specs=_mha_specs(sp, hd),
        out_shape=jax.ShapeDtypeStruct((b, sp, hd), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return out, (q, k, v)


def _mha_bwd(causal, seq_len, heads, head_dim, interpret, res, do):
    q, k, v = res
    b, sp, hd = q.shape
    kern = functools.partial(
        _mha_bwd_kernel, scale=1.0 / (head_dim ** 0.5), causal=causal,
        seq_len=seq_len, heads=heads, head_dim=head_dim)
    dq, dk, dv = pl.pallas_call(
        kern, grid=(b,), in_specs=[_mha_specs(sp, hd)] * 4,
        out_specs=(_mha_specs(sp, hd),) * 3,
        out_shape=(jax.ShapeDtypeStruct((b, sp, hd), q.dtype),) * 3,
        interpret=interpret,
    )(q, k, v, do)
    return dq, dk, dv


_mha.defvjp(_mha_fwd, _mha_bwd)


def _xla_packed_attention(q, k, v, heads, causal):
    """Reference XLA path over packed [B, S, H*D] operands (used as the
    autodiff backward of the hybrid kernel below)."""
    b, s, hd = q.shape
    d = hd // heads
    scale = 1.0 / (d ** 0.5)
    qh = q.reshape(b, s, heads, d)
    kh = k.reshape(b, s, heads, d)
    vh = v.reshape(b, s, heads, d)
    hp = "highest" if q.dtype == jnp.float32 else None
    scores = jnp.einsum("bqhd,bkhd->bhqk", qh, kh, precision=hp,
                        preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    if causal:
        mask = jnp.tril(jnp.ones((s, s), dtype=bool))
        scores = jnp.where(mask, scores, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, vh, precision=hp,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, s, hd)


def _to_heads_first(t, heads, sp, dp):
    """[B, S, H*D] -> [B*H, Sp, Dp] (padded)."""
    b, s, hd = t.shape
    d = hd // heads
    t = t.reshape(b, s, heads, d).transpose(0, 2, 1, 3)
    t = _pad_to(_pad_to(t, sp, 2), dp, 3)
    return t.reshape(b * heads, sp, dp)


def _from_heads_first(t, b, heads, s, d):
    """[B*H, Sp, Dp] -> [B, S, H*D]."""
    sp, dp = t.shape[1], t.shape[2]
    t = t.reshape(b, heads, sp, dp)[:, :, :s, :d]
    return t.transpose(0, 2, 1, 3).reshape(b, s, heads * d)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mha_fast(q, k, v, heads, causal, interpret):
    """Packed pallas forward + heads-first fused backward kernel with
    input-dtype MXU operands — the training configuration."""
    b, s, hd = q.shape
    sp = max(_round_up(s, 8), 8)
    out = _mha_fwd(_pad_to(q, sp, 1), _pad_to(k, sp, 1), _pad_to(v, sp, 1),
                   causal, s, heads, hd // heads, interpret)[0]
    return out[:, :s, :]


def _mha_fast_fwd(q, k, v, heads, causal, interpret):
    return _mha_fast(q, k, v, heads, causal, interpret), (q, k, v)


def _mha_fast_bwd(heads, causal, interpret, res, do):
    q, k, v = res
    b, s, hd = q.shape
    d = hd // heads
    sp = max(_round_up(s, 8), 8)
    dp = max(_round_up(d, 128), 128)
    qh = _to_heads_first(q, heads, sp, dp)
    kh = _to_heads_first(k, heads, sp, dp)
    vh = _to_heads_first(v, heads, sp, dp)
    doh = _to_heads_first(do, heads, sp, dp)
    n = qh.shape[0]
    kern = functools.partial(
        _bwd_kernel, scale=1.0 / (d ** 0.5), causal=causal, seq_len=s,
        keep_dtype=q.dtype != jnp.float32)
    dq, dk, dv = pl.pallas_call(
        kern, grid=(n,), in_specs=[_specs(n, sp, dp)] * 4,
        out_specs=(_specs(n, sp, dp),) * 3,
        out_shape=(jax.ShapeDtypeStruct((n, sp, dp), q.dtype),) * 3,
        interpret=interpret,
    )(qh, kh, vh, doh)
    return (_from_heads_first(dq, b, heads, s, d),
            _from_heads_first(dk, b, heads, s, d),
            _from_heads_first(dv, b, heads, s, d))


_mha_fast.defvjp(_mha_fast_fwd, _mha_fast_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _mha_hybrid(q, k, v, heads, causal, interpret):
    b, s, hd = q.shape
    sp = max(_round_up(s, 8), 8)
    out = _mha_fwd(_pad_to(q, sp, 1), _pad_to(k, sp, 1),
                   _pad_to(v, sp, 1), causal, s, heads, hd // heads,
                   interpret)[0]
    return out[:, :s, :]


def _mha_hybrid_fwd(q, k, v, heads, causal, interpret):
    return _mha_hybrid(q, k, v, heads, causal, interpret), (q, k, v)


def _mha_hybrid_bwd(heads, causal, interpret, res, do):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q_, k_, v_: _xla_packed_attention(q_, k_, v_, heads, causal),
        q, k, v)
    return vjp(do)


_mha_hybrid.defvjp(_mha_hybrid_fwd, _mha_hybrid_bwd)


def mha_packed(q, k, v, *, heads: int, causal: bool = False,
               interpret: bool = False, bwd: str = "pallas"
               ) -> jnp.ndarray:
    """Fused multi-head attention over packed heads.

    q, k, v: [B, S, H*D] (the qkv projection output sliced in thirds) ->
    out [B, S, H*D].  S is padded to the sublane tile (8) with key-side
    masking; the H*D lane dim is its natural 768/512/1024 (a multiple of
    128 for every CLIP width) so no lane padding happens at all.

    bwd selects the backward implementation:
      'fused'  — heads-first fused backward kernel, input-dtype MXU
                 operands (training default; fastest measured on v5e);
      'pallas' — packed-layout backward kernel (per-head lane slicing,
                 slower at ViT-B shapes);
      'xla'    — differentiate through the XLA formulation."""
    b, s, hd = q.shape
    head_dim = hd // heads
    if bwd == "fused":
        return _mha_fast(q, k, v, heads, causal, interpret)
    if bwd == "xla":
        return _mha_hybrid(q, k, v, heads, causal, interpret)
    sp = max(_round_up(s, 8), 8)

    def prep(t):
        return _pad_to(t, sp, 1)

    out = _mha(prep(q), prep(k), prep(v), causal, s, heads, head_dim,
               interpret)
    return out[:, :s, :]


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
