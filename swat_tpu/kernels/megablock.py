"""Block-fused transformer-layer megakernel (Pallas TPU).

One ``pallas_call`` runs an ENTIRE pre-LN transformer block — LN1 -> qkv
-> multi-head attention -> out-proj -> residual -> LN2 -> MLP -> residual
— with the layer's weights VMEM-resident across a grid of batch blocks.
Two further kernels implement the backward pass (MLP half and attention
half) as a custom VJP, saving only the layer input ``x`` and the
post-attention residual ``x2`` to HBM.

Why: the measured ViT-B/32 train step decomposes into matmuls ~23 ms +
attention ~27 ms + activation HBM round trips ~22 ms (CLAUDE.md,
scripts/ablate_functional.py).  XLA writes every matmul output (qkv,
scores, probs, MLP hidden) back to HBM; this kernel keeps all of them in
VMEM, so per layer only ``x``/``x2``/``y`` (each [B, Sp, D]) cross HBM.

Attention layout: the per-head [S, S] matmuls of CLIP's short sequences
(S=50 image / 77 text tokens) are hopeless MXU shapes, and per-head
64-lane slicing of activations forces relayouts (every fused-backward
variant in kernels/flash_attention.py measured SLOWER than XLA because of
them).  Here a batch block of ``bi`` images is flattened to one
[bi*Sp, D] token matrix and attention runs BLOCK-DIAGONALLY: per head,
one [Bt, hd] x [hd, Bt] score matmul with a same-image mask.  That wastes
bi x FLOPs on masked cross-image scores but turns attention into large
MXU-shaped matmuls with zero activation relayouts — the per-head weight
slices are pre-arranged OUTSIDE the kernel as [H, D, hd] / [H, hd, D]
arrays (sublane-indexed, no lane slicing anywhere).

Equivalence with models/functional.py is enforced by
tests/test_megablock.py; the hot call this replaces is the reference's
``model.encode_image`` inside ``train_cutmix`` (reference
utils/training.py:1474).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_VMEM_LIMIT = 128 * 1024 * 1024


def _round_up(n, m):
    return ((n + m - 1) // m) * m


def pick_block_imgs(batch: int, sp: int, target_rows: int = 512) -> int:
    """Largest divisor of ``batch`` whose token-row count stays near
    ``target_rows`` (the MXU sweet spot for the score matmuls)."""
    want = max(1, target_rows // sp)
    bi = min(want, batch)
    while batch % bi:
        bi -= 1
    return bi


def _ln_fwd(x32, scale, bias, eps=1e-5):
    """fp32 LayerNorm, fast-variance form (matches functional._layer_norm).
    Returns (y32, xhat, rstd)."""
    mu = x32.mean(axis=-1, keepdims=True)
    mu2 = (x32 * x32).mean(axis=-1, keepdims=True)
    var = jnp.maximum(0.0, mu2 - mu * mu)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * rstd
    return xhat * scale + bias, xhat, rstd


def _ln_bwd(dy32, xhat, rstd, scale):
    """Standard LN input-gradient; returns (dx32, dscale_rows, dbias_rows)
    where the d{scale,bias}_rows are still [Bt, D] (caller reduces)."""
    n = xhat.shape[-1]
    dyh = dy32 * scale
    s1 = jnp.sum(dyh, axis=-1, keepdims=True)
    s2 = jnp.sum(dyh * xhat, axis=-1, keepdims=True)
    dx = (rstd / n) * (n * dyh - s1 - xhat * s2)
    return dx, dy32 * xhat, dy32


def _erf(x):
    """Abramowitz-Stegun 7.1.26 rational erf (max abs err 1.5e-7):
    Mosaic implements neither erf nor erfc, so the exact-gelu models
    (non-quickgelu OpenCLIP configs) need an in-kernel formulation built
    from exp only."""
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _act(m, quick_gelu):
    if quick_gelu:
        return m * jax.nn.sigmoid(1.702 * m)
    return 0.5 * m * (1.0 + _erf(m * 0.7071067811865476))


def _act_grad32(m32, quick_gelu):
    """d(act)/dm evaluated in fp32."""
    if quick_gelu:
        s = jax.nn.sigmoid(1.702 * m32)
        return s * (1.0 + 1.702 * m32 * (1.0 - s))
    # exact gelu: Phi(m) + m * phi(m)
    inv_sqrt2 = 0.7071067811865476
    phi = jnp.exp(-0.5 * m32 * m32) * 0.3989422804014327
    cdf = 0.5 * (1.0 + _erf(m32 * inv_sqrt2))
    return cdf + m32 * phi


def _mask(bt, sp, seq_len, causal):
    rows = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bt, bt), 1)
    m = (rows // sp == cols // sp) & (cols % sp < seq_len)
    if causal:
        m = m & (cols % sp <= rows % sp)
    return m


def _dot(a, b, hp, dims=None):
    if dims is None:
        dims = (((a.ndim - 1,), (0,)), ((), ()))
    return jax.lax.dot_general(a, b, dimension_numbers=dims, precision=hp,
                               preferred_element_type=jnp.float32)


def _dn(ca, cb):
    return (((ca,), (cb,)), ((), ()))


# ---------------------------------------------------------------------------
# forward kernel


def _fwd_kernel(x_ref, wq, wk, wv, bq, bk, bv, wo, bo, l1s, l1b, l2s, l2b,
                wfc, bfc, wp, bp, y_ref, x2_ref, *,
                bi, sp, seq_len, heads, head_dim, causal, quick_gelu):
    d = x_ref.shape[-1]
    bt = bi * sp
    cd = x_ref.dtype
    hp = "highest" if cd == jnp.float32 else None
    scale = 1.0 / (head_dim ** 0.5)

    x = x_ref[...]
    x32 = x.astype(jnp.float32)
    h1_32, _, _ = _ln_fwd(x32, l1s[0].astype(jnp.float32),
                          l1b[0].astype(jnp.float32))
    h1 = h1_32.astype(cd)

    mask = _mask(bt, sp, seq_len, causal)
    acc = jnp.zeros((bt, d), jnp.float32)
    for h in range(heads):
        q = _dot(h1, wq[h], hp).astype(cd) + bq[h]
        k = _dot(h1, wk[h], hp).astype(cd) + bk[h]
        v = _dot(h1, wv[h], hp).astype(cd) + bv[h]
        s = _dot(q, k, hp, _dn(1, 1)) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)
        o = _dot(p.astype(cd), v, hp).astype(cd)
        acc = acc + _dot(o, wo[h], hp)
    attn = acc.astype(cd) + bo[0]
    x2 = x + attn
    x2_ref[...] = x2

    x2_32 = x2.astype(jnp.float32)
    h2_32, _, _ = _ln_fwd(x2_32, l2s[0].astype(jnp.float32),
                          l2b[0].astype(jnp.float32))
    h2 = h2_32.astype(cd)
    m1 = _dot(h2, wfc[...], hp).astype(cd) + bfc[0]
    g = _act(m1.astype(jnp.float32), quick_gelu).astype(cd)
    y = x2 + (_dot(g, wp[...], hp).astype(cd) + bp[0])
    y_ref[...] = y


# ---------------------------------------------------------------------------
# backward kernels


def _mlp_bwd_kernel(x2_ref, dy_ref, wfc, bfc, wp, l2s, l2b,
                    dx2_ref, dwfc_ref, dbfc_ref, dwp_ref, dbp_ref,
                    dl2s_ref, dl2b_ref, *, bi, sp, quick_gelu):
    d = x2_ref.shape[-1]
    f = wfc.shape[-1]
    bt = bi * sp
    cd = x2_ref.dtype
    hp = "highest" if cd == jnp.float32 else None

    @pl.when(pl.program_id(0) == 0)
    def _():
        dwfc_ref[...] = jnp.zeros_like(dwfc_ref)
        dbfc_ref[...] = jnp.zeros_like(dbfc_ref)
        dwp_ref[...] = jnp.zeros_like(dwp_ref)
        dbp_ref[...] = jnp.zeros_like(dbp_ref)
        dl2s_ref[...] = jnp.zeros_like(dl2s_ref)
        dl2b_ref[...] = jnp.zeros_like(dl2b_ref)

    x2 = x2_ref[...]
    dy = dy_ref[...]
    x2_32 = x2.astype(jnp.float32)
    h2_32, xhat, rstd = _ln_fwd(x2_32, l2s[0].astype(jnp.float32),
                                l2b[0].astype(jnp.float32))
    h2 = h2_32.astype(cd)
    m1 = _dot(h2, wfc[...], hp).astype(cd) + bfc[0]
    g = _act(m1.astype(jnp.float32), quick_gelu).astype(cd)

    dy32 = dy.astype(jnp.float32)
    dbp_ref[...] += jnp.sum(dy32, axis=0, keepdims=True)
    dwp_ref[...] += _dot(g, dy, hp, _dn(0, 0))
    dg = _dot(dy, wp[...], hp, _dn(1, 1))                     # [Bt, F] f32
    dm = dg * _act_grad32(m1.astype(jnp.float32), quick_gelu)
    dbfc_ref[...] += jnp.sum(dm, axis=0, keepdims=True)
    dm_c = dm.astype(cd)
    dwfc_ref[...] += _dot(h2, dm_c, hp, _dn(0, 0))
    dh2 = _dot(dm_c, wfc[...], hp, _dn(1, 1))                 # [Bt, D] f32
    dx_ln, ds_rows, db_rows = _ln_bwd(dh2, xhat, rstd,
                                      l2s[0].astype(jnp.float32))
    dl2s_ref[...] += jnp.sum(ds_rows, axis=0, keepdims=True)
    dl2b_ref[...] += jnp.sum(db_rows, axis=0, keepdims=True)
    dx2 = (dy32 + dx_ln).astype(cd)
    dx2_ref[...] = dx2


def _attn_bwd_kernel(x_ref, dx2_ref, wq, wk, wv, bq, bk, bv, wo, l1s, l1b,
                     dx_ref, dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref,
                     dbv_ref, dwo_ref, dbo_ref, dl1s_ref, dl1b_ref, *,
                     bi, sp, seq_len, heads, head_dim, causal):
    d = x_ref.shape[-1]
    bt = bi * sp
    cd = x_ref.dtype
    hp = "highest" if cd == jnp.float32 else None
    scale = 1.0 / (head_dim ** 0.5)

    @pl.when(pl.program_id(0) == 0)
    def _():
        for r in (dwq_ref, dwk_ref, dwv_ref, dbq_ref, dbk_ref, dbv_ref,
                  dwo_ref, dbo_ref, dl1s_ref, dl1b_ref):
            r[...] = jnp.zeros_like(r)

    x = x_ref[...]
    dx2 = dx2_ref[...]
    x32 = x.astype(jnp.float32)
    h1_32, xhat, rstd = _ln_fwd(x32, l1s[0].astype(jnp.float32),
                                l1b[0].astype(jnp.float32))
    h1 = h1_32.astype(cd)
    dx2_32 = dx2.astype(jnp.float32)
    dbo_ref[...] += jnp.sum(dx2_32, axis=0, keepdims=True)

    mask = _mask(bt, sp, seq_len, causal)
    dh1 = jnp.zeros((bt, d), jnp.float32)
    for h in range(heads):
        q = _dot(h1, wq[h], hp).astype(cd) + bq[h]
        k = _dot(h1, wk[h], hp).astype(cd) + bk[h]
        v = _dot(h1, wv[h], hp).astype(cd) + bv[h]
        s = _dot(q, k, hp, _dn(1, 1)) * scale
        s = jnp.where(mask, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        p = p / jnp.sum(p, axis=-1, keepdims=True)       # [Bt, Bt] f32
        p_c = p.astype(cd)

        o = _dot(p_c, v, hp).astype(cd)                  # [Bt, hd]
        dwo_ref[h] += _dot(o, dx2, hp, _dn(0, 0))
        do = _dot(dx2, wo[h], hp, _dn(1, 1)).astype(cd)  # [Bt, hd]
        dv = _dot(p_c, do, hp, _dn(0, 0))                # [Bt, hd] f32
        dp = _dot(do, v, hp, _dn(1, 1))                  # [Bt, Bt] f32
        delta = jnp.sum(p * dp, axis=-1, keepdims=True)
        ds = p * (dp - delta) * scale
        ds = jnp.where(mask, ds, 0.0).astype(cd)
        dq = _dot(ds, k, hp)                             # [Bt, hd] f32
        dk = _dot(ds, q, hp, _dn(0, 0))                  # [Bt, hd] f32
        dbq_ref[h] += jnp.sum(dq, axis=0, keepdims=True)
        dbk_ref[h] += jnp.sum(dk, axis=0, keepdims=True)
        dbv_ref[h] += jnp.sum(dv, axis=0, keepdims=True)
        dq_c, dk_c, dv_c = (t.astype(cd) for t in (dq, dk, dv))
        dwq_ref[h] += _dot(h1, dq_c, hp, _dn(0, 0))
        dwk_ref[h] += _dot(h1, dk_c, hp, _dn(0, 0))
        dwv_ref[h] += _dot(h1, dv_c, hp, _dn(0, 0))
        dh1 = dh1 + _dot(dq_c, wq[h], hp, _dn(1, 1))
        dh1 = dh1 + _dot(dk_c, wk[h], hp, _dn(1, 1))
        dh1 = dh1 + _dot(dv_c, wv[h], hp, _dn(1, 1))

    dx_ln, ds_rows, db_rows = _ln_bwd(dh1, xhat, rstd,
                                      l1s[0].astype(jnp.float32))
    dl1s_ref[...] += jnp.sum(ds_rows, axis=0, keepdims=True)
    dl1b_ref[...] += jnp.sum(db_rows, axis=0, keepdims=True)
    dx = (dx2_32 + dx_ln).astype(cd)
    dx_ref[...] = dx


# ---------------------------------------------------------------------------
# pallas_call plumbing


def _x_spec(bi, sp, d):
    return pl.BlockSpec((bi * sp, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _w_spec(shape):
    nd = len(shape)
    return pl.BlockSpec(shape, lambda i: (0,) * nd,
                        memory_space=pltpu.VMEM)


def _params():
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT)


@functools.lru_cache(maxsize=64)
def _make_block_fn(bi, sp, seq_len, heads, head_dim, d, f, causal,
                   quick_gelu, interpret):
    """Build the custom-VJP fused block for one static configuration.

    Signature of the returned fn:
      f(x, wq, wk, wv, bq, bk, bv, wo, bo, l1s, l1b, l2s, l2b,
        wfc, bfc, wp, bp) -> y
    with x [B, Sp, D] (B divisible by bi) and per-head weights
    wq/wk/wv [H, D, hd], wo [H, hd, D], biases bq/bk/bv [H, 1, hd],
    vectors as [1, D] / [1, F].
    """

    def fwd_call(x, *w):
        nb = x.shape[0] // (bi * sp)
        kern = functools.partial(
            _fwd_kernel, bi=bi, sp=sp, seq_len=seq_len, heads=heads,
            head_dim=head_dim, causal=causal, quick_gelu=quick_gelu)
        y, x2 = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[_x_spec(bi, sp, d)] + [_w_spec(t.shape) for t in w],
            out_specs=(_x_spec(bi, sp, d), _x_spec(bi, sp, d)),
            out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),) * 2,
            compiler_params=_params(), interpret=interpret,
        )(x, *w)
        return y, x2

    def mlp_bwd_call(x2, dy, wfc, bfc, wp, l2s, l2b):
        nb = x2.shape[0] // (bi * sp)
        kern = functools.partial(_mlp_bwd_kernel, bi=bi, sp=sp,
                                 quick_gelu=quick_gelu)
        f32 = jnp.float32
        outs = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[_x_spec(bi, sp, d)] * 2 + [
                _w_spec(t.shape) for t in (wfc, bfc, wp, l2s, l2b)],
            out_specs=(_x_spec(bi, sp, d), _w_spec((d, f)), _w_spec((1, f)),
                       _w_spec((f, d)), _w_spec((1, d)), _w_spec((1, d)),
                       _w_spec((1, d))),
            out_shape=(jax.ShapeDtypeStruct(x2.shape, x2.dtype),
                       jax.ShapeDtypeStruct((d, f), f32),
                       jax.ShapeDtypeStruct((1, f), f32),
                       jax.ShapeDtypeStruct((f, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            compiler_params=_params(), interpret=interpret,
        )(x2, dy, wfc, bfc, wp, l2s, l2b)
        return outs

    def attn_bwd_call(x, dx2, wq, wk, wv, bq, bk, bv, wo, l1s, l1b):
        nb = x.shape[0] // (bi * sp)
        kern = functools.partial(
            _attn_bwd_kernel, bi=bi, sp=sp, seq_len=seq_len, heads=heads,
            head_dim=head_dim, causal=causal)
        f32 = jnp.float32
        hw = (heads, d, head_dim)
        hb = (heads, 1, head_dim)
        outs = pl.pallas_call(
            kern, grid=(nb,),
            in_specs=[_x_spec(bi, sp, d)] * 2 + [
                _w_spec(t.shape)
                for t in (wq, wk, wv, bq, bk, bv, wo, l1s, l1b)],
            out_specs=(_x_spec(bi, sp, d), _w_spec(hw), _w_spec(hw),
                       _w_spec(hw), _w_spec(hb), _w_spec(hb), _w_spec(hb),
                       _w_spec((heads, head_dim, d)), _w_spec((1, d)),
                       _w_spec((1, d)), _w_spec((1, d))),
            out_shape=(jax.ShapeDtypeStruct(x.shape, x.dtype),
                       jax.ShapeDtypeStruct(hw, f32),
                       jax.ShapeDtypeStruct(hw, f32),
                       jax.ShapeDtypeStruct(hw, f32),
                       jax.ShapeDtypeStruct(hb, f32),
                       jax.ShapeDtypeStruct(hb, f32),
                       jax.ShapeDtypeStruct(hb, f32),
                       jax.ShapeDtypeStruct((heads, head_dim, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32),
                       jax.ShapeDtypeStruct((1, d), f32)),
            compiler_params=_params(), interpret=interpret,
        )(x, dx2, wq, wk, wv, bq, bk, bv, wo, l1s, l1b)
        return outs

    @jax.custom_vjp
    def block(x, wq, wk, wv, bq, bk, bv, wo, bo, l1s, l1b, l2s, l2b,
              wfc, bfc, wp, bp):
        return fwd_call(x, wq, wk, wv, bq, bk, bv, wo, bo, l1s, l1b,
                        l2s, l2b, wfc, bfc, wp, bp)[0]

    def block_fwd(x, wq, wk, wv, bq, bk, bv, wo, bo, l1s, l1b, l2s, l2b,
                  wfc, bfc, wp, bp):
        y, x2 = fwd_call(x, wq, wk, wv, bq, bk, bv, wo, bo, l1s, l1b,
                         l2s, l2b, wfc, bfc, wp, bp)
        return y, (x, x2, wq, wk, wv, bq, bk, bv, wo, l1s, l1b, l2s, l2b,
                   wfc, bfc, wp)

    def block_bwd(res, dy):
        (x, x2, wq, wk, wv, bq, bk, bv, wo, l1s, l1b, l2s, l2b,
         wfc, bfc, wp) = res
        (dx2, dwfc, dbfc, dwp, dbp, dl2s, dl2b) = mlp_bwd_call(
            x2, dy, wfc, bfc, wp, l2s, l2b)
        (dx, dwq, dwk, dwv, dbq, dbk, dbv, dwo, dbo, dl1s, dl1b
         ) = attn_bwd_call(x, dx2, wq, wk, wv, bq, bk, bv, wo, l1s, l1b)

        def c(g, like):
            return g.astype(like.dtype)

        return (dx, c(dwq, wq), c(dwk, wk), c(dwv, wv), c(dbq, bq),
                c(dbk, bk), c(dbv, bv), c(dwo, wo), c(dbo, wo),
                c(dl1s, l1s), c(dl1b, l1b), c(dl2s, l2s), c(dl2b, l2b),
                c(dwfc, wfc), c(dbfc, bfc), c(dwp, wp), c(dbp, wp))

    block.defvjp(block_fwd, block_bwd)
    return block


# ---------------------------------------------------------------------------
# host-side wrapper over the functional layer tree


def _prep_weights(p, heads, cd):
    """Rearrange one functional layer slice into megakernel layout:
    per-head weight stacks, 2D bias/LN vectors, all cast to ``cd``."""
    d = p["attn"]["qkv"]["kernel"].shape[0]
    hd = d // heads

    def heads_cols(w):          # [D, D] -> [H, D, hd]
        return w.reshape(d, heads, hd).transpose(1, 0, 2)

    wq, wk, wv = jnp.split(p["attn"]["qkv"]["kernel"].astype(cd), 3, axis=1)
    bq, bk, bv = jnp.split(p["attn"]["qkv"]["bias"].astype(cd), 3)
    wo = p["attn"]["out"]["kernel"].astype(cd).reshape(heads, hd, d)
    return (
        heads_cols(wq), heads_cols(wk), heads_cols(wv),
        bq.reshape(heads, 1, hd), bk.reshape(heads, 1, hd),
        bv.reshape(heads, 1, hd),
        wo, p["attn"]["out"]["bias"].astype(cd).reshape(1, d),
        p["ln_1"]["ln"]["scale"].astype(cd).reshape(1, d),
        p["ln_1"]["ln"]["bias"].astype(cd).reshape(1, d),
        p["ln_2"]["ln"]["scale"].astype(cd).reshape(1, d),
        p["ln_2"]["ln"]["bias"].astype(cd).reshape(1, d),
        p["mlp"]["fc"]["kernel"].astype(cd),
        p["mlp"]["fc"]["bias"].astype(cd).reshape(1, -1),
        p["mlp"]["proj"]["kernel"].astype(cd),
        p["mlp"]["proj"]["bias"].astype(cd).reshape(1, d),
    )


def fused_transformer(p, x, *, heads: int, layers: int, quick_gelu: bool,
                      causal: bool, compute_dtype=jnp.bfloat16,
                      block_imgs: int | None = None,
                      interpret: bool | None = None):
    """Run ``layers`` fused pre-LN blocks over x [B, S, D].

    Drop-in for functional._transformer: pads S to the sublane tile once,
    runs every layer at the padded length (padded rows are masked as
    attention keys and stay row-local garbage), slices back at the end.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, s, d = x.shape
    sp = max(_round_up(s, 8), 8)
    if sp != s:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, 0)))
    bi = block_imgs or pick_block_imgs(b, sp)
    if b % bi:
        raise ValueError(f"block_imgs={bi} must divide batch {b}")
    head_dim = d // heads
    mlp_dim = p["blocks"]["mlp"]["fc"]["kernel"].shape[-1]
    fn = _make_block_fn(bi, sp, s, heads, head_dim, d, mlp_dim, causal,
                        quick_gelu, interpret)
    # flatten batch x tokens ONCE (free in XLA); kernels are purely 2D so
    # Mosaic never relayouts a 3D tiled block
    x = x.astype(compute_dtype).reshape(b * sp, d)
    for i in range(layers):
        layer = jax.tree_util.tree_map(lambda a: a[i], p["blocks"])
        w = _prep_weights(layer, heads, compute_dtype)
        x = fn(x, *w)
    x = x.reshape(b, sp, d)
    return x[:, :s, :] if sp != s else x
