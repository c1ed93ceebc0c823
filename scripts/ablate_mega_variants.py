"""Forward megablock kernel variants on the real TPU — localize the gap
between the measured 2.78 ms/layer-call and the ~0.95 ms matmul bound.

Variants (one ViT-B/32 layer, bsz 256, bi images per block):
  base        the production kernel (per-head weight-slice matmuls)
  noattn      attention replaced by identity  -> LN+qkv+MLP cost
  nomlp       MLP skipped                     -> LN+attention cost
  noln        LayerNorms replaced by copies   -> matmul+softmax cost
  fusedqkv    one [Bt,768]x[768,2304] qkv matmul + in-kernel lane slices
  bf16sm      softmax in bf16 storage

Usage: python scripts/ablate_mega_variants.py [bi] [variants...]
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 30


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.kernels import megablock as M

    B, S, D, H, F = 256, 50, 768, 12, 3072
    sp = 56
    hd = D // H
    bi = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    wanted = sys.argv[2:] or ["base", "noattn", "nomlp", "noln",
                              "fusedqkv", "bf16sm"]
    bt = bi * sp
    nb = B // bi

    rng = np.random.default_rng(0)
    cd = jnp.bfloat16
    x = jax.device_put(rng.standard_normal((B * sp, D)).astype(np.float32)
                       ).astype(cd)

    def mk(*shape):
        return jax.device_put(
            (rng.standard_normal(shape) * 0.02).astype(np.float32)
        ).astype(cd)

    wq, wk, wv = mk(H, D, hd), mk(H, D, hd), mk(H, D, hd)
    wqkv = mk(D, 3 * D)
    bq, bk, bv = mk(H, 1, hd), mk(H, 1, hd), mk(H, 1, hd)
    wo, bo = mk(H, hd, D), mk(1, D)
    l1s, l1b, l2s, l2b = mk(1, D), mk(1, D), mk(1, D), mk(1, D)
    wfc, bfc, wp, bp = mk(D, F), mk(1, F), mk(F, D), mk(1, D)

    def kernel(x_ref, wq, wk, wv, wqkv, bq, bk, bv, wo, bo, l1s, l1b,
               l2s, l2b, wfc, bfc, wp, bp, y_ref, *, attn=True, mlp=True,
               ln=True, fusedqkv=False, softmax_dtype=jnp.float32,
               bf16out=False):
        scale = 1.0 / (hd ** 0.5)
        xv = x_ref[...]

        def dot16(a, b, dims=None):
            # bf16 output: f32 MXU output measured 1.77x slower
            # (scripts/ablate_peak.py) — round to bf16 in the MXU epilogue
            if not bf16out:
                return M._dot(a, b, None, dims).astype(cd)
            if dims is None:
                dims = (((a.ndim - 1,), (0,)), ((), ()))
            return jax.lax.dot_general(a, b, dimension_numbers=dims)

        def norm(p_s, p_b, t):
            if not ln:
                return t
            y, _, _ = M._ln_fwd(t.astype(jnp.float32),
                                p_s[0].astype(jnp.float32),
                                p_b[0].astype(jnp.float32))
            return y.astype(cd)

        h1 = norm(l1s, l1b, xv)
        if attn:
            mask = M._mask(bt, sp, S, False)
            acc = jnp.zeros((bt, D), jnp.float32)
            if fusedqkv:
                qkv = M._dot(h1, wqkv[...], None).astype(cd)
            for h in range(H):
                if fusedqkv:
                    q = qkv[:, h * hd:(h + 1) * hd] + bq[h]
                    k = qkv[:, D + h * hd:D + (h + 1) * hd] + bk[h]
                    v = qkv[:, 2 * D + h * hd:2 * D + (h + 1) * hd] + bv[h]
                else:
                    q = dot16(h1, wq[h]) + bq[h]
                    k = dot16(h1, wk[h]) + bk[h]
                    v = dot16(h1, wv[h]) + bv[h]
                s = M._dot(q, k, None, M._dn(1, 1)).astype(
                    softmax_dtype) * scale
                s = jnp.where(mask, s, jnp.asarray(-3e38, softmax_dtype))
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp(s - m)
                p = p / jnp.sum(p, axis=-1, keepdims=True)
                o = dot16(p.astype(cd), v)
                if bf16out:
                    acc = acc + dot16(o, wo[h]).astype(jnp.float32)
                else:
                    acc = acc + M._dot(o, wo[h], None)
            x2 = xv + (acc.astype(cd) + bo[0])
        else:
            x2 = xv
        if mlp:
            h2 = norm(l2s, l2b, x2)
            m1 = dot16(h2, wfc[...]) + bfc[0]
            g = M._act(m1.astype(jnp.float32), True).astype(cd)
            y = x2 + (dot16(g, wp[...]) + bp[0])
        else:
            y = x2
        y_ref[...] = y

    w_all = (wq, wk, wv, wqkv, bq, bk, bv, wo, bo, l1s, l1b, l2s, l2b,
             wfc, bfc, wp, bp)

    def build(**opts):
        kern = functools.partial(kernel, **opts)

        def call(x, *w):
            return pl.pallas_call(
                kern, grid=(nb,),
                in_specs=[M._x_spec(bi, sp, D)] + [
                    M._w_spec(t.shape) for t in w],
                out_specs=M._x_spec(bi, sp, D),
                out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
                compiler_params=M._params(),
            )(x, *w)

        @jax.jit
        def many(x, *w):
            def body(c, i):
                return call(c * (1.0 + 1e-6 * i.astype(cd)), *w), None
            y, _ = jax.lax.scan(body, x, jnp.arange(REPS))
            return y
        return many

    VARIANTS = {
        "base": {},
        "noattn": dict(attn=False),
        "nomlp": dict(mlp=False),
        "noln": dict(ln=False),
        "fusedqkv": dict(fusedqkv=True),
        "bf16sm": dict(softmax_dtype=jnp.bfloat16),
        "bf16out": dict(bf16out=True),
        "bf16all": dict(bf16out=True, softmax_dtype=jnp.bfloat16),
    }
    for name in wanted:
        fn = build(**VARIANTS[name])
        out = fn(x, *w_all)
        _ = float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = fn(x, *w_all)
        _ = float(jnp.sum(out).astype(jnp.float32))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"bi={bi} {name:10s} {ms:7.3f} ms/layer-call "
              f"(x12 = {12 * ms:6.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
