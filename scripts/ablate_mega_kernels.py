"""Per-kernel microbenchmark of the megablock pieces on the real TPU.

Times each pallas kernel in isolation (fwd / mlp_bwd / attn_bwd) for one
ViT-B/32 layer at bsz 256, across block sizes — localizes where the
fused step's time goes (one layer's useful fwd work is ~183 GFLOP
= 0.93 ms at peak).

Usage: python scripts/ablate_mega_kernels.py [bi ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 50


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.kernels import megablock as M

    B, S, D, H, F = 256, 50, 768, 12, 3072
    sp = 56
    bis = [int(a) for a in sys.argv[1:]] or [4, 8, 16]

    rng = np.random.default_rng(0)
    cd = jnp.bfloat16
    x = jax.device_put(rng.standard_normal((B * sp, D)).astype(np.float32)
                       ).astype(cd)
    dy = jax.device_put(rng.standard_normal((B * sp, D)).astype(np.float32)
                        ).astype(cd)

    def mk(*shape):
        return jax.device_put(
            (rng.standard_normal(shape) * 0.02).astype(np.float32)).astype(cd)

    hd = D // H
    wq, wk, wv = mk(H, D, hd), mk(H, D, hd), mk(H, D, hd)
    bq, bk, bv = mk(H, 1, hd), mk(H, 1, hd), mk(H, 1, hd)
    wo, bo = mk(H, hd, D), mk(1, D)
    l1s, l1b, l2s, l2b = mk(1, D), mk(1, D), mk(1, D), mk(1, D)
    wfc, bfc, wp, bp = mk(D, F), mk(1, F), mk(F, D), mk(1, D)
    w_all = (wq, wk, wv, bq, bk, bv, wo, bo, l1s, l1b, l2s, l2b,
             wfc, bfc, wp, bp)

    def timed(name, fn, *args):
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out
                          ).astype(jnp.float32))
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out[0] if isinstance(out, tuple) else out
                          ).astype(jnp.float32))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        print(f"{name:24s} {ms:7.3f} ms/call", flush=True)
        return ms

    for bi in bis:
        import functools

        blk = M._make_block_fn(bi, sp, S, H, hd, D, F, False, True, False)
        # grab the raw calls off a fresh factory run by rebuilding them
        # (the factory closures aren't exposed; re-create equivalents)
        def fwd_many(x, *w):
            def body(c, i):
                y = blk(c * (1.0 + 1e-6 * i.astype(cd)), *w)
                return y, None
            y, _ = jax.lax.scan(body, x, jnp.arange(REPS))
            return y

        def grad_many(x, *w):
            def one(x):
                def body(c, i):
                    y = blk(c * (1.0 + 1e-6 * i.astype(cd)), *w)
                    return y, None
                y, _ = jax.lax.scan(body, x, jnp.arange(REPS))
                return jnp.sum(y.astype(jnp.float32))
            return jax.grad(one)(x)

        print(f"--- bi={bi} (Bt={bi*sp}) ---")
        f = timed("fwd layer", jax.jit(fwd_many), x, *w_all)
        g = timed("fwd+bwd layer", jax.jit(grad_many), x, *w_all)
        print(f"   -> bwd-only {g - f:7.3f} ms ; x12 layers: "
              f"fwd {12*f:.1f} ms, full {12*g:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
