"""Is int8 matmul actually 2x on this chip through XLA?

v5e lists 394 int8 TOPS vs 197 bf16 TFLOP/s.  This times
dot_general(s8, s8 -> s32) against the bf16 matmul at the ViT MLP shape
and at square 4096, scan-of-iters (one dispatch), host transfer forcing
completion.  If the int8 path doesn't beat bf16 by a wide margin, a
quantized inference mode has no hardware case on this chip and we keep
bf16 everywhere.

Also times the W8A8 *dequantized* epilogue variant (int32 accum ->
scale multiply -> bf16) which is what a real quantized dense layer pays.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# 300 iters per dispatch: the ~18 ms tunnel latency per jitted call
# (CLAUDE.md) would otherwise add 18/ITERS ms to each per-iter time —
# at 30 iters that's 0.6 ms on matmuls that take 0.2-1.5 ms, enough
# bias to flip the int8-vs-bf16 verdict this script exists to decide.
ITERS = 300


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    def timed(fn, *args, reps=3):
        _ = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / (reps * ITERS) * 1e3

    shapes = [
        ("vit_mlp", 14336, 768, 3072),   # B/32 bsz-256 MLP fc
        ("square4k", 4096, 4096, 4096),
    ]
    rng = np.random.default_rng(0)
    out = {}
    for name, m, k, n in shapes:
        a8 = jax.device_put(rng.integers(-127, 127, (m, k)).astype(np.int8))
        b8 = jax.device_put(rng.integers(-127, 127, (k, n)).astype(np.int8))
        abf = jax.device_put(rng.standard_normal((m, k)).astype(jnp.bfloat16))
        bbf = jax.device_put(rng.standard_normal((k, n)).astype(jnp.bfloat16))
        col_scale = jax.device_put(
            rng.standard_normal((1, n)).astype(np.float32))

        # every body perturbs one input element from the carry — the
        # matmul is otherwise loop-invariant and XLA would hoist it out
        # of the scan (measuring ONE matmul instead of ITERS)
        @jax.jit
        def mm_bf16(a, b):
            def body(c, i):
                a_ = a.at[0, 0].set(jnp.where(c < jnp.inf, a[0, 0], 0))
                y = jax.lax.dot(a_, b)
                return c + y[0, 0].astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return s

        @jax.jit
        def mm_int8(a, b):
            def body(c, i):
                a_ = a.at[0, 0].set(
                    jnp.where(c < jnp.inf, a[0, 0], 0).astype(a.dtype))
                y = jax.lax.dot_general(
                    a_, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return c + y[0, 0].astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return s

        @jax.jit
        def mm_w8a8(a, b, cs):
            def body(c, i):
                a_ = a.at[0, 0].set(
                    jnp.where(c < jnp.inf, a[0, 0], 0).astype(a.dtype))
                y = jax.lax.dot_general(
                    a_, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                yq = (y.astype(jnp.float32) * cs).astype(jnp.bfloat16)
                return c + yq[0, 0].astype(jnp.float32), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
            return s

        tf = 2 * m * k * n / 1e12
        r = {
            "bf16_ms": round(timed(mm_bf16, abf, bbf), 3),
            "int8_ms": round(timed(mm_int8, a8, b8), 3),
            "w8a8_dequant_ms": round(timed(mm_w8a8, a8, b8, col_scale), 3),
        }
        r["bf16_tflops"] = round(tf / (r["bf16_ms"] / 1e3), 1)
        r["int8_tops"] = round(tf / (r["int8_ms"] / 1e3), 1)
        r["speedup"] = round(r["bf16_ms"] / r["w8a8_dequant_ms"], 2)
        out[name] = r
        print(json.dumps({name: r}), flush=True)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
