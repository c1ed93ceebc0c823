"""Calibrate practical MXU peak on this chip: square bf16 matmuls and
the exact ViT-B/32 MLP shapes, XLA only."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 20
PEAK = 197.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    rng = np.random.default_rng(0)

    def bench(name, m, k, n, pref=None):
        x = jax.device_put(rng.standard_normal((m, k)).astype(np.float32)
                           ).astype(jnp.bfloat16)
        w = jax.device_put(rng.standard_normal((k, n)).astype(np.float32)
                           ).astype(jnp.bfloat16)

        @jax.jit
        def many(x, w):
            def body(c, i):
                y = jnp.dot(c, w, preferred_element_type=pref)
                return y.astype(jnp.bfloat16)[:, :k] if n >= k else \
                    jnp.pad(y.astype(jnp.bfloat16), ((0, 0), (0, k - n))), \
                    None
            y, _ = jax.lax.scan(body, x, jnp.arange(REPS))
            return y

        out = many(x, w)
        _ = float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = many(x, w)
        _ = float(jnp.sum(out).astype(jnp.float32))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        tf = 2 * m * k * n / ms / 1e9
        print(f"{name:28s} {ms:7.3f} ms  {tf:6.1f} TFLOP/s "
              f"({tf/PEAK*100:4.1f}%)", flush=True)

    bench("square 4096 bf16", 4096, 4096, 4096)
    bench("square 4096 bf16 pref-f32", 4096, 4096, 4096, jnp.float32)
    bench("square 8192 bf16", 8192, 8192, 8192)
    bench("mlp fc 14336x768x3072", 14336, 768, 3072, jnp.float32)
    bench("mlp proj 14336x3072x768", 14336, 3072, 768, jnp.float32)
    bench("qkv 14336x768x2304", 14336, 768, 2304, jnp.float32)


if __name__ == "__main__":
    main()
