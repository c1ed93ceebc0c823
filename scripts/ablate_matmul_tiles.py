"""How does Mosaic matmul efficiency scale with block rows (M)?

Times y = x @ w (w [768, 3072] VMEM-resident, grid over row blocks) for
several block sizes, plus the XLA whole-matrix matmul as reference.
Decides the megablock MLP-half block size.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 30
PEAK = 197.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    D, F = 768, 3072
    N = 14336  # 256 images x 56 tokens
    rng = np.random.default_rng(0)
    x = jax.device_put(rng.standard_normal((N, D)).astype(np.float32)
                       ).astype(jnp.bfloat16)
    w = jax.device_put(rng.standard_normal((D, F)).astype(np.float32) * .02
                       ).astype(jnp.bfloat16)
    w2 = jax.device_put(rng.standard_normal((F, D)).astype(np.float32) * .02
                        ).astype(jnp.bfloat16)
    gflop = 2 * N * D * F * 2 / 1e9  # both matmuls

    def timed(name, fn, *args):
        out = fn(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))
        t0 = time.perf_counter()
        out = fn(*args)
        _ = float(jnp.sum(out).astype(jnp.float32))
        ms = (time.perf_counter() - t0) / REPS * 1e3
        tf = gflop / ms
        print(f"{name:16s} {ms:7.3f} ms  {tf:6.1f} TFLOP/s "
              f"({tf/PEAK*100:4.1f}%)", flush=True)

    def kernel(x_ref, w_ref, w2_ref, y_ref):
        m = jax.lax.dot_general(
            x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y_ref[...] = jax.lax.dot_general(
            m, w2_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(jnp.bfloat16)

    def build(bm):
        def call(x, w, w2):
            return pl.pallas_call(
                kernel, grid=(N // bm,),
                in_specs=[
                    pl.BlockSpec((bm, D), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((D, F), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((F, D), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((bm, D), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N, D), x.dtype),
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=128 * 1024 * 1024),
            )(x, w, w2)

        @jax.jit
        def many(x, w, w2):
            def body(c, i):
                return call(c * (1.0 + 1e-6 * i.astype(jnp.bfloat16)),
                            w, w2), None
            y, _ = jax.lax.scan(body, x, jnp.arange(REPS))
            return y
        return many

    @jax.jit
    def xla_many(x, w, w2):
        def body(c, i):
            m = jnp.dot(c, w, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            y = jnp.dot(m, w2, preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
            return y * (1.0 + 1e-6 * i.astype(jnp.bfloat16)), None
        y, _ = jax.lax.scan(body, x, jnp.arange(REPS))
        return y

    timed("xla", xla_many, x, w, w2)
    for bm in [448, 896, 1792, 3584, 7168]:
        timed(f"pallas bm={bm}", build(bm), x, w, w2)


if __name__ == "__main__":
    main()
