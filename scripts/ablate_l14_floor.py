"""L/14 attainable-MFU floor proof (VERDICT r4 item 7).

The r4 accum sweep clustered accum={2,4} x {pallas,XLA} within ~1% at
~176 img/s (43.4% nominal MFU) — suggesting the bottleneck is not the
kernel choice.  This script measures the DISPATCH-CORRECTED matmul
roofline at exactly the L/14 training shapes (bsz 64, S=257, width 1024,
heads 16, hd 64, MLP 4096) and composes a step-time floor:

  * MLP chain [M,1024]x[1024,4096]x[4096,1024], M = 64*257
  * qkv [M,1024]x[1024,3072] and out-proj [M,1024]x[1024,1024]
  * attention score/AV batched matmuls [B*H, S, hd] x [B*H, hd, S]
    (K=hd=64 — a structurally bad MXU shape; this is the unavoidable
    attention cost at S=257, not a kernel deficiency)
  * patch embed [B, 50176..] conv as [B*256, 3*14*14]x[588,1024]

MEASURED OUTCOME (r5, one v5e chip): the composition comes out at 490 ms
vs the real accum-2 training step's 362 ms — the fused whole-graph step
is 35% FASTER than its own kernels run back-to-back, so there is no
kernel-level lever left (the r4 accum x kernel sweep clustering within
1% said the same thing from the other side).  The 43.4%-nominal-MFU gap
to peak is shape-structural: at S=257/hd=64 the attention matmuls run at
4.9-10.2 TFLOP/s (vs 104-131 for the MLP/qkv shapes) and eat ~2/3 of the
per-layer matmul time for ~13% of the FLOPs.  L/14 single-chip is closed
as "at the S=257 structural chain limit"; the lever that remains is
sharding (tp over heads restores MXU-friendly shapes), not kernels.

Every timing is a lax.scan of STEPS iterations in ONE dispatch (the
18 ms tunnel latency is amortized).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, S, W, H, HD, MLP = 64, 257, 1024, 16, 64, 4096
LAYERS = 24
STEPS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    rng = np.random.default_rng(0)
    M = BATCH * S

    def timed(fn, *args, reps=3):
        _ = float(fn(*args))
        t0 = time.perf_counter()
        out = None
        for _ in range(reps):
            out = fn(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / (reps * STEPS)

    def bf16(*shape):
        return jax.device_put(
            rng.standard_normal(shape).astype(jnp.bfloat16))

    def scan_matmul(a_shape, b_shape, batched=False):
        a, b = bf16(*a_shape), bf16(*b_shape)

        @jax.jit
        def run(a, b):
            def body(h, _):
                o = jnp.einsum("bij,bjk->bik", h, b) if batched \
                    else jnp.dot(h, b)
                # feed the output scale back so the scan can't be elided
                return h * (1 + 1e-12 * o.reshape(-1)[0].astype(
                    jnp.bfloat16)), None

            h, _ = jax.lax.scan(body, a, None, length=STEPS)
            return h.reshape(-1)[0].astype(jnp.float32)

        sec = timed(run, a, b)
        if batched:
            flops = 2 * a_shape[0] * a_shape[1] * a_shape[2] * b_shape[2]
        else:
            flops = 2 * a_shape[0] * a_shape[1] * b_shape[1]
        return sec, flops / sec / 1e12

    results = {}
    # MLP chain (the FLOP majority): fc then proj, separately timed at
    # exact shapes (chained timing would hide the narrow-K proj rate)
    sec_fc, tf_fc = scan_matmul((M, W), (W, MLP))
    sec_pr, tf_pr = scan_matmul((M, MLP), (MLP, W))
    # attention projections
    sec_qkv, tf_qkv = scan_matmul((M, W), (W, 3 * W))
    sec_out, tf_out = scan_matmul((M, W), (W, W))
    # attention score + AV (batched, K=64)
    sec_sc, tf_sc = scan_matmul((BATCH * H, S, HD), (BATCH * H, HD, S),
                                batched=True)
    sec_av, tf_av = scan_matmul((BATCH * H, S, S), (BATCH * H, S, HD),
                                batched=True)
    # patch embed as matmul [B*256 patches, 3*14*14] x [588, 1024]
    sec_pe, tf_pe = scan_matmul((BATCH * 256, 588), (588, W))

    results["tflops"] = {
        "mlp_fc": round(tf_fc, 1), "mlp_proj": round(tf_pr, 1),
        "qkv": round(tf_qkv, 1), "attn_out": round(tf_out, 1),
        "scores_k64": round(tf_sc, 1), "av_k257": round(tf_av, 1),
        "patch_embed": round(tf_pe, 1),
    }

    # ---- compose the per-step floor (fwd 1x + bwd 2x, accum -> no
    # recompute; LN/softmax/elementwise assumed fused = free)
    per_layer_fwd = (sec_fc + sec_pr + sec_qkv + sec_out + sec_sc
                     + sec_av)
    fwd = LAYERS * per_layer_fwd + sec_pe
    step_floor = 3 * fwd                      # bwd = 2x fwd at same rates
    floor_img_s = BATCH / step_floor
    measured = 176.8                          # r4 accum=2+pallas, bsz 64
    results.update({
        "per_layer_fwd_ms": round(per_layer_fwd * 1e3, 3),
        "chain_composition_ms": round(step_floor * 1e3, 1),
        "composition_img_per_s": round(floor_img_s, 1),
        "measured_img_per_s": measured,
        "measured_over_composition": round(measured / floor_img_s, 3),
        "note": ("MEASURED OUTCOME (r5): the isolated-kernel composition "
                 "is 490 ms vs the real accum-2 step's 362 ms — the "
                 "fused whole-graph step already beats running its own "
                 "kernels back-to-back by 35%, i.e. no kernel-level "
                 "lever remains (consistent with the r4 sweep clustering "
                 "within 1%).  The gap from 43.4% nominal MFU to peak is "
                 "shape-STRUCTURAL: the K=64 score matmul runs at 10.2 "
                 "TFLOP/s and AV at 4.9 (S=257 pads badly), attn_out at "
                 "43 — attention at these shapes costs ~4.3 of the 6.76 "
                 "ms per-layer matmul time for ~13% of its FLOPs."),
    })
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
