"""L/14 (and B/16) training-MFU sweep: remat policy x attention kernel
(VERDICT r3 item 3).

r3 measured the packed pallas custom-VJP winning 17% at S>=197 and
benchmarked L/14 with ONE remat mode; the two levers were never
co-optimized.  The pallas kernel's custom VJP recomputes attention
internally, so combining it with a remat policy that would otherwise
SAVE the [B, H, S, S] score matrices ('dots_all') or recompute the whole
block ('full') changes both HBM and recompute — this grid finds the
fastest feasible (policy, kernel) pair per model.  OOMs are data points
(reported as JSON), not crashes.

Reference match: the hot call utils/training.py:1474 at the shapes of
utils/extras.py:97-114 (ViT-L-14, bsz-32-class configs).

Usage: python scripts/ablate_l14_mfu.py [model_cfg ...] [--bsz N]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    from _common import parse_models_bsz
    from bench_models import bench_one

    cfgs, bsz_over = parse_models_bsz(sys.argv[1:])
    runs = []
    for c in (cfgs or ["vitl14_openclip_laion400m",
                       "vitb16_openclip_laion400m"]):
        bsz = bsz_over or (64 if "vitl14" in c else 128)
        runs.append((c, bsz))

    for c, bsz in runs:
        grid = [(remat, attn)
                for remat in (False, "dots_all", "dots", "full")
                for attn in ("pallas", "xla")]
        for remat, attn in grid:
            try:
                bench_one(c, bsz, remat=remat, attn=attn)
            except Exception as e:   # OOM is part of the answer
                print(json.dumps({"model_cfg": c, "bsz": bsz,
                                  "remat": str(remat), "attn": attn,
                                  "error": repr(e)[:160]}), flush=True)


if __name__ == "__main__":
    main()
