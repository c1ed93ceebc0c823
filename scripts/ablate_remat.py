"""Selective-remat ablation for single-chip L/14 training (one v5e chip).

L/14 fwd+bwd at bsz 64 needs ~16.5G HBM vs the chip's 15.75G, so remat is
mandatory — but full-block remat recomputes everything and drops nominal
MFU to ~33%. The selective jax.checkpoint policies keep matmul outputs
resident and recompute only the cheap ops:

  full      recompute the whole block (smallest memory)
  dots      save non-batched matmul outputs (qkv/out/fc/proj); recompute
            elementwise + the batched attention scores/softmax
  dots_all  save every matmul output incl. attention scores

Each mode may OOM (that is part of the answer) — errors are reported as
JSON, later modes still run.  Reference match: the reference trains L/14
at bsz 32 on an 80GB A100 with no checkpointing (utils/extras.py:97-114).

Usage: python scripts/ablate_remat.py [model_cfg] [--bsz N]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    from bench_models import bench_one

    argv, args, bsz = sys.argv[1:], [], None
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--bsz" or a.startswith("--bsz="):
            if "=" in a:
                bsz = int(a.split("=", 1)[1])
            elif i + 1 < len(argv):
                bsz = int(argv[i + 1])
                i += 1
            else:
                sys.exit("--bsz requires a value")
        else:
            args.append(a)
        i += 1
    model_cfg = args[0] if args else "vitl14_openclip_laion400m"
    bsz = bsz or (64 if "vitl14" in model_cfg else 256)

    for mode in (True, "dots", "dots_all"):
        try:
            bench_one(model_cfg, bsz, remat=mode)
        except Exception as e:  # OOM is a data point, not a crash
            print(json.dumps({"model_cfg": model_cfg, "bsz": bsz,
                              "remat": str(mode),
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
