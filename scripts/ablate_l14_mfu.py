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

Each grid point runs in its OWN subprocess (scripts/bench_models.py
<cfg> --bsz --remat --attn): a failed L/14 compile presents as the axon
HTTP-500 compile-helper error AND leaks HBM server-side — after one, all
later allocations in the same process RESOURCE_EXHAUST (measured r4).
Known-likely-OOM points (L/14 without remat) run LAST for the same
reason.

Reference match: the hot call utils/training.py:1474 at the shapes of
utils/extras.py:97-114 (ViT-L-14, bsz-32-class configs).

Usage: python scripts/ablate_l14_mfu.py [model_cfg ...] [--bsz N]
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    from _common import parse_models_bsz

    cfgs, bsz_over = parse_models_bsz(sys.argv[1:])
    runs = []
    for c in (cfgs or ["vitl14_openclip_laion400m",
                       "vitb16_openclip_laion400m"]):
        bsz = bsz_over or (64 if "vitl14" in c else 128)
        runs.append((c, bsz))

    bench = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_models.py")
    grid = []
    for c, bsz in runs:
        # 'first<K>' (prefix-block remat, r4): the hope was that L/14 is
        # only ~0.75 GB over the 15.75 GB HBM budget so a small rematted
        # prefix would fit at K/24 of full remat's recompute.  Measured:
        # first8 compiled but RESOURCE_EXHAUSTED at runtime; first4 and
        # first2 OOM'd at compile — XLA's scheduling holds peak memory
        # well above the live-residual estimate, and full remat stays
        # the only fitting single-chip L/14 policy.  Kept in the grid so
        # reruns at other shapes see it.
        for remat in ("dots", "dots_all", "full", "first8", "first4",
                      "first2", "False"):
            for attn in ("pallas", "xla"):
                # L/14 fwd+bwd without remat needs 16.5G vs 15.75G HBM:
                # expected OOM — keep it as a trailing data point so its
                # leaked-HBM failure mode can't shadow feasible configs
                oomish = remat == "False" and "vitl14" in c
                grid.append((oomish, c, bsz, remat, attn, 1))
        # gradient accumulation (r4, the winner at L/14): no remat,
        # microbatched encode+loss — measured 176.8 img/s (accum=2,
        # pallas) vs full remat's 159.2; accum=2+XLA OOMs (XLA autodiff
        # saves larger attention residuals than the pallas custom-VJP)
        for accum in (2, 4):
            for attn in ("pallas", "xla"):
                grid.append((accum == 2 and attn == "xla", c, bsz,
                             "False", attn, accum))
    grid.sort(key=lambda g: g[0])

    for _, c, bsz, remat, attn, accum in grid:
        # one process per point; never killed (a timeout-kill mid-compile
        # wedges the chip) — a clean OOM exit is itself the data point
        subprocess.run([sys.executable, bench, c, f"--bsz={bsz}",
                        f"--remat={remat}", f"--attn={attn}",
                        f"--accum={accum}"])


if __name__ == "__main__":
    main()
