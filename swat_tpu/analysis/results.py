"""Result aggregation & baseline comparison.

The reference ships analysis scripts over result CSVs plus the paper's
hard-coded accuracy tables (reference plots_tables/fig2_domain_gap/
benchmark.py).  Here: parse the harness CSVs (scripts/*.sh output), average
over seeds, tabulate per dataset x shots, and diff against the published
SWAT numbers (BASELINE.md) to check the ±0.5% reproduction bar.

Usage:
    python -m swat_tpu.analysis.results --results_dir results/swat_vitb32_T2T500
"""

from __future__ import annotations

import argparse
import csv
import os
from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np

# SWAT (T2T500) paper accuracies, 4/8/16-shot (BASELINE.md, from the
# reference's plots_tables/fig2_domain_gap/benchmark.py:123-135)
SWAT_PAPER = {
    "semi-aves": (58.5, 61.3, 63.1),
    "flowers102": (90.6, 94.1, 96.4),
    "fgvc-aircraft": (55.7, 59.1, 62.4),
    "eurosat": (83.4, 88.7, 92.9),
    "dtd": (58.3, 62.6, 66.3),
    "oxford_pets": (91.3, 91.5, 91.6),
    "food101": (77.3, 77.6, 78.3),
    "stanford_cars": (81.1, 83.5, 85.4),
    "imagenet": (65.8, 66.6, 67.6),
}

ZEROSHOT_PAPER = {  # OpenCLIP ZS / REAL-Prompt (benchmark.py:29-53)
    "dtd": (53.5, 59.2), "eurosat": (51.1, 56.9),
    "fgvc-aircraft": (17.1, 18.0), "flowers102": (68.2, 76.0),
    "semi-aves": (8.4, 43.4), "oxford_pets": (88.7, 88.7),
    "food101": (77.2, 77.1), "stanford_cars": (79.2, 80.6),
    "imagenet": (63.0, 63.6),
}

SHOT_INDEX = {4: 0, 8: 1, 16: 2}


def read_results_csv(path: str) -> List[dict]:
    with open(path) as f:
        reader = csv.DictReader(f)
        return [row for row in reader if row.get("Dataset")]


def aggregate(rows: List[dict], acc_col: str = "Stage2LPAcc"
              ) -> Dict[Tuple[str, int], Tuple[float, float, int]]:
    """(dataset, shots) -> (mean, std, n) over seeds."""
    groups: Dict[Tuple[str, int], List[float]] = defaultdict(list)
    for row in rows:
        try:
            acc = float(row[acc_col])
            shots = int(row["Shots"])
        except (KeyError, ValueError):
            continue
        if acc < 0:
            continue
        groups[(row["Dataset"], shots)].append(acc)
    return {k: (float(np.mean(v)), float(np.std(v)), len(v))
            for k, v in groups.items()}


def compare_to_paper(agg, tolerance: float = 0.5) -> List[str]:
    lines = ["dataset        shots  ours(mean±std)  paper   delta  within±0.5"]
    deltas = []
    for (ds, shots), (mean, std, n) in sorted(agg.items()):
        paper = None
        if ds in SWAT_PAPER and shots in SHOT_INDEX:
            paper = SWAT_PAPER[ds][SHOT_INDEX[shots]]
        if paper is None:
            lines.append(f"{ds:14s} {shots:5d}  {mean:5.1f}±{std:4.1f}"
                         f" (n={n})   --")
            continue
        delta = mean - paper
        deltas.append(delta)
        ok = "yes" if abs(delta) <= tolerance else "NO"
        lines.append(f"{ds:14s} {shots:5d}  {mean:5.1f}±{std:4.1f} (n={n})"
                     f"  {paper:5.1f}  {delta:+5.1f}  {ok}")
    if deltas:
        lines.append(f"mean delta: {np.mean(deltas):+.2f} over "
                     f"{len(deltas)} cells")
    return lines


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--results_dir", required=True)
    p.add_argument("--acc_col", default="Stage2LPAcc",
                   help="Stage1Acc | WSFTAcc | Stage2LPAcc | Stage2FSFTAcc")
    p.add_argument("--tolerance", type=float, default=0.5)
    args = p.parse_args(argv)

    rows: List[dict] = []
    for fn in sorted(os.listdir(args.results_dir)):
        if fn.endswith(".csv"):
            rows.extend(read_results_csv(os.path.join(args.results_dir, fn)))
    agg = aggregate(rows, args.acc_col)
    for line in compare_to_paper(agg, args.tolerance):
        print(line)


if __name__ == "__main__":
    main()
