"""Analysis figures & tables over run outputs (reference plots_tables/).

Ports the *capabilities* of the reference's paper-artifact scripts so the
same analyses run against this framework's outputs:

  head_tail_accuracy / stagewise_head_tail_row
      table3_stagewise_head_tail/get_head_tail_acc.py:173-196 — classes
      sorted by retrieved-image count, head = top 90%, tail = bottom 10%,
      accuracies from the per-class recall in stage score JSONs.
  head_weight_norms / plot_weight_norms
      same script's plot_norm (:8-38): per-class classifier-row norms
      before/after stage-2 probing, sorted by training count.
  plot_loss_curves
      fig4_no_overfit/plot_loss.py — Train_loss + Test_acc twin-axis plot
      from a run's loss.csv.
  retrieved_distribution / plot_retrieved_distribution
      fig3_imbalanced_distribution — per-class retrieved-count histogram.
  collect_stage_accs
      table4_ablate_SWAT/get_dataset_accuracy.py — walk output dirs and
      tabulate stage-1/2/3 test accuracies per dataset.

All plotting is optional (matplotlib imported lazily, Agg backend); every
function also returns the underlying arrays so tests and notebooks can
consume the numbers directly.
"""

from __future__ import annotations

import csv
import glob
import json
import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np


def _plt():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def class_counts_from_split(split_path: str) -> Dict[str, int]:
    """'path label is_fewshot' lines -> {class_id: count} (reference
    get_head_tail_acc.py:94-103)."""
    counts: Dict[str, int] = defaultdict(int)
    with open(split_path) as f:
        for line in f:
            toks = line.split()
            if len(toks) >= 2:
                counts[toks[-2]] += 1
    return dict(counts)


def head_tail_accuracy(scores: dict, counts: Dict[str, int],
                       head_frac: float = 0.9) -> Dict[str, float]:
    """Head/tail/overall accuracy from a stage scores dict
    (eval.metrics.calculate_scores output) + per-class counts.

    Classes sorted by count descending; head = first 90% (reference
    :173-194). Returns percentages."""
    recall = scores["per_class_recall"]
    num_classes = len(recall)
    order = sorted(range(num_classes),
                   key=lambda c: counts.get(str(c), 0), reverse=True)
    accs = [recall[str(c)] if str(c) in recall else recall[c]
            for c in order]
    head_len = int(head_frac * num_classes)
    head = accs[:head_len]
    tail = accs[head_len:]
    return {
        "head_acc": float(np.mean(head) * 100) if head else 0.0,
        "tail_acc": float(np.mean(tail) * 100) if tail else 0.0,
        "overall_acc": float(scores["acc"] * 100),
    }


def stagewise_head_tail_row(output_dir: str, counts: Dict[str, int],
                            head_frac: float = 0.9) -> Dict[str, float]:
    """One table-3 row for a run dir holding stage{1,2}_test_scores.json."""
    row: Dict[str, float] = {}
    for stage in (1, 2):
        path = os.path.join(output_dir, f"stage{stage}_test_scores.json")
        with open(path) as f:
            scores = json.load(f)
        ht = head_tail_accuracy(scores, counts, head_frac)
        for k, v in ht.items():
            row[f"stage{stage}_{k}"] = round(v, 1)
    return row


def head_weight_norms(head: np.ndarray,
                      counts: Optional[Dict[str, int]] = None
                      ) -> np.ndarray:
    """Per-class row norms of a classifier head [C, D]; when ``counts`` is
    given, returned in decreasing-training-count order (plot_norm's x
    axis)."""
    norms = np.linalg.norm(np.asarray(head), axis=-1)
    if counts is None:
        return norms
    order = sorted(range(norms.shape[0]),
                   key=lambda c: counts.get(str(c), 0), reverse=True)
    return norms[order]


def plot_weight_norms(norms_before: np.ndarray, norms_after: np.ndarray,
                      dataset: str, out_png: str):
    """plot_norm equivalent (get_head_tail_acc.py:8-38)."""
    plt = _plt()
    plt.figure(figsize=(10, 5))
    plt.plot(norms_before, alpha=0.8, label="Before probing", linewidth=2)
    plt.plot(norms_after, alpha=0.8, label="After probing", linewidth=2)
    plt.xlabel("Classes sorted by decreasing number of training images")
    plt.ylabel("Norm")
    plt.legend()
    plt.title(f"Norm of per-class weights of learned classifier - {dataset}")
    plt.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    plt.savefig(out_png, dpi=150)
    plt.close()


def read_loss_csv(loss_csv: str) -> Dict[str, np.ndarray]:
    """loss.csv -> column arrays (Epoch, Iter, Train_loss, Val_loss,
    Val_acc, Test_acc)."""
    cols: Dict[str, List[float]] = defaultdict(list)
    with open(loss_csv) as f:
        for row in csv.DictReader(f):
            for k, v in row.items():
                cols[k].append(float(v))
    return {k: np.asarray(v) for k, v in cols.items()}


def plot_loss_curves(loss_csv: str, out_png: Optional[str] = None
                     ) -> Dict[str, np.ndarray]:
    """Train-loss + test-acc twin-axis plot (fig4 plot_loss.py)."""
    cols = read_loss_csv(loss_csv)
    if out_png:
        plt = _plt()
        fig, ax1 = plt.subplots()
        ax1.set_xlabel("Epoch")
        ax1.set_ylabel("Train Loss", color="tab:blue")
        ax1.plot(cols["Train_loss"], color="tab:blue")
        ax2 = ax1.twinx()
        ax2.set_ylabel("Test acc", color="tab:red")
        ax2.plot(cols["Test_acc"], color="tab:red")
        fig.tight_layout()
        os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
        fig.savefig(out_png, dpi=150)
        plt.close(fig)
    return cols


def retrieved_distribution(split_path: str, num_classes: int
                           ) -> np.ndarray:
    """Per-class retrieved-count vector, sorted descending
    (fig3_imbalanced_distribution)."""
    counts = class_counts_from_split(split_path)
    vec = np.asarray([counts.get(str(c), 0) for c in range(num_classes)])
    return np.sort(vec)[::-1]


def plot_retrieved_distribution(split_path: str, num_classes: int,
                                out_png: str) -> np.ndarray:
    vec = retrieved_distribution(split_path, num_classes)
    plt = _plt()
    plt.figure(figsize=(8, 4))
    plt.bar(np.arange(vec.shape[0]), vec, width=1.0)
    plt.xlabel("Classes sorted by retrieved count")
    plt.ylabel("# retrieved images")
    plt.tight_layout()
    os.makedirs(os.path.dirname(out_png) or ".", exist_ok=True)
    plt.savefig(out_png, dpi=150)
    plt.close()
    return vec


def collect_stage_accs(output_root: str) -> List[Dict[str, object]]:
    """Walk run dirs under output_root (output_{dataset}/{case_name}/) and
    tabulate per-stage test accuracies from stage{N}_test_scores.json
    (table4_ablate_SWAT/get_dataset_accuracy.py equivalent)."""
    rows: List[Dict[str, object]] = []
    for scores_path in sorted(glob.glob(os.path.join(
            output_root, "**", "stage1_test_scores.json"), recursive=True)):
        run_dir = os.path.dirname(scores_path)
        row: Dict[str, object] = {"run": os.path.basename(run_dir)}
        for stage in (1, 2, 3):
            p = os.path.join(run_dir, f"stage{stage}_test_scores.json")
            if os.path.exists(p):
                with open(p) as f:
                    row[f"stage{stage}_acc"] = round(
                        json.load(f)["acc"] * 100, 1)
        rows.append(row)
    return rows


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="swat-tpu analysis figures")
    sub = p.add_subparsers(dest="cmd", required=True)

    ht = sub.add_parser("head-tail")
    ht.add_argument("--output_dir", required=True)
    ht.add_argument("--split", required=True,
                    help="retrieved split file for class counts")

    ls = sub.add_parser("loss-curve")
    ls.add_argument("--loss_csv", required=True)
    ls.add_argument("--out", required=True)

    dist = sub.add_parser("distribution")
    dist.add_argument("--split", required=True)
    dist.add_argument("--num_classes", type=int, required=True)
    dist.add_argument("--out", required=True)

    tab = sub.add_parser("stage-table")
    tab.add_argument("--output_root", required=True)

    args = p.parse_args(argv)
    if args.cmd == "head-tail":
        counts = class_counts_from_split(args.split)
        print(json.dumps(stagewise_head_tail_row(args.output_dir, counts)))
    elif args.cmd == "loss-curve":
        plot_loss_curves(args.loss_csv, args.out)
        print(f"Wrote {args.out}")
    elif args.cmd == "distribution":
        plot_retrieved_distribution(args.split, args.num_classes, args.out)
        print(f"Wrote {args.out}")
    elif args.cmd == "stage-table":
        for row in collect_stage_accs(args.output_root):
            print(json.dumps(row))


if __name__ == "__main__":
    main()
