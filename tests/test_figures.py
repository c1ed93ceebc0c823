"""Analysis figures/tables (swat_tpu/analysis/figures.py vs the reference
plots_tables scripts)."""

import json
import os

import pytest

import numpy as np

from swat_tpu.analysis.figures import (
    class_counts_from_split,
    collect_stage_accs,
    head_tail_accuracy,
    head_weight_norms,
    plot_loss_curves,
    plot_retrieved_distribution,
    plot_weight_norms,
    retrieved_distribution,
    stagewise_head_tail_row,
)


def _scores(per_class_recall, acc):
    return {"acc": acc,
            "per_class_recall": {str(i): r
                                 for i, r in enumerate(per_class_recall)}}


def test_head_tail_split_semantics(tmp_path):
    """Head = top 90% classes by retrieved count, tail = rest (reference
    get_head_tail_acc.py:183-194)."""
    # 10 classes: class 9 has the fewest retrieved images -> tail
    counts = {str(c): 100 - c for c in range(10)}
    recall = [1.0] * 9 + [0.0]  # tail class has recall 0
    ht = head_tail_accuracy(_scores(recall, acc=0.9), counts)
    assert ht["head_acc"] == 100.0
    assert ht["tail_acc"] == 0.0
    assert ht["overall_acc"] == 90.0


def test_class_counts_and_distribution(tmp_path):
    p = tmp_path / "T2T.txt"
    p.write_text("a.jpg 0 0\nb.jpg 0 0\nc.jpg 1 0\nd.jpg 2 0\ne.jpg 2 0\n"
                 "f.jpg 2 0\n")
    counts = class_counts_from_split(str(p))
    assert counts == {"0": 2, "1": 1, "2": 3}
    vec = retrieved_distribution(str(p), 4)
    assert vec.tolist() == [3, 2, 1, 0]
    out = str(tmp_path / "dist.png")
    plot_retrieved_distribution(str(p), 4, out)
    assert os.path.getsize(out) > 0


def test_stagewise_row_and_table(tmp_path):
    run = tmp_path / "output_x" / "case"
    os.makedirs(run)
    json.dump(_scores([0.5, 1.0], 0.75),
              open(run / "stage1_test_scores.json", "w"))
    json.dump(_scores([1.0, 1.0], 1.0),
              open(run / "stage2_test_scores.json", "w"))
    counts = {"0": 5, "1": 1}
    row = stagewise_head_tail_row(str(run), counts)
    assert row["stage1_head_acc"] == 50.0  # head = class 0 (90% of 2 -> 1)
    assert row["stage1_tail_acc"] == 100.0
    assert row["stage2_overall_acc"] == 100.0

    rows = collect_stage_accs(str(tmp_path))
    assert rows == [{"run": "case", "stage1_acc": 75.0,
                     "stage2_acc": 100.0}]


def test_loss_curves_and_norm_plot(tmp_path):
    csv_path = tmp_path / "loss.csv"
    csv_path.write_text(
        "Epoch,Iter,Train_loss,Val_loss,Val_acc,Test_acc\n"
        "1,10,2.0,1.9,40.0,41.0\n2,20,1.5,1.6,50.0,52.0\n")
    out = str(tmp_path / "loss.png")
    cols = plot_loss_curves(str(csv_path), out)
    assert cols["Train_loss"].tolist() == [2.0, 1.5]
    assert os.path.getsize(out) > 0

    head = np.asarray([[3.0, 4.0], [1.0, 0.0]])  # norms 5, 1
    norms = head_weight_norms(head)
    np.testing.assert_allclose(norms, [5.0, 1.0])
    # sorted by descending count: class 1 has more data -> first
    sorted_norms = head_weight_norms(head, {"0": 1, "1": 9})
    np.testing.assert_allclose(sorted_norms, [1.0, 5.0])
    out2 = str(tmp_path / "norms.png")
    plot_weight_norms(norms, norms, "test", out2)
    assert os.path.getsize(out2) > 0


def test_ablation_curve_and_sweep(tmp_path):
    from swat_tpu.analysis.figures import (
        collect_sweep_accs,
        plot_ablation_curve,
    )

    dirs = {}
    for x, acc in [(10, 0.61), (50, 0.631), (90, 0.60)]:
        d = tmp_path / f"sweep{x}"
        d.mkdir()
        (d / "stage2_test_scores.json").write_text(
            json.dumps({"acc": acc}))
        dirs[x] = str(d)
    xs, ys = collect_sweep_accs(dirs, stage=2)
    assert xs == [10, 50, 90]
    assert ys == pytest.approx([61.0, 63.1, 60.0])
    out = tmp_path / "curve.png"
    plot_ablation_curve(xs, {"Aves": ys}, vline=50, vline_label="SWAT",
                        xlabel="Stage 1 training epochs",
                        out_png=str(out))
    assert out.exists() and out.stat().st_size > 0


def test_imbalance_and_retraining_and_domain_gap(tmp_path):
    from swat_tpu.analysis.figures import (
        plot_domain_gap,
        plot_retraining_curves,
        plot_sorted_retrieved_counts,
    )

    counts = {"Semi-Aves": {str(c): (c + 1) * 10 for c in range(20)},
              "DTD": {str(c): 500 - c for c in range(47)}}
    out = tmp_path / "imb.png"
    data = plot_sorted_retrieved_counts(counts, str(out))
    assert out.exists()
    assert data["Semi-Aves"][0] == 200  # sorted descending

    csvs = {}
    for seed in (1, 2):
        p = tmp_path / f"loss{seed}.csv"
        rows = ["Epoch,Iter,Train_loss,Val_loss,Val_acc,Test_acc"] + [
            f"{e},{e*10},{1.0/(e+1)},{1.0/(e+1)},{50+e},{49+e+seed}"
            for e in range(5)]
        p.write_text("\n".join(rows) + "\n")
        csvs.setdefault("Aves", []).append(str(p))
    out2 = tmp_path / "retrain.png"
    curves = plot_retraining_curves(csvs, out_png=str(out2))
    assert out2.exists()
    mean, std = curves["Aves"]
    assert mean.shape == (5,) and std[0] == pytest.approx(0.5)

    out3 = tmp_path / "gap.png"
    ds = plot_domain_gap({"zeroshot": {"semi-aves": 54.9},
                          "SWAT": {"semi-aves": 63.1, "dtd": 68.0}},
                         str(out3))
    assert out3.exists() and ds == ["dtd", "semi-aves"]


def test_ablate_table(tmp_path):
    from swat_tpu.analysis.figures import ablate_table

    p = tmp_path / "results.csv"
    hdr = ("Dataset,Method,Model,Shots,Seed,Stage2LPAcc\n")
    rows = [
        "semi-aves,SWAT,vitb32,4,1,58.0",
        "semi-aves,SWAT,vitb32,4,2,59.0",
        "dtd,SWAT,vitb32,4,1,66.0",
    ]
    p.write_text(hdr + "\n".join(rows) + "\n")
    tab = ablate_table({"T2T500": str(p)})
    assert tab[0]["config"] == "T2T500"
    assert tab[0]["semi-aves@4"] == 58.5
    assert tab[0]["dtd@4"] == 66.0
    assert tab[0]["mean"] == pytest.approx(62.2, abs=0.1)


def test_match_vs_download(tmp_path):
    """retrieval_analysis.ipynb port: join + sort + log-y curve, both
    class_frequency JSON formats (reference nested / repo flat)."""
    from swat_tpu.analysis.figures import (match_vs_download_counts,
                                           plot_match_vs_download,
                                           read_download_counts)

    nested = {"0": {"name": "a", "actual_freq": 10},
              "1": {"name": "b", "actual_freq": 300},
              "2": {"name": "c", "actual_freq": 40}}
    flat = {"0": 10, "1": 300, "2": 40}
    dl = tmp_path / "download_ct.txt"
    dl.write_text("class 0 ct 7\nclass 1 ct 250\nclass 2 ct 40\n")
    counts = read_download_counts(str(dl))
    assert counts == {0: 7, 1: 250, 2: 40}

    j1 = match_vs_download_counts(nested, counts)
    j2 = match_vs_download_counts(flat, counts)
    assert j1 == j2
    assert list(j1) == [1, 2, 0]  # sorted by match_ct desc
    assert j1[1] == {"match_ct": 300, "download_ct": 250}

    out = tmp_path / "match.png"
    arr = plot_match_vs_download(flat, counts, str(out))
    assert out.exists()
    assert arr.shape == (2, 3) and arr[0].tolist() == [300, 40, 10]
