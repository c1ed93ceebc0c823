"""The one-command reproduction runbook (cli/repro.py): preflight must
catch each missing-asset mode, the plan must print time estimates, and
the --execute chain must run configs end-to-end and emit the
reference-format results CSVs + the ±0.5% scoring table — all on
synthetic assets, so when real assets appear there is no code left to
write (VERDICT r5 item 6)."""

import io
import json
import os
from contextlib import redirect_stdout

import numpy as np
import pytest
import torch
from PIL import Image

from swat_tpu.cli import repro
from swat_tpu.data.registry import NUM_CLASSES_DICT
from swat_tpu.models.configs import CLIPConfig, MODEL_REGISTRY

from torch_oracle_lib import make_oracle_sd

DS = "semi-aves"          # must be a paper dataset so scoring engages
NUM_CLASSES = 3


@pytest.fixture(scope="module", autouse=True)
def register():
    from swat_tpu.models.configs import TextConfig, VisionConfig

    MODEL_REGISTRY["repro_tiny"] = CLIPConfig(
        name="repro-tiny",
        vision=VisionConfig(image_size=32, patch_size=8, width=64,
                            layers=2, heads=4, embed_dim=32,
                            quick_gelu=True),
        text=TextConfig(context_length=16, vocab_size=512, width=32,
                        layers=2, heads=4, embed_dim=32, quick_gelu=True))
    saved = NUM_CLASSES_DICT.get(DS)
    NUM_CLASSES_DICT[DS] = NUM_CLASSES
    yield
    MODEL_REGISTRY.pop("repro_tiny", None)
    NUM_CLASSES_DICT[DS] = saved


@pytest.fixture(scope="module")
def assets(tmp_path_factory):
    box = tmp_path_factory.mktemp("repro")
    root = box / "data" / DS
    os.makedirs(root / "imgs")
    sd = make_oracle_sd(seed=3, w=64, layers=2, embed=32, patch=8,
                        img=32, ctx=16, vocab=512, text_w=32,
                        text_layers=2)
    torch.save(sd, box / "ckpt.pt")

    rng = np.random.default_rng(0)
    colors = np.asarray([[220, 40, 40], [40, 220, 40], [40, 40, 220]])

    def split(name, n, fs, pre):
        lines = []
        for c in range(NUM_CLASSES):
            for i in range(n):
                fn = f"imgs/{pre}_{c}_{i}.jpg"
                arr = (colors[c] + rng.integers(-30, 30, (36, 40, 3))
                       ).clip(0, 255).astype(np.uint8)
                Image.fromarray(arr).save(root / fn)
                lines.append(f"{fn} {c} {fs}")
        (root / name).write_text("\n".join(lines) + "\n")

    split("fewshot4_seed1.txt", 4, 1, "fs")
    split("test.txt", 5, 0, "te")
    split("T2T30.txt", 6, 0, "rt")
    metrics = {str(c): {"name": f"c{c}",
                        "most_common_name": f"thing {c}",
                        "alternates": {}} for c in range(NUM_CLASSES)}
    (root / f"{DS}_metrics-LAION400M.json").write_text(
        json.dumps(metrics))
    return box


def _base_args(box, tmp_path, *extra):
    return ["--checkpoint", str(box / "ckpt.pt"),
            "--model_cfg", "repro_tiny",
            "--dataset_path", str(box / "data"),
            "--retrieved_path", str(box / "data"),
            "--retrieval_split", "T2T30.txt",
            "--datasets", DS, "--shots", "4", "--seeds", "1",
            "--allow_hash_tokenizer", "--bsz", "12",
            "--out", str(tmp_path / "results"), *extra]


def test_preflight_catches_missing_assets(assets, tmp_path):
    # missing checkpoint
    rc = repro.run(["--checkpoint", str(tmp_path / "nope.pt"),
                    "--model_cfg", "repro_tiny",
                    "--dataset_path", str(assets / "data"),
                    "--retrieved_path", str(assets / "data"),
                    "--datasets", DS, "--shots", "4", "--seeds", "1",
                    "--allow_hash_tokenizer", "--bsz", "12",
                    "--out", str(tmp_path / "r")])
    assert rc == 1
    # hash tokenizer refused for a real repro
    buf = io.StringIO()
    args = [a for a in _base_args(assets, tmp_path)
            if a != "--allow_hash_tokenizer"]
    with redirect_stdout(buf):
        rc = repro.run(args)
    assert rc == 1 and "hash fallback" in buf.getvalue()
    # missing fewshot split for an unavailable seed
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = repro.run(_base_args(assets, tmp_path, "--seeds", "2"))
    assert rc == 1 and "fewshot4_seed2.txt" in buf.getvalue()


def test_dry_run_prints_plan(assets, tmp_path):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = repro.run(_base_args(assets, tmp_path,
                                  "--configs", "zeroshot", "swat"))
    out = buf.getvalue()
    assert rc == 0
    assert "== plan ==" in out and "TOTAL ~" in out
    assert "dry run only" in out


def test_execute_chain_and_scoring(assets, tmp_path):
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = repro.run(_base_args(
            assets, tmp_path, "--configs", "zeroshot", "ft-fewshot",
            "--epochs_override", "1", "--execute"))
    out = buf.getvalue()
    assert rc == 0, out[-2000:]
    res = tmp_path / "results"
    zs = (res / f"zeroshot_{DS}.csv").read_text().strip().splitlines()
    assert zs[0] == repro.CSV_HEADER and len(zs) == 2
    ft = (res / f"ft-fewshot_{DS}.csv").read_text().strip().splitlines()
    assert len(ft) == 2
    # scoring table engaged against the published numbers
    assert "== score vs paper ==" in out
    assert "ft-fewshot" in out and DS in out