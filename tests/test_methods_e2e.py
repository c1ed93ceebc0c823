"""Method-level e2e: every remaining training method runs through
SwatPipeline.train_method on the synthetic dataset (finite losses, correct
frozen/trainable behavior, sane accuracies)."""

import dataclasses
import json
import os

import numpy as np
import pytest
from PIL import Image

from swat_tpu.core.config import RunConfig
from swat_tpu.data.prompts import TEMPLATES
from swat_tpu.data.registry import NUM_CLASSES_DICT

DATASET = "test3m"
NUM_CLASSES = 3


@pytest.fixture(scope="module", autouse=True)
def register_dataset():
    NUM_CLASSES_DICT[DATASET] = NUM_CLASSES
    TEMPLATES[DATASET] = ["a photo of a {}."]
    yield
    NUM_CLASSES_DICT.pop(DATASET, None)
    TEMPLATES.pop(DATASET, None)


@pytest.fixture(scope="module")
def dataset_dir(tmp_path_factory):
    rng = np.random.default_rng(0)
    base = tmp_path_factory.mktemp("data")
    root = base / DATASET
    os.makedirs(root / "imgs")
    colors = np.asarray([[220, 40, 40], [40, 220, 40], [40, 40, 220]])

    def write_split(name, n_per_class, fewshot, prefix):
        lines = []
        for c in range(NUM_CLASSES):
            for i in range(n_per_class):
                fname = f"imgs/{prefix}_{c}_{i}.jpg"
                arr = (colors[c] + rng.integers(-30, 30, (40, 48, 3))
                       ).clip(0, 255).astype(np.uint8)
                Image.fromarray(arr).save(root / fname)
                lines.append(f"{fname} {c} {fewshot}")
        with open(root / name, "w") as f:
            f.write("\n".join(lines) + "\n")

    write_split("fewshot4_seed1.txt", 4, 1, "fs")
    write_split("test.txt", 4, 0, "te")
    write_split("T2T8.txt", 8, 0, "rt")
    write_split("u_train_in_oracle.txt", 6, 0, "ul")
    metrics = {str(c): {"name": f"class{c}",
                        "most_common_name": ["red", "green", "blue"][c]}
               for c in range(NUM_CLASSES)}
    with open(root / f"{DATASET}_metrics-LAION400M.json", "w") as f:
        json.dump(metrics, f)
    return str(base)


@pytest.fixture(scope="module")
def pipeline(dataset_dir, tmp_path_factory):
    from swat_tpu.train.stages import SwatPipeline

    out = tmp_path_factory.mktemp("out")
    cfg = RunConfig(
        dataset=DATASET, model_cfg="test_tiny", shots=4, seed=1,
        dataset_path=dataset_dir, retrieved_path=dataset_dir,
        folder=str(out), bsz=4, num_workers=4, epochs=2,
        retrieval_split="T2T8.txt", mesh_data=1, lr_classifier=1e-2,
        lr_backbone=1e-3, method="finetune").derived()
    return SwatPipeline(cfg)


def _run(pipeline, **overrides):
    cfg = dataclasses.replace(pipeline.cfg, **overrides).derived()
    state, best = pipeline.train_method(cfg, pipeline.params, pipeline.head)
    assert best.val_acc >= 0
    return best


def test_cmlp(pipeline):
    best = _run(pipeline, method="CMLP", epochs=2)
    assert 0 <= best.val_acc <= 100.001


def test_finetune_mixed(pipeline):
    best = _run(pipeline, method="finetune-mixed",
                data_source="fewshot+retrieved", epochs=1, bsz=8)
    assert 0 <= best.val_acc <= 100.001


def test_mixup_fs(pipeline):
    best = _run(pipeline, method="mixup-fs",
                data_source="fewshot+retrieved", epochs=1, bsz=4,
                fewshot_ratio=1.0)
    assert 0 <= best.val_acc <= 100.001


def test_cutmix_fs(pipeline):
    best = _run(pipeline, method="cutmix-fs",
                data_source="fewshot+retrieved", epochs=1, bsz=4)
    assert 0 <= best.val_acc <= 100.001


def test_cmo(pipeline):
    best = _run(pipeline, method="CMO",
                data_source="fewshot+retrieved", epochs=1)
    assert 0 <= best.val_acc <= 100.001


def test_resizemix_and_saliencymix(pipeline):
    for method in ("resizemix", "saliencymix"):
        best = _run(pipeline, method=method, epochs=1)
        assert 0 <= best.val_acc <= 100.001, method


def test_attentivemix(pipeline):
    best = _run(pipeline, method="attentivemix", epochs=1)
    assert 0 <= best.val_acc <= 100.001


def test_flyp(pipeline):
    best = _run(pipeline, method="FLYP", epochs=2)
    # FLYP's best head is rebuilt from the text tower each epoch
    assert best.trainable["head"].shape == (NUM_CLASSES, 32)


def test_fixmatch(pipeline):
    best = _run(pipeline, method="fixmatch", epochs=1, mu=1)
    assert 0 <= best.val_acc <= 100.001


def test_multitask(pipeline):
    best = _run(pipeline, method="finetune-multitask",
                data_source="fewshot+retrieved", epochs=1)
    assert isinstance(best.trainable["head"], dict)
    assert best.trainable["head"]["dataset"].shape[0] == 2


def test_dataset_cls(pipeline):
    best = _run(pipeline, method="dataset-cls",
                data_source="fewshot+retrieved", epochs=1)
    assert 0 <= best.val_acc <= 100.001


def test_mixup_fs_default_ratio(pipeline):
    """mixup-fs must run at the default fewshot_ratio=0.5: its lambda is
    always 0 or 1 (batch selection), so the twin matches the primary
    batch size regardless of the ratio (review fix)."""
    best = _run(pipeline, method="mixup-fs",
                data_source="fewshot+retrieved", epochs=1, bsz=4,
                fewshot_ratio=0.5)
    assert 0 <= best.val_acc <= 100.001


def test_weighted_ce_probing_uses_real_source(pipeline):
    """Pre-extracted probing with WeightedCE gets real fewshot/retrieved
    source flags (FeatureBatches no longer hardcodes -1, which zeroed
    every weight at fewshot_weight=2)."""
    best = _run(pipeline, method="probing",
                data_source="fewshot+retrieved", epochs=2,
                loss_name="WeightedCE", fewshot_weight=2.0,
                lr_classifier=1e-2)
    # with the old -1 source flags every weight was 2-fw = 0 -> no
    # learning signal at all; now training must move the head
    assert best.val_acc > 0.0
