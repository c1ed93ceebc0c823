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


def test_persistent_feature_cache(pipeline):
    """Frozen-method feature extraction persists across runs and
    --recal_fea busts it (reference pre_extract_feature,
    utils/dataloader.py:35-104; VERDICT r2 item 7)."""
    import glob
    import time as _time

    best1 = _run(pipeline, method="probing", epochs=1)
    cache_dir = os.path.join(pipeline.cfg.dataset_root, "pre_extracted")
    files = sorted(glob.glob(os.path.join(cache_dir, "*.npz")))
    assert files, "no persistent feature cache written"
    mtimes = {f: os.path.getmtime(f) for f in files}

    _time.sleep(0.05)
    best2 = _run(pipeline, method="probing", epochs=1)
    assert best2.val_acc == pytest.approx(best1.val_acc, abs=1e-6)
    for f in files:  # untouched -> loaded from disk, not re-extracted
        assert os.path.getmtime(f) == mtimes[f]

    _time.sleep(0.05)
    _run(pipeline, method="probing", epochs=1, recal_fea=True)
    assert any(os.path.getmtime(f) != mtimes[f] for f in files), \
        "--recal_fea did not re-extract"


# ---------------------------------------------------------------------------
# method-semantics assertions (VERDICT r2 item 5): tie each method's
# DISTINCT behavior to its name, beyond "doesn't crash"


@pytest.mark.parametrize("method,source,epochs", [
    ("finetune", "fewshot", 3),
    ("cutmix", "fewshot", 3),
    ("mixup", "fewshot", 3),
    ("resizemix", "fewshot", 3),
    ("probing", "fewshot", 3),
    ("CMLP", "fewshot", 3),
    ("cutmix-fs", "fewshot+retrieved", 3),
    ("CMO", "fewshot+retrieved", 3),
])
def test_method_beats_chance(pipeline, method, source, epochs):
    """Color-separable 3-class data: every trainable method must beat
    chance (33.3%) after a few epochs — a renamed method or degenerate
    mixing op fails this."""
    best = _run(pipeline, method=method, data_source=source,
                epochs=epochs, bsz=4)
    assert best.val_acc > 40.0, (method, best.val_acc)


def test_fixmatch_mask_rate_engages(pipeline):
    """The pseudo-label confidence gate must actually open for confident
    predictions (reference mask_w semantics, utils/training.py:896-908):
    with an amplified head, weak-view confidences pass 0.95 and the
    consistency loss becomes nonzero."""
    import jax
    import jax.numpy as jnp

    from swat_tpu.train import steps as S
    from swat_tpu.train.state import create_train_state

    cfg = pipeline.cfg
    model = pipeline.model
    params = pipeline.params
    # amplify the head so softmax(logits) saturates past the threshold
    # (fresh param copies per state: the jitted step donates its input)
    head = pipeline.head * 2000.0
    copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
    state, tx = create_train_state(copy(params), head, "fixmatch",
                                   lr_classifier=1e-3, lr_backbone=1e-4,
                                   total_iter=4)
    step = S.make_fixmatch_step(
        model, tx, image_size=model.cfg.vision.image_size, aux=True)
    rng = np.random.default_rng(0)
    n, canvas = 4, 40
    batch = {
        "canvases": rng.integers(0, 255, (n, canvas, canvas, 3)
                                 ).astype(np.uint8),
        "valid_hw": np.full((n, 2), canvas, np.int32),
        "labels": rng.integers(0, NUM_CLASSES, n).astype(np.int32),
        "source": np.ones(n, np.int32),
        "canvases_u": rng.integers(0, 255, (n, canvas, canvas, 3)
                                   ).astype(np.uint8),
        "valid_hw_u": np.full((n, 2), canvas, np.int32),
    }
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, (loss, mask_rate, loss_u) = step(state, batch,
                                        jax.random.PRNGKey(0))
    assert float(mask_rate) > 0.0
    assert np.isfinite(float(loss))

    # consistency loss engages when the gate is open and predictions are
    # not fully saturated: threshold=0 opens every row at amp=1
    state1, _ = create_train_state(copy(params), pipeline.head,
                                   "fixmatch",
                                   lr_classifier=1e-3, lr_backbone=1e-4,
                                   total_iter=4)
    step0 = S.make_fixmatch_step(
        model, tx, threshold=0.0,
        image_size=model.cfg.vision.image_size, aux=True)
    _, (_, mask0, loss_u0) = step0(state1, batch, jax.random.PRNGKey(0))
    assert float(mask0) == 1.0
    assert float(loss_u0) > 0.0

    # and with an impossible threshold the gate must stay closed
    # (fresh state again: the jitted step donated the previous one)
    state2, _ = create_train_state(copy(params), head, "fixmatch",
                                   lr_classifier=1e-3, lr_backbone=1e-4,
                                   total_iter=4)
    step_hi = S.make_fixmatch_step(
        model, tx, threshold=2.0,
        image_size=model.cfg.vision.image_size, aux=True)
    _, (_, mask_hi, loss_u_hi) = step_hi(state2, batch,
                                         jax.random.PRNGKey(0))
    assert float(mask_hi) == 0.0 and float(loss_u_hi) == 0.0


def test_scan_methods_route_their_mix_op(pipeline, monkeypatch):
    """Each resident-scan method must trace ITS mixing kernel: 'cutmix'
    traces aug.cutmix, 'finetune' must not, 'mixup' traces aug.mixup
    (guards the method dispatch in scan_loop.make_scan_epoch)."""
    from swat_tpu.kernels import augment as aug_mod

    calls = []
    real_cutmix, real_mixup = aug_mod.cutmix, aug_mod.mixup

    def spy_cutmix(*a, **k):
        calls.append("cutmix")
        return real_cutmix(*a, **k)

    def spy_mixup(*a, **k):
        calls.append("mixup")
        return real_mixup(*a, **k)

    monkeypatch.setattr(aug_mod, "cutmix", spy_cutmix)
    monkeypatch.setattr(aug_mod, "mixup", spy_mixup)

    _run(pipeline, method="finetune", epochs=1)
    assert calls == []
    _run(pipeline, method="cutmix", epochs=1)
    assert "cutmix" in calls and "mixup" not in calls
    calls.clear()
    _run(pipeline, method="mixup", epochs=1)
    assert "mixup" in calls and "cutmix" not in calls
