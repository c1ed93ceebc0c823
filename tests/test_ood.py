"""OOD suite: folder-label schemes (wnid / numeric / subset) and the
4-dataset sweep wiring (reference testing.py:22-72,
utils/datasets/imagenet_1k.py)."""

import json
import logging
import os

import numpy as np
import pytest
from PIL import Image

from swat_tpu.data.splits import Sample
from swat_tpu.eval.ood import (
    folder_dataset_samples,
    ood_index_subset,
    test_imagenet_ood as run_imagenet_ood,
    validate_ood,
    wnid_to_index,
)

ASSET = os.path.join(os.path.dirname(__file__), "..", "swat_tpu", "eval",
                     "ood_indices.json")


def _mk_img(path):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(path)


def test_folder_samples_wnid(tmp_path):
    wmap = wnid_to_index()
    wnid = list(wmap)[7]
    _mk_img(str(tmp_path / wnid / "a.jpeg"))
    _mk_img(str(tmp_path / wnid / "b.jpeg"))
    samples = folder_dataset_samples(str(tmp_path), wmap)
    assert len(samples) == 2
    assert all(s.label == wmap[wnid] for s in samples)


def test_folder_samples_numeric(tmp_path):
    """ImageNet-V2 numeric class-index folders (reference
    imagenet_1k.py:82-84) must yield labels = int(folder)."""
    _mk_img(str(tmp_path / "0" / "x.jpeg"))
    _mk_img(str(tmp_path / "517" / "y.jpeg"))
    samples = folder_dataset_samples(str(tmp_path), None, numeric=True)
    assert sorted(s.label for s in samples) == [0, 517]
    # without numeric mode these folders are unlabeled
    assert folder_dataset_samples(str(tmp_path), wnid_to_index()) == []


def test_folder_samples_subset_mapping(tmp_path):
    """ImageNet-A wnid folders map to positions in the 200-class subset."""
    asset = json.load(open(ASSET))
    sub = ood_index_subset("imagenet_adv")
    wmap = wnid_to_index()
    inv = {idx: pos for pos, idx in enumerate(sub)}
    label_map = {w: inv[j] for w, j in wmap.items() if j in inv}
    wnid = asset["all_wnids"][sub[3]]  # 4th subset class
    _mk_img(str(tmp_path / wnid / "a.jpeg"))
    samples = folder_dataset_samples(str(tmp_path), label_map)
    assert len(samples) == 1 and samples[0].label == 3


class _Loader:
    """Minimal loader yielding one batch per call with precomputed feats."""

    def __init__(self, samples, num_classes):
        self.samples = samples
        self.num_classes = num_classes

    def __iter__(self):
        n = len(self.samples)
        labels = np.asarray([s.label for s in self.samples], np.int32)
        yield {
            "images": labels,  # smuggle labels to the fake encoder
            "labels": labels,
            "mask": np.ones(n, bool),
        }


def test_validate_ood_masking():
    """A/R: logits restricted to subset columns; labels are subset
    positions (reference validate_simple, testing.py:388-389)."""
    num_classes = 10
    sub = [2, 5, 7]

    class Ev:
        def _encode(self, params, labels):
            return np.eye(num_classes, dtype=np.float32)[
                np.asarray([sub[l] for l in labels])]

    samples = [Sample("x", i, 0) for i in [0, 1, 2, 2]]
    head = np.eye(num_classes, dtype=np.float32)
    acc = validate_ood(Ev(), None, head, None,
                       _Loader(samples, num_classes), indices_in_1k=sub)
    assert acc == 100.0
    # without masking, predictions land on full-1000 indices -> all wrong
    acc_unmasked = validate_ood(Ev(), None, head, None,
                                _Loader(samples, num_classes))
    assert acc_unmasked == 0.0


def test_imagenet_ood_sweep(tmp_path, caplog):
    """End-to-end sweep over synthetic v2 (numeric) + adv (wnid) trees:
    both datasets produce nonzero sample counts and an accuracy."""
    asset = json.load(open(ASSET))
    sub = asset["indices_in_1k_adv"]
    # v2: numeric folders
    _mk_img(str(tmp_path / "imagenet_v2" / "3" / "a.jpeg"))
    _mk_img(str(tmp_path / "imagenet_v2" / "9" / "b.jpeg"))
    # adv: wnid folders under imagenet_adv/imagenet-a
    wnid = asset["all_wnids"][sub[0]]
    _mk_img(str(tmp_path / "imagenet_adv" / "imagenet-a" / wnid / "c.jpeg"))

    class Ev:
        def _encode(self, params, full_1k_labels):
            return np.eye(1000, dtype=np.float32)[np.asarray(full_1k_labels)]

    def make_loader(samples):
        is_adv = any("imagenet_adv" in s.path for s in samples)

        class L:
            def __iter__(self_inner):
                labels = np.asarray([s.label for s in samples], np.int32)
                # the fake encoder wants full-1k indices; adv labels are
                # subset positions, so map them back through `sub`
                full = np.asarray([sub[l] for l in labels]) if is_adv \
                    else labels
                yield {"images": full, "labels": labels,
                       "mask": np.ones(len(samples), bool)}

        return L()

    logger = logging.getLogger("test_ood")
    head = np.eye(1000, dtype=np.float32)
    accs = run_imagenet_ood(Ev(), None, head, None, str(tmp_path),
                             make_loader, logger)
    assert set(accs) == {"imagenet_v2", "imagenet_adv"}
    assert accs["imagenet_v2"] == 100.0
    assert accs["imagenet_adv"] == 100.0


def test_validate_multitask_dual_heads():
    """Dual-head scoring: class head vs labels, dataset head vs source
    (reference validate_multitask, testing.py:189-278)."""
    import jax.numpy as jnp

    from swat_tpu.data.splits import Sample
    from swat_tpu.eval.validate import validate_multitask

    num_classes, dim = 4, 6
    rng_l = np.random.default_rng(0)
    n = 8
    labels = rng_l.integers(0, num_classes, n)
    source = rng_l.integers(0, 2, n)
    # features one-hot encode (label, source) jointly
    feats = np.zeros((n, dim), np.float32)
    feats[np.arange(n), labels] = 1.0
    feats[np.arange(n), 4 + source] = 0.5

    class Ev:
        def _encode(self, params, idx):
            return jnp.asarray(feats[np.asarray(idx)])

    class Loader:
        def __iter__(self):
            yield {"images": np.arange(n), "labels": labels,
                   "source": source, "mask": np.ones(n, bool)}

    cls_head = np.eye(num_classes, dim, dtype=np.float32)      # picks labels
    ds_head = np.zeros((2, dim), np.float32)
    ds_head[0, 4] = 1.0
    ds_head[1, 5] = 1.0                                        # picks source
    acc, loss, cm, d_acc, dcm = validate_multitask(
        Ev(), None, cls_head, ds_head, 0.0, Loader())
    assert acc == 100.0 and d_acc == 100.0
    assert cm.sum() == n and dcm.sum() == n
    assert np.isfinite(loss)
