"""Mined-pool plumbing: img2dataset restructure -> caption map -> mined
feature extraction (reference laion_downloader.py:198-234,
process_meta_map.py:5-47, extract_mined_feature.py:103-280).

These stages were previously covered only 'behaviorally' (PARITY.md);
here the full download->extract chain runs on a synthetic dump with the
tiny model.
"""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.tokenizer import get_tokenizer
from swat_tpu.retrieval.downloader import restructure_download
from swat_tpu.retrieval.mined import (
    build_caption_map,
    extract_mined_features,
    find_mined_images,
    load_mined_features,
    lookup_caption,
    save_mined_features,
)

CFG = get_model_config("test_tiny")


def _write_dump(flat_dir, entries):
    """entries: list of (shard, key, status, caption, with_jpg)."""
    for shard, key, status, caption, with_jpg in entries:
        sd = os.path.join(flat_dir, shard)
        os.makedirs(sd, exist_ok=True)
        with open(os.path.join(sd, f"{key}.json"), "w") as f:
            json.dump({"key": key, "status": status, "caption": caption}, f)
        if with_jpg:
            arr = np.full((8, 8, 3), int(key[-2:]) * 2, np.uint8)
            Image.fromarray(arr).save(os.path.join(sd, f"{key}.jpg"))


def test_restructure_download_and_caption_map(tmp_path):
    flat = str(tmp_path / "flat")
    out = str(tmp_path / "byclass")
    _write_dump(flat, [
        ("00000", "000000010", "success", "a red bird", True),
        ("00000", "000000011", "failed_to_download", "dead", True),
        ("00000", "000000012", "success", "missing img", False),
        ("00001", "000000020", "success", "a blue car", True),
        ("00001", "000000021", "success", "unknown key", True),
    ])
    key_to_class = {"000000010": 3, "000000020": 3, "000000012": 3}
    cmap = restructure_download(flat, out, key_to_class)

    # only success + known-key + jpg-present survive; sequential ids
    assert sorted(os.listdir(os.path.join(out, "3"))) == ["0.jpg", "1.jpg"]
    assert cmap == {"3": {"0": "a red bird", "1": "a blue car"}}

    samples = find_mined_images(out)
    assert [(s.label, os.path.basename(s.path)) for s in samples] == [
        (3, "0.jpg"), (3, "1.jpg")]
    assert lookup_caption(cmap, samples[0].path) == "a red bird"
    assert lookup_caption(cmap, "/x/9/7.jpg") is None


def test_build_caption_map_both_entry_forms():
    meta = {"0": {"0": {"caption": "dict form"}, "1": "plain form"},
            2: {"5": "int class key"}}
    cmap = build_caption_map(meta)
    assert cmap == {"0": {"0": "dict form", "1": "plain form"},
                    "2": {"5": "int class key"}}


def test_extract_mined_features_end_to_end(tmp_path):
    """The extract stage of the retrieval pipeline (reference
    extract_mined_feats_batch): encodes every downloaded image AND its
    caption, returns the bundle the sample CLI consumes."""
    rng = np.random.default_rng(0)
    root = tmp_path / "mined"
    for cls in (0, 1):
        os.makedirs(root / str(cls))
        for i in range(3):
            arr = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / str(cls) / f"{i}.jpg")
    samples = find_mined_images(str(root))
    assert len(samples) == 6

    cmap = {str(c): {str(i): f"caption {c}" for i in range(3)}
            for c in (0, 1)}
    model = CLIPModel(CFG)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, CFG.vision.image_size, CFG.vision.image_size, 3),
                 np.float32),
        np.zeros((1, CFG.text.context_length), np.int32))["params"]

    feats = extract_mined_features(
        model, params, samples, cmap, get_tokenizer(), batch_size=4,
        num_workers=2, image_size=CFG.vision.image_size)

    assert feats["image_features"].shape == (6, CFG.embed_dim)
    assert feats["caption_features"].shape == (6, CFG.embed_dim)
    np.testing.assert_array_equal(feats["labels"], [0, 0, 0, 1, 1, 1])
    assert list(feats["captions"][:3]) == ["caption 0"] * 3
    # features are L2-normalized
    np.testing.assert_allclose(
        np.linalg.norm(feats["image_features"], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(feats["caption_features"], axis=-1), 1.0, atol=1e-5)
    # same caption text -> identical caption features
    np.testing.assert_array_equal(feats["caption_features"][0],
                                  feats["caption_features"][1])
    # the npz round trip feeding the sample CLI keeps every key
    p = str(tmp_path / "mined.npz")
    save_mined_features(p, feats)
    back = load_mined_features(p)
    assert set(back) == {"image_features", "caption_features", "labels",
                         "file_paths", "captions"}
    np.testing.assert_array_equal(back["image_features"],
                                  feats["image_features"])

    # int8 bulk-inference path (retrieval cli extract --quantize int8):
    # same bundle shapes, features near the fp32 ones
    from swat_tpu.models.quant import quantize_tree

    qfeats = extract_mined_features(
        model, quantize_tree(params), samples, cmap, get_tokenizer(),
        batch_size=4, num_workers=2, image_size=CFG.vision.image_size)
    assert qfeats["image_features"].shape == (6, CFG.embed_dim)
    cos = np.sum(qfeats["image_features"] * feats["image_features"], -1)
    assert cos.min() > 0.99, cos


def test_extract_cli_quantize_int8(tmp_path):
    """The `retrieval extract --quantize int8` argv surface: quantizes
    the tree host-side before the single device_put, then runs the same
    bundle pipeline (covers the CLI wiring around cmd_extract, not just
    extract_mined_features)."""
    from swat_tpu.retrieval.cli import main as retrieval_main

    rng = np.random.default_rng(1)
    root = tmp_path / "mined"
    for cls in (0, 1):
        os.makedirs(root / str(cls))
        for i in range(2):
            arr = rng.integers(0, 255, (40, 40, 3)).astype(np.uint8)
            Image.fromarray(arr).save(root / str(cls) / f"{i}.jpg")
    cmap_path = tmp_path / "cmap.json"
    with open(cmap_path, "w") as f:
        json.dump({str(c): {str(i): f"cap {c}" for i in range(2)}
                   for c in (0, 1)}, f)

    out = tmp_path / "mined_q.npz"
    retrieval_main([
        "extract", "--mined_dir", str(root), "--caption_map",
        str(cmap_path), "--output", str(out), "--model_cfg", "test_tiny",
        "--bsz", "4", "--mesh_data", "1", "--quantize", "int8"])

    from swat_tpu.retrieval.mined import load_mined_features

    feats = load_mined_features(str(out))
    assert feats["image_features"].shape == (4, CFG.embed_dim)
    np.testing.assert_allclose(
        np.linalg.norm(feats["image_features"], axis=-1), 1.0, atol=1e-5)
    np.testing.assert_array_equal(feats["labels"], [0, 0, 1, 1])
