"""Native C++ image loader vs the PIL reference path
(swat_tpu/data/native/decoder.cpp vs data/transforms.py)."""

import os

import numpy as np
import pytest
from PIL import Image

from swat_tpu.data import native
from swat_tpu.data.transforms import eval_preprocess, load_image, train_canvas

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native decoder unavailable")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(96, 128), (300, 200), (50, 50),
                                (37, 411)]):
        # smooth-ish images: JPEG is lossy, so high-frequency noise decodes
        # with larger PIL/libjpeg agreement margins
        base = rng.integers(0, 255, (4, 4, 3)).astype(np.uint8)
        img = Image.fromarray(base).resize((w, h), Image.BILINEAR)
        p = str(d / f"img{i}.jpg")
        img.save(p, quality=95)
        paths.append(p)
    # grayscale jpeg (libjpeg converts to RGB)
    g = Image.fromarray(rng.integers(0, 255, (64, 80)).astype(np.uint8),
                        mode="L")
    p = str(d / "gray.jpg")
    g.save(p, quality=95)
    paths.append(p)
    # png -> PIL fallback path
    png = Image.fromarray(rng.integers(0, 255, (40, 60, 3)).astype(np.uint8))
    p = str(d / "img.png")
    png.save(p)
    paths.append(p)
    return paths


def _close(a, b, max_lsb=3, mean_lsb=0.6):
    diff = np.abs(a.astype(np.int32) - b.astype(np.int32))
    assert diff.max() <= max_lsb, diff.max()
    assert diff.mean() <= mean_lsb, diff.mean()


def test_canvas_batch_matches_pil(jpegs):
    out, valid_hw = native.batch_train_canvases(jpegs, canvas=256,
                                                threads=2)
    for i, p in enumerate(jpegs):
        ref, (nh, nw) = train_canvas(load_image(p), 256)
        assert tuple(valid_hw[i]) == (nh, nw), p
        _close(out[i], ref)


def test_eval_batch_matches_pil(jpegs):
    out = native.batch_eval_pixels(jpegs, n_px=224, threads=2)
    for i, p in enumerate(jpegs):
        ref = eval_preprocess(load_image(p), 224)
        # eval_preprocess returns normalized floats; unnormalize to uint8
        from swat_tpu.kernels.augment import CLIP_MEAN, CLIP_STD

        ref_u8 = np.clip((ref * np.asarray(CLIP_STD) +
                          np.asarray(CLIP_MEAN)) * 255.0 + 0.5,
                         0, 255).astype(np.uint8)
        _close(out[i], ref_u8)


def test_missing_file_falls_back_gracefully(tmp_path):
    img = Image.fromarray(np.zeros((32, 32, 3), np.uint8))
    ok = str(tmp_path / "ok.jpg")
    img.save(ok)
    with pytest.raises(FileNotFoundError):
        native.batch_train_canvases([ok, str(tmp_path / "missing.jpg")],
                                    canvas=64, threads=1)


def test_corrupt_jpeg_raises_cleanly(tmp_path):
    """Truncated or garbage JPEG bytes must surface as a per-image
    exception (libjpeg error -> PIL fallback -> OSError), never crash the
    process — the reference's PIL loader raises the same way inside its
    DataLoader workers."""
    ok = str(tmp_path / "ok.jpg")
    Image.fromarray(np.full((40, 40, 3), 100, np.uint8)).save(ok)
    data = open(ok, "rb").read()
    trunc = str(tmp_path / "trunc.jpg")
    with open(trunc, "wb") as f:
        f.write(data[: len(data) // 3])
    garb = str(tmp_path / "garb.jpg")
    with open(garb, "wb") as f:
        f.write(b"\xff\xd8\xff\xe0NOTAJPEG" + b"\x00" * 100)
    for bad in (trunc, garb):
        with pytest.raises(OSError):
            native.batch_train_canvases([ok, bad], canvas=64, threads=1)
