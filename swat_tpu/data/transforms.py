"""Host-side image decode & preprocessing.

Policy split (SURVEY.md §7 "Data input pipeline"):

* eval preprocess runs on host, exactly matching OpenCLIP's deterministic
  transform (resize shorter side -> center crop -> normalize) so zero-shot
  numbers are bit-comparable;
* train images are decoded and aspect-preserving-resized onto a fixed
  uint8 canvas on host; the random crop / flip / normalize / mixing run
  on-device (`swat_tpu.kernels.augment`).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
from PIL import Image

from swat_tpu.kernels.augment import CLIP_MEAN, CLIP_STD

CANVAS_SIZE = 256  # train canvas; >= 224/sqrt(0.9*3/4) covers all crops


def load_image(path: str) -> Image.Image:
    """Raw PIL image, MODE PRESERVED: the reference converts to RGB only
    AFTER the geometric transforms (_convert_image_to_rgb sits after
    RandomResizedCrop / Resize+CenterCrop, utils/extras.py:54,75,84), so
    palette images resample in P mode (PIL silently uses NEAREST there)
    and only then convert."""
    return Image.open(path)


def eval_crop(img: Image.Image, n_px: int = 224) -> Image.Image:
    """Resize(shorter side = n_px, bicubic) + CenterCrop(n_px) + RGB
    convert — OpenCLIP's val preprocess geometry (used by the reference
    via ``get_engine``'s returned ``preprocess``)."""
    w, h = img.size
    # torchvision Resize truncates the long side (int(), not round):
    # _compute_resized_output_size — matching it keeps the bicubic grid
    # and center crop bit-comparable with the reference preprocess
    if w < h:
        nw, nh = n_px, max(n_px, int(h * n_px / w))
    else:
        nw, nh = max(n_px, int(w * n_px / h)), n_px
    img = img.resize((nw, nh), Image.BICUBIC)
    # torchvision F.center_crop: int(round(d / 2.0)) — round-half-even,
    # NOT floor (shifts the crop by one pixel when d % 4 == 3)
    left = int(round((nw - n_px) / 2.0))
    top = int(round((nh - n_px) / 2.0))
    return img.crop((left, top, left + n_px, top + n_px)).convert("RGB")


def eval_preprocess(img: Image.Image, n_px: int = 224) -> np.ndarray:
    x = np.asarray(eval_crop(img, n_px), dtype=np.float32) / 255.0
    return ((x - np.asarray(CLIP_MEAN, np.float32))
            / np.asarray(CLIP_STD, np.float32))


def train_canvas(img: Image.Image, canvas: int = CANVAS_SIZE
                 ) -> Tuple[np.ndarray, Tuple[int, int]]:
    """Aspect-preserving resize (longest side -> canvas) into the top-left
    of a [canvas, canvas, 3] uint8 array; returns (canvas, (valid_h,
    valid_w)).  Small images upscale (bicubic) so crop statistics stay
    comparable to the reference's full-resolution RandomResizedCrop."""
    w, h = img.size
    if w >= h:
        nw = canvas
        nh = max(1, int(round(h * canvas / w)))
    else:
        nh = canvas
        nw = max(1, int(round(w * canvas / h)))
    img = img.resize((nw, nh), Image.BICUBIC).convert("RGB")
    out = np.zeros((canvas, canvas, 3), dtype=np.uint8)
    out[:nh, :nw] = np.asarray(img, dtype=np.uint8)
    return out, (nh, nw)


def host_train_preprocess(img: Image.Image, rng: np.random.Generator,
                          n_px: int = 224, scale=(0.9, 1.0),
                          ratio=(3 / 4, 4 / 3)) -> np.ndarray:
    """Exact host-side reference train transform (RandomResizedCrop +
    HFlip + normalize, utils/extras.py:66-77) — parity/fallback mode."""
    w, h = img.size
    area = w * h
    for _ in range(10):
        target = rng.uniform(scale[0], scale[1]) * area
        aspect = float(np.exp(rng.uniform(np.log(ratio[0]), np.log(ratio[1]))))
        cw = int(round((target * aspect) ** 0.5))
        ch = int(round((target / aspect) ** 0.5))
        if 0 < cw <= w and 0 < ch <= h:
            j = int(rng.integers(0, w - cw + 1))
            i = int(rng.integers(0, h - ch + 1))
            break
    else:
        # torchvision RandomResizedCrop fallback: ratio-clamped CENTER
        # crop (get_params), not the whole image — with scale=(0.9,1.0)
        # every 3:2 image fails all 10 attempts and lands here
        in_ratio = w / h
        if in_ratio < ratio[0]:
            cw = w
            ch = int(round(cw / ratio[0]))
        elif in_ratio > ratio[1]:
            ch = h
            cw = int(round(ch * ratio[1]))
        else:
            cw, ch = w, h
        i = (h - ch) // 2
        j = (w - cw) // 2
    img = img.crop((j, i, j + cw, i + ch)).resize((n_px, n_px), Image.BICUBIC)
    if rng.random() < 0.5:
        img = img.transpose(Image.FLIP_LEFT_RIGHT)
    # RGB convert AFTER the geometry (reference _convert_image_to_rgb
    # placement, utils/extras.py:75)
    x = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return ((x - np.asarray(CLIP_MEAN, np.float32))
            / np.asarray(CLIP_STD, np.float32))
