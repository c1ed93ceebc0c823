"""On-device batched augmentation.

The reference does all augmentation per-image in PIL inside DataLoader
worker processes (RandomResizedCrop/HFlip, utils/extras.py:66-77) and the
mixing strategies as in-place tensor slicing on GPU (cutmix
utils/training.py:1459-1468, mixup :1113-1134, resizemix :2340-2374, CMO
:1909-1925, saliencymix :2007-2033).  Here the whole chain is vectorized
jax image math executed on-device inside the jitted train step:

  host: decode JPEG -> aspect-preserving resize onto a fixed uint8 canvas
  device: random-resized-crop (scale_and_translate) -> hflip -> normalize
          -> mixing strategy -> model

Everything is static-shape; per-batch randomness comes from a jax PRNG key
threaded through the train step.  Semantics intentionally match the
reference's distributions (beta draws, mix_prob gates, pixel-ratio lambda
correction) — parity is statistical (3-seed means), not bit-exact
(SURVEY.md §7 "Randomness semantics").
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

# CLIP normalization constants (reference utils/extras.py:67)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def normalize(images: jnp.ndarray) -> jnp.ndarray:
    """uint8/float [..,H,W,3] pixel values -> CLIP-normalized float32."""
    x = images.astype(jnp.float32)
    if images.dtype == jnp.uint8:
        x = x / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std


def denormalize(images: jnp.ndarray) -> jnp.ndarray:
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return images * std + mean


# ---------------------------------------------------------------------------
# RandomResizedCrop on canvases


def _sample_crop(key, valid_h, valid_w, scale, ratio, tries: int = 10):
    """torch RandomResizedCrop sampling: ``tries`` candidate (h,w) draws,
    first in-bounds candidate wins, else center-crop fallback."""
    area = (valid_h * valid_w).astype(jnp.float32)
    k_area, k_ratio, k_pos = jax.random.split(key, 3)
    target = jax.random.uniform(
        k_area, (tries,), minval=scale[0], maxval=scale[1]) * area
    log_ratio = jax.random.uniform(
        k_ratio, (tries,), minval=jnp.log(ratio[0]), maxval=jnp.log(ratio[1]))
    aspect = jnp.exp(log_ratio)
    w = jnp.sqrt(target * aspect).round().astype(jnp.int32)
    h = jnp.sqrt(target / aspect).round().astype(jnp.int32)
    ok = (w > 0) & (w <= valid_w) & (h > 0) & (h <= valid_h)
    idx = jnp.argmax(ok)  # first valid try
    any_ok = jnp.any(ok)
    # fallback: torchvision's centered crop with the aspect ratio clamped
    # into [ratio[0], ratio[1]] (RandomResizedCrop.get_params tail) —
    # extreme-aspect images crop a ratio-legal region instead of
    # stretching the whole valid area
    in_ratio = valid_w.astype(jnp.float32) / valid_h.astype(jnp.float32)
    fb_w = jnp.where(
        in_ratio < ratio[0], valid_w,
        jnp.where(in_ratio > ratio[1],
                  jnp.round(valid_h * ratio[1]).astype(jnp.int32),
                  valid_w))
    fb_h = jnp.where(
        in_ratio < ratio[0],
        jnp.round(valid_w / ratio[0]).astype(jnp.int32),
        jnp.where(in_ratio > ratio[1], valid_h, valid_h))
    ch = jnp.where(any_ok, h[idx], fb_h)
    cw = jnp.where(any_ok, w[idx], fb_w)
    k_i, k_j = jax.random.split(k_pos)
    i = jax.random.randint(k_i, (), 0, jnp.maximum(valid_h - ch, 0) + 1)
    j = jax.random.randint(k_j, (), 0, jnp.maximum(valid_w - cw, 0) + 1)
    i = jnp.where(any_ok, i, (valid_h - ch) // 2)
    j = jnp.where(any_ok, j, (valid_w - cw) // 2)
    return i, j, ch, cw


def _crop_resize_one(canvas, i, j, h, w, out_size: int,
                     dtype=jnp.float32):
    """Crop [i:i+h, j:j+w] and resize to (out_size, out_size), bicubic.

    ``dtype`` is the resample compute/storage type: bf16 runs the two
    1-D resampling tensordots on the MXU at full rate and halves the
    activation HBM traffic; pixel error is <1 uint8 LSB (augmentation
    parity is statistical, SURVEY.md §7)."""
    scale_y = out_size / h.astype(jnp.float32)
    scale_x = out_size / w.astype(jnp.float32)
    return jax.image.scale_and_translate(
        canvas.astype(dtype),
        shape=(out_size, out_size, canvas.shape[-1]),
        spatial_dims=(0, 1),
        scale=jnp.stack([scale_y, scale_x]),
        translation=jnp.stack([-i.astype(jnp.float32) * scale_y,
                               -j.astype(jnp.float32) * scale_x]),
        method="cubic",
    )


def random_resized_crop(
    canvases: jnp.ndarray,          # [B, C, C, 3] uint8/float
    valid_hw: jnp.ndarray,          # [B, 2] int32 valid (h, w) per canvas
    key: jax.Array,
    out_size: int = 224,
    scale: Tuple[float, float] = (0.9, 1.0),
    ratio: Tuple[float, float] = (3 / 4, 4 / 3),
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched RandomResizedCrop (reference transform, utils/extras.py:70).

    Canvases hold the aspect-preserving resized image in the top-left
    [0:valid_h, 0:valid_w] region; crops are sampled inside it."""
    b = canvases.shape[0]
    keys = jax.random.split(key, b)

    def one(canvas, hw, k):
        i, j, h, w = _sample_crop(k, hw[0], hw[1], scale, ratio)
        return _crop_resize_one(canvas, i, j, h, w, out_size, dtype)

    return jax.vmap(one)(canvases, valid_hw, keys)


def random_hflip(images: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
    flip = jax.random.bernoulli(key, 0.5, (images.shape[0], 1, 1, 1))
    return jnp.where(flip, images[:, :, ::-1, :], images)


def train_augment(canvases, valid_hw, key, out_size: int = 224,
                  scale=(0.9, 1.0), dtype=jnp.float32):
    """Full reference train transform on device: RRC + hflip + normalize.
    Canvases are uint8 pixels; RRC returns ``dtype`` in [0, 255]."""
    k_crop, k_flip = jax.random.split(key)
    x = random_resized_crop(canvases, valid_hw, k_crop, out_size, scale,
                            dtype=dtype)
    x = random_hflip(x, k_flip)
    return _normalize_float_pixels(x, dtype)


def _normalize_float_pixels(x, dtype=jnp.float32):
    mean = jnp.asarray(CLIP_MEAN, dtype) * 255.0
    std = jnp.asarray(CLIP_STD, dtype) * 255.0
    return (x.astype(dtype) - mean) / std


# ---------------------------------------------------------------------------
# mixing strategies (batch-level, inside jit)


def _rand_bbox(key, height: int, width: int, lam):
    """Box sampling identical to reference rand_bbox
    (utils/training.py:1404-1420): center uniform over the image, side =
    size*sqrt(1-lam), clipped."""
    cut_rat = jnp.sqrt(1.0 - lam)
    cut_h = (height * cut_rat).astype(jnp.int32)
    cut_w = (width * cut_rat).astype(jnp.int32)
    k1, k2 = jax.random.split(key)
    cy = jax.random.randint(k1, (), 0, height)
    cx = jax.random.randint(k2, (), 0, width)
    y1 = jnp.clip(cy - cut_h // 2, 0, height)
    y2 = jnp.clip(cy + cut_h // 2, 0, height)
    x1 = jnp.clip(cx - cut_w // 2, 0, width)
    x2 = jnp.clip(cx + cut_w // 2, 0, width)
    return y1, y2, x1, x2


def _safe_beta(key, beta: float):
    """beta<=0 disables mixing in the reference (train_cutmix's
    `args.cutmix_beta > 0` gate, mixup_data's `if alpha > 0: ... else:
    lam = 1`): return lam=1 so the box is empty / the blend is identity.
    jax.random.beta(key, 0, 0) would produce NaN-derived garbage boxes
    that still paste with probability mix_prob."""
    if beta <= 0:
        return jnp.float32(1.0)
    return jax.random.beta(key, beta, beta)


def _box_mask(height: int, width: int, y1, y2, x1, x2):
    rows = jnp.arange(height)[:, None]
    cols = jnp.arange(width)[None, :]
    return ((rows >= y1) & (rows < y2) & (cols >= x1) & (cols < x2))


def cutmix(images, labels, key, beta: float = 1.0, mix_prob: float = 0.5):
    """Reference train_cutmix mixing (utils/training.py:1457-1472): one
    beta-lambda, one box, one shuffle per batch; gate with mix_prob;
    lambda corrected to the exact pixel ratio.

    Returns (mixed_images, y_a, y_b, lam_scalar)."""
    b, h, w, _ = images.shape
    k_gate, k_lam, k_perm, k_box = jax.random.split(key, 4)
    gate = jax.random.uniform(k_gate) < mix_prob
    lam0 = _safe_beta(k_lam, beta)
    perm = jax.random.permutation(k_perm, b)
    y1, y2, x1, x2 = _rand_bbox(k_box, h, w, lam0)
    mask = _box_mask(h, w, y1, y2, x1, x2)[None, :, :, None]
    mixed = jnp.where(mask & gate, images[perm], images)
    lam = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)
    lam = jnp.where(gate, lam, 1.0)
    y_b = jnp.where(gate, labels[perm], labels)
    return mixed, labels, y_b, lam


def cutmix_from(images, labels, images2, labels2, key,
                beta: float = 1.0, mix_prob: float = 0.5):
    """CMO variant (utils/training.py:1909-1925): paste the box from a
    second (inverse-frequency-sampled) batch instead of a shuffle."""
    b, h, w, _ = images.shape
    k_gate, k_lam, k_box = jax.random.split(key, 3)
    gate = jax.random.uniform(k_gate) < mix_prob
    lam0 = _safe_beta(k_lam, beta)
    y1, y2, x1, x2 = _rand_bbox(k_box, h, w, lam0)
    mask = _box_mask(h, w, y1, y2, x1, x2)[None, :, :, None]
    mixed = jnp.where(mask & gate, images2, images)
    lam = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)
    lam = jnp.where(gate, lam, 1.0)
    y_b = jnp.where(gate, labels2, labels)
    return mixed, labels, y_b, lam


def mixup(images, labels, key, alpha: float = 1.0, mix_prob: float = 0.5):
    """Reference mixup_data (utils/training.py:1113-1134)."""
    b = images.shape[0]
    k_gate, k_lam, k_perm = jax.random.split(key, 3)
    lam = _safe_beta(k_lam, alpha)
    lam = jnp.where(jax.random.uniform(k_gate) <= mix_prob, lam, 1.0)
    perm = jax.random.permutation(k_perm, b)
    mixed = lam * images + (1.0 - lam) * images[perm]
    return mixed, labels, labels[perm], lam


def mixup_fs(images_retr, labels_retr, images_fs, labels_fs, key,
             alpha: float = 1.0, mix_prob: float = 0.5):
    """Reference mixup_data_fs (utils/training.py:1136-1154): with prob
    mix_prob use the few-shot batch (lam=0), else the retrieved batch."""
    k_gate, _ = jax.random.split(key)
    lam = jnp.where(jax.random.uniform(k_gate) <= mix_prob, 0.0, 1.0)
    mixed = lam * images_retr + (1.0 - lam) * images_fs
    return mixed, labels_retr, labels_fs, lam


def resizemix(images, labels, key, mix_prob: float = 0.5,
              tau_range=(0.1, 0.8)):
    """Reference train_resizemix (utils/training.py:2340-2374): shrink the
    shuffled batch by tau and paste at one random position (shared across
    the batch), lambda = 1 - pasted-area ratio.

    Static-shape formulation: scale_and_translate renders the shuffled
    image scaled-by-tau at (pos_y, pos_x) on a zero canvas; a box mask
    selects the pasted region."""
    b, h, w, _ = images.shape
    k_gate, k_tau, k_perm, k_py, k_px = jax.random.split(key, 5)
    gate = jax.random.uniform(k_gate) < mix_prob
    tau = jax.random.uniform(k_tau, minval=tau_range[0], maxval=tau_range[1])
    rh = (h * tau).astype(jnp.int32)
    rw = (w * tau).astype(jnp.int32)
    pos_y = jax.random.randint(k_py, (), 0, jnp.maximum(h - rh, 1))
    pos_x = jax.random.randint(k_px, (), 0, jnp.maximum(w - rw, 1))
    perm = jax.random.permutation(k_perm, b)
    shuffled = images[perm]

    scale_y = rh.astype(jnp.float32) / h
    scale_x = rw.astype(jnp.float32) / w

    def paint(img):
        # antialias=False: the reference F.interpolate(mode='bilinear')
        # never low-pass filters on downscale (and tau in [0.1,0.8]
        # always downscales) — the scale_and_translate default would
        # systematically smooth every pasted patch
        return jax.image.scale_and_translate(
            img, shape=img.shape, spatial_dims=(0, 1),
            scale=jnp.stack([scale_y, scale_x]),
            translation=jnp.stack([pos_y.astype(jnp.float32),
                                   pos_x.astype(jnp.float32)]),
            method="linear", antialias=False)

    pasted = jax.vmap(paint)(shuffled)
    mask = _box_mask(h, w, pos_y, pos_y + rh, pos_x, pos_x + rw)[None, :, :, None]
    mixed = jnp.where(mask & gate, pasted, images)
    lam = 1.0 - (rh * rw).astype(jnp.float32) / (h * w)
    lam = jnp.where(gate, lam, 1.0)
    y_b = jnp.where(gate, labels[perm], labels)
    return mixed, labels, y_b, lam


# ---------------------------------------------------------------------------
# saliency-guided mixing (TPU-native replacement for OpenCV fine-grained
# saliency, reference utils/training.py:2007-2033 / SURVEY.md §2.4 item 3)


def saliency_map(images: jnp.ndarray, blur: int = 7) -> jnp.ndarray:
    """Center-surround (difference-of-boxes) saliency proxy: |pixel - local
    mean| of the grayscale image.  [B,H,W,3] -> [B,H,W] float32."""
    gray = images.astype(jnp.float32).mean(axis=-1)
    kernel = jnp.ones((blur, blur), jnp.float32) / (blur * blur)
    blurred = jax.lax.conv_general_dilated(
        gray[:, None], kernel[None, None], window_strides=(1, 1),
        padding="SAME")[:, 0]
    return jnp.abs(gray - blurred)


def saliencymix(images, labels, key, beta: float = 1.0,
                mix_prob: float = 0.5):
    """Reference train_saliencymix2 (utils/training.py:2169-2230): per-image
    boxes centered on the saliency peak of the *shuffled* image; per-image
    pixel-ratio lambdas."""
    b, h, w, _ = images.shape
    k_gate, k_lam, k_perm = jax.random.split(key, 3)
    gate = jax.random.uniform(k_gate) < mix_prob
    lam0 = _safe_beta(k_lam, beta)
    perm = jax.random.permutation(k_perm, b)
    shuffled = images[perm]

    sal = saliency_map(shuffled)  # [B,H,W]
    flat_idx = jnp.argmax(sal.reshape(b, -1), axis=-1)
    peak_y = flat_idx // w
    peak_x = flat_idx % w

    cut_rat = jnp.sqrt(1.0 - lam0)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cut_w = (w * cut_rat).astype(jnp.int32)
    y1 = jnp.clip(peak_y - cut_h // 2, 0, h)
    y2 = jnp.clip(peak_y + cut_h // 2, 0, h)
    x1 = jnp.clip(peak_x - cut_w // 2, 0, w)
    x2 = jnp.clip(peak_x + cut_w // 2, 0, w)

    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    mask = ((rows >= y1[:, None, None]) & (rows < y2[:, None, None])
            & (cols >= x1[:, None, None]) & (cols < x2[:, None, None]))
    mixed = jnp.where(mask[..., None] & gate, shuffled, images)
    lam_list = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)
    lam_list = jnp.where(gate, lam_list, 1.0)
    y_b = jnp.where(gate, labels[perm], labels)
    return mixed, labels, y_b, lam_list


def attentivemix(images, labels, heatmaps, key, beta: float = 1.0,
                 mix_prob: float = 0.5):
    """Reference train_attentivemix2 (utils/training.py:2672-2831): boxes
    centered on the peak of a model-provided heatmap (GEM in the reference;
    here the CLIP attention heatmap from `swat_tpu.eval.heatmap`).

    heatmaps: [B, h', w'] for the *unshuffled* batch; they are permuted
    alongside the images."""
    b, h, w, _ = images.shape
    k_gate, k_lam, k_perm = jax.random.split(key, 3)
    gate = jax.random.uniform(k_gate) < mix_prob
    lam0 = _safe_beta(k_lam, beta)
    perm = jax.random.permutation(k_perm, b)
    shuffled = images[perm]
    hm = heatmaps[perm]
    hh, hw = hm.shape[1], hm.shape[2]
    flat_idx = jnp.argmax(hm.reshape(b, -1), axis=-1)
    # center of the peak CELL, not its top-left corner: the reference's
    # full-resolution GEM argmax centers the box on the attended region;
    # corner mapping would bias every box up-left by half a cell
    peak_y = (flat_idx // hw) * (h // hh) + (h // hh) // 2
    peak_x = (flat_idx % hw) * (w // hw) + (w // hw) // 2

    cut_rat = jnp.sqrt(1.0 - lam0)
    cut_h = (h * cut_rat).astype(jnp.int32)
    cut_w = (w * cut_rat).astype(jnp.int32)
    y1 = jnp.clip(peak_y - cut_h // 2, 0, h)
    y2 = jnp.clip(peak_y + cut_h // 2, 0, h)
    x1 = jnp.clip(peak_x - cut_w // 2, 0, w)
    x2 = jnp.clip(peak_x + cut_w // 2, 0, w)

    rows = jnp.arange(h)[None, :, None]
    cols = jnp.arange(w)[None, None, :]
    mask = ((rows >= y1[:, None, None]) & (rows < y2[:, None, None])
            & (cols >= x1[:, None, None]) & (cols < x2[:, None, None]))
    mixed = jnp.where(mask[..., None] & gate, shuffled, images)
    lam_list = 1.0 - ((y2 - y1) * (x2 - x1)).astype(jnp.float32) / (h * w)
    lam_list = jnp.where(gate, lam_list, 1.0)
    y_b = jnp.where(gate, labels[perm], labels)
    return mixed, labels, y_b, lam_list
