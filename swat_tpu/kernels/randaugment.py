"""On-device batched RandAugment (FixMatch pool).

TPU-native replacement for the reference's PIL-based RandAugmentMC
(reference utils/randaugment.py:205-220 and its 14-op pool :147-163):
every op is vectorized jax image math on [B, H, W, 3] float pixel tensors
(0..255), with per-image op selection via `lax.switch` under `vmap`.
Magnitude semantics (v = randint(1, m), scaled by max_v/10 + bias, random
sign, apply-probability 0.5, trailing CutoutAbs(112)) follow the reference.

Geometric ops use inverse-mapped nearest-neighbor sampling with black fill
(PIL AFFINE/rotate defaults); photometric ops mirror the PIL enhance /
ImageOps algorithms (blend formulations, histogram LUTs for equalize).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

PARAMETER_MAX = 10


# ---------------------------------------------------------------------------
# helpers


def _blend(img1, img2, factor):
    """PIL Image.blend semantics: img1 + factor * (img2 - img1)
    == ImageEnhance(img2).enhance(factor) with img1 the degenerate image."""
    return jnp.clip(img1 + factor * (img2 - img1), 0.0, 255.0)


def _grayscale(img):
    # PIL L-mode weights
    g = (img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114)
    return jnp.broadcast_to(g[..., None], img.shape)


def _affine_nearest(img, a, b, c, d, e, f):
    """PIL transform(AFFINE) bit-faithful: output pixel (x, y) samples the
    input at (a*(x+.5)+b*(y+.5)+c, d*(x+.5)+e*(y+.5)+f) — PIL maps pixel
    CENTERS — with NEAREST = truncation (Geometry.c COORD()), black
    outside."""
    h, w, _ = img.shape
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + 0.5
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1) + 0.5
    sx = a * xs + b * ys + c
    sy = d * xs + e * ys + f
    valid = (sx >= 0) & (sx < w) & (sy >= 0) & (sy < h)
    ix = jnp.clip(sx.astype(jnp.int32), 0, w - 1)   # trunc like COORD()
    iy = jnp.clip(sy.astype(jnp.int32), 0, h - 1)
    out = img[iy, ix]
    return jnp.where(valid[..., None], out, 0.0)


def _channel_lut_apply(img, lut):
    """img [H,W,3] int32 values, lut [3,256] -> mapped image."""
    idx = jnp.clip(img.astype(jnp.int32), 0, 255)
    out = jnp.stack([lut[ch][idx[..., ch]] for ch in range(3)], axis=-1)
    return out.astype(jnp.float32)


def _histograms(img):
    """per-channel 256-bin histogram: [3, 256]."""
    idx = jnp.clip(img.astype(jnp.int32), 0, 255)

    def hist(ch):
        return jnp.zeros((256,), jnp.int32).at[idx[..., ch].reshape(-1)].add(1)

    return jnp.stack([hist(c) for c in range(3)])


# ---------------------------------------------------------------------------
# ops — each op(img [H,W,3] f32 0..255, v float, key) -> img

def op_identity(img, v, key):
    return img


def op_autocontrast(img, v, key):
    def one_channel(ch):
        lo = ch.min()
        hi = ch.max()
        scale = 255.0 / jnp.maximum(hi - lo, 1e-5)
        out = (ch - lo) * scale
        return jnp.where(hi > lo, out, ch)

    return jnp.clip(jnp.stack(
        [one_channel(img[..., c]) for c in range(3)], axis=-1), 0, 255)


def op_brightness(img, v, key):
    return _blend(jnp.zeros_like(img), img, v)


def op_color(img, v, key):
    return _blend(_grayscale(img), img, v)


def op_contrast(img, v, key):
    # PIL Contrast: degenerate = solid image of the mean of L-channel
    mean = _grayscale(img)[..., 0].mean()
    return _blend(jnp.full_like(img, mean), img, v)


def op_sharpness(img, v, key):
    # PIL SMOOTH kernel [[1,1,1],[1,5,1],[1,1,1]]/13, edges kept
    kernel = jnp.array([[1., 1., 1.], [1., 5., 1.], [1., 1., 1.]]) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None], kernel[None, None],
        window_strides=(1, 1), padding="SAME")[:, 0].transpose(1, 2, 0)
    # PIL keeps the 1-pixel border unfiltered
    h, w, _ = img.shape
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = ((ys == 0) | (ys == h - 1) | (xs == 0) | (xs == w - 1))
    smoothed = jnp.where(border[..., None], img, smoothed)
    return _blend(smoothed, img, v)


def op_equalize(img, v, key):
    # PIL ImageOps.equalize per channel
    hists = _histograms(img)  # [3,256]

    def lut_for(h):
        step = (h.sum() - h[255]) // 255
        csum = jnp.concatenate([jnp.zeros((1,), h.dtype), jnp.cumsum(h)[:-1]])
        lut = (step // 2 + csum) // jnp.maximum(step, 1)
        ident = jnp.arange(256, dtype=lut.dtype)
        return jnp.where(step == 0, ident, jnp.clip(lut, 0, 255))

    luts = jnp.stack([lut_for(hists[c]) for c in range(3)])
    return _channel_lut_apply(img, luts.astype(jnp.float32))


def op_posterize(img, v, key):
    bits = jnp.clip(v.astype(jnp.int32), 1, 8)
    shift = 8 - bits
    vals = img.astype(jnp.int32)
    return ((vals >> shift) << shift).astype(jnp.float32)


def op_solarize(img, v, key):
    threshold = 256.0 - v
    return jnp.where(img >= threshold, 255.0 - img, img)


def op_rotate(img, v, key):
    # PIL img.rotate(deg): inverse map about (w/2, h/2) with matrix
    # [cos, -sin; sin, cos] of +deg (bit-exact vs PIL, tests/
    # test_randaugment.py; the previous -deg convention rotated the
    # opposite way from the reference)
    theta = v * jnp.pi / 180.0
    h, w, _ = img.shape
    cy, cx = h / 2.0, w / 2.0
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    a, b = cos, -sin
    d, e = sin, cos
    c = cx - a * cx - b * cy
    f = cy - d * cx - e * cy
    return _affine_nearest(img, a, b, c, d, e, f)


def op_shear_x(img, v, key):
    return _affine_nearest(img, 1.0, v, 0.0, 0.0, 1.0, 0.0)


def op_shear_y(img, v, key):
    return _affine_nearest(img, 1.0, 0.0, 0.0, v, 1.0, 0.0)


def op_translate_x(img, v, key):
    # reference TranslateX: v = int(v * w) — trunc toward zero, NOT floor
    # (floor(-3.7) = -4 would over-shift negative translations)
    w = img.shape[1]
    return _affine_nearest(img, 1.0, 0.0, jnp.trunc(v * w), 0.0, 1.0, 0.0)


def op_translate_y(img, v, key):
    h = img.shape[0]
    return _affine_nearest(img, 1.0, 0.0, 0.0, 0.0, 1.0, jnp.trunc(v * h))


def cutout_abs(img, size, key):
    """Gray (127) box of side ``size`` centered at a uniform point
    (reference CutoutAbs, utils/randaugment.py:46-60)."""
    h, w, _ = img.shape
    k1, k2 = jax.random.split(key)
    x0 = jax.random.uniform(k1) * w
    y0 = jax.random.uniform(k2) * h
    x0 = jnp.maximum(0, x0 - size / 2).astype(jnp.int32)
    y0 = jnp.maximum(0, y0 - size / 2).astype(jnp.int32)
    x1 = jnp.minimum(w, x0 + size)
    y1 = jnp.minimum(h, y0 + size)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    # PIL ImageDraw.rectangle((x0, y0, x1, y1)) INCLUDES the x1/y1 edge
    mask = (ys >= y0) & (ys <= y1) & (xs >= x0) & (xs <= x1)
    return jnp.where(mask[..., None], 127.0, img)


# (op, max_v, bias, signed) — reference fixmatch_augment_pool (:147-163)
_POOL = [
    (op_autocontrast, None, 0.0, False),
    (op_brightness, 0.9, 0.05, False),
    (op_color, 0.9, 0.05, False),
    (op_contrast, 0.9, 0.05, False),
    (op_equalize, None, 0.0, False),
    (op_identity, None, 0.0, False),
    (op_posterize, 4, 4, False),       # int param
    (op_rotate, 30, 0.0, True),
    (op_sharpness, 0.9, 0.05, False),
    (op_shear_x, 0.3, 0.0, True),
    (op_shear_y, 0.3, 0.0, True),
    (op_solarize, 256, 0.0, False),    # int param
    (op_translate_x, 0.3, 0.0, True),
    (op_translate_y, 0.3, 0.0, True),
]
_INT_PARAM_OPS = {6, 11}  # posterize, solarize
NUM_OPS = len(_POOL)


def _apply_one(img, op_idx, magnitude, sign, gate, key):
    """Apply pool op ``op_idx`` with raw magnitude draw ``magnitude``
    (1..m-1) when ``gate``; magnitude scaling per op."""

    branches = []
    for i, (fn, max_v, bias, signed) in enumerate(_POOL):
        def make(fn=fn, max_v=max_v, bias=bias, signed=signed, i=i):
            def branch(operand):
                img, magnitude, sign, key = operand
                if max_v is None:
                    v = jnp.float32(0)
                elif i in _INT_PARAM_OPS:
                    v = jnp.floor(magnitude * max_v / PARAMETER_MAX) + bias
                else:
                    v = magnitude * max_v / PARAMETER_MAX + bias
                if signed:
                    v = v * sign
                return fn(img, v, key)

            return branch

        branches.append(make())

    out = jax.lax.switch(op_idx, branches, (img, magnitude, sign, key))
    return jnp.where(gate, out, img)


def rand_augment(images: jnp.ndarray, key: jax.Array, n: int = 2,
                 m: int = 10, cutout: int = 112) -> jnp.ndarray:
    """Batched RandAugmentMC(n, m): images [B,H,W,3] float 0..255.

    Per image: n ops drawn uniformly from the pool, magnitude
    v ~ randint(1, m), applied with probability 0.5, random sign for
    geometric ops; CutoutAbs(cutout) always applied last
    (reference RandAugmentMC.__call__, utils/randaugment.py:213-220,
    with CutoutAbs(int(224*0.5)))."""
    b = images.shape[0]

    def one(img, key):
        # 5 keys per op (op/mag/gate/sign + a fresh key for the op body)
        # plus one for the cutout — no key is ever consumed twice
        keys = jax.random.split(key, n * 5 + 1)
        for j in range(n):
            k_op, k_mag, k_gate, k_sign, k_apply = keys[j * 5: j * 5 + 5]
            op_idx = jax.random.randint(k_op, (), 0, NUM_OPS)
            magnitude = jax.random.randint(k_mag, (), 1, m).astype(jnp.float32)
            gate = jax.random.uniform(k_gate) < 0.5
            sign = jnp.where(jax.random.uniform(k_sign) < 0.5, -1.0, 1.0)
            img = _apply_one(img, op_idx, magnitude, sign, gate, k_apply)
        return cutout_abs(img, cutout, keys[-1])

    return jax.vmap(one)(images, jax.random.split(key, b))
