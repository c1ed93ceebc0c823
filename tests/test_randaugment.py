"""PIL-parity for the on-device RandAugment pool.

The reference ops ARE PIL calls (utils/randaugment.py:20-136), so PIL is
the exact oracle: pointwise/LUT ops must match bit-for-bit on integral
images; blend/filter ops to PIL's integer rounding (atol<=2); geometric
ops reproduce PIL's pixel-center + truncation sampling convention
(Geometry.c) with f32-vs-f64 boundary flips on <0.5% of pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import PIL.Image
import PIL.ImageDraw
import PIL.ImageEnhance
import PIL.ImageOps
import pytest

from swat_tpu.kernels import randaugment as RA

H, W = 47, 33   # non-square to catch x/y swaps
KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def img():
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, (H, W, 3)).astype(np.uint8)


def run(op, img_u8, v=0.0):
    out = op(jnp.asarray(img_u8, jnp.float32), jnp.float32(v), KEY)
    return np.asarray(out)


def pil(img_u8):
    return PIL.Image.fromarray(img_u8)


def frac_equal(a, b):
    return (np.round(a) == np.asarray(b, np.float32)).all(axis=-1).mean()


# ---- exact ops -----------------------------------------------------------

def test_equalize_exact(img):
    ref = np.asarray(PIL.ImageOps.equalize(pil(img)))
    np.testing.assert_array_equal(run(RA.op_equalize, img), ref)


@pytest.mark.parametrize("bits", [4, 5, 6, 7])
def test_posterize_exact(img, bits):
    ref = np.asarray(PIL.ImageOps.posterize(pil(img), bits))
    np.testing.assert_array_equal(run(RA.op_posterize, img, bits), ref)


@pytest.mark.parametrize("v", [25, 128, 230])
def test_solarize_exact(img, v):
    ref = np.asarray(PIL.ImageOps.solarize(pil(img), 256 - v))
    np.testing.assert_array_equal(run(RA.op_solarize, img, v), ref)


@pytest.mark.parametrize("shift", [0.13, -0.13, 0.29, -0.29])
def test_translate_exact(img, shift):
    """reference TranslateX/Y: v = int(v*size) — trunc toward zero."""
    ref = np.asarray(pil(img).transform(
        (W, H), PIL.Image.AFFINE, (1, 0, int(shift * W), 0, 1, 0)))
    np.testing.assert_array_equal(run(RA.op_translate_x, img, shift), ref)
    ref = np.asarray(pil(img).transform(
        (W, H), PIL.Image.AFFINE, (1, 0, 0, 0, 1, int(shift * H))))
    np.testing.assert_array_equal(run(RA.op_translate_y, img, shift), ref)


def test_cutout_abs_exact(img):
    """Same uniform draws -> same gray box incl. PIL's inclusive
    rectangle edge (reference CutoutAbs, utils/randaugment.py:46-60)."""
    key = jax.random.PRNGKey(5)
    size = 14
    got = np.asarray(RA.cutout_abs(jnp.asarray(img, jnp.float32),
                                   size, key))
    k1, k2 = jax.random.split(key)
    x0 = int(max(0, float(jax.random.uniform(k1)) * W - size / 2))
    y0 = int(max(0, float(jax.random.uniform(k2)) * H - size / 2))
    x1, y1 = int(min(W, x0 + size)), int(min(H, y0 + size))
    ref = pil(img).copy()
    PIL.ImageDraw.Draw(ref).rectangle((x0, y0, x1, y1), (127, 127, 127))
    np.testing.assert_array_equal(got, np.asarray(ref))


# ---- geometric ops (pixel-center + trunc convention) ---------------------

@pytest.mark.parametrize("deg", [7.0, -23.0, 30.0])
def test_rotate_matches_pil(img, deg):
    ref = np.asarray(pil(img).rotate(deg))
    assert frac_equal(run(RA.op_rotate, img, deg), ref) >= 0.99


@pytest.mark.parametrize("v", [0.12, -0.27])
def test_shear_matches_pil(img, v):
    # >=0.95, not 1.0: when v*(y+0.5) lands within f32 rounding of an
    # integer (e.g. 0.12*12.5), f32 truncates across the boundary PIL's
    # f64 stays below, flipping that whole row/column by one pixel —
    # sub-pixel boundary noise, not a convention difference (v=-0.27 is
    # boundary-free and matches 100%)
    ref = np.asarray(pil(img).transform(
        (W, H), PIL.Image.AFFINE, (1, v, 0, 0, 1, 0)))
    assert frac_equal(run(RA.op_shear_x, img, v), ref) >= 0.95
    ref = np.asarray(pil(img).transform(
        (W, H), PIL.Image.AFFINE, (1, 0, 0, v, 1, 0)))
    assert frac_equal(run(RA.op_shear_y, img, v), ref) >= 0.95


# ---- blend / filter ops (PIL integer rounding) ---------------------------

def test_autocontrast_close(img):
    ref = np.asarray(PIL.ImageOps.autocontrast(pil(img))).astype(np.float32)
    assert np.abs(run(RA.op_autocontrast, img) - ref).max() <= 1.0


@pytest.mark.parametrize("v", [0.3, 0.95, 1.6])
def test_brightness_close(img, v):
    ref = np.asarray(PIL.ImageEnhance.Brightness(pil(img)).enhance(v))
    assert np.abs(run(RA.op_brightness, img, v) - ref).max() <= 1.0


@pytest.mark.parametrize("v", [0.3, 1.6])
def test_color_close(img, v):
    ref = np.asarray(PIL.ImageEnhance.Color(pil(img)).enhance(v))
    assert np.abs(run(RA.op_color, img, v) - ref).max() <= 2.0


@pytest.mark.parametrize("v", [0.3, 1.6])
def test_contrast_close(img, v):
    ref = np.asarray(PIL.ImageEnhance.Contrast(pil(img)).enhance(v))
    assert np.abs(run(RA.op_contrast, img, v) - ref).max() <= 2.0


@pytest.mark.parametrize("v", [0.3, 1.6])
def test_sharpness_close(img, v):
    ref = np.asarray(PIL.ImageEnhance.Sharpness(pil(img)).enhance(v))
    assert np.abs(run(RA.op_sharpness, img, v) - ref).max() <= 2.0


# ---- batched entry point -------------------------------------------------

def test_rand_augment_batch(img):
    batch = np.stack([img] * 4).astype(np.float32)
    out = RA.rand_augment(jnp.asarray(batch), jax.random.PRNGKey(7),
                          n=2, m=10, cutout=10)
    assert out.shape == batch.shape
    out = np.asarray(out)
    assert out.min() >= 0 and out.max() <= 255
    # per-image keys: the 4 identical inputs get different augmentations
    assert not np.array_equal(out[0], out[1])
    # deterministic under the same key
    out2 = np.asarray(RA.rand_augment(jnp.asarray(batch),
                                      jax.random.PRNGKey(7),
                                      n=2, m=10, cutout=10))
    np.testing.assert_array_equal(out, out2)
