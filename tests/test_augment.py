"""On-device augmentation kernels: semantics checks against the reference's
distributions and invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.kernels import augment as aug


def test_normalize_roundtrip(rng):
    x = rng.uniform(0, 1, (2, 8, 8, 3)).astype(np.float32)
    n = aug.normalize(jnp.asarray(x))
    back = aug.denormalize(n)
    np.testing.assert_allclose(np.asarray(back), x, rtol=1e-5, atol=1e-6)


def test_rrc_shape_and_range(rng):
    canvases = rng.integers(0, 255, (4, 64, 64, 3)).astype(np.uint8)
    hw = np.array([[64, 64], [48, 64], [64, 32], [20, 20]], np.int32)
    out = aug.random_resized_crop(jnp.asarray(canvases), jnp.asarray(hw),
                                  jax.random.PRNGKey(0), out_size=32)
    assert out.shape == (4, 32, 32, 3)
    vals = np.asarray(out)
    assert vals.min() > -30 and vals.max() < 300  # bicubic over/undershoot ok


def test_rrc_crops_inside_valid_region():
    # canvas: valid region is white, padding black; crops must be ~white
    canvas = np.zeros((1, 64, 64, 3), np.uint8)
    canvas[0, :32, :48] = 255
    hw = np.array([[32, 48]], np.int32)
    for seed in range(10):
        out = aug.random_resized_crop(
            jnp.asarray(canvas), jnp.asarray(hw),
            jax.random.PRNGKey(seed), out_size=16)
        assert float(np.asarray(out).mean()) > 220, seed


def test_cutmix_lambda_matches_pixel_ratio(rng):
    images = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(8))
    mixed, y_a, y_b, lam = aug.cutmix(images, labels, jax.random.PRNGKey(1),
                                      beta=1.0, mix_prob=1.0)
    # fraction of unchanged pixels == lam
    changed = np.any(np.asarray(mixed) != np.asarray(images), axis=-1)
    # rows where the permutation moved a different image
    frac_changed = changed.mean(axis=(1, 2)).max()
    assert float(lam) == pytest.approx(1 - frac_changed, abs=1e-6)
    np.testing.assert_array_equal(np.asarray(y_a), np.arange(8))


def test_cutmix_gate_off_is_identity(rng):
    images = jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(4))
    mixed, y_a, y_b, lam = aug.cutmix(images, labels, jax.random.PRNGKey(0),
                                      beta=1.0, mix_prob=0.0)
    np.testing.assert_array_equal(np.asarray(mixed), np.asarray(images))
    assert float(lam) == 1.0
    np.testing.assert_array_equal(np.asarray(y_b), np.asarray(labels))


def test_mixup_convex_combination(rng):
    images = jnp.asarray(rng.normal(size=(4, 8, 8, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(4))
    mixed, y_a, y_b, lam = aug.mixup(images, labels, jax.random.PRNGKey(2),
                                     alpha=1.0, mix_prob=1.0)
    lam_f = float(lam)
    lo = np.minimum(np.asarray(images).min(), np.asarray(images).min())
    assert 0.0 <= lam_f <= 1.0
    # each mixed pixel must lie between the two sources
    assert np.isfinite(np.asarray(mixed)).all()


def test_resizemix_lambda(rng):
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(4))
    mixed, y_a, y_b, lam = aug.resizemix(
        images, labels, jax.random.PRNGKey(3), mix_prob=1.0)
    assert 1 - 0.8 ** 2 - 1e-3 <= float(lam) < 1.0
    changed = np.any(np.asarray(mixed) != np.asarray(images), axis=-1)
    frac = changed.mean(axis=(1, 2)).max()
    assert frac <= 1 - float(lam) + 0.01


def test_saliencymix_per_image_lams(rng):
    images = jnp.asarray(rng.normal(size=(4, 32, 32, 3)).astype(np.float32))
    labels = jnp.asarray(np.arange(4))
    mixed, y_a, y_b, lam_vec = aug.saliencymix(
        images, labels, jax.random.PRNGKey(4), beta=1.0, mix_prob=1.0)
    assert lam_vec.shape == (4,)
    assert np.all((np.asarray(lam_vec) >= 0) & (np.asarray(lam_vec) <= 1))


def test_saliency_map_peaks_on_feature():
    img = np.zeros((1, 32, 32, 3), np.float32)
    img[0, 20, 11] = 50.0  # bright dot = most salient point
    sal = np.asarray(aug.saliency_map(jnp.asarray(img)))
    peak = np.unravel_index(sal[0].argmax(), sal[0].shape)
    assert abs(peak[0] - 20) <= 1 and abs(peak[1] - 11) <= 1


def test_rrc_fallback_clamps_aspect(rng):
    """When no candidate crop fits (extreme aspect), the fallback crops a
    ratio-legal centered region like torchvision, instead of stretching
    the whole valid area (reference transform parity)."""
    import jax

    from swat_tpu.kernels.augment import _sample_crop

    key = jax.random.PRNGKey(0)
    # 4:1 panorama: in_ratio=4.0 > 4/3 -> width clamps to h * 4/3
    i, j, ch, cw = _sample_crop(key, jnp.int32(64), jnp.int32(256),
                                (0.9, 1.0), (3 / 4, 4 / 3))
    assert int(ch) == 64
    assert int(cw) == round(64 * 4 / 3)
    assert int(j) == (256 - int(cw)) // 2  # centered
    # 1:4 portrait: height clamps to w / (3/4)
    i, j, ch, cw = _sample_crop(key, jnp.int32(256), jnp.int32(64),
                                (0.9, 1.0), (3 / 4, 4 / 3))
    assert int(cw) == 64
    assert int(ch) == round(64 / (3 / 4))
    assert int(i) == (256 - int(ch)) // 2


def test_beta_zero_disables_mixing(rng):
    """beta<=0 means 'never mix' in the reference (train_cutmix's
    cutmix_beta>0 gate, mixup_data's alpha>0 branch); jax.random.beta
    with (0,0) would emit NaN-derived garbage boxes."""
    import jax

    from swat_tpu.kernels import augment as aug

    imgs = jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32)
    labels = jnp.arange(4)
    for fn in (aug.cutmix, aug.mixup):
        mixed, y_a, y_b, lam = fn(imgs, labels, jax.random.PRNGKey(0),
                                  0.0, 1.0)
        np.testing.assert_array_equal(np.asarray(mixed), np.asarray(imgs))
        assert float(lam) == 1.0


def test_rrc_bf16_close_to_f32(rng):
    """The bf16 resample (production bf16-policy scan path) deviates from
    the f32 one by at most a few uint8 LSBs — augmentation-level noise,
    not a semantic change (crop boxes/flips are identical: same keys)."""
    import jax
    import jax.numpy as jnp

    from swat_tpu.kernels.augment import random_resized_crop

    canv = jnp.asarray(rng.integers(0, 255, (8, 64, 64, 3)), jnp.uint8)
    hw = jnp.full((8, 2), 64, jnp.int32)
    k = jax.random.PRNGKey(3)
    a = random_resized_crop(canv, hw, k, out_size=32)
    b = random_resized_crop(canv, hw, k, out_size=32, dtype=jnp.bfloat16)
    assert b.dtype == jnp.bfloat16
    dev = float(jnp.max(jnp.abs(a - b.astype(jnp.float32))))
    assert dev < 6.0  # a couple of LSBs on the 0..255 scale


def test_clip_text_heatmap_conditions_on_text():
    """GEM-analog text-conditioned localization (reference
    utils/training.py:2717-2731): the map must follow the text embedding
    — different per-image texts give different maps, and a text aligned
    with one patch's token peaks on that patch."""
    import jax
    import jax.numpy as jnp

    from swat_tpu.eval.heatmap import clip_text_heatmap
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import CLIPConfig, TextConfig, VisionConfig
    from swat_tpu.core.precision import FP32_PRECISION

    cfg = CLIPConfig(
        name="tiny",
        vision=VisionConfig(image_size=32, patch_size=16, width=64,
                            layers=2, heads=4, embed_dim=48,
                            quick_gelu=True),
        text=TextConfig(context_length=12, vocab_size=100, width=64,
                        layers=2, heads=4, embed_dim=48, quick_gelu=True))
    model = CLIPModel(cfg, precision=FP32_PRECISION)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3), jnp.float32),
                        jnp.zeros((1, 12), jnp.int32))["params"]
    images = jax.random.normal(jax.random.PRNGKey(1), (3, 32, 32, 3))

    t1 = jax.random.normal(jax.random.PRNGKey(2), (3, 48))
    t1 = t1 / jnp.linalg.norm(t1, axis=-1, keepdims=True)
    t2 = -t1
    hm1 = clip_text_heatmap(model, params, images, t1)
    hm2 = clip_text_heatmap(model, params, images, t2)
    assert hm1.shape == (3, 2, 2)
    # flipping the text embedding flips the cosine map
    np.testing.assert_allclose(np.asarray(hm1), -np.asarray(hm2),
                               rtol=0, atol=1e-6)
    assert float(jnp.abs(hm1).max()) <= 1.0 + 1e-5

    # a text equal to one patch's projected token must peak there
    tokens = model.apply({"params": params}, images,
                         method=CLIPModel.encode_image_tokens)
    tokens = tokens / jnp.linalg.norm(tokens, axis=-1, keepdims=True)
    target = tokens[:, 3]    # patch index 2 (after the class token)
    hm = clip_text_heatmap(model, params, images, target)
    flat = np.asarray(hm.reshape(3, -1))
    assert (flat.argmax(axis=1) == 2).all()
