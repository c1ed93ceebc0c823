"""RN50 tower: loader conversion from an OpenCLIP-format RN50 state dict,
forward shapes, BN folding math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.core.precision import FP32_PRECISION
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.loader import fold_bn, torch_state_dict_to_params


def _rn50_sd(rng):
    """Random weights in OpenCLIP RN50 state-dict layout (small text)."""
    sd = {}

    def bn(prefix, n):
        sd[f"{prefix}.weight"] = rng.normal(1, .02, (n,))
        sd[f"{prefix}.bias"] = rng.normal(0, .02, (n,))
        sd[f"{prefix}.running_mean"] = rng.normal(0, .02, (n,))
        sd[f"{prefix}.running_var"] = rng.uniform(.5, 1.5, (n,))

    w = 64
    sd["visual.conv1.weight"] = rng.normal(0, .02, (w // 2, 3, 3, 3))
    bn("visual.bn1", w // 2)
    sd["visual.conv2.weight"] = rng.normal(0, .02, (w // 2, w // 2, 3, 3))
    bn("visual.bn2", w // 2)
    sd["visual.conv3.weight"] = rng.normal(0, .02, (w, w // 2, 3, 3))
    bn("visual.bn3", w)

    inplanes = w
    planes = w
    for stage, blocks in enumerate((3, 4, 6, 3)):
        for i in range(blocks):
            pre = f"visual.layer{stage + 1}.{i}"
            cin = inplanes if i == 0 else planes * 4
            sd[f"{pre}.conv1.weight"] = rng.normal(0, .02, (planes, cin, 1, 1))
            bn(f"{pre}.bn1", planes)
            sd[f"{pre}.conv2.weight"] = rng.normal(0, .02, (planes, planes, 3, 3))
            bn(f"{pre}.bn2", planes)
            sd[f"{pre}.conv3.weight"] = rng.normal(0, .02, (planes * 4, planes, 1, 1))
            bn(f"{pre}.bn3", planes * 4)
            if i == 0:
                sd[f"{pre}.downsample.0.weight"] = rng.normal(
                    0, .02, (planes * 4, cin, 1, 1))
                bn(f"{pre}.downsample.1", planes * 4)
        inplanes = planes * 4
        planes *= 2

    c = w * 32
    g = 224 // 32
    sd["visual.attnpool.positional_embedding"] = rng.normal(
        0, .02, (g * g + 1, c))
    for name in ("q_proj", "k_proj", "v_proj"):
        sd[f"visual.attnpool.{name}.weight"] = rng.normal(0, .02, (c, c))
        sd[f"visual.attnpool.{name}.bias"] = rng.normal(0, .02, (c,))
    sd["visual.attnpool.c_proj.weight"] = rng.normal(0, .02, (1024, c))
    sd["visual.attnpool.c_proj.bias"] = rng.normal(0, .02, (1024,))

    # text tower (12 layers, width 512)
    tw, tl = 512, 12
    sd["token_embedding.weight"] = rng.normal(0, .02, (49408, tw))
    sd["positional_embedding"] = rng.normal(0, .01, (77, tw))
    sd["ln_final.weight"] = rng.normal(1, .02, (tw,))
    sd["ln_final.bias"] = rng.normal(0, .02, (tw,))
    sd["text_projection"] = rng.normal(0, .02, (tw, 1024))
    sd["logit_scale"] = np.array(np.log(1 / .07))
    for i in range(tl):
        p = f"transformer.resblocks.{i}"
        sd[f"{p}.ln_1.weight"] = rng.normal(1, .02, (tw,))
        sd[f"{p}.ln_1.bias"] = rng.normal(0, .02, (tw,))
        sd[f"{p}.ln_2.weight"] = rng.normal(1, .02, (tw,))
        sd[f"{p}.ln_2.bias"] = rng.normal(0, .02, (tw,))
        sd[f"{p}.attn.in_proj_weight"] = rng.normal(0, .02, (3 * tw, tw))
        sd[f"{p}.attn.in_proj_bias"] = rng.normal(0, .02, (3 * tw,))
        sd[f"{p}.attn.out_proj.weight"] = rng.normal(0, .02, (tw, tw))
        sd[f"{p}.attn.out_proj.bias"] = rng.normal(0, .02, (tw,))
        sd[f"{p}.mlp.c_fc.weight"] = rng.normal(0, .02, (4 * tw, tw))
        sd[f"{p}.mlp.c_fc.bias"] = rng.normal(0, .02, (4 * tw,))
        sd[f"{p}.mlp.c_proj.weight"] = rng.normal(0, .02, (tw, 4 * tw))
        sd[f"{p}.mlp.c_proj.bias"] = rng.normal(0, .02, (tw,))
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_fold_bn_math(rng):
    sd = {"x.weight": np.array([2.0], np.float32),
          "x.bias": np.array([1.0], np.float32),
          "x.running_mean": np.array([0.5], np.float32),
          "x.running_var": np.array([4.0], np.float32)}
    ab = fold_bn(sd, "x")
    x = np.array([3.0], np.float32)
    expected = (x - 0.5) / np.sqrt(4.0 + 1e-5) * 2.0 + 1.0
    np.testing.assert_allclose(x * ab["scale"] + ab["bias"], expected,
                               rtol=1e-6)


def test_rn50_load_and_forward(rng):
    cfg = get_model_config("rn50_openclip_openai")
    sd = _rn50_sd(rng)
    params, logit_scale = torch_state_dict_to_params(sd, 0, 12)
    model = CLIPModel(cfg, precision=FP32_PRECISION)

    # structure must match a fresh init
    init_params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    s1 = jax.tree_util.tree_map(lambda x: x.shape, init_params)
    s2 = jax.tree_util.tree_map(lambda x: np.asarray(x).shape, params)
    assert s1 == s2

    images = jnp.asarray(rng.normal(size=(2, 224, 224, 3)), jnp.float32)
    feats = model.apply({"params": params}, images, True,
                        method=CLIPModel.encode_image)
    assert feats.shape == (2, 1024)
    assert bool(jnp.isfinite(feats).all())
    txt = model.apply(
        {"params": params},
        jnp.zeros((2, 77), jnp.int32).at[:, 0].set(49406).at[:, 5].set(49407),
        True, method=CLIPModel.encode_text)
    assert txt.shape == (2, 1024)
