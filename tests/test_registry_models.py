"""Every registry model config initializes with self-consistent shapes
(ViT-B/32, B/16, L/14, RN50 across pretrainings) — guards dims/heads/
embed_dim wiring against the OpenCLIP architectures."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import MODEL_REGISTRY, get_model_config


@pytest.mark.parametrize("name", [
    "vitb32_openclip_laion400m", "vitb16_openclip_laion400m",
    "vitb32_openclip_laion2b", "vitb32_clip", "rn50_openclip_openai",
])
def test_registry_config_shapes(name):
    cfg = get_model_config(name)
    model = CLIPModel(cfg)
    v = cfg.vision
    image_size = getattr(v, "image_size", 224)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, image_size, image_size, 3), jnp.float32),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    img_f = model.apply({"params": params},
                        jnp.zeros((1, image_size, image_size, 3)), True,
                        method=CLIPModel.encode_image)
    txt_f = model.apply(
        {"params": params},
        jnp.zeros((1, cfg.text.context_length), jnp.int32
                  ).at[0, 0].set(cfg.text.vocab_size - 1),
        True, method=CLIPModel.encode_text)
    assert img_f.shape == (1, cfg.embed_dim)
    assert txt_f.shape == (1, cfg.embed_dim)


def test_vitl14_dims_init_only():
    """L/14 is big; check param dims without a forward pass."""
    cfg = get_model_config("vitl14_openclip_laion400m")
    assert cfg.vision.width == 1024 and cfg.vision.layers == 24
    assert cfg.text.width == 768 and cfg.embed_dim == 768
    model = CLIPModel(cfg)
    shapes = jax.eval_shape(
        lambda k: model.init(
            k, jnp.zeros((1, 224, 224, 3), jnp.float32),
            jnp.zeros((1, 77), jnp.int32)),
        jax.random.PRNGKey(0))["params"]
    blocks = shapes["visual"]["transformer"]["blocks"]
    assert blocks["attn"]["qkv"]["kernel"].shape == (24, 1024, 3072)
    assert shapes["visual"]["proj"].shape == (1024, 768)
    assert shapes["text"]["text_projection"].shape == (768, 768)
