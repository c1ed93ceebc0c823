"""CLIP relevance heatmaps.

TPU-native replacement for the external GEM model the reference uses for
AttentiveMix (reference get_GEM_heatmap, utils/training.py:2458-2460; the
gem import is commented out at main.py:22, leaving the method dormant).
Here the heatmap is the cosine similarity between each projected patch
token and the image's own class-token embedding — a self-relevance map
computed entirely by the CLIP visual tower on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from swat_tpu.models.clip import CLIPModel


def clip_attention_heatmap(model: CLIPModel, params, images) -> jnp.ndarray:
    """images [B, H, W, 3] (normalized) -> heatmaps [B, gh, gw] in [-1,1]."""
    tokens = model.apply({"params": params}, images,
                         method=CLIPModel.encode_image_tokens)
    tokens = tokens / jnp.linalg.norm(tokens, axis=-1, keepdims=True)
    cls = tokens[:, 0]                       # [B, D]
    patches = tokens[:, 1:]                  # [B, S-1, D]
    sim = jnp.einsum("bd,bsd->bs", cls, patches)
    b, s = sim.shape
    g = int(round(s ** 0.5))
    return sim.reshape(b, g, g)
