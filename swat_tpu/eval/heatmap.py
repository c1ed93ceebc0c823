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


def _patch_similarity_map(model: CLIPModel, params, images,
                          query_of_tokens) -> jnp.ndarray:
    """Cosine map between every projected patch token and a per-image
    query vector ([B, D], produced by `query_of_tokens` from the
    normalized token array) -> [B, gh, gw]."""
    tokens = model.apply({"params": params}, images,
                         method=CLIPModel.encode_image_tokens)
    tokens = tokens / jnp.linalg.norm(tokens, axis=-1, keepdims=True)
    patches = tokens[:, 1:]                  # [B, S-1, D]
    query = jnp.asarray(query_of_tokens(tokens), tokens.dtype)
    sim = jnp.einsum("bd,bsd->bs", query, patches)
    b, s = sim.shape
    g = int(round(s ** 0.5))
    return sim.reshape(b, g, g)


def clip_attention_heatmap(model: CLIPModel, params, images) -> jnp.ndarray:
    """images [B, H, W, 3] (normalized) -> heatmaps [B, gh, gw] in [-1,1]:
    self-relevance of each patch token to the image's class token."""
    return _patch_similarity_map(model, params, images,
                                 lambda tokens: tokens[:, 0])


def clip_text_heatmap(model: CLIPModel, params, images,
                      text_embeds) -> jnp.ndarray:
    """GEM-style text-conditioned localization map.

    The reference's AttentiveMix hands GEM a per-image localization text
    chosen by --attentive_name (the class's common/scientific name or the
    generic 'bird', utils/training.py:2717-2731) and takes the heatmap of
    that text over the image.  Here: cosine similarity between each
    projected patch token and the per-image text embedding.

    images [B, H, W, 3] (normalized), text_embeds [B, D] (normalized,
    from a frozen text-tower bank) -> heatmaps [B, gh, gw] in [-1, 1].
    """
    return _patch_similarity_map(model, params, images,
                                 lambda _: text_embeds)
