"""Top-K prompt-pool zero-shot scoring.

Working TPU-native version of the reference's dormant ``validate_topK``
(testing.py:490-545): instead of classifying against each class's *mean*
prompt embedding, score a class by the mean of the top-K cosine
similarities between the image and that class's full prompt pool — one
batched matmul over the padded [C, P_max, D] prompt bank plus a masked
top_k, no per-class python loop.
"""

from __future__ import annotations

from typing import Dict, Mapping

import jax
import jax.numpy as jnp
import numpy as np


def build_prompt_bank(prompt_tensors: Mapping[str, dict]):
    """Pad per-class prompt pools to [C, P_max, D] + [C, P_max] mask."""
    cids = sorted(prompt_tensors, key=int)
    pools = [np.asarray(prompt_tensors[c]["all"], np.float32) for c in cids]
    p_max = max(p.shape[0] for p in pools)
    d = pools[0].shape[1]
    bank = np.zeros((len(cids), p_max, d), np.float32)
    mask = np.zeros((len(cids), p_max), bool)
    for i, p in enumerate(pools):
        bank[i, : p.shape[0]] = p
        mask[i, : p.shape[0]] = True
    return jnp.asarray(bank), jnp.asarray(mask)


def topk_prompt_logits(image_features, bank, mask, k: int = 3):
    """[B, D] x [C, P, D] -> [B, C]: per class, mean of the top-k prompt
    similarities (k clamped per the reference's per-class pool-size rule,
    testing.py:517-520)."""
    k = min(k, int(bank.shape[1]))

    @jax.jit
    def run(feats, bank, mask):
        sims = jnp.einsum("bd,cpd->bcp", feats, bank,
                          preferred_element_type=jnp.float32)
        sims = jnp.where(mask[None], sims, -jnp.inf)
        top, _ = jax.lax.top_k(sims, k)
        valid = jnp.isfinite(top)
        return jnp.where(valid, top, 0.0).sum(-1) / jnp.maximum(
            valid.sum(-1), 1)

    return run(jnp.asarray(image_features, jnp.float32), bank, mask)


def validate_topk(image_features, labels, prompt_tensors, k: int = 3):
    """Returns top-1 accuracy (%) under top-K prompt scoring."""
    bank, mask = build_prompt_bank(prompt_tensors)
    logits = topk_prompt_logits(image_features, bank, mask, k)
    preds = np.asarray(jnp.argmax(logits, axis=-1))
    return float((preds == np.asarray(labels)).mean() * 100.0)
