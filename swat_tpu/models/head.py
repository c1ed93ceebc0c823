"""Bias-free linear classifier head.

Functional equivalent of ``MyLinear`` (reference utils/models.py:47-72): a
single weight matrix [num_classes, embed_dim], initialized either from the
mean text-prompt embeddings per class (``cls_init`` in
{'text','REAL-Prompt','REAL-Linear'}, reference utils/models.py:29-32) or
randomly (reference utils/models.py:34-37).  The head is just an array leaf
in the train state — WiSE-FT interpolation and tau-normalization become plain
array arithmetic (reference main.py:27-73,100-129).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_head_from_prompts(class_embeddings: jnp.ndarray) -> jnp.ndarray:
    """class_embeddings: [num_classes, embed_dim] (mean-of-prompt, already
    normalized — see `swat_tpu.data.prompts.class_embedding_matrix`)."""
    return jnp.asarray(class_embeddings, dtype=jnp.float32)


def init_head_random(key, num_classes: int, embed_dim: int) -> jnp.ndarray:
    """Matches torch nn.Linear default init: U(-1/sqrt(in), 1/sqrt(in))."""
    bound = 1.0 / (embed_dim ** 0.5)
    return jax.random.uniform(
        key, (num_classes, embed_dim), jnp.float32, -bound, bound)


def head_logits(head: jnp.ndarray, features: jnp.ndarray) -> jnp.ndarray:
    """[B, D] x [C, D] -> [B, C] in fp32 (small matmul, keep exact)."""
    return jnp.dot(features.astype(jnp.float32), head.T,
                   precision="highest", preferred_element_type=jnp.float32)


def tau_normalize(head: jnp.ndarray, tau: float) -> jnp.ndarray:
    """w_c /= ||w_c||^tau (reference main.py:38)."""
    norms = jnp.linalg.norm(head, axis=-1, keepdims=True)
    return head / jnp.power(norms, tau)


def wise_ft_head(learned: jnp.ndarray, zeroshot: jnp.ndarray,
                 alpha: float) -> jnp.ndarray:
    """alpha * learned + (1-alpha) * zeroshot (reference main.py:147)."""
    return alpha * learned + (1.0 - alpha) * zeroshot


def wise_ft_params(finetuned_params, zeroshot_params, alpha: float):
    """Backbone interpolation (reference main.py:76-98) as pytree math."""
    return jax.tree_util.tree_map(
        lambda a, b: alpha * a + (1.0 - alpha) * b,
        finetuned_params, zeroshot_params)
