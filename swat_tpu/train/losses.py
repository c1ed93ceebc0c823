"""Loss registry (functional).

Mirrors reference utils/losses.py: CE, WeightedCE (few-shot vs retrieved
sample weights via the source flag), Focal, BalancedSoftmax.  All losses are
pure functions of (logits, labels, source) so they can live inside jitted
train steps; `set_loss` dispatch mirrors reference utils/losses.py:9-23.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

LossFn = Callable[[jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray]],
                  jnp.ndarray]


def _ce_per_sample(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]


def cross_entropy(logits, labels, source=None):
    return _ce_per_sample(logits, labels).mean()


def make_weighted_ce(fewshot_weight: float = 1.0) -> LossFn:
    """source==1 (few-shot) samples get ``fewshot_weight``, retrieved get 1
    (reference WeightedCELoss, utils/losses.py:74-96)."""

    def loss(logits, labels, source):
        w = source.astype(jnp.float32) * fewshot_weight + (
            1.0 - source.astype(jnp.float32))
        return (_ce_per_sample(logits, labels) * w).mean()

    return loss


def make_focal(alpha: float = 1.0, gamma: float = 2.0) -> LossFn:
    """reference FocalLoss utils/losses.py:26-46 (with its 1e-8 clamp)."""

    def loss(logits, labels, source=None):
        ce = jnp.clip(_ce_per_sample(logits, labels), 1e-8, None)
        pt = jnp.exp(-ce)
        return (alpha * (1 - pt) ** gamma * ce).mean()

    return loss


def make_balanced_softmax(cls_num_list: Sequence[int]) -> LossFn:
    """log-prior-adjusted CE (reference BalancedSoftmaxLoss,
    utils/losses.py:99-111)."""
    counts = jnp.asarray(cls_num_list, jnp.float32)
    log_prior = jnp.log(counts / counts.sum())[None, :]

    def loss(logits, labels, source=None):
        return _ce_per_sample(logits + log_prior, labels).mean()

    return loss


def set_loss(loss_name: str, *, fewshot_weight: float = 1.0,
             focal_alpha: float = 1.0, focal_gamma: float = 2.0,
             cls_num_list: Optional[Sequence[int]] = None) -> LossFn:
    if loss_name == "CE":
        return cross_entropy
    if loss_name == "WeightedCE":
        return make_weighted_ce(fewshot_weight)
    if loss_name == "Focal":
        return make_focal(focal_alpha, focal_gamma)
    if loss_name == "BalancedSoftmax":
        if cls_num_list is None:
            raise ValueError("BalancedSoftmax needs cls_num_list")
        return make_balanced_softmax(cls_num_list)
    raise NotImplementedError(f"Loss {loss_name} not implemented.")


def mixup_criterion(loss: LossFn, logits, y_a, y_b, lam, source=None):
    """lam * L(y_a) + (1-lam) * L(y_b) (reference utils/training.py:1157)."""
    return (lam * loss(logits, y_a, source)
            + (1.0 - lam) * loss(logits, y_b, source))


def mixup_criterion_lam_vector(logits, y_a, y_b, lam_vec):
    """Per-sample lambdas, SUMMED over the batch — deliberately matching the
    reference's mixup_criterion_lam_list (utils/training.py:1160-1162),
    which sums per-sample CE instead of averaging (saliencymix/attentivemix
    use this; the ~bsz× larger gradient scale is part of the method's
    published behavior)."""
    ce_a = _ce_per_sample(logits, y_a)
    ce_b = _ce_per_sample(logits, y_b)
    return jnp.sum(lam_vec * ce_a + (1.0 - lam_vec) * ce_b)
