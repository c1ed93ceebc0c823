"""Train state: one pytree holding model params, classifier head,
logit_scale, and optimizer state.

The trainable tree is {'model': ..., 'head': ..., 'logit_scale': ...} so a
single optax.multi_transform drives the reference's param groups
(utils/optimizers.py:38-127): head & logit_scale at lr_classifier, visual
tower at lr_backbone, text tower / frozen parts zeroed.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
import optax

from swat_tpu.train.optim import (
    LOG100,
    WARMUP_ITER,
    build_optimizer,
    label_params,
    trains_logit_scale,
)


@flax.struct.dataclass
class TrainState:
    model: Any                 # CLIP param tree
    head: jnp.ndarray          # [num_classes, embed_dim]
    logit_scale: jnp.ndarray   # scalar (log of the scale)
    opt_state: Any
    step: jnp.ndarray

    @property
    def trainable(self):
        return {"model": self.model, "head": self.head,
                "logit_scale": self.logit_scale}

    def replace_trainable(self, tree, **kw):
        return self.replace(model=tree["model"], head=tree["head"],
                            logit_scale=tree["logit_scale"], **kw)


def init_logit_scale(method: str, temperature: float = 0.07) -> float:
    """ln(1/temperature) for finetune/FLYP (utils/optimizers.py:80,119),
    fixed ln(100) for frozen methods (:51-59)."""
    if trains_logit_scale(method):
        return float(np.log(1.0 / temperature))
    return LOG100


def make_labels(params, method: str, head=None, locked_text: bool = False):
    """Label tree matching the trainable structure. ``head`` may be an
    array or a pytree of arrays (multitask uses {'cls','dataset'}).

    FLYP's head is NOT an optimizer param (reference utils/optimizers.py:
    83-120 passes only model params + projectors + logit_scale; the head
    is rebuilt from the text tower each eval, utils/training.py:489) —
    labeling it 'head' would weight-decay it every step with zero grads
    under AdamW, a drift the reference does not have."""
    head_tag = "frozen" if method == "FLYP" else "head"
    head_labels = (head_tag if head is None else
                   jax.tree_util.tree_map(lambda _: head_tag, head))
    # fixmatch: logit_scale is in the reference's optimizer (the finetune
    # branch, utils/optimizers.py:80-81) but the fixmatch loss never uses
    # it (utils/training.py:893-908 — the scaled variant is commented
    # out), so its torch grad stays None and AdamW SKIPS it: it remains
    # bit-constant at ln(1/0.07).  Labeling it 'head' here would apply
    # decoupled weight decay with zero grads — the same phantom-decay
    # drift as FLYP's head.
    ls_trains = trains_logit_scale(method) and method != "fixmatch"
    return {
        "model": label_params(params, method, locked_text),
        "head": head_labels,
        "logit_scale": "head" if ls_trains else "frozen",
    }


def create_train_state(params, head, method: str, *,
                       lr_classifier: float = 1e-4,
                       lr_backbone: float = 1e-6,
                       total_iter: int = 1000,
                       wd: float = 1e-2,
                       optim_type: str = "AdamW",
                       lr_projector: Optional[float] = None,
                       temperature: float = 0.07,
                       logit_scale: Optional[float] = None,
                       locked_text: bool = False,
                       warmup_iter: int = WARMUP_ITER):
    """Returns (state, tx). ``params``/``head`` may be host arrays; they are
    device_put once here (host trees re-upload per step otherwise)."""
    from swat_tpu.models.quant import is_quantized

    if is_quantized(params):
        raise ValueError(
            "refusing to train on an int8-quantized tree: gradients "
            "through the rounding are zero (models/quant.py is "
            "inference-only; keep the fp32 tree for training)")
    labels = make_labels(params, method, head, locked_text)
    tx = build_optimizer(labels, lr_classifier=lr_classifier,
                         lr_backbone=lr_backbone, total_iter=total_iter,
                         wd=wd, optim_type=optim_type,
                         lr_projector=lr_projector, warmup_iter=warmup_iter)
    if logit_scale is None:
        logit_scale = init_logit_scale(method, temperature)
    # copy=True: the state owns its buffers — steps donate them, and
    # aliasing caller arrays would delete the caller's copies too
    trainable = {
        "model": jax.tree_util.tree_map(
            lambda x: jnp.array(x, copy=True), params),
        "head": jax.tree_util.tree_map(
            lambda h: jnp.array(h, jnp.float32, copy=True), head),
        "logit_scale": jnp.array(logit_scale, jnp.float32),
    }
    trainable = jax.device_put(trainable)
    opt_state = tx.init(trainable)
    state = TrainState(model=trainable["model"], head=trainable["head"],
                       logit_scale=trainable["logit_scale"],
                       opt_state=opt_state, step=jnp.zeros((), jnp.int32))
    return state, tx
