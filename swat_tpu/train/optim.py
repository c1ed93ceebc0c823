"""Optimizers and LR schedule.

Reproduces reference utils/optimizers.py exactly:

* per-iteration stepped schedule (scheduler.step() after every optimizer
  step, e.g. utils/training.py:1489): optimizer step i uses
    i == 0                 -> warmup_lr  (absolute, per LinearWarmupScheduler
                              get_lr at last_epoch==0, :202-203)
    1 <= i < 50            -> base_lr * i / 50          (:204-206)
    i >= 50                -> cosine anneal step s=i-49 over total_iter:
                              eta + (base-eta)(1+cos(pi*s/T))/2  (:31,176-178)
* warmup_lr = 1e-5 if lr_backbone > 5e-5 else 1e-6  (:32)
* AdamW betas (0.9, 0.999), weight decay on every group incl. logit_scale
  (:139-146); SGD momentum 0.9 with L2-coupled wd (:131-137)
* param groups by label: head & logit_scale at lr_classifier, visual tower
  at lr_backbone, text tower frozen for finetune methods (:38-81); FLYP
  trains both towers at lr_backbone with projectors at lr_projector
  (:83-120); probing/CMLP freeze the whole model (:53-59)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import optax

WARMUP_ITER = 50
ETA_MIN = 1e-9


def make_lr_schedule(base_lr: float, total_iter: int,
                     warmup_iter: int = WARMUP_ITER,
                     warmup_lr: float = 1e-6,
                     eta_min: float = ETA_MIN) -> Callable:
    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        warm = jnp.where(step == 0, warmup_lr,
                         base_lr * step / warmup_iter)
        s = step - (warmup_iter - 1)
        cos = eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * s / total_iter))
        return jnp.where(step < warmup_iter, warm, cos)

    return schedule


def default_warmup_lr(lr_backbone: float) -> float:
    return 1e-5 if lr_backbone > 5e-5 else 1e-6


def _adamw(schedule, wd: float):
    return optax.adamw(learning_rate=schedule, b1=0.9, b2=0.999,
                       eps=1e-8, weight_decay=wd)


def _sgd(schedule, wd: float):
    # torch SGD: grad += wd * p, then momentum, then lr
    return optax.chain(
        optax.add_decayed_weights(wd),
        optax.trace(decay=0.9, nesterov=False),
        optax.scale_by_learning_rate(schedule),
    )


def build_optimizer(labels, *, lr_classifier: float, lr_backbone: float,
                    total_iter: int, wd: float = 1e-2,
                    optim_type: str = "AdamW",
                    lr_projector: Optional[float] = None,
                    warmup_iter: int = WARMUP_ITER) -> optax.GradientTransformation:
    """labels: pytree (same structure as the grads) with values in
    {'head', 'backbone', 'projector', 'frozen'}."""
    warmup_lr = default_warmup_lr(lr_backbone)
    make = _adamw if optim_type == "AdamW" else _sgd

    def tx_for(base_lr):
        return make(make_lr_schedule(base_lr, total_iter, warmup_iter,
                                     warmup_lr), wd)

    transforms = {
        "head": tx_for(lr_classifier),
        "backbone": tx_for(lr_backbone),
        "projector": tx_for(lr_projector
                            if lr_projector is not None else lr_backbone),
        "frozen": optax.set_to_zero(),
    }
    return optax.multi_transform(transforms, labels)


# ---------------------------------------------------------------------------
# parameter labeling per method (reference set_params, utils/optimizers.py:38)

FINETUNE_METHODS = {
    "finetune", "finetune-multitask", "finetune-mixed", "dataset-cls",
    "mixup", "mixup-fs", "cutmix", "cutmix-fs", "resizemix",
    "saliencymix", "attentivemix", "CMO", "fixmatch",
}
FROZEN_METHODS = {"zeroshot", "probing", "REAL-Linear", "CMLP"}

LOG100 = 4.60517  # ln(100), fixed logit_scale for frozen methods (:51,58)


def _freeze_bn_stats(params, labels):
    """BN running statistics (AffineBN mean/var leaves) are state, not
    weights: force their label to 'frozen' whatever the method says (no
    AdamW step, no weight decay)."""

    def fix(path, _leaf, label):
        names = [getattr(k, "key", str(k)) for k in path]
        if names[-1] in ("mean", "var") and any(
                n.startswith("bn") or n == "down_bn" for n in names):
            return "frozen"
        return label

    return jax.tree_util.tree_map_with_path(fix, params, labels)


def label_params(params, method: str, locked_text: bool = False) -> Dict:
    """Label the *model* param tree. The head / logit_scale leaves are
    labeled by the train state itself (swat_tpu.train.state)."""

    def const(tag):
        return lambda tree: jax.tree_util.tree_map(lambda _: tag, tree)

    if method in FROZEN_METHODS:
        return const("frozen")(params)

    if method in FINETUNE_METHODS:
        # visual tower trains, text tower locked (lock_text_tower, :12-19)
        return _freeze_bn_stats(params, {
            "visual": const("backbone")(params["visual"]),
            "text": const("frozen")(params["text"]),
        })

    if method == "FLYP":
        vis = const("backbone")(params["visual"])
        vis["proj"] = "projector"
        if locked_text:
            # --locked_text freezes the text tower via lock_text_tower
            # (utils/optimizers.py:12-19, incl. text_projection) — but the
            # FLYP branch then re-enables BOTH projectors and appends them
            # as the lr_projector group (:103-120), so text_projection
            # still trains even with the tower locked.
            txt = const("frozen")(params["text"])
        else:
            txt = const("backbone")(params["text"])
        txt["text_projection"] = "projector"
        return _freeze_bn_stats(params, {"visual": vis, "text": txt})

    raise NotImplementedError(f"Method {method} not implemented.")


def trains_logit_scale(method: str) -> bool:
    """Finetune/FLYP methods learn logit_scale (init ln(1/temperature),
    :80,119); frozen methods pin it at ln(100) (:51-59)."""
    return method in FINETUNE_METHODS or method == "FLYP"
