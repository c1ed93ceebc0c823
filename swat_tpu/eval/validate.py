"""Evaluation: the `validate` path every trainer calls ~2x/epoch
(reference testing.py:403-486).

One jitted batch-eval function (encode -> head -> argmax + masked loss);
confusion-matrix accumulation on host over int counts.  Batches arrive
padded to a static shape with a validity mask (the TPU-native replacement
for torch's ragged final batch).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from swat_tpu.core.mesh import shard_batch
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.head import head_logits
from swat_tpu.train.losses import LossFn, cross_entropy


def cm_scatter_add(cm, preds, labels, mask, num_classes: int):
    """Device-side confusion update (rows=true, cols=pred): one
    scatter-add per batch inside the jitted eval carry, replacing the
    per-batch host accumulation (~18 ms tunnel sync each) the reference
    does via torchmetrics (testing.py:449-458).  Masked-out padding rows
    contribute 0."""
    idx = labels * num_classes + preds
    return (cm.reshape(-1).at[idx].add(mask.astype(cm.dtype))
            .reshape(num_classes, num_classes))


class Evaluator:
    """Reusable jitted eval for a fixed model; works for both image batches
    and pre-extracted feature batches."""

    def __init__(self, model: CLIPModel, num_classes: int,
                 loss: LossFn = cross_entropy, mesh=None):
        self.model = model
        self.num_classes = num_classes
        self.mesh = mesh
        self.loss = loss

        def encode(params, images):
            from swat_tpu.models import functional as F

            return F.encode_image(model, params, images, normalize=True,
                                   mode="infer")

        def eval_feats(head, logit_scale, feats, labels, source, mask,
                       carry):
            logits = head_logits(head, feats)
            preds = jnp.argmax(logits, axis=-1)
            max_logits = jnp.max(logits, axis=-1)
            correct = jnp.sum((preds == labels) & mask)
            scaled = logits * jnp.exp(logit_scale)
            per = _per_sample_loss(self.loss, scaled, labels, source)
            loss_sum = jnp.sum(per * mask)
            nb = jnp.sum(mask)
            # the running (correct, count, sum of batch-mean losses)
            # accumulates INSIDE the jitted call: every eager scalar op
            # here would be its own ~18 ms tunnel dispatch per batch
            carry = (carry[0] + correct, carry[1] + nb,
                     carry[2] + loss_sum / jnp.maximum(nb, 1))
            return preds, max_logits, carry

        def eval_feats_cm(head, logit_scale, feats, labels, source, mask,
                          carry, cm):
            # confusion-path variant: the [C, C] matrix rides the jitted
            # carry as a device-side scatter-add (like validate_features),
            # so return_confusion costs ONE host pull per split instead of
            # one ~18 ms tunnel sync per batch (reference accumulates per
            # batch on host via torchmetrics, testing.py:449-458)
            preds, max_logits, carry = eval_feats(
                head, logit_scale, feats, labels, source, mask, carry)
            cm = cm_scatter_add(cm, preds, labels, mask, num_classes)
            return preds, max_logits, carry, cm

        self._encode = jax.jit(encode)
        self._eval_feats = jax.jit(eval_feats)
        self._eval_feats_cm = jax.jit(eval_feats_cm)
        self._mt_eval_cache: dict = {}

    def validate(self, params, head, logit_scale, loader, *,
                 pre_extracted: bool = False,
                 return_confusion: bool = False,
                 predict_labels_path: str | None = None):
        """Returns (acc_percent, mean_loss, confusion_matrix|None) —
        signature parity with reference validate (testing.py:403).
        ``predict_labels_path`` dumps '<pred> <max_logit>' lines for
        pseudo-labeling (reference testing.py:466-480)."""
        # one jitted call per batch; the (correct, count, loss) carry —
        # and, with return_confusion, the [C, C] matrix — ride inside it,
        # so both paths issue NO eager per-batch device ops and sync once
        # at the end (a host float()/int() per batch costs one ~18 ms
        # tunnel round trip each)
        cm_dev = (jnp.zeros((self.num_classes, self.num_classes), jnp.int32)
                  if return_confusion else None)
        carry = (jnp.int32(0), jnp.int32(0), jnp.float32(0))
        batches = 0
        predicted: list = []
        logit_scale = jnp.asarray(logit_scale, jnp.float32)
        for batch in loader:
            if self.mesh is not None:
                batch = shard_batch(self.mesh, batch)
            if pre_extracted or "features" in batch:
                feats = batch["features"]
            else:
                feats = self._encode(params, batch["images"])
            args = (head, logit_scale, feats,
                    jnp.asarray(batch["labels"]),
                    jnp.asarray(batch["source"]),
                    jnp.asarray(batch["mask"]), carry)
            if return_confusion:
                preds, max_logits, carry, cm_dev = self._eval_feats_cm(
                    *args, cm_dev)
            else:
                preds, max_logits, carry = self._eval_feats(*args)
            batches += 1
            if predict_labels_path:
                m = np.asarray(batch["mask"])
                predicted.extend(zip(np.asarray(preds)[m].tolist(),
                                     np.asarray(max_logits)[m].tolist()))
        if predict_labels_path:
            with open(predict_labels_path, "w") as f:
                for pred, logit in predicted:
                    f.write(f"{pred} {logit}\n")
        cm = np.asarray(cm_dev, np.int64) if return_confusion else None
        acc = int(carry[0]) / max(int(carry[1]), 1) * 100.0
        return acc, float(carry[2]) / max(batches, 1), cm


def validate_multitask(evaluator: Evaluator, params, cls_head, dataset_head,
                       logit_scale, loader, loss: LossFn = cross_entropy):
    """Dual-head validation for finetune-multitask (reference
    validate_multitask, testing.py:189-278): the class head is scored
    against labels, the binary dataset head against the source flag, over
    the same loader pass.

    Returns (acc%, mean_loss, cm, dataset_acc%, dataset_cm)."""
    num_classes = int(np.asarray(cls_head).shape[0])
    logit_scale = jnp.asarray(logit_scale, jnp.float32)

    # one jitted kernel per batch (both heads + per-sample loss + BOTH
    # confusion scatter-adds fused into the carry -> O(1) host syncs per
    # split; multitask validates every epoch, so the old per-batch host
    # accumulation cost ~batches x 18 ms/epoch over the tunnel); cached
    # on the evaluator per (loss, num_classes) so repeated validation
    # passes don't retrace
    cache = evaluator.__dict__.setdefault("_mt_eval_cache", {})
    run = cache.get((loss, num_classes))
    if run is None:
        @jax.jit
        def run(cls_head, dataset_head, logit_scale, feats, labels,
                source, mask, carry, cm, dcm):
            logits = head_logits(cls_head, feats)
            d_preds = jnp.argmax(head_logits(dataset_head, feats), axis=-1)
            preds = jnp.argmax(logits, axis=-1)
            per = _per_sample_loss(loss, logits * jnp.exp(logit_scale),
                                   labels, source)
            nb = jnp.sum(mask)
            carry = (carry[0] + jnp.sum((preds == labels) & mask),
                     carry[1] + jnp.sum((d_preds == source) & mask),
                     carry[2] + nb,
                     carry[3] + jnp.sum(per * mask) / jnp.maximum(nb, 1))
            cm = cm_scatter_add(cm, preds, labels, mask, num_classes)
            dcm = cm_scatter_add(dcm, d_preds, source, mask, 2)
            return carry, cm, dcm

        cache[(loss, num_classes)] = run

    carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.float32(0))
    cm = jnp.zeros((num_classes, num_classes), jnp.int32)
    dcm = jnp.zeros((2, 2), jnp.int32)
    batches = 0
    cls_head = jnp.asarray(cls_head)
    dataset_head = jnp.asarray(dataset_head)
    for batch in loader:
        feats = evaluator._encode(params, batch["images"])
        carry, cm, dcm = run(
            cls_head, dataset_head, logit_scale, feats,
            jnp.asarray(batch["labels"]), jnp.asarray(batch["source"]),
            jnp.asarray(batch["mask"]), carry, cm, dcm)
        batches += 1
    count = max(int(carry[2]), 1)
    acc = int(carry[0]) / count * 100.0
    d_acc = int(carry[1]) / count * 100.0
    return (acc, float(carry[3]) / max(batches, 1),
            np.asarray(cm, np.int64), d_acc, np.asarray(dcm, np.int64))


def _per_sample_loss(loss: LossFn, logits, labels, source):
    """Recover per-sample losses from a mean-reducing LossFn by evaluating
    it per row under vmap (keeps one loss definition for train and eval)."""
    return jax.vmap(
        lambda lg, lb, sc: loss(lg[None], lb[None], sc[None]))(
        logits, labels, source)


def validate_features(head, logit_scale, features, labels,
                      num_classes: int, loss: LossFn = cross_entropy,
                      source=None):
    """Single-shot eval over a full pre-extracted feature matrix (the
    'pre_extracted' fast path, SURVEY.md §7 step 5). Returns
    (acc%, loss, confusion_matrix)."""
    features = jnp.asarray(features)
    labels = jnp.asarray(labels)
    if source is None:
        source = jnp.full_like(labels, -1)

    @jax.jit
    def run(head, logit_scale, feats, labels, source):
        logits = head_logits(head, feats)
        preds = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((preds == labels).astype(jnp.float32)) * 100.0
        scaled = logits * jnp.exp(logit_scale)
        loss_val = loss(scaled, labels, source)
        onehot_idx = labels * num_classes + preds
        cm = jnp.zeros((num_classes * num_classes,), jnp.int32).at[
            onehot_idx].add(1).reshape(num_classes, num_classes)
        return acc, loss_val, cm

    acc, loss_val, cm = run(head, jnp.asarray(logit_scale, jnp.float32),
                            features, labels, source)
    return float(acc), float(loss_val), np.asarray(cm)
