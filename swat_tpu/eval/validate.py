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
from swat_tpu.eval.metrics import confusion_matrix_update
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.head import head_logits
from swat_tpu.train.losses import LossFn, cross_entropy


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

        self._encode = jax.jit(encode)
        self._eval_feats = jax.jit(eval_feats)
        self._mt_eval_cache: dict = {}

    def validate(self, params, head, logit_scale, loader, *,
                 pre_extracted: bool = False,
                 return_confusion: bool = False,
                 predict_labels_path: str | None = None):
        """Returns (acc_percent, mean_loss, confusion_matrix|None) —
        signature parity with reference validate (testing.py:403).
        ``predict_labels_path`` dumps '<pred> <max_logit>' lines for
        pseudo-labeling (reference testing.py:466-480)."""
        cm = (np.zeros((self.num_classes, self.num_classes), np.int64)
              if return_confusion else None)
        # one jitted call per batch; the (correct, count, loss) carry
        # rides inside it, so the plain acc/loss path issues NO eager
        # device ops and syncs once at the end (a host float()/int() per
        # batch costs one ~18 ms tunnel round trip each)
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
            preds, max_logits, carry = self._eval_feats(
                head, logit_scale, feats, jnp.asarray(batch["labels"]),
                jnp.asarray(batch["source"]),
                jnp.asarray(batch["mask"]), carry)
            batches += 1
            if cm is not None:
                cm = confusion_matrix_update(
                    cm, np.asarray(preds), np.asarray(batch["labels"]),
                    np.asarray(batch["mask"]))
            if predict_labels_path:
                m = np.asarray(batch["mask"])
                predicted.extend(zip(np.asarray(preds)[m].tolist(),
                                     np.asarray(max_logits)[m].tolist()))
        if predict_labels_path:
            with open(predict_labels_path, "w") as f:
                for pred, logit in predicted:
                    f.write(f"{pred} {logit}\n")
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
    cm = np.zeros((num_classes, num_classes), np.int64)
    dcm = np.zeros((2, 2), np.int64)
    logit_scale = jnp.asarray(logit_scale, jnp.float32)

    # one jitted kernel per batch (both heads + per-sample loss fused);
    # cached on the evaluator per loss object so repeated validation
    # passes don't retrace
    cache = evaluator.__dict__.setdefault("_mt_eval_cache", {})
    run = cache.get(loss)
    if run is None:
        @jax.jit
        def run(cls_head, dataset_head, logit_scale, feats, labels,
                source, mask, carry):
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
            return preds, d_preds, carry

        cache[loss] = run

    carry = (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.float32(0))
    batches = 0
    cls_head = jnp.asarray(cls_head)
    dataset_head = jnp.asarray(dataset_head)
    for batch in loader:
        feats = evaluator._encode(params, batch["images"])
        preds, d_preds, carry = run(
            cls_head, dataset_head, logit_scale, feats,
            jnp.asarray(batch["labels"]), jnp.asarray(batch["source"]),
            jnp.asarray(batch["mask"]), carry)
        batches += 1
        mask = np.asarray(batch["mask"])
        cm = confusion_matrix_update(cm, np.asarray(preds),
                                     np.asarray(batch["labels"]), mask)
        dcm = confusion_matrix_update(dcm, np.asarray(d_preds),
                                      np.asarray(batch["source"]), mask)
    count = max(int(carry[2]), 1)
    acc = int(carry[0]) / count * 100.0
    d_acc = int(carry[1]) / count * 100.0
    return acc, float(carry[3]) / max(batches, 1), cm, d_acc, dcm


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
