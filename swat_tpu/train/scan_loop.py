"""Resident-dataset epoch execution: whole-epoch `lax.scan` under one jit.

The few-shot splits SWAT trains on are small (10^2-10^5 images), so the
entire split fits in HBM as uint8 canvases.  Instead of dispatching one
jitted step per batch (each dispatch pays host-round-trip latency — severe
over a tunneled TPU, nontrivial everywhere), an epoch becomes ONE device
program: `lax.scan` over per-step batch indices, gathering batches from the
resident arrays, running augment -> mix -> fwd/bwd -> update per step.

Same idea for eval: the preprocessed eval split lives on device as uint8
pixels and a whole validation pass is one jit (encode + logits + confusion
matrix accumulated in the scan carry).

This has no reference counterpart (the reference streams PIL batches from
DataLoader workers every step); it is the TPU-native fast path.  The
per-step body is LITERALLY the streaming factories' body
(steps.make_mix_fn + steps.make_encode_loss), so for identical batches
and per-step keys the scan epoch and the twin-verified streaming steps
produce the same trajectory — a tested property for every SCAN_METHODS /
SCAN_TWIN_METHODS entry
(tests/test_scan_loop.py::test_scan_epoch_matches_streaming_steps), not
a docstring claim.
"""

from __future__ import annotations

import functools
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swat_tpu.data.splits import Sample
from swat_tpu.data.transforms import CANVAS_SIZE
from swat_tpu.kernels import augment as aug
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.head import head_logits
from swat_tpu.train.losses import LossFn, cross_entropy
from swat_tpu.train.state import TrainState


class ResidentData:
    """A split resident in HBM: uint8 canvases + valid dims + labels."""

    def __init__(self, canvases, valid_hw, labels, source):
        self.canvases = canvases
        self.valid_hw = valid_hw
        self.labels = labels
        self.source = source
        self.n = int(canvases.shape[0])

    @classmethod
    def from_samples(cls, samples, canvas: int = CANVAS_SIZE,
                     num_workers: int = 16, sharding=None):
        from swat_tpu.data import native

        if native.available():
            canvases, valid_hw = native.batch_train_canvases(
                [s.path for s in samples], canvas, num_workers)
        else:
            import concurrent.futures as cf

            from swat_tpu.data.transforms import load_image, train_canvas

            def load(s: Sample):
                return train_canvas(load_image(s.path), canvas)

            with cf.ThreadPoolExecutor(num_workers) as pool:
                loaded = list(pool.map(load, samples))
            canvases = np.stack([c for c, _ in loaded])
            valid_hw = np.asarray([hw for _, hw in loaded], np.int32)
        labels = np.asarray([s.label for s in samples], np.int32)
        source = np.asarray([s.is_fewshot for s in samples], np.int32)
        put = (lambda x: jax.device_put(x, sharding)) if sharding \
            else jax.device_put
        return cls(put(canvases), put(valid_hw), put(labels), put(source))

    def nbytes(self) -> int:
        return sum(int(a.size) * a.dtype.itemsize
                   for a in (self.canvases, self.valid_hw, self.labels,
                             self.source))


def epoch_permutation(rng: np.random.Generator, n: int, batch_size: int
                      ) -> np.ndarray:
    """[steps, batch_size] shuffled indices, drop-last."""
    order = rng.permutation(n)
    steps = n // batch_size
    return order[: steps * batch_size].reshape(steps, batch_size).astype(
        np.int32)


SCAN_METHODS = {"finetune", "cutmix", "mixup", "resizemix", "saliencymix"}
SCAN_TWIN_METHODS = {"cutmix-fs", "finetune-mixed", "mixup-fs", "CMO"}


def make_scan_epoch(model: CLIPModel, tx, method: str,
                    loss: LossFn = cross_entropy, *,
                    mixup_alpha: float = 1.0, cutmix_beta: float = 1.0,
                    mix_prob: float = 0.5, image_size: int = 224,
                    mesh=None, aug_dtype=jnp.float32):
    """Returns run(state, data, perm, key[, twin_data, twin_perm]) ->
    (state, mean_loss), one device dispatch per epoch.

    Single-loader methods (SCAN_METHODS) ignore the twin arguments;
    twin methods (SCAN_TWIN_METHODS) gather the second batch from a
    second resident dataset (the reference's two-loader pattern, e.g.
    utils/training.py:1566-1620, with CMO's inverse-frequency sampling
    expressed through the twin permutation).

    With ``mesh``, every gathered batch is constrained to the ``data``
    axis so the whole scan epoch runs dp-sharded (GSPMD inserts the
    cross-shard gather from the resident arrays and the grad psum) —
    the flagship resident mode uses all chips, not one."""
    _dsh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _dsh(ndim):
            return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))

    from swat_tpu.models import functional as F
    from swat_tpu.train.steps import make_encode_loss, make_mix_fn

    # THE same per-step body the streaming factories run (steps.make_*
    # compose the identical mix/encode_loss pair), so the scan path is
    # trajectory-IDENTICAL to the twin-verified streaming path —
    # tests/test_scan_loop.py::test_scan_epoch_matches_streaming_steps
    # pins it for every SCAN_METHODS / SCAN_TWIN_METHODS entry.
    mix = make_mix_fn(method, mixup_alpha=mixup_alpha,
                      cutmix_beta=cutmix_beta, mix_prob=mix_prob,
                      image_size=image_size, aug_dtype=aug_dtype)
    encode_loss = make_encode_loss(model, loss)

    def one_step(state: TrainState, batch, twin, key):
        def loss_fn(trainable):
            return encode_loss(trainable, mix(trainable, batch, twin, key))

        (val, bn_upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable)
        updates, new_opt = tx.update(grads, state.opt_state,
                                     state.trainable)
        new_tr = jax.tree_util.tree_map(lambda p, u: p + u,
                                        state.trainable, updates)
        if bn_upd:
            new_tr = {**new_tr, "model": {
                **new_tr["model"],
                "visual": F.apply_bn_updates(new_tr["model"]["visual"],
                                             bn_upd)}}
        return state.replace_trainable(new_tr, opt_state=new_opt,
                                       step=state.step + 1), val

    def _gather(arrays, idx):
        b = {
            "canvases": arrays[0][idx], "valid_hw": arrays[1][idx],
            "labels": arrays[2][idx], "source": arrays[3][idx],
        }
        if _dsh is not None:
            b = {k: jax.lax.with_sharding_constraint(v, _dsh(v.ndim))
                 for k, v in b.items()}
        return b

    @functools.partial(jax.jit, donate_argnums=0, static_argnums=(7,))
    def epoch_fn(state, primary, perm, key, twin, twin_perm, _unused,
                 has_twin):
        steps = perm.shape[0]
        keys = jax.random.split(key, steps)

        def body(carry, xs):
            st, loss_sum = carry
            if has_twin:
                idx, tidx, k = xs
                batch = _gather(primary, idx)
                tw = _gather(twin, tidx)
            else:
                idx, k = xs
                batch = _gather(primary, idx)
                tw = None
            st, val = one_step(st, batch, tw, k)
            return (st, loss_sum + val), None

        xs = (perm, twin_perm, keys) if has_twin else (perm, keys)
        (state, loss_sum), _ = jax.lax.scan(
            body, (state, jnp.float32(0)), xs)
        return state, loss_sum / steps

    def run(state, data: ResidentData, perm: np.ndarray, key,
            twin_data: "ResidentData" = None,
            twin_perm: Optional[np.ndarray] = None):
        primary = (data.canvases, data.valid_hw, data.labels, data.source)
        has_twin = twin_data is not None
        twin = (primary if not has_twin else
                (twin_data.canvases, twin_data.valid_hw, twin_data.labels,
                 twin_data.source))
        tp = (jnp.asarray(twin_perm) if has_twin
              else jnp.zeros((perm.shape[0], 1), jnp.int32))
        return epoch_fn(state, primary, jnp.asarray(perm), key, twin, tp,
                        None, has_twin)

    return run


# ---------------------------------------------------------------------------
# resident eval: one dispatch per validation pass


class ResidentEval:
    """Eval split preprocessed once: uint8 center-cropped pixels on device,
    padded to a batch multiple with a mask."""

    def __init__(self, images_u8, labels, mask, num_classes: int,
                 source=None):
        self.images_u8 = images_u8
        self.labels = labels
        self.mask = mask
        self.num_classes = num_classes
        self.source = (source if source is not None
                       else jnp.full_like(labels, -1))

    @classmethod
    def from_samples(cls, samples, num_classes: int, n_px: int = 224,
                     batch_size: int = 256, num_workers: int = 16,
                     sharding=None):
        from swat_tpu.data import native

        if native.available():
            images = list(native.batch_eval_pixels(
                [s.path for s in samples], n_px, num_workers))
        else:
            import concurrent.futures as cf

            from swat_tpu.data.transforms import eval_crop, load_image

            def load(s: Sample):
                return np.asarray(eval_crop(load_image(s.path), n_px),
                                  np.uint8)

            with cf.ThreadPoolExecutor(num_workers) as pool:
                images = list(pool.map(load, samples))
        n = len(images)
        pad = (-n) % batch_size
        if pad:
            images += [np.zeros_like(images[0])] * pad
        images = np.stack(images)
        labels = np.asarray([s.label for s in samples] + [0] * pad,
                            np.int32)
        source = np.asarray([s.is_fewshot for s in samples] + [0] * pad,
                            np.int32)
        mask = np.arange(n + pad) < n
        put = (lambda x: jax.device_put(x, sharding)) if sharding \
            else jax.device_put
        return cls(put(images), put(labels), put(mask), num_classes,
                   put(source))


def make_scan_eval(model: CLIPModel, num_classes: int, batch_size: int = 256,
                   loss: LossFn = cross_entropy, mesh=None):
    """Returns eval_fn(params, head, logit_scale, resident_eval) ->
    (acc%, mean_loss, confusion_matrix) in ONE device dispatch.

    ``loss`` is the run's configured LossFn (CE/WeightedCE/Focal/
    BalancedSoftmax) evaluated per sample — same numbers as the streaming
    Evaluator path (reference validate computes args.loss,
    testing.py:441-447)."""
    from swat_tpu.eval.validate import _per_sample_loss

    _dsh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        def _dsh(ndim):
            return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))

    @jax.jit
    def run(params, head, logit_scale, images_u8, labels, mask, source):
        n = images_u8.shape[0]
        steps = n // batch_size

        def body(carry, i):
            correct, loss_sum, cnt, cm = carry
            sl = jax.lax.dynamic_slice_in_dim(images_u8, i * batch_size,
                                              batch_size)
            lb = jax.lax.dynamic_slice_in_dim(labels, i * batch_size,
                                              batch_size)
            mk = jax.lax.dynamic_slice_in_dim(mask, i * batch_size,
                                              batch_size)
            sc = jax.lax.dynamic_slice_in_dim(source, i * batch_size,
                                              batch_size)
            if _dsh is not None:
                sl = jax.lax.with_sharding_constraint(sl, _dsh(sl.ndim))
                lb = jax.lax.with_sharding_constraint(lb, _dsh(1))
                mk = jax.lax.with_sharding_constraint(mk, _dsh(1))
                sc = jax.lax.with_sharding_constraint(sc, _dsh(1))
            x = aug.normalize(sl)
            from swat_tpu.models import functional as F

            feats = F.encode_image(model, params, x, normalize=True,
                                   mode="infer")
            logits = head_logits(head, feats)
            preds = jnp.argmax(logits, axis=-1)
            correct += jnp.sum((preds == lb) & mk)
            scaled = (logits * jnp.exp(logit_scale)).astype(jnp.float32)
            per = _per_sample_loss(loss, scaled, lb, sc)
            loss_sum += jnp.sum(per * mk)
            cnt += jnp.sum(mk)
            upd = jnp.zeros((num_classes * num_classes,), jnp.int32).at[
                lb * num_classes + preds].add(mk.astype(jnp.int32))
            return (correct, loss_sum, cnt, cm + upd), None

        init = (jnp.int32(0), jnp.float32(0), jnp.int32(0),
                jnp.zeros((num_classes * num_classes,), jnp.int32))
        (correct, loss_sum, cnt, cm), _ = jax.lax.scan(
            body, init, jnp.arange(steps))
        acc = correct.astype(jnp.float32) / jnp.maximum(cnt, 1) * 100.0
        return acc, loss_sum / jnp.maximum(cnt, 1), cm.reshape(
            num_classes, num_classes)

    def eval_fn(params, head, logit_scale, ev: ResidentEval):
        acc, mean_loss, cm = run(params, head,
                                 jnp.asarray(logit_scale, jnp.float32),
                                 ev.images_u8, ev.labels, ev.mask,
                                 ev.source)
        return float(acc), float(mean_loss), np.asarray(cm)

    return eval_fn
