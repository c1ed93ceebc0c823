"""Jitted train steps, one factory per method family.

Each step fuses the whole iteration on device: on-device augmentation
(random-resized-crop/flip/normalize from uint8 canvases), the method's
mixing strategy, forward, loss, backward, and the optax update — the
TPU-native equivalent of the reference per-method training loops in
utils/training.py.  Steps donate the state, keep params resident, and are
jit-compiled once per (method, batch shape).

Batch dict keys (from swat_tpu.data.pipeline):
  canvases [B,C,C,3] u8 + valid_hw [B,2]   (device-aug mode)
  images   [B,224,224,3] f32               (host-aug / pre-augmented mode)
  features [B,D] f32                       (pre-extracted mode)
  labels, source [B] i32
  optional *_fs / *_u twins for two-loader methods, prompt_tokens [B,77]
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from swat_tpu.kernels import augment as aug
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.head import head_logits
from swat_tpu.train.losses import (
    LossFn,
    cross_entropy,
    mixup_criterion,
    mixup_criterion_lam_vector,
)
from swat_tpu.train.state import TrainState


def _get_images(batch, key, image_size: int = 224, dtype=None):
    """Resolve the batch's image tensor, running the on-device augment
    chain when the batch carries canvases."""
    if "canvases" in batch:
        kw = {} if dtype is None else {"dtype": dtype}
        return aug.train_augment(batch["canvases"], batch["valid_hw"], key,
                                 out_size=image_size, **kw)
    return batch["images"]


def make_mix_fn(method: str, *, mixup_alpha: float = 1.0,
                cutmix_beta: float = 1.0, mix_prob: float = 0.5,
                heatmap_fn: Optional[Callable] = None,
                image_size: int = 224, aug_dtype=None):
    """THE per-step augment+mix body, shared verbatim by the streaming
    step factories below and the resident scan path
    (train/scan_loop.make_scan_epoch) — one implementation, so the two
    execution modes are trajectory-equivalent by construction
    (tests/test_scan_loop.py::test_scan_epoch_matches_streaming_steps).

    Returns mix(trainable, batch, twin, key) ->
        (images, y_a, y_b, lam, lam_vec, source)
    ``batch``/``twin`` carry canvases+valid_hw (device augment) or
    pre-augmented images, plus labels/source.  ``twin`` is the second
    loader's batch for the -fs/CMO/mixed families (reference two-loader
    pattern, utils/training.py:724-737), None otherwise.  The key is
    split 3 ways internally (primary augment, twin augment, mix draw).
    """

    def mix(trainable, batch, twin, key):
        k_aug, k_aug2, k_mix = jax.random.split(key, 3)
        images = _get_images(batch, k_aug, image_size, aug_dtype)
        labels = batch["labels"]
        source = batch["source"]
        lam = None
        lam_vec = None

        if twin is not None:
            images2 = _get_images(twin, k_aug2, image_size, aug_dtype)
            labels2 = twin["labels"]

        if method == "finetune":
            y_a = y_b = labels
            lam = 1.0
        elif method == "finetune-mixed":
            # reference train_ce_mixed: concat retrieved + few-shot
            # half-batches (utils/training.py:692-816)
            images = jnp.concatenate([images, images2], axis=0)
            labels = jnp.concatenate([labels, labels2], axis=0)
            source = jnp.concatenate([source, twin["source"]], axis=0)
            y_a = y_b = labels
            lam = 1.0
        elif method == "cutmix":
            images, y_a, y_b, lam = aug.cutmix(
                images, labels, k_mix, cutmix_beta, mix_prob)
        elif method == "cutmix-fs":
            images = jnp.concatenate([images, images2], axis=0)
            labels = jnp.concatenate([labels, labels2], axis=0)
            source = jnp.concatenate([source, twin["source"]], axis=0)
            images, y_a, y_b, lam = aug.cutmix(
                images, labels, k_mix, cutmix_beta, mix_prob)
        elif method == "CMO":
            images, y_a, y_b, lam = aug.cutmix_from(
                images, labels, images2, labels2, k_mix,
                cutmix_beta, mix_prob)
        elif method == "mixup":
            images, y_a, y_b, lam = aug.mixup(
                images, labels, k_mix, mixup_alpha, mix_prob)
        elif method == "mixup-fs":
            images, y_a, y_b, lam = aug.mixup_fs(
                images, labels, images2, labels2, k_mix,
                mixup_alpha, mix_prob)
        elif method == "resizemix":
            images, y_a, y_b, lam = aug.resizemix(
                images, labels, k_mix, mix_prob)
        elif method == "saliencymix":
            images, y_a, y_b, lam_vec = aug.saliencymix(
                images, labels, k_mix, cutmix_beta, mix_prob)
        elif method == "attentivemix":
            # the reference's GEM heatmap model is a SEPARATE frozen
            # model (utils/training.py:2682) — no gradients flow from
            # the mixing loss into the heatmap network.  labels pick
            # each image's localization text (--attentive_name,
            # :2717-2731); self-relevance heatmap_fns ignore them.
            heatmaps = jax.lax.stop_gradient(
                heatmap_fn(trainable["model"], images, labels))
            images, y_a, y_b, lam_vec = aug.attentivemix(
                images, labels, heatmaps, k_mix, cutmix_beta, mix_prob)
        else:
            raise NotImplementedError(method)
        return images, y_a, y_b, lam, lam_vec, source

    return mix


def mix_criterion(loss: LossFn, logits, y_a, y_b, lam, lam_vec, source):
    """Dispatch between the scalar-lambda and per-image-lambda mixing
    criteria (shared by the streaming and scan paths)."""
    if lam_vec is not None:
        return mixup_criterion_lam_vector(logits, y_a, y_b, lam_vec)
    return mixup_criterion(loss, logits, y_a, y_b, lam, source)


def make_encode_loss(model: CLIPModel, loss: LossFn):
    """encode_loss(trainable, mixed) -> (loss, bn_upd) for a mix() output
    tuple — the second shared half of the per-step body."""

    def encode_loss(trainable, mixed):
        images, y_a, y_b, lam, lam_vec, source = mixed
        feats, bn_upd = _encode_train(model, trainable["model"], images)
        logits = _scaled_logits(trainable["head"],
                                trainable["logit_scale"], feats)
        return mix_criterion(loss, logits, y_a, y_b, lam, lam_vec,
                             source), bn_upd

    return encode_loss


def _encode(model, params, images):
    # functional fast path (ViT): plain-loop layers, no scan-VJP residual
    # stacking (see swat_tpu.models.functional module doc)
    from swat_tpu.models import functional as F

    return F.encode_image(model, params, images, normalize=True)


def _encode_train(model, params, images):
    """Training-mode encode: RN50 runs batch-stat BN and returns the
    sown running-stat updates (reference model.train() semantics,
    utils/training.py:330); ViT towers have no normalization state."""
    from swat_tpu.models import functional as F

    if F._is_vit(model):
        return F.encode_image(model, params, images, normalize=True), None
    return F.encode_image_bn_train(model, params, images)


def _fold_bn(state: TrainState, bn_upd):
    if not bn_upd:
        return state
    from swat_tpu.models import functional as F

    model = dict(state.model)
    model["visual"] = F.apply_bn_updates(model["visual"], bn_upd)
    return state.replace(model=model)


def _scaled_logits(head, logit_scale, feats):
    return head_logits(head, feats) * jnp.exp(logit_scale)


def _apply_update(tx, state: TrainState, grads):
    updates, new_opt = tx.update(grads, state.opt_state, state.trainable)
    new_trainable = jax.tree_util.tree_map(
        lambda p, u: p + u, state.trainable, updates)
    return state.replace_trainable(new_trainable, opt_state=new_opt,
                                   step=state.step + 1)


def make_probing_step(model: CLIPModel, tx, loss: LossFn = cross_entropy,
                      pre_extracted: bool = True, image_size: int = 224):
    """Linear probe (reference train_probing, utils/training.py:47-161):
    frozen backbone, head-only CE at fixed logit_scale."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        def loss_fn(trainable):
            if pre_extracted:
                feats = batch["features"]
            else:
                # streaming mode (reference default pre_extracted=False):
                # fresh train augmentation + encode every step; the
                # encoder is frozen, so stop_gradient skips its backward
                feats = jax.lax.stop_gradient(
                    _encode(model, trainable["model"],
                            _get_images(batch, key, image_size)))
            logits = _scaled_logits(trainable["head"],
                                    trainable["logit_scale"], feats)
            return loss(logits, batch["labels"], batch["source"])

        val, grads = jax.value_and_grad(loss_fn)(state.trainable)
        return _apply_update(tx, state, grads), val

    return step


def make_cmlp_step(model: CLIPModel, tx, loss: LossFn = cross_entropy,
                   pre_extracted: bool = True, image_size: int = 224):
    """Cross-modal LP (reference train_CMLP, utils/training.py:164-293):
    concat image features with a batch of text-prompt embeddings sharing
    labels.  Batch needs 'features' (or images/canvases when
    pre_extracted=False), 'text_features', 'text_labels'."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        def loss_fn(trainable):
            if pre_extracted:
                img_feats = batch["features"]
            else:
                img_feats = jax.lax.stop_gradient(
                    _encode(model, trainable["model"],
                            _get_images(batch, key, image_size)))
            feats = jnp.concatenate(
                [img_feats, batch["text_features"]], axis=0)
            labels = jnp.concatenate(
                [batch["labels"], batch["text_labels"]], axis=0)
            logits = _scaled_logits(trainable["head"],
                                    trainable["logit_scale"], feats)
            return loss(logits, labels, None)

        val, grads = jax.value_and_grad(loss_fn)(state.trainable)
        return _apply_update(tx, state, grads), val

    return step


def _check_accum(model, accum: int):
    from swat_tpu.models import functional as F

    if accum > 1 and not F._is_vit(model):
        raise ValueError(
            "grad accumulation (accum>1) is ViT-only: RN50's batch-stat "
            "BN is not microbatch-decomposable")


def _accum_value_and_grad(trainable, micro_loss, per_sample, accum: int,
                          reduction: str = "mean"):
    """Microbatch gradient accumulation: the HBM lever that replaces remat
    with ZERO recompute.

    `per_sample` is a dict of arrays with leading dim B (divisible by
    `accum`); augmentation and cross-sample mixing (cutmix's permutation
    spans the whole batch) already happened on the FULL batch — only
    encode+loss, where the activation memory lives, runs inside the
    lax.scan, so peak activation HBM drops by accum× while every matmul
    keeps an MXU-sized M dim.  lax.scan (not an unrolled loop) forces the
    microbatches to be sequenced so XLA cannot overlap their liveness.

    All registry losses reduce by per-sample MEAN, so the full-batch value
    and gradient equal the average over equal-size microbatches; the
    lam-vector criterion (saliencymix/attentivemix) SUMS, so those pass
    reduction='sum'.  Equivalence is to reduction-order rounding, not
    bit-exact (tests/test_train.py::test_accum_matches_single_pass).
    """
    batch_dim = next(iter(jax.tree_util.tree_leaves(per_sample))).shape[0]
    if batch_dim % accum:
        raise ValueError(
            f"batch size {batch_dim} is not divisible by accum={accum}")
    mbs = jax.tree_util.tree_map(
        lambda a: a.reshape((accum, a.shape[0] // accum) + a.shape[1:]),
        per_sample)
    g0 = jax.tree_util.tree_map(jnp.zeros_like, trainable)

    def body(carry, mb):
        val_acc, g_acc = carry
        val, g = jax.value_and_grad(micro_loss)(trainable, mb)
        return (val_acc + val,
                jax.tree_util.tree_map(jnp.add, g_acc, g)), None

    (val_sum, g_sum), _ = jax.lax.scan(body, (jnp.float32(0.0), g0), mbs)
    if reduction == "mean":
        inv = 1.0 / accum
        return val_sum * inv, jax.tree_util.tree_map(
            lambda g: (g * inv).astype(g.dtype), g_sum)
    return val_sum, g_sum


def _twin_of(batch):
    """The second loader's sub-batch, carried as *_fs keys (the
    reference's tuple-of-loaders pattern flattened into one dict)."""
    twin = {k[:-3]: v for k, v in batch.items() if k.endswith("_fs")}
    return twin or None


def _make_mix_step(model: CLIPModel, tx, method: str, loss: LossFn,
                   mix, accum: int):
    """Shared step builder over a make_mix_fn body: full-batch mix ->
    encode+loss (microbatched under accum) -> optax update."""
    encode_loss = make_encode_loss(model, loss)

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        twin = _twin_of(batch)

        if accum > 1:
            # full-batch mix outside the grad (exact: no gradient flows
            # through it — attentivemix's heatmap is stop_gradient'ed)
            images, y_a, y_b, lam, lam_vec, source = mix(
                state.trainable, batch, twin, key)
            per_sample = {"images": images, "y_a": y_a, "y_b": y_b,
                          "source": source}
            if lam_vec is not None:
                per_sample["lam_vec"] = lam_vec

            def micro_loss(trainable, mb):
                val, _ = encode_loss(
                    trainable, (mb["images"], mb["y_a"], mb["y_b"], lam,
                                mb.get("lam_vec"), mb["source"]))
                return val

            val, grads = _accum_value_and_grad(
                state.trainable, micro_loss, per_sample, accum,
                reduction="sum" if lam_vec is not None else "mean")
            return _apply_update(tx, state, grads), val

        def loss_fn(trainable):
            return encode_loss(trainable, mix(trainable, batch, twin, key))

        (val, bn_upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable)
        return _fold_bn(_apply_update(tx, state, grads), bn_upd), val

    return step


def make_ce_step(model: CLIPModel, tx, loss: LossFn = cross_entropy,
                 concat_fs: bool = False, image_size: int = 224,
                 accum: int = 1):
    """Standard finetune CE (reference train_ce, utils/training.py:296-412).
    With concat_fs=True the few-shot twin batch is concatenated first
    (reference train_ce_mixed, :692-816).  accum>1 splits the (concatenated)
    batch into `accum` microbatches and accumulates gradients — same
    semantics, 1/accum the activation HBM, no recompute."""
    _check_accum(model, accum)
    mix = make_mix_fn("finetune-mixed" if concat_fs else "finetune",
                      image_size=image_size)
    return _make_mix_step(model, tx, "finetune", loss, mix, accum)


def make_mixing_step(model: CLIPModel, tx, method: str,
                     loss: LossFn = cross_entropy, *,
                     mixup_alpha: float = 1.0, cutmix_beta: float = 1.0,
                     mix_prob: float = 0.5,
                     heatmap_fn: Optional[Callable] = None,
                     image_size: int = 224, accum: int = 1):
    """One factory for the mixing family:

    cutmix      reference train_cutmix      utils/training.py:1422-1556
    cutmix-fs   reference train_cutmix_fs2  :1701-1862 (concat fs batch,
                then cutmix over the combined batch)
    mixup       reference train_mixup       :1164-1278
    mixup-fs    reference train_mixup_fs    :1281-1401
    resizemix   reference train_resizemix   :2309-2455
    saliencymix reference train_saliencymix2 :2169-2306 (per-image lambdas,
                summed loss)
    attentivemix reference train_attentivemix2 :2672-2831 (model heatmap)
    CMO         reference train_CMO         :1865-2005 (second batch from
                inverse-frequency loader)

    The augment+mix body itself is make_mix_fn — the same function the
    resident scan path runs, so streaming and scan trajectories are
    identical by construction.

    accum>1: the mix itself stays a full-batch op (its pairing permutation
    spans the batch) computed outside the gradient — only encode+loss is
    microbatched (attentivemix's heatmap was already stop_gradient'ed, so
    hoisting it out of the grad is exact).
    """
    _check_accum(model, accum)
    mix = make_mix_fn(method, mixup_alpha=mixup_alpha,
                      cutmix_beta=cutmix_beta, mix_prob=mix_prob,
                      heatmap_fn=heatmap_fn, image_size=image_size)
    return _make_mix_step(model, tx, method, loss, mix, accum)


def make_flyp_step(model: CLIPModel, tx, loss: LossFn = cross_entropy,
                   image_size: int = 224):
    """FLYP contrastive finetune (reference train_flyp,
    utils/training.py:415-552): bidirectional InfoNCE between the batch's
    image features and its sampled prompt-text features."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        def loss_fn(trainable):
            images = _get_images(batch, key, image_size)
            img_f, bn_upd = _encode_train(model, trainable["model"],
                                          images)
            from swat_tpu.models import functional as F

            txt_f = F.encode_text(model, trainable["model"],
                                  batch["prompt_tokens"], normalize=True)
            scale = jnp.exp(trainable["logit_scale"])
            # fp32 features: the default precision would round through
            # bf16 on this stack (CLAUDE.md); small matmul, keep exact
            logits_i = scale * jnp.dot(img_f, txt_f.T,
                                       precision="highest")
            logits_t = logits_i.T
            labels = jnp.arange(logits_i.shape[0])
            source = batch["source"]
            return (0.5 * (loss(logits_i, labels, source)
                           + loss(logits_t, labels, source)), bn_upd)

        (val, bn_upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable)
        return _fold_bn(_apply_update(tx, state, grads), bn_upd), val

    return step


def make_multitask_step(model: CLIPModel, tx, loss: LossFn = cross_entropy,
                        dataset_wd: float = 1.0, image_size: int = 224):
    """Class head + binary dataset-source head with weighted sum loss
    (reference train_ce_multitask, utils/training.py:990-1111).  The extra
    head rides in batch-state as trainable['dataset_head'] (created by the
    method driver)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        def loss_fn(trainable):
            images = _get_images(batch, key, image_size)
            feats, bn_upd = _encode_train(model, trainable["model"],
                                          images)
            scale = jnp.exp(trainable["logit_scale"])
            logits = head_logits(trainable["head"]["cls"], feats) * scale
            # dataset logits are deliberately UNSCALED: the reference
            # comments the scaling out (utils/training.py:1035-1036)
            ds_logits = head_logits(trainable["head"]["dataset"], feats)
            cls_loss = loss(logits, batch["labels"], batch["source"])
            ds_loss = cross_entropy(ds_logits, batch["source"], None)
            return cls_loss + dataset_wd * ds_loss, bn_upd

        (val, bn_upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable)
        return _fold_bn(_apply_update(tx, state, grads), bn_upd), val

    return step


def make_dataset_cls_step(model: CLIPModel, tx,
                          loss: LossFn = cross_entropy,
                          image_size: int = 224):
    """Binary retrieved-vs-fewshot classification using source as the label
    (reference train_dataset_cls, utils/training.py:572-685)."""

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        def loss_fn(trainable):
            images = _get_images(batch, key, image_size)
            feats, bn_upd = _encode_train(model, trainable["model"],
                                          images)
            logits = _scaled_logits(trainable["head"],
                                    trainable["logit_scale"], feats)
            return loss(logits, batch["source"], None), bn_upd

        (val, bn_upd), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.trainable)
        return _fold_bn(_apply_update(tx, state, grads), bn_upd), val

    return step


def make_fixmatch_step(model: CLIPModel, tx, *, threshold: float = 0.95,
                       lambda_u: float = 1.0, image_size: int = 224,
                       aux: bool = False):
    """FixMatch (reference train_fixmatch, utils/training.py:820-983):
    labeled CE + confidence-masked consistency between weak/strong views.
    The weak/strong unlabeled views are produced on-device from one set of
    canvases ('canvases_u'/'valid_hw_u'): weak = RRC+flip, strong =
    RRC+flip+RandAugment(2,10) (reference TransformFixMatch,
    utils/extras.py:41-63).  Pre-augmented 'images'/'images_w'/'images_s'
    are also accepted."""
    from swat_tpu.kernels.randaugment import rand_augment

    @functools.partial(jax.jit, donate_argnums=0)
    def step(state: TrainState, batch, key):
        k_l, k_w, k_s, k_ra = jax.random.split(key, 4)

        def loss_fn(trainable):
            images_l = _get_images(batch, k_l, image_size)
            if "canvases_u" in batch:
                uc, uhw = batch["canvases_u"], batch["valid_hw_u"]
                k_wc, k_wf = jax.random.split(k_w)
                k_sc, k_sf = jax.random.split(k_s)
                w_px = aug.random_hflip(aug.random_resized_crop(
                    uc, uhw, k_wc, image_size), k_wf)
                s_px = aug.random_hflip(aug.random_resized_crop(
                    uc, uhw, k_sc, image_size), k_sf)
                s_px = rand_augment(s_px, k_ra, n=2, m=10,
                                    cutout=image_size // 2)
                images_w = aug._normalize_float_pixels(w_px)
                images_s = aug._normalize_float_pixels(s_px)
            else:
                images_w, images_s = batch["images_w"], batch["images_s"]
            n_l = images_l.shape[0]
            all_images = jnp.concatenate(
                [images_l, images_w, images_s], axis=0)
            feats, bn_upd = _encode_train(model, trainable["model"],
                                          all_images)
            logits = head_logits(trainable["head"], feats)
            logits_l = logits[:n_l]
            logits_u_w, logits_u_s = jnp.split(logits[n_l:], 2, axis=0)
            # labeled loss: plain unscaled CE (reference :893)
            loss_l = cross_entropy(logits_l, batch["labels"], None)
            # pseudo-labels from the weak view (no logit scaling, :897)
            probs_w = jax.nn.softmax(
                jax.lax.stop_gradient(logits_u_w), axis=-1)
            max_p = probs_w.max(axis=-1)
            targets = probs_w.argmax(axis=-1)
            mask = (max_p >= threshold).astype(jnp.float32)
            logp_s = jax.nn.log_softmax(logits_u_s.astype(jnp.float32), -1)
            per = -jnp.take_along_axis(logp_s, targets[:, None], 1)[:, 0]
            loss_u = (per * mask).mean()
            return (loss_l + lambda_u * loss_u,
                    (mask.mean(), loss_u, bn_upd))

        (val, (mask_rate, loss_u, bn_upd)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.trainable)
        new_state = _fold_bn(_apply_update(tx, state, grads), bn_upd)
        if aux:
            # (pseudo-label mask rate, consistency loss) for tests /
            # diagnostics (reference logs mask_w.mean(), training.py:908)
            return new_state, (val, mask_rate, loss_u)
        return new_state, val

    return step
