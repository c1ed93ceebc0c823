"""Stage orchestration: the reference main.py flow, TPU-native.

stage-1 finetune (method dispatch) -> WiSE-FT alpha ensembling -> feature
re-extraction -> tau-normalization -> best-bundle save -> stage-2 linear
probing -> stage-2 few-shot full finetune -> CSV summary line.

Mirrors reference main.py:198-606 with immutable per-stage configs instead
of mutated args.  WiSE-FT (main.py:132-195) and tau-norm (main.py:27-73)
are pure array/pytree arithmetic over pre-extracted features.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from swat_tpu.core.config import RunConfig
from swat_tpu.core.mesh import MeshSpec, create_mesh
from swat_tpu.core.precision import DEFAULT_PRECISION, FP32_PRECISION
from swat_tpu.data import prompts as P
from swat_tpu.data.features import extract_image_features
from swat_tpu.data.pipeline import (
    CyclingLoader,
    EvalLoader,
    FeatureBatches,
    TrainLoader,
    TrainSnapshotLoader,
    WeightedTrainLoader,
)
from swat_tpu.data.splits import class_counts, read_split
from swat_tpu.eval.metrics import calculate_scores
from swat_tpu.eval.validate import Evaluator, validate_features
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.head import (
    head_logits,
    init_head_from_prompts,
    init_head_random,
    tau_normalize,
    wise_ft_head,
    wise_ft_params,
)
from swat_tpu.models.loader import load_torch_checkpoint
from swat_tpu.models.tokenizer import get_tokenizer
from swat_tpu.train import steps as S
from swat_tpu.train.checkpoint import (
    load_best_model,
    save_best_model,
    save_test_scores,
)
from swat_tpu.train.losses import set_loss
from swat_tpu.train.state import create_train_state
from swat_tpu.train.trainer import compose_twin, train_loop
from swat_tpu.utils.logging import set_logger


# methods whose gradient decomposes over equal-size microbatches: the CE
# and mixing families (augmentation + the mix pairing stay full-batch ops
# outside the gradient).  FLYP's [B,B] contrastive and fixmatch's global
# threshold stats couple the whole batch; frozen-encoder methods have no
# activation memory to save.
ACCUM_METHODS = frozenset({
    "finetune", "finetune-mixed", "mixup", "cutmix", "resizemix",
    "saliencymix", "attentivemix", "mixup-fs", "cutmix-fs", "CMO",
})


def _pick_accum(combined_bsz: int, target_micro: int = 32):
    """Smallest divisor of the encode batch giving microbatch <= target."""
    lo = max(2, -(-combined_bsz // target_micro))
    for d in range(lo, combined_bsz + 1):
        if combined_bsz % d == 0 and combined_bsz // d <= target_micro:
            return d
    return None


def auto_memory_policy(model_cfg: str, remat, accum: int, bsz: int,
                       n_devices: int, method: str):
    """Pick the effective (remat, accum) for one run.

    ViT-L/14 fwd+bwd at bsz>=64 needs ~16.5G HBM vs a v5e chip's 15.75G.
    The r4 isolated sweeps (scripts/ablate_l14_mfu.py, the accum sweep)
    measured, at bsz 64 on one chip:

      accum=2, no remat, pallas   362 ms  176.8 img/s  43.4% nominal MFU
      full remat + pallas         402 ms  159.2 img/s  39.1%
      full remat + XLA            470 ms  136.1 img/s  33.5%
      dots / dots_all / no-remat / first<K>      RESOURCE_EXHAUSTED
      accum=4 == accum=2 (175.4); accum=2 + XLA attention still OOMs
      (XLA autodiff saves larger attention residuals than the packed
      pallas custom-VJP, which recomputes its softmax stats)

    So when the user left both --remat and --accum unset:
    - microbatch-decomposable methods (ACCUM_METHODS) get gradient
      accumulation sized for a <=32-image microbatch — zero recompute,
      the measured fastest feasible policy;
    - coupled losses (FLYP, fixmatch) get full block remat, the only
      fitting alternative.
    An explicit --remat or --accum is never second-guessed, except that
    an explicit accum whose microbatch still exceeds HBM (>=64 images)
    gets full remat on top rather than a guaranteed compile-time OOM
    (the axon HTTP-500 presentation). Multi-device meshes shard
    activations and the reference's bsz-32 config (utils/extras.py:97-114
    trains L/14 at bsz 32 on an 80GB A100) fits outright — untouched.
    """
    if not ("vitl14" in model_cfg and bsz >= 64 and n_devices == 1):
        return remat, accum
    if remat:
        return remat, accum
    # encode batch: finetune-mixed concatenates the few-shot twin batch
    # (reference train_ce_mixed, utils/training.py:692-816) — the other
    # twin methods only mix FROM the second batch
    combined = bsz * (2 if method == "finetune-mixed" else 1)
    if accum > 1:
        if combined // accum >= 64:
            return "full", accum
        return remat, accum
    if method in ACCUM_METHODS:
        picked = _pick_accum(combined)
        if picked is not None:
            return False, picked
    return "full", accum


class SwatPipeline:
    """Holds the model, prompts, heads, and loaders for one run."""

    def __init__(self, cfg: RunConfig, logger=None, loss_logger=None):
        self.cfg = cfg.derived()
        cfg = self.cfg
        if logger is None:
            logger, loss_logger = set_logger(cfg)
        self.logger = logger
        self.loss_logger = loss_logger

        self.mesh = None
        if cfg.mesh_data != 1 or cfg.mesh_model != 1:
            try:
                self.mesh = create_mesh(MeshSpec(cfg.mesh_data,
                                                 cfg.mesh_model))
            except ValueError:
                self.mesh = None
        # lets batch-sharded inference keep the fused pallas attention
        # (kernel runs per-shard under shard_map)
        from swat_tpu.models import functional as _F

        _F.set_inference_mesh(self.mesh)

        self.model_cfg = get_model_config(cfg.model_cfg)
        precision = (FP32_PRECISION if cfg.compute_dtype == "float32"
                     else DEFAULT_PRECISION)
        remat, accum = auto_memory_policy(
            cfg.model_cfg, cfg.remat, cfg.accum, cfg.bsz,
            len(jax.devices()), cfg.method)
        if (remat, accum) != (cfg.remat, cfg.accum):
            # measured (scripts/ablate_l14_mfu.py + the accum sweep):
            # L/14 fwd+bwd at bsz 64 needs 16.5G HBM vs a v5e chip's
            # 15.75G. Gradient accumulation (microbatch 32, zero
            # recompute) trains at 176.8 img/s (43.4% nominal MFU) vs
            # full remat's 159.2 — the default for microbatch-
            # decomposable methods; coupled losses fall back to full
            # remat, the only other policy that fits
            self.logger.warning(
                "ViT-L/14 at bsz>=64 on one chip exceeds HBM — "
                f"auto-enabling remat={remat!r}, accum={accum} "
                "(measured policy, scripts/ablate_l14_mfu.py). Pass "
                "--remat/--accum explicitly or shard with --mesh_data "
                "to override.")
            self.cfg = dataclasses.replace(self.cfg, accum=accum)
            cfg = self.cfg
        self.model = CLIPModel(self.model_cfg, precision=precision,
                               remat=remat, use_pallas=cfg.use_pallas)

        # ---- pretrained weights (reference set_model, utils/models.py:11)
        if cfg.checkpoint_path:
            params, pretrained_scale = load_torch_checkpoint(
                cfg.checkpoint_path, self.model_cfg.vision.layers,
                self.model_cfg.text.layers)
            logger.info(f"Loaded model: {cfg.model_cfg} from "
                        f"{cfg.checkpoint_path}")
        else:
            params = self.model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, self.model_cfg.vision.image_size,
                           self.model_cfg.vision.image_size, 3),
                          jnp.float32),
                jnp.zeros((1, self.model_cfg.text.context_length),
                          jnp.int32))["params"]
            logger.info(
                f"WARNING: no checkpoint_path; {cfg.model_cfg} initialized "
                "randomly (smoke-test mode)")
        self.params = jax.device_put(
            jax.tree_util.tree_map(jnp.asarray, params))
        self.zeroshot_params = self.params  # immutable tree, safe to alias

        self.tokenizer = get_tokenizer(
            cfg.bpe_path, vocab_size=self.model_cfg.text.vocab_size)

        # ---- prompts (reference set_prompt, utils/prompt.py:71-80)
        self.prompt_tensors, self.text_prompts, self.tokenized_prompts = (
            self._build_prompts())

        # ---- classifier head (reference set_classifier,
        # utils/models.py:22-43)
        if cfg.method == "dataset-cls":
            head = init_head_random(jax.random.PRNGKey(cfg.training_seed),
                                    2, self.model_cfg.embed_dim)
        elif cfg.cls_init in ("REAL-Prompt", "REAL-Linear", "text"):
            head = init_head_from_prompts(
                P.class_embedding_matrix(self.prompt_tensors))
            logger.info("Initialized classifier head with text embedding. "
                        f"weights.shape: {head.shape}")
        elif cfg.cls_init == "random":
            head = init_head_random(jax.random.PRNGKey(cfg.training_seed),
                                    cfg.num_classes,
                                    self.model_cfg.embed_dim)
        else:
            raise NotImplementedError(cfg.cls_init)
        self.head = jnp.asarray(head)
        self.zeroshot_head = self.head

        self.evaluator = Evaluator(self.model, cfg.num_classes,
                                   loss=self._loss(), mesh=self.mesh)
        self._resident_eval_cache: Dict[str, object] = {}
        self._scan_eval = None

    # ------------------------------------------------------------------
    # helpers

    def _loss(self, cfg: Optional[RunConfig] = None):
        cfg = cfg or self.cfg
        cls_num_list = None
        if cfg.loss_name == "BalancedSoftmax":
            samples = read_split(cfg.dataset_root, cfg.train_split)
            cls_num_list = class_counts(samples, cfg.num_classes)
        return set_loss(cfg.loss_name, fewshot_weight=cfg.fewshot_weight,
                        focal_alpha=cfg.focal_alpha,
                        focal_gamma=cfg.focal_gamma,
                        cls_num_list=cls_num_list)

    def _encode_text_fn(self, params):
        from swat_tpu.data.features import make_text_encoder

        return make_text_encoder(self.model, params)

    def _build_prompts(self):
        cfg = self.cfg
        metrics = P.load_class_metrics(cfg.metrics_file)
        self.logger.info(f"Loaded metrics from: {cfg.metrics_file}")
        text_prompts = P.make_prompts(metrics, cfg.dataset, cfg.prompt_name)
        tokenized = P.tokenize_prompts(
            text_prompts, self.tokenizer,
            self.model_cfg.text.context_length)
        cache = os.path.join(
            cfg.dataset_root, "prompts",
            f"{cfg.dataset}_{cfg.model_cfg}_{cfg.prompt_name}"
            "_prompt_tensors.npz")
        if not cfg.recal_prompt and os.path.exists(cache):
            tensors = P.load_prompt_tensors(cache)
            self.logger.info(f"Loaded prompt tensors from {cache}")
        else:
            tensors = P.encode_prompts(
                self._encode_text_fn(self.params), tokenized)
            P.save_prompt_tensors(cache, tensors)
            self.logger.info(f"Saved prompt tensors to {cache}")
        return tensors, text_prompts, tokenized

    def _samples(self, split):
        return read_split(self.cfg.dataset_root, split)

    def _train_samples(self, cfg: RunConfig):
        """Train-split samples, plus pseudo-labeled unlabeled data when
        --utrain is set (reference utils/dataloader.py:188-202 +
        inat_dataset.py:26-32 append semantics)."""
        samples = self._samples(cfg.train_split)
        if cfg.utrain:
            from swat_tpu.data.splits import read_pseudo_split

            pseudo = read_pseudo_split(cfg.utrain)
            self.logger.info(
                f"Load utrain data with pseudo-labels from: {cfg.utrain} "
                f"({len(pseudo)} samples)")
            samples = samples + pseudo
        return samples

    def _eval_loader(self, split, bsz: int = 128):
        return EvalLoader(self._samples(split), batch_size=bsz,
                          n_px=self.model_cfg.vision.image_size,
                          num_workers=self.cfg.num_workers)

    def _cached_extract(self, cfg: RunConfig, params, split_tag: str,
                        loader_fn, samples=None):
        """Persistent pre-extracted feature cache under
        ``<dataset_root>/pre_extracted/`` keyed by (dataset, model_cfg,
        split tag, split-content digest, params digest); ``--recal_fea``
        busts it (reference pre_extract_feature,
        utils/dataloader.py:35-104, whose cache the reference keys only
        by naming convention — the digests make a finetuned backbone or
        a changed split, e.g. --utrain pseudo-labels appended, never
        collide with a stale cache)."""
        import hashlib

        from swat_tpu.data.features import (
            extract_or_load,
            feature_cache_path,
            params_fingerprint,
        )

        extra = params_fingerprint(params)
        if samples is not None:
            h = hashlib.sha1()
            for smp in samples:
                h.update(f"{smp.path}|{smp.label}|{smp.is_fewshot};"
                         .encode())
            extra = f"{extra}_{h.hexdigest()[:8]}"
        cache_dir = os.path.join(cfg.dataset_root, "pre_extracted")
        path = feature_cache_path(
            cache_dir, cfg.dataset, cfg.model_cfg, split_tag, extra=extra)
        return extract_or_load(
            path, cfg.recal_fea,
            lambda: extract_image_features(self.model, params, loader_fn(),
                                           self.mesh),
            logger=self.logger)

    def _resident_eval_for(self, split) -> Optional[object]:
        """ResidentEval for a split when enabled and within budget; cached.
        One device dispatch per validation pass (scan_loop.make_scan_eval)."""
        cfg = self.cfg
        if cfg.resident == "off":
            return None
        tag = str(split)
        if tag in self._resident_eval_cache:
            return self._resident_eval_cache[tag]
        from swat_tpu.train.scan_loop import ResidentEval, make_scan_eval

        samples = self._samples(split)
        n_px = self.model_cfg.vision.image_size
        est = len(samples) * n_px * n_px * 3
        if cfg.resident != "on" and est > cfg.resident_budget_bytes:
            self._resident_eval_cache[tag] = None
            return None
        from swat_tpu.core.mesh import pad_to_multiple, resident_sharding

        n_pad = pad_to_multiple(max(len(samples), 1), 256)
        ev = ResidentEval.from_samples(samples, cfg.num_classes, n_px=n_px,
                                       num_workers=cfg.num_workers,
                                       sharding=resident_sharding(
                                           self.mesh, n_pad))
        if self._scan_eval is None:
            self._scan_eval = make_scan_eval(self.model, cfg.num_classes,
                                             loss=self._loss(),
                                             mesh=self.mesh)
        self._resident_eval_cache[tag] = ev
        return ev

    def _validate_images(self, params, head, logit_scale, split,
                         return_confusion=False, bsz=128):
        ev = self._resident_eval_for(split)
        if ev is not None:
            acc, loss, cm = self._scan_eval(params, head, logit_scale, ev)
            return acc, loss, (cm if return_confusion else None)
        loader = self._eval_loader(split, bsz=bsz)
        return self.evaluator.validate(
            params, head, logit_scale, loader,
            return_confusion=return_confusion)

    # ------------------------------------------------------------------
    # zero-shot (reference run_zeroshot, utils/training.py:23-44)

    def run_zeroshot(self, params=None) -> float:
        """``params`` defaults to the pretrained tree; run_stage1 passes
        the --model_path-loaded tree (reference loads the checkpoint
        before run_zeroshot, main.py:215-221) while the head stays the
        prompt-built one from the pretrained text tower."""
        acc, _, _ = self._validate_images(
            self.params if params is None else params, self.zeroshot_head,
            np.log(100.0), self.cfg.test_split, return_confusion=False)
        self.logger.info(f"+++++ Zero-shot Test Acc: {round(acc, 3)}")
        return acc

    # ------------------------------------------------------------------
    # method dispatch (reference main.py:236-327)

    def train_method(self, cfg: RunConfig, params, head):
        """Returns (final_state, BestSnapshot)."""
        method = cfg.method
        logger = self.logger
        loss = self._loss(cfg)
        mc = self.model_cfg
        image_size = mc.vision.image_size

        frozen = method in ("probing", "REAL-Linear", "CMLP")

        if frozen:
            # val/test eval-transform features are deterministic, so the
            # per-epoch validation reuses them in BOTH pre_extracted
            # modes (same values as the reference's per-epoch re-encode).
            # The TRAIN side follows the reference exactly:
            #  * pre_extracted=False (the parser default — the probing
            #    `args.pre_extracted = True` line is commented out,
            #    utils/parser.py:169): stream images with fresh train
            #    augmentation every step (train_probing :94-99);
            #  * pre_extracted=True: ONE train-transform snapshot
            #    (pre_extract_feature extracts the train split with
            #    transform(224,'train'), utils/dataloader.py:72-81),
            #    persisted across runs, busted by --recal_fea.
            _train_smp = self._train_samples(cfg)
            if cfg.pre_extracted:
                snap_mode = "eval" if cfg.aug_mode == "eval" else "train"
                train_feats = self._cached_extract(
                    cfg, params,
                    "train_trainaug" if snap_mode == "train"
                    else "train_evalaug",
                    lambda: TrainSnapshotLoader(
                        _train_smp, 256, image_size, cfg.num_workers,
                        seed=cfg.training_seed, mode=snap_mode),
                    samples=_train_smp)
                train_loader = FeatureBatches(
                    train_feats["image_features"], train_feats["labels"],
                    batch_size=cfg.bsz, shuffle=True, drop_last=True,
                    seed=cfg.training_seed,
                    source=train_feats.get("source"))
            else:
                train_loader = TrainLoader(
                    _train_smp, batch_size=cfg.bsz,
                    seed=cfg.training_seed, mode=cfg.aug_mode,
                    n_px=image_size, num_workers=cfg.num_workers)
            _val_smp = self._samples(cfg.val_split)
            val_feats = self._cached_extract(
                cfg, params, "val",
                lambda: EvalLoader(_val_smp, 256, image_size,
                                   cfg.num_workers),
                samples=_val_smp)
            _test_smp = self._samples(cfg.test_split)
            test_feats = self._cached_extract(
                cfg, params, "test",
                lambda: EvalLoader(_test_smp, 256, image_size,
                                   cfg.num_workers),
                samples=_test_smp)
        else:
            train_loader = TrainLoader(
                self._train_samples(cfg), batch_size=cfg.bsz,
                seed=cfg.training_seed, mode=cfg.aug_mode,
                n_px=image_size, num_workers=cfg.num_workers,
                tokenized_prompts=(self.tokenized_prompts
                                   if method == "FLYP" else None))

        # resident-dataset scan path (one dispatch per epoch) for the
        # single-loader image methods and the *-fs twin-loader family
        resident_data = None
        resident_twin = None
        from swat_tpu.train.scan_loop import (
            SCAN_METHODS,
            SCAN_TWIN_METHODS,
        )

        if (not frozen and cfg.resident != "off"
                and cfg.aug_mode == "canvas"
                and method in (SCAN_METHODS | SCAN_TWIN_METHODS)):
            from swat_tpu.data.transforms import CANVAS_SIZE
            from swat_tpu.train.scan_loop import ResidentData

            samples = self._train_samples(cfg)
            twin_samples = (self._samples(cfg.fewshot_data)
                            if method in SCAN_TWIN_METHODS else [])
            if method == "CMO":
                twin_samples = self._train_samples(cfg)
            est = (len(samples) + len(twin_samples)) * \
                CANVAS_SIZE * CANVAS_SIZE * 3
            if cfg.resident == "on" or est <= cfg.resident_budget_bytes:
                from swat_tpu.core.mesh import resident_sharding

                resident_data = ResidentData.from_samples(
                    samples, num_workers=cfg.num_workers,
                    sharding=resident_sharding(self.mesh, len(samples)))
                if method in SCAN_TWIN_METHODS:
                    resident_twin = ResidentData.from_samples(
                        twin_samples, num_workers=cfg.num_workers,
                        sharding=resident_sharding(self.mesh,
                                                   len(twin_samples)))
                logger.info(
                    f"Resident train data: {len(samples)}"
                    f"{' + ' + str(len(twin_samples)) if twin_samples else ''}"
                    f" canvases ({est / 1e9:.2f} GB) on device; "
                    "scan-epoch mode.")

        u_loader = None
        if method == "fixmatch":
            # the epoch iterates the *unlabeled* loader (reference
            # train_fixmatch, utils/training.py:869-876) — the LR schedule
            # must span that loop, not the labeled one
            u_loader = TrainLoader(
                self._samples(cfg.unlabeled_data),
                batch_size=cfg.bsz * cfg.mu, seed=cfg.training_seed,
                mode="canvas", n_px=image_size,
                num_workers=cfg.num_workers)
            steps_per_epoch = len(u_loader)
        else:
            steps_per_epoch = len(train_loader)
        total_iter = steps_per_epoch * max(cfg.epochs, 1)

        # dataset-cls needs a binary head (reference set_classifier,
        # utils/models.py:24-27)
        if method == "dataset-cls" and np.asarray(head).shape[0] != 2:
            head = init_head_random(
                jax.random.PRNGKey(cfg.training_seed), 2, mc.embed_dim)

        # multitask needs a second (dataset) head
        if method == "finetune-multitask":
            head = {"cls": jnp.asarray(head),
                    "dataset": init_head_random(
                        jax.random.PRNGKey(cfg.training_seed + 1), 2,
                        mc.embed_dim)}

        state, tx = create_train_state(
            params, head, method, lr_classifier=cfg.lr_classifier,
            lr_backbone=cfg.lr_backbone, total_iter=total_iter,
            wd=cfg.wd, optim_type=cfg.optim,
            lr_projector=cfg.lr_projector, temperature=cfg.temperature,
            locked_text=cfg.locked_text)

        # ---- step + batch composition
        twin_cycler = None
        post_epoch = None
        # --accum applies to the CE + mixing families (the L/14 hot
        # paths); the contrastive ([B,B] negatives span the batch),
        # frozen-encoder, and fixmatch steps don't take it
        if cfg.accum > 1 and method not in (
                "finetune", "finetune-mixed", "mixup", "cutmix",
                "resizemix", "saliencymix", "attentivemix", "mixup-fs",
                "cutmix-fs", "CMO"):
            raise ValueError(
                f"--accum only supports the CE/mixing methods, "
                f"not {method!r} (FLYP's contrastive loss couples the "
                f"whole batch; frozen-encoder methods don't need it)")

        if method in ("probing", "REAL-Linear"):
            step = S.make_probing_step(self.model, tx, loss,
                                       cfg.pre_extracted, image_size)
        elif method == "CMLP":
            step = S.make_cmlp_step(self.model, tx, loss,
                                    cfg.pre_extracted, image_size)
            bank = self.prompt_tensors
            if cfg.use_attribute:
                # attribute-augmented text bank (reference
                # set_text_dataloader, utils/dataloader.py:257-266)
                import json as _json

                attr_path = os.path.join(
                    cfg.dataset_root, "prompts",
                    f"visual-attrs-{cfg.dataset}.json")
                with open(attr_path) as f:
                    attributes = _json.load(f)
                metrics = P.load_class_metrics(cfg.metrics_file)
                attr_prompts = P.make_attribute_prompts(
                    metrics, cfg.dataset, attributes, cfg.prompt_name)
                tokenized = P.tokenize_prompts(
                    attr_prompts, self.tokenizer,
                    self.model_cfg.text.context_length)
                bank = P.encode_prompts(
                    self._encode_text_fn(self.params), tokenized)
            text_feats, text_labels = _flatten_prompt_bank(bank)
            twin_cycler = CyclingLoader(FeatureBatches(
                text_feats, text_labels, batch_size=cfg.bsz, shuffle=True,
                drop_last=True, seed=cfg.training_seed))
        elif method == "finetune":
            step = S.make_ce_step(self.model, tx, loss, False, image_size,
                                  accum=cfg.accum)
        elif method == "finetune-mixed":
            step = S.make_ce_step(self.model, tx, loss, True, image_size,
                                  accum=cfg.accum)
            twin_cycler = CyclingLoader(self._fs_loader(cfg))
        elif method in ("mixup", "cutmix", "resizemix", "saliencymix"):
            step = S.make_mixing_step(
                self.model, tx, method, loss, mixup_alpha=cfg.mixup_alpha,
                cutmix_beta=cfg.cutmix_beta, mix_prob=cfg.mix_prob,
                image_size=image_size, accum=cfg.accum)
        elif method == "attentivemix":
            step = S.make_mixing_step(
                self.model, tx, method, loss, mixup_alpha=cfg.mixup_alpha,
                cutmix_beta=cfg.cutmix_beta, mix_prob=cfg.mix_prob,
                heatmap_fn=self._heatmap_fn(), image_size=image_size,
                accum=cfg.accum)
        elif method in ("mixup-fs", "cutmix-fs"):
            step = S.make_mixing_step(
                self.model, tx, method, loss, mixup_alpha=cfg.mixup_alpha,
                cutmix_beta=cfg.cutmix_beta, mix_prob=cfg.mix_prob,
                image_size=image_size, accum=cfg.accum)
            twin_cycler = CyclingLoader(self._fs_loader(cfg))
        elif method == "CMO":
            step = S.make_mixing_step(
                self.model, tx, "CMO", loss, cutmix_beta=cfg.cutmix_beta,
                mix_prob=cfg.mix_prob, image_size=image_size,
                accum=cfg.accum)
            twin_cycler = CyclingLoader(WeightedTrainLoader(
                self._train_samples(cfg), cfg.num_classes,
                cfg.cmo_alpha, batch_size=cfg.bsz, seed=cfg.training_seed,
                mode=cfg.aug_mode, n_px=image_size,
                num_workers=cfg.num_workers))
        elif method == "FLYP":
            step = S.make_flyp_step(self.model, tx, loss, image_size)
            post_epoch = self._flyp_post_epoch()
        elif method == "finetune-multitask":
            step = S.make_multitask_step(self.model, tx, loss,
                                         cfg.dataset_wd, image_size)
        elif method == "dataset-cls":
            step = S.make_dataset_cls_step(self.model, tx, loss, image_size)
        elif method == "fixmatch":
            step = S.make_fixmatch_step(
                self.model, tx, threshold=cfg.threshold,
                lambda_u=cfg.lambda_u, image_size=image_size)
            # primary iteration over the *unlabeled* loader (built above,
            # before the optimizer, so total_iter matches)
            labeled_cycler = CyclingLoader(train_loader)

            def train_batches():
                for ub in u_loader:
                    lb = labeled_cycler.next()
                    merged = dict(lb)
                    merged["canvases_u"] = ub["canvases"]
                    merged["valid_hw_u"] = ub["valid_hw"]
                    yield merged
        else:
            raise NotImplementedError(f"Method {method} not implemented.")

        if method != "fixmatch":
            if twin_cycler is not None:
                def train_batches():
                    if method == "CMLP":
                        for b in train_loader:
                            t = twin_cycler.next()
                            merged = dict(b)
                            merged["text_features"] = t["features"]
                            merged["text_labels"] = t["labels"]
                            yield merged
                    else:
                        yield from compose_twin(iter(train_loader),
                                                twin_cycler)
            else:
                def train_batches():
                    return iter(train_loader)

        # ---- validation closures
        if frozen:
            def validate_fn(state):
                head_arr = _cls_head(state.head)
                return validate_features(
                    head_arr, state.logit_scale,
                    val_feats["image_features"], val_feats["labels"],
                    cfg.num_classes, loss,
                    source=val_feats.get("source"))

            def test_fn(state):
                acc, _, _ = validate_features(
                    _cls_head(state.head), state.logit_scale,
                    test_feats["image_features"], test_feats["labels"],
                    cfg.num_classes, loss,
                    source=test_feats.get("source"))
                return acc
        elif method == "dataset-cls":
            # predictions compared against the source flag (reference
            # validate_dataset, testing.py:280-364)
            def _swap(samples):
                from swat_tpu.data.splits import Sample as _S

                return [_S(s.path, s.is_fewshot, s.is_fewshot)
                        for s in samples]

            def validate_fn(state):
                loader = EvalLoader(_swap(self._samples(cfg.val_split)),
                                    128, image_size, cfg.num_workers)
                return self.evaluator.validate(
                    state.model, _cls_head(state.head), state.logit_scale,
                    loader, return_confusion=True)

            def test_fn(state):
                loader = EvalLoader(_swap(self._samples(cfg.test_split)),
                                    128, image_size, cfg.num_workers)
                acc, _, _ = self.evaluator.validate(
                    state.model, _cls_head(state.head), state.logit_scale,
                    loader)
                return acc
        elif method == "finetune-multitask":
            # dual-head validation: class acc + dataset-source acc
            # (reference validate_multitask, testing.py:189-278)
            from swat_tpu.eval.validate import validate_multitask

            def validate_fn(state):
                loader = EvalLoader(self._samples(cfg.val_split), 128,
                                    image_size, cfg.num_workers)
                acc, vloss, cm, d_acc, _ = validate_multitask(
                    self.evaluator, state.model, state.head["cls"],
                    state.head["dataset"], state.logit_scale, loader, loss)
                logger.info(f"Dataset Val Acc: {round(d_acc, 3)}")
                return acc, vloss, cm

            def test_fn(state):
                loader = EvalLoader(self._samples(cfg.test_split), 128,
                                    image_size, cfg.num_workers)
                acc, _, _, d_acc, _ = validate_multitask(
                    self.evaluator, state.model, state.head["cls"],
                    state.head["dataset"], state.logit_scale, loader, loss)
                logger.info(f"Dataset Test Acc: {round(d_acc, 3)}")
                return acc
        else:
            val_split = (cfg.test_split if method == "fixmatch"
                         else cfg.val_split)  # reference :922-924

            def validate_fn(state):
                return self._validate_images(
                    state.model, _cls_head(state.head), state.logit_scale,
                    val_split, return_confusion=True)

            def test_fn(state):
                acc, _, _ = self._validate_images(
                    state.model, _cls_head(state.head), state.logit_scale,
                    cfg.test_split)
                return acc

        epoch_runner = None
        if resident_data is not None:
            from swat_tpu.train.scan_loop import (
                epoch_permutation,
                make_scan_epoch,
            )

            # augmentation follows the compute policy: under bf16 the
            # model casts pixels to bf16 at the first matmul anyway, so
            # the RRC resample runs its tensordots in bf16 too (2x
            # measured, scripts/ablate_aug.py); fp32 parity runs keep
            # the f32 resample
            import jax.numpy as _jnp

            aug_dtype = (_jnp.float32 if cfg.compute_dtype == "float32"
                         else _jnp.bfloat16)
            scan_epoch = make_scan_epoch(
                self.model, tx, method, loss, mixup_alpha=cfg.mixup_alpha,
                cutmix_beta=cfg.cutmix_beta, mix_prob=cfg.mix_prob,
                image_size=image_size, mesh=self.mesh,
                aug_dtype=aug_dtype)
            perm_rng = np.random.default_rng(cfg.training_seed)
            twin_bsz = (cfg.bsz if method == "mixup-fs" else
                        max(1, int(cfg.bsz * cfg.fewshot_ratio)))
            cmo_probs = None
            if method == "CMO":
                from swat_tpu.data.pipeline import WeightedSampler

                cmo_probs = WeightedSampler(
                    self._train_samples(cfg), cfg.num_classes,
                    cfg.cmo_alpha).p

            def epoch_runner(state, epoch, key):
                perm = epoch_permutation(perm_rng, resident_data.n, cfg.bsz)
                if resident_twin is None:
                    return scan_epoch(state, resident_data, perm, key)
                steps = perm.shape[0]
                if method == "CMO":
                    # twin batch = inverse-frequency sample of the full
                    # train set, same batch size as the primary
                    tperm = perm_rng.choice(
                        resident_twin.n, size=(steps, cfg.bsz),
                        replace=True, p=cmo_probs).astype(np.int32)
                else:
                    # few-shot twin loader cycles with its own shuffles
                    # (reference utils/training.py:724-737)
                    need = steps * twin_bsz
                    reps = []
                    while sum(len(r) for r in reps) < need:
                        reps.append(perm_rng.permutation(resident_twin.n))
                    tperm = np.concatenate(reps)[:need].reshape(
                        steps, twin_bsz).astype(np.int32)
                return scan_epoch(state, resident_data, perm, key,
                                  resident_twin, tperm)

        ckpt_dir = os.path.join(cfg.output_dir, "model_ckpts")
        return train_loop(
            cfg=cfg, state=state, step_fn=step,
            train_batches=train_batches, steps_per_epoch=steps_per_epoch,
            validate_fn=validate_fn, test_fn=test_fn, logger=logger,
            loss_logger=self.loss_logger, mesh=self.mesh, method=method,
            ckpt_dir=ckpt_dir, post_epoch=post_epoch,
            epoch_runner=epoch_runner)

    def _fs_loader(self, cfg: RunConfig):
        """Few-shot twin loader for *-fs / finetune-mixed methods
        (reference get_retrieve_fewshot_dataloader,
        utils/dataloader.py:138-165).  mixup-fs SELECTS whole batches
        (its lambda is always 0 or 1), so its twin matches the primary
        batch size; concat methods use the fewshot_ratio split."""
        if cfg.method == "mixup-fs":
            bsz = cfg.bsz
        else:
            bsz = max(1, int(cfg.bsz * cfg.fewshot_ratio))
        return TrainLoader(
            self._samples(cfg.fewshot_data), batch_size=bsz,
            seed=cfg.training_seed + 7, mode=cfg.aug_mode,
            n_px=self.model_cfg.vision.image_size,
            num_workers=cfg.num_workers)

    def _flyp_post_epoch(self):
        """Rebuild the classifier head from the updated text tower each
        epoch (reference build_classifier_head, utils/models.py:75-82)."""

        def post(state, epoch):
            tensors = P.encode_prompts(
                self._encode_text_fn(state.model), self.tokenized_prompts)
            new_head = jnp.asarray(P.class_embedding_matrix(tensors))
            return state.replace(head=new_head)

        return post

    def _heatmap_fn(self):
        """CLIP heatmap for attentivemix — the TPU-native replacement for
        the external GEM model (reference main.py:22,
        utils/training.py:2672).

        Honors --attentive_name (reference :2717-2731): each image is
        localized with its own class's text — 'c-name' (common name),
        's-name' (species), or 'general' (the reference hardcodes the
        word 'bird', :2724-2725) — encoded ONCE by the frozen initial
        text tower (the GEM-model analog) into a [C, D] bank.  Falls
        back to cls-token self-relevance when no class names can be
        built from the metrics file."""
        from swat_tpu.eval.heatmap import (
            clip_attention_heatmap,
            clip_text_heatmap,
        )

        model = self.model
        bank = self._attentive_text_bank()
        if bank is None:

            def fn(params, images, labels):
                return clip_attention_heatmap(model, params, images)
        else:
            self.logger.info(
                f"attentivemix: text-conditioned heatmaps "
                f"({self.cfg.attentive_name}, {bank.shape[0]} classes)")

            def fn(params, images, labels):
                return clip_text_heatmap(model, params, images,
                                         bank[labels])

        return fn

    def _attentive_text_bank(self):
        """[num_classes, D] normalized localization-text embeddings in
        class order, or None when the metrics file lacks usable names."""
        import jax.numpy as jnp

        cfg = self.cfg
        try:
            metrics = P.load_class_metrics(cfg.metrics_file)
        except (OSError, ValueError, KeyError):
            return None
        # the bank is indexed by label inside the jitted step, where
        # JAX's clamping gather would silently misalign classes if ids
        # were sparse or off-by-one — require exactly 0..num_classes-1
        try:
            ids = {int(k) for k in metrics}
        except ValueError:
            return None
        if ids != set(range(cfg.num_classes)):
            self.logger.warning(
                "attentivemix: metrics class ids are not contiguous "
                "0..num_classes-1; falling back to self-relevance "
                "heatmaps")
            return None
        texts = {}
        for class_id in sorted(metrics, key=int):
            entry = metrics[class_id]
            if cfg.attentive_name == "general":
                name = "bird"   # hardcoded in the reference, :2724-2725
            elif cfg.attentive_name == "s-name":
                name = (entry.get("species")
                        or entry.get("most_common_name")
                        or entry.get("name"))
            else:   # 'c-name' (default)
                name = (entry.get("common_name")
                        or entry.get("most_common_name")
                        or entry.get("name"))
            if isinstance(name, list):
                name = name[0] if name else None
            if not isinstance(name, str) or not name:
                return None
            texts[class_id] = [name]
        tokenized = P.tokenize_prompts(texts, self.tokenizer,
                                       self.model_cfg.text.context_length)
        tensors = P.encode_prompts(self._encode_text_fn(self.params),
                                   tokenized)
        return jnp.stack([jnp.asarray(tensors[cid]["mean"])
                          for cid in sorted(tensors, key=int)])

    # ------------------------------------------------------------------
    # WiSE-FT (reference run_wsft_alpha, main.py:132-195)

    def run_wsft_alpha(self, cfg, best_trainable, alphas=(0.5,)):
        logger = self.logger
        best_alpha, best_val, best_test = 0.0, -1.0, -1.0
        best_backbone, best_head_arr = None, None
        learned_head = _cls_head(best_trainable["head"])
        for alpha in alphas:
            w_head = wise_ft_head(learned_head, np.asarray(self.zeroshot_head),
                                  alpha)
            if cfg.freeze_visual:
                w_backbone = best_trainable["model"]
            else:
                w_backbone = wise_ft_params(
                    best_trainable["model"], self.zeroshot_params, alpha)
            val_acc, _, _ = self._validate_images(
                w_backbone, w_head, best_trainable["logit_scale"],
                cfg.val_split)
            test_acc, _, _ = self._validate_images(
                w_backbone, w_head, best_trainable["logit_scale"],
                cfg.test_split)
            logger.info(f"Alpha:{round(alpha, 3)}, "
                        f"Val Acc: {round(val_acc, 3)}, "
                        f"Test Acc: {round(test_acc, 3)}")
            if val_acc > best_val:
                best_val, best_test, best_alpha = val_acc, test_acc, alpha
                best_backbone, best_head_arr = w_backbone, w_head
        logger.info(f"+++++ Best Alpha: {round(best_alpha, 2)}, "
                    f"Val Acc: {round(best_val, 3)}, "
                    f"Test Acc: {round(best_test, 3)}")
        return best_backbone, best_head_arr, best_test

    # ------------------------------------------------------------------
    # tau normalization (reference run_tau_normalization, main.py:27-73)

    def run_tau_normalization(self, cfg, head, val_feats, test_feats,
                              logit_scale):
        logger = self.logger
        best_tau, best_val, best_test = 0.0, 0.0, 0.0
        best_tau_head = np.asarray(head)
        loss = self._loss(cfg)
        for tau in np.arange(0.0, 2.2, 0.2):
            tau_head = np.asarray(tau_normalize(jnp.asarray(head), tau))
            val_acc, _, _ = validate_features(
                tau_head, logit_scale, val_feats["image_features"],
                val_feats["labels"], cfg.num_classes, loss)
            test_acc, _, _ = validate_features(
                tau_head, logit_scale, test_feats["image_features"],
                test_feats["labels"], cfg.num_classes, loss)
            logger.info(f"Tau: {round(tau, 2)}, "
                        f"Val Acc: {round(val_acc, 3)}, "
                        f"Test Acc: {round(test_acc, 3)}")
            if val_acc > best_val:
                best_tau, best_val, best_test = tau, val_acc, test_acc
                best_tau_head = tau_head
        logger.info(f"+++++ Best Tau: {round(best_tau, 1)}, "
                    f"Val Acc: {round(best_val, 3)}, "
                    f"Test Acc: {round(best_test, 3)}")
        return best_tau_head, best_tau, best_test

    # ------------------------------------------------------------------
    # stage 1 (reference run_stage1_finetuning, main.py:198-398)

    def run_stage1(self) -> Tuple[float, Optional[str], float]:
        cfg = self.cfg
        logger = self.logger

        # warm start BEFORE the zero-shot check: the reference loads
        # --model_path first (main.py:215-221), so check_zeroshot /
        # zeroshot_only report the LOADED model's accuracy (with the
        # prompt-built head from the pretrained text tower)
        params, head = self.params, self.head
        if cfg.model_path:
            params, head, _, _ = self._load_ckpt(cfg.model_path)

        zs_acc = None
        if cfg.check_zeroshot or cfg.method == "zeroshot":
            logger.info("Check Zero-shot Acc ......")
            zs_acc = self.run_zeroshot(params)
        if cfg.zeroshot_only or cfg.method == "zeroshot":
            summary = (f"{cfg.dataset},{cfg.method},{cfg.data_source},"
                       f"{cfg.cls_init},{cfg.shots},{cfg.seed},"
                       f"{cfg.retrieval_split},{round(zs_acc, 1)}")
            logger.info(summary)
            print(summary)
            return zs_acc, None, -1.0

        if cfg.skip_stage1:
            logger.info("Skip stage 1 finetuning.")
            return -1.0, cfg.stage1_model_path, -1.0

        state, best = self.train_method(cfg, params, head)
        best_trainable = best.trainable
        if cfg.method == "dataset-cls":
            return -1.0, None, -1.0

        # ---- WiSE-FT
        wsft_backbone = wsft_head = None
        wsft_test_acc = -1.0
        if not cfg.no_wsft:
            logger.info("Checking WSFT ......")
            wsft_backbone, wsft_head, wsft_test_acc = self.run_wsft_alpha(
                cfg, best_trainable, alphas=(cfg.alpha,))

        # ---- re-extract features with the best model for fast tau/test
        best_params = best_trainable["model"]
        best_head = _cls_head(best_trainable["head"])
        logit_scale = best_trainable["logit_scale"]
        val_feats = extract_image_features(
            self.model, best_params, self._eval_loader(cfg.val_split, 256),
            self.mesh)
        test_feats = extract_image_features(
            self.model, best_params, self._eval_loader(cfg.test_split, 256),
            self.mesh)
        logger.info("Extracted val, test features for fast testing "
                    "after training.")

        loss = self._loss(cfg)
        test_acc, _, test_cm = validate_features(
            best_head, logit_scale, test_feats["image_features"],
            test_feats["labels"], cfg.num_classes, loss)
        scores = calculate_scores(test_cm)
        logger.info(f"+++++ Test Acc: {round(test_acc, 3)}")
        save_test_scores(scores, test_cm, cfg.output_dir, "test", stage=1)

        # ---- tau normalization.  With --no_tau unset but tau_norm False
        # the reference still stores a COPY of the best head with
        # tau=0.0/acc=0.0 in the bundle (run_tau_normalization's
        # untaken-branch returns, main.py:29-32,73) — consumers loading
        # best_tau_head from a stage-1 bundle rely on it being present
        best_tau_head, best_tau, best_tau_test_acc = None, -1, -1.0
        if not cfg.no_tau:
            if cfg.tau_norm:
                logger.info("Check Tau Normalization ......")
                best_tau_head, best_tau, best_tau_test_acc = (
                    self.run_tau_normalization(cfg, best_head, val_feats,
                                               test_feats, logit_scale))
            else:
                best_tau_head = np.array(best_head, copy=True)
                best_tau, best_tau_test_acc = 0.0, 0.0

        path = save_best_model(
            cfg.output_dir, 1, best_records=best.records,
            model_params=best_params, head=best_head,
            logit_scale=logit_scale, test_acc=test_acc, best_tau=best_tau,
            best_tau_test_acc=best_tau_test_acc,
            wsft_test_acc=wsft_test_acc, best_tau_head=best_tau_head,
            wsft_backbone=wsft_backbone, wsft_head=wsft_head)
        logger.info(f"Stage 1 Best Model saved to: {path}")
        return test_acc, path, wsft_test_acc

    def _load_ckpt(self, path: str):
        return load_best_model(path, self.params, np.asarray(self.head))

    # ------------------------------------------------------------------
    # stage 2 probing (reference run_stage2_probing, main.py:402-474)

    def run_stage2_probing(self, stage1_path: str):
        cfg = self.cfg
        logger = self.logger
        logger.info("Run stage 2 classifier retraining ......")

        params, head, logit_scale, _ = self._load_ckpt(stage1_path)
        params = jax.device_put(params)

        stage2 = dataclasses.replace(
            cfg, method="probing", pre_extracted=True, freeze_visual=True,
            epochs=10, early_stop=False,
            data_source="fewshot",
            # probing trains on frozen pre-extracted features: there is
            # no activation memory to microbatch, and the accum gate
            # rejects non-CE/mixing methods — drop any inherited value
            accum=1)

        # few-shot train features — extracted with the *train* transform
        # (one random-crop/flip snapshot per image) exactly like the
        # reference's extract_train_dataloader (main.py:413-415,
        # utils/dataloader.py:278-287), including its shuffle=True,
        # drop_last=True bsz-128 extraction that discards up to 127
        # random samples from the probing train set
        _fs_smp = self._samples(cfg.fewshot_data)
        snap_mode = "eval" if cfg.aug_mode == "eval" else "train"
        train_feats = self._cached_extract(
            cfg, params,
            "fsprobe_trainaug" if snap_mode == "train"
            else "fsprobe_evalaug",
            lambda: TrainSnapshotLoader(_fs_smp, 128,
                                        self.model_cfg.vision.image_size,
                                        cfg.num_workers,
                                        seed=cfg.training_seed,
                                        shuffle_drop_bsz=128,
                                        mode=snap_mode),
            samples=_fs_smp)
        _t_smp = self._samples(cfg.test_split)
        test_feats = self._cached_extract(
            cfg, params, "test",
            lambda: EvalLoader(_t_smp, 256,
                               self.model_cfg.vision.image_size,
                               cfg.num_workers),
            samples=_t_smp)

        loss = self._loss(stage2)
        train_loader = FeatureBatches(
            train_feats["image_features"], train_feats["labels"],
            batch_size=stage2.bsz, shuffle=True, drop_last=True,
            seed=stage2.training_seed)
        total_iter = len(train_loader) * stage2.epochs
        # logit_scale resets to ln(100) for probing (reference re-runs
        # set_params with method='probing', main.py:429)
        state, tx = create_train_state(
            params, head, "probing", lr_classifier=stage2.lr_classifier,
            lr_backbone=stage2.lr_backbone, total_iter=total_iter,
            wd=stage2.wd, optim_type=stage2.optim)
        step = S.make_probing_step(self.model, tx, loss, True)

        def validate_fn(state):
            return validate_features(
                state.head, state.logit_scale,
                train_feats["image_features"], train_feats["labels"],
                stage2.num_classes, loss)

        def test_fn(state):
            acc, _, _ = validate_features(
                state.head, state.logit_scale,
                test_feats["image_features"], test_feats["labels"],
                stage2.num_classes, loss)
            return acc

        state, best = train_loop(
            cfg=stage2, state=state, step_fn=step,
            train_batches=lambda: iter(train_loader),
            steps_per_epoch=len(train_loader), validate_fn=validate_fn,
            test_fn=test_fn, logger=logger, loss_logger=self.loss_logger,
            mesh=self.mesh, method="probing")

        test_acc, _, test_cm = validate_features(
            _cls_head(best.trainable["head"]),
            best.trainable["logit_scale"], test_feats["image_features"],
            test_feats["labels"], stage2.num_classes, loss)
        scores = calculate_scores(test_cm)
        logger.info(f"+++++ stage 2 Test Acc: {round(test_acc, 3)}")
        save_test_scores(scores, test_cm, cfg.output_dir, "test", stage=2)
        path = save_best_model(
            cfg.output_dir, 2, best_records=best.records,
            model_params=best.trainable["model"],
            head=_cls_head(best.trainable["head"]),
            logit_scale=best.trainable["logit_scale"], test_acc=test_acc)
        return test_acc, path

    # ------------------------------------------------------------------
    # stage 2 FSFT (reference run_stage2_FSFT, main.py:478-540)

    def run_stage2_fsft(self, stage1_path: str):
        cfg = self.cfg
        logger = self.logger
        logger.info("Run stage 2 few-shot finetuning ......")

        params, head, logit_scale, _ = self._load_ckpt(stage1_path)
        stage2 = dataclasses.replace(
            cfg, method="finetune", pre_extracted=False,
            freeze_visual=False, epochs=10, early_stop=False,
            save_ckpt=False, data_source="fewshot")

        state, best = self.train_method(stage2, params, head)
        test_acc, _, test_cm = self._validate_images(
            best.trainable["model"], _cls_head(best.trainable["head"]),
            best.trainable["logit_scale"], cfg.test_split,
            return_confusion=True)
        scores = calculate_scores(test_cm)
        logger.info(f"+++++ Stage 2 FSFT Test Acc: {round(test_acc, 3)}")
        save_test_scores(scores, test_cm, cfg.output_dir, "test", stage=3)
        path = save_best_model(
            cfg.output_dir, 3, best_records=best.records,
            model_params=best.trainable["model"],
            head=_cls_head(best.trainable["head"]),
            logit_scale=best.trainable["logit_scale"], test_acc=test_acc)
        return test_acc, path

    # ------------------------------------------------------------------
    # ImageNet OOD sweep (reference main.py:599-602, testing.py:22-72)

    def run_ood(self, model_path: Optional[str] = None) -> Dict[str, float]:
        """4-dataset OOD sweep.  The reference passes the live ``model``
        object AFTER run_stage2_FSFT (main.py:599-602), which by then
        holds the stage-2 FSFT weights (train_ce mutates it in place;
        with early_stop=False final == best) — so callers pass the most
        downstream stage bundle that ran (FSFT > LP > stage-1)."""
        from swat_tpu.eval.ood import test_imagenet_ood

        params, head = self.params, self.head
        if model_path:
            params, head, _, _ = self._load_ckpt(model_path)

        def make_loader(samples):
            return EvalLoader(samples, batch_size=256,
                              n_px=self.model_cfg.vision.image_size,
                              num_workers=self.cfg.num_workers)

        return test_imagenet_ood(
            self.evaluator, params, head, None, self.cfg.dataset_path,
            make_loader, self.logger)

    # ------------------------------------------------------------------
    # full run (reference __main__, main.py:544-606)

    def run(self) -> str:
        from swat_tpu.utils.profiling import maybe_trace

        with maybe_trace(self.cfg.trace_dir):
            return self._run_impl()

    def _run_impl(self) -> str:
        cfg = self.cfg
        start = time.time()
        stage1_method = cfg.method

        stage1_acc, stage1_path, wsft_acc = self.run_stage1()
        if cfg.zeroshot_only or cfg.method == "zeroshot":
            return ""
        if cfg.method == "dataset-cls":
            # the reference exits right after train_dataset_cls
            # (main.py:329-330): no stage 2, no summary row for the
            # harness to ingest
            self.logger.info("dataset-cls run complete (no summary row; "
                             "reference exits after training).")
            return ""

        stage2_lp_acc = -1.0
        stage2_fsft_acc = -1.0
        ood_path = stage1_path
        if not cfg.skip_stage2 and stage1_path:
            stage2_lp_acc, lp_path = self.run_stage2_probing(stage1_path)
            stage2_fsft_acc, fsft_path = self.run_stage2_fsft(stage1_path)
            ood_path = fsft_path or lp_path or stage1_path
        else:
            self.logger.info("Skip stage 2.")

        self.logger.info(
            f"Total time: {round((time.time() - start) / 60, 1)} mins.")

        # ---- ImageNet OOD sweep (reference main.py:599-602, run on the
        # most downstream trained weights — the live model holds the
        # stage-2 FSFT state there)
        if cfg.test_imagenet_ood:
            self.logger.info("Test ImageNet OOD ......")
            self.run_ood(ood_path)

        summary = (f"{cfg.dataset},{stage1_method},{cfg.data_source},"
                   f"{cfg.cls_init},{cfg.shots},{cfg.seed},"
                   f"{cfg.retrieval_split},{round(stage1_acc, 1)},"
                   f"{round(wsft_acc, 1)},{round(stage2_lp_acc, 1)},"
                   f"{round(stage2_fsft_acc, 1)}")
        self.logger.info(summary)
        print(summary)
        return summary


def _cls_head(head):
    """The classification head array (multitask stores {'cls','dataset'})."""
    if isinstance(head, dict):
        return head["cls"]
    return head


def _flatten_prompt_bank(prompt_tensors):
    """All prompt embeddings + class labels (reference TextTensorDataset,
    utils/datasets/dataset_utils.py:258-279)."""
    feats, labels = [], []
    for cid in sorted(prompt_tensors, key=int):
        f = np.asarray(prompt_tensors[cid]["all"])
        feats.append(f)
        labels.append(np.full(f.shape[0], int(cid), np.int32))
    return np.concatenate(feats, 0), np.concatenate(labels, 0)
