"""Generic epoch-loop driver with best-model tracking.

One loop serves all 18 methods (the reference repeats this loop per trainer
in utils/training.py); the semantics preserved exactly:

* per-iteration scheduler stepping (inside the jitted step);
* validation either every epoch or only when ``early_stop``/last epoch —
  per-method, matching each reference trainer (see VALIDATE_EVERY_EPOCH);
* best snapshot when ``val_acc >= best_val_acc`` (ties move forward,
  reference utils/training.py:1506);
* loss.csv line per epoch with -1 placeholders before first validation;
* ``stop_epochs`` early break; periodic ckpt on iter % save_freq.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import numpy as np

from swat_tpu.eval.metrics import calculate_scores
from swat_tpu.train.checkpoint import save_train_ckpt

# methods whose reference trainer validates every epoch (ungated);
# NOTE: even these gate the BEST-snapshot update on early_stop/last-epoch
# (e.g. train_probing utils/training.py:120, train_ce_mixed :770), so
# with early_stop=False the selected model is always the LAST epoch's —
# the per-epoch validation only feeds logs/loss.csv
VALIDATE_EVERY_EPOCH = {
    "probing", "REAL-Linear", "finetune-mixed", "finetune-multitask",
    "mixup", "mixup-fs", "cutmix-fs", "resizemix", "attentivemix",
}


@dataclasses.dataclass
class BestSnapshot:
    trainable: Any = None        # {'model','head','logit_scale'} host copy
    records: Dict = dataclasses.field(default_factory=dict)
    val_acc: float = -1.0


def snapshot_trainable(state) -> Any:
    """Host copy of the best trainable tree (the reference deep-copies the
    model per improvement, utils/training.py:1514-1515)."""
    return jax.tree_util.tree_map(np.asarray, state.trainable)


def try_resume(state, ckpt_dir: str, logger):
    """Load the newest periodic ckpt in ckpt_dir; returns
    (state, epoch_completed|0).  Ckpt tags encode the epoch
    (``ckpt_ep{E}_it{I}.msgpack``, checkpoint.save_train_ckpt)."""
    import glob
    import re

    from swat_tpu.train.checkpoint import load_train_ckpt

    paths = glob.glob(os.path.join(ckpt_dir, "ckpt_ep*_it*.msgpack"))
    if not paths:
        return state, 0
    latest = max(paths, key=os.path.getmtime)
    m = re.search(r"ckpt_ep(\d+)_it(\d+)", latest)
    epoch = int(m.group(1)) if m else 0
    state, meta = load_train_ckpt(latest, state)
    logger.info(f"Resumed from {latest} (epoch {epoch}, "
                f"iter {int(np.asarray(state.step))})")
    return state, epoch


def compose_twin(primary: Iterable[dict], twin_cycler, suffix: str = "_fs"):
    """Merge each primary batch with a cycled twin batch under ``suffix``
    (the reference two-loader pattern, utils/training.py:724-737)."""
    for batch in primary:
        twin = twin_cycler.next()
        merged = dict(batch)
        merged.update({f"{k}{suffix}": v for k, v in twin.items()})
        yield merged


def train_loop(
    *,
    cfg,
    state,
    step_fn: Callable,
    train_batches: Callable[[], Iterable[dict]],
    steps_per_epoch: int,
    validate_fn: Callable,          # (state) -> (val_acc, val_loss, cm)
    test_fn: Callable,              # (state) -> test_acc
    logger,
    loss_logger=None,
    mesh=None,
    method: Optional[str] = None,
    ckpt_dir: Optional[str] = None,
    post_epoch: Optional[Callable] = None,   # e.g. FLYP head rebuild
    epoch_runner: Optional[Callable] = None,  # resident scan-epoch path
):
    """Runs cfg.epochs epochs; returns (final_state, BestSnapshot).

    When ``epoch_runner(state, epoch, key) -> (state, avg_loss)`` is given
    (resident-data mode, swat_tpu.train.scan_loop) it replaces the
    per-batch loop: one device dispatch per epoch."""
    method = method or cfg.method
    every_epoch = method in VALIDATE_EVERY_EPOCH
    key = jax.random.PRNGKey(cfg.training_seed)

    best = BestSnapshot()
    num_iter = 0
    val_acc, val_loss, test_acc = -1.0, -1.0, -1.0

    from swat_tpu.utils.profiling import StepMeter

    start_epoch = 1
    if getattr(cfg, "resume", False) and ckpt_dir:
        state, resumed_epoch = try_resume(state, ckpt_dir, logger)
        if resumed_epoch:
            start_epoch = resumed_epoch + 1
            num_iter = int(np.asarray(state.step))

    meter = StepMeter()
    for epoch in range(start_epoch, cfg.epochs + 1):
        meter.reset()
        train_loss_sum = 0.0
        if epoch_runner is not None:
            key, sub = jax.random.split(key)
            state, avg_loss = epoch_runner(state, epoch, sub)
            num_iter += steps_per_epoch
            train_loss_sum = float(avg_loss) * steps_per_epoch
        else:
            # keep losses on device until epoch end: materializing per
            # step would serialize dispatch against compute and stall the
            # pipeline on every host round-trip
            epoch_losses = []
            batches = train_batches()
            if mesh is not None:
                # double-buffered sharded uploads: batch N+1's H2D DMA
                # overlaps step N's compute (data/pipeline.device_prefetch)
                from swat_tpu.data.pipeline import device_prefetch

                batches = device_prefetch(batches, mesh)
            for batch in batches:
                num_iter += 1
                key, sub = jax.random.split(key)
                state, loss = step_fn(state, batch, sub)
                epoch_losses.append(loss)
            train_loss_sum = float(sum(epoch_losses[1:], epoch_losses[0])) \
                if epoch_losses else 0.0

        snapshot_epoch = cfg.early_stop or epoch == cfg.epochs
        do_validate = every_epoch or snapshot_epoch
        if post_epoch is not None and do_validate:
            # FLYP's head rebuild happens only on validation epochs in
            # the reference (train_flyp utils/training.py:488-490)
            state = post_epoch(state, epoch)
        if do_validate:
            val_acc, val_loss, cm = validate_fn(state)
            scores = calculate_scores(cm) if cm is not None else {}
            # the reference gates the best update on early_stop/last
            # epoch even in every-epoch-validating trainers
            # (utils/training.py:120,770,1232,1506)
            if snapshot_epoch and val_acc >= best.val_acc:
                best.val_acc = val_acc
                best.trainable = snapshot_trainable(state)
                best.records = {
                    "best_val_acc": val_acc,
                    "best_logit_scale": float(np.asarray(state.logit_scale)),
                    "best_epoch": epoch,
                    "best_iter": num_iter,
                    "best_scores": scores,
                    "best_confusion_matrix": cm,
                }
            test_acc = test_fn(state)

        train_loss_avg = train_loss_sum / max(steps_per_epoch, 1)
        if loss_logger is not None:
            loss_logger.write(
                f"{epoch},{num_iter},{round(train_loss_avg, 6)},"
                f"{round(val_loss, 6)},{round(val_acc, 6)},"
                f"{round(test_acc, 6)}\n")
            loss_logger.flush()
        meter.tick(steps_per_epoch * cfg.bsz)
        logger.info(
            f"Epoch {epoch}, Iter {num_iter}, "
            f"Trn Loss: {round(train_loss_avg, 6)}, "
            f"Val Loss: {round(val_loss, 6)}, "
            f"Val Acc: {round(val_acc, 3)}, Test Acc: {round(test_acc, 3)}, "
            f"{meter.items_per_sec:.0f} img/s")

        # save_freq is documented "in epoch" (reference utils/parser.py:141);
        # the reference code gates on num_iter % save_freq
        # (utils/training.py:153), a bug that almost never fires — follow
        # the documented per-epoch semantics instead
        if cfg.save_ckpt and ckpt_dir and (
                epoch % cfg.save_freq == 0 or epoch == cfg.epochs):
            path = save_train_ckpt(ckpt_dir, f"ep{epoch}_it{num_iter}",
                                   state, best.records)
            logger.info(f"Model ckpt saved to: {path}")

        if epoch == cfg.stop_epochs:
            break

    if best.trainable is None:  # epochs == 0 edge: keep current weights
        logger.info("No training epochs ran; snapshotting current weights "
                    f"(val_acc {round(val_acc, 3)} recorded as best)")
        best.trainable = snapshot_trainable(state)
        best.records = {"best_val_acc": val_acc, "best_epoch": -1,
                        "best_iter": num_iter, "best_scores": {},
                        "best_confusion_matrix": None,
                        "best_logit_scale": float(
                            np.asarray(state.logit_scale))}
    logger.info(
        f"Training done. Best val Acc: {round(best.val_acc, 3)} at epoch "
        f"{best.records.get('best_epoch', -1)}, "
        f"iter {best.records.get('best_iter', -1)}")
    return state, best
