"""bf16-policy accuracy evidence (VERDICT r3 item 2).

The reference trains fp32 end-to-end (model.float(), reference
utils/extras.py:163); this rebuild's production default is bf16 compute
+ bf16 softmax storage + bf16 augmentation resample.  Every parity
artifact runs the fp32 policy, so nothing bounded what the bf16 stack
costs in ACCURACY — and the +-0.5% reproduction bar can be silently
consumed by exactly that drift.

This script trains the same small-but-real CLIP to convergence on a
noisy color-separable synthetic task under (a) the fp32 parity policy
and (b) the FULL production bf16 policy, >=3 seeds each with identical
data/keys per seed, and reports the final test-accuracy delta plus the
per-epoch loss-curve divergence.

The task is deliberately NOT trivially separable (6 classes on
overlapping color centers + heavy per-pixel noise) so both policies land
mid-scale (~80-95%) where drift is visible; a 100%-both result would
prove nothing.

Run:  python scripts/ablate_bf16_accuracy.py [--seeds 3] [--epochs 30]
      (CPU or TPU; bf16 matmuls accumulate fp32 on both backends)
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

from swat_tpu.core.precision import DEFAULT_PRECISION, FP32_PRECISION
from swat_tpu.kernels import augment as aug
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.head import init_head_random
from swat_tpu.train.scan_loop import ResidentData, make_scan_epoch
from swat_tpu.train.state import create_train_state

C = 6
CANVAS, IMG = 40, 32
N_TRAIN_PER, N_TEST_PER = 48, 60
BSZ = 48

# 6 color centers spaced 30 apart in one channel.  Difficulty comes from
# a PER-IMAGE global color shift (uniform +-25/channel) comparable to
# the class separation: per-pixel noise alone averages out over 1024
# pixels and both policies hit 100% (measured) — the per-image shift
# creates irreducible class overlap so accuracy lands mid-scale where
# precision drift is visible.
COLORS = np.asarray([
    [110, 60, 60], [140, 60, 60], [170, 60, 60],
    [60, 60, 110], [60, 60, 140], [60, 60, 170],
], np.int32)


def make_split(rng, n_per):
    n = n_per * C
    labels = np.repeat(np.arange(C), n_per)
    canv = np.empty((n, CANVAS, CANVAS, 3), np.uint8)
    for i, c in enumerate(labels):
        shift = rng.integers(-25, 26, (1, 1, 3))
        canv[i] = np.clip(
            COLORS[c] + shift + rng.integers(-40, 40, (CANVAS, CANVAS, 3)),
            0, 255)
    hw = np.full((n, 2), CANVAS, np.int32)
    return canv, hw, labels.astype(np.int32)


def eval_acc(model, params, head, test_canv, test_labels, precision):
    """Eval-transform (full-canvas resize to IMG) + encode + head."""
    from swat_tpu.models import functional as F

    dtype = precision.compute_dtype

    @jax.jit
    def run(params, head, canv):
        x = jax.image.resize(canv.astype(dtype),
                             (canv.shape[0], IMG, IMG, 3), "cubic")
        x = aug._normalize_float_pixels(x, dtype)
        feats = F.encode_image(model, params, x, normalize=True,
                               mode="infer")
        logits = feats @ head.T
        return jnp.argmax(logits, -1)

    preds = np.asarray(run(params, jnp.asarray(head, jnp.float32),
                           jnp.asarray(test_canv)))
    return float((preds == test_labels).mean() * 100.0)


def train_one(seed: int, precision, epochs: int,
              return_state: bool = False):
    cfg = get_model_config("test_tiny")
    model = CLIPModel(cfg, precision=precision)
    rng = np.random.default_rng(1000 + seed)
    canv, hw, labels = make_split(rng, N_TRAIN_PER)
    test_canv, _, test_labels = make_split(
        np.random.default_rng(77), N_TEST_PER)   # shared test set

    params = model.init(
        jax.random.PRNGKey(seed),
        jnp.zeros((1, IMG, IMG, 3), jnp.float32),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(seed + 1), C, cfg.embed_dim)
    state, tx = create_train_state(
        params, head, "cutmix", lr_classifier=1e-3, lr_backbone=1e-4,
        total_iter=epochs * (len(labels) // BSZ))
    # the full production path: resident scan epochs, aug in the
    # policy's compute dtype (bf16 resample under the bf16 policy)
    epoch = make_scan_epoch(model, tx, "cutmix", image_size=IMG,
                            aug_dtype=precision.compute_dtype)
    data = ResidentData(jnp.asarray(canv), jnp.asarray(hw),
                        jnp.asarray(labels),
                        jnp.asarray(np.ones_like(labels)))
    n = len(labels)
    steps = n // BSZ
    losses = []
    perm_rng = np.random.default_rng(seed)
    for e in range(epochs):
        perm = perm_rng.permutation(n)[:steps * BSZ].reshape(
            steps, BSZ).astype(np.int32)
        state, loss = epoch(state, data, perm,
                            jax.random.fold_in(jax.random.PRNGKey(9), e))
        losses.append(float(loss))
    acc = eval_acc(model, state.model, np.asarray(state.head),
                   test_canv, test_labels, precision)
    if return_state:
        return (acc, state), losses
    return acc, losses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    out = {"fp32": [], "bf16": [], "loss_div": []}
    for seed in range(args.seeds):
        t0 = time.time()
        acc32, l32 = train_one(seed, FP32_PRECISION, args.epochs)
        acc16, l16 = train_one(seed, DEFAULT_PRECISION, args.epochs)
        div = float(np.mean(np.abs(np.asarray(l32) - np.asarray(l16))))
        out["fp32"].append(acc32)
        out["bf16"].append(acc16)
        out["loss_div"].append(div)
        print(f"seed {seed}: fp32 {acc32:.2f}% bf16 {acc16:.2f}% "
              f"mean|loss diff| {div:.4f}  [{time.time() - t0:.0f}s]",
              flush=True)

    m32, m16 = np.mean(out["fp32"]), np.mean(out["bf16"])
    print(json.dumps({
        "task": "6-class noisy color, cutmix stage-1, "
                f"{args.seeds} seeds x {args.epochs} epochs",
        "fp32_accs": out["fp32"], "bf16_accs": out["bf16"],
        "fp32_mean": round(float(m32), 3),
        "bf16_mean": round(float(m16), 3),
        "delta_bf16_minus_fp32": round(float(m16 - m32), 3),
        "mean_epoch_loss_divergence": round(
            float(np.mean(out["loss_div"])), 5),
    }))


if __name__ == "__main__":
    main()
