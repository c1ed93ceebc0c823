"""int8 W8A8 accuracy-delta bound (VERDICT r3 item 7).

models/quant.py was mechanically verified (round-trip, dispatch,
refusal-to-train) but nothing bounded the ACCURACY cost of W8A8 serving.
With real weights asset-gated, the available evidence is a
synthetic-convergence experiment: train the small-but-real CLIP on the
noisy color task (same task as ablate_bf16_accuracy) to convergence,
then score the SAME trained tree three ways —

  fp32 tree / fp32 policy   (the parity reference)
  fp32 tree / bf16 policy   (production bf16 serving)
  int8 tree / bf16 policy   (production --quantize int8 serving)

— and report top-1 deltas plus prediction agreement across seeds.
Matches the serving stages the reference runs in fp32 torch
(extract_mined_feature.py:103-213, testing.py CLI).

Run: python scripts/ablate_int8_accuracy.py [--seeds 3] [--epochs 30]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
sys.path.insert(0, __file__.rsplit("/", 1)[0])

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

from swat_tpu.core.precision import DEFAULT_PRECISION, FP32_PRECISION
from swat_tpu.kernels import augment as aug
from swat_tpu.models.clip import CLIPModel
from swat_tpu.models.configs import get_model_config
from swat_tpu.models.quant import quantize_tree

from ablate_bf16_accuracy import IMG, N_TEST_PER, make_split, train_one


def predict(precision, params, head, test_canv):
    from swat_tpu.models import functional as F

    cfg = get_model_config("test_tiny")
    model = CLIPModel(cfg, precision=precision)
    dtype = precision.compute_dtype

    @jax.jit
    def run(params, head, canv):
        x = jax.image.resize(canv.astype(dtype),
                             (canv.shape[0], IMG, IMG, 3), "cubic")
        x = aug._normalize_float_pixels(x, dtype)
        feats = F.encode_image(model, params, x, normalize=True,
                               mode="infer")
        return jnp.argmax(feats @ head.T, -1)

    return np.asarray(run(params, jnp.asarray(head, jnp.float32),
                          jnp.asarray(test_canv)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=30)
    args = ap.parse_args()

    test_canv, _, test_labels = make_split(
        np.random.default_rng(77), N_TEST_PER)
    rows = []
    for seed in range(args.seeds):
        # train under the fp32 parity policy; score the same tree
        acc_train, _ = train_one(seed, FP32_PRECISION, args.epochs,
                                 return_state=True)
        state = acc_train[1]
        params = jax.device_get(state.model)
        head = np.asarray(state.head)

        p32 = predict(FP32_PRECISION, params, head, test_canv)
        p16 = predict(DEFAULT_PRECISION, params, head, test_canv)
        p8 = predict(DEFAULT_PRECISION, quantize_tree(params), head,
                     test_canv)
        acc = {k: float((p == test_labels).mean() * 100)
               for k, p in [("fp32", p32), ("bf16", p16), ("int8", p8)]}
        agree8 = float((p8 == p32).mean() * 100)
        rows.append({**acc, "int8_vs_fp32_agreement": agree8})
        print(json.dumps({"seed": seed, **rows[-1]}), flush=True)

    summary = {k: round(float(np.mean([r[k] for r in rows])), 3)
               for k in rows[0]}
    summary.update({
        "metric": "int8_accuracy_delta",
        "delta_int8_minus_fp32": round(
            summary["int8"] - summary["fp32"], 3),
        "delta_bf16_minus_fp32": round(
            summary["bf16"] - summary["fp32"], 3),
        "seeds": args.seeds,
    })
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
