"""Benchmark: OpenCLIP ViT-B/32 finetune throughput (images/sec/chip).

Runs the production resident-data training path (swat_tpu.train.scan_loop):
a whole epoch of REAL cutmix train steps — on-device random-resized-crop +
flip + normalize from uint8 canvases, cutmix, ViT-B/32 forward, CE loss,
backward, AdamW with the reference's warmup-cosine schedule — as one
device program on the real TPU (bf16 compute / fp32 params).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference (tian1327/SWAT) publishes no throughput numbers
(SURVEY.md §6); BASELINE_IMG_PER_SEC is a documented estimate of its
single-A100 fp32 torch loop (bsz 32, PIL worker augmentation):
ViT-B/32 fwd+bwd ≈ 13 GFLOP/img at that loop's utilization ≈ 1000 img/s.
vs_baseline = measured / estimate.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_IMG_PER_SEC = 1000.0
BATCH = 256
STEPS_PER_EPOCH = 20
EPOCHS = 3  # timed epochs after warmup


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.train.scan_loop import ResidentData, make_scan_epoch
    from swat_tpu.train.state import create_train_state

    cfg = get_model_config("vitb32_openclip_laion400m")
    model = CLIPModel(cfg)  # bf16 compute policy
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))

    state, tx = create_train_state(
        params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
        total_iter=STEPS_PER_EPOCH * (EPOCHS + 2))
    run_epoch = make_scan_epoch(model, tx, "cutmix")

    n = BATCH * 2  # resident pool; batches gathered by permutation
    rng = np.random.default_rng(0)
    data = ResidentData(
        jax.device_put(rng.integers(0, 255, (n, 256, 256, 3)
                                    ).astype(np.uint8)),
        jax.device_put(np.full((n, 2), 256, np.int32)),
        jax.device_put(rng.integers(0, 200, n).astype(np.int32)),
        jax.device_put(rng.integers(0, 2, n).astype(np.int32)))

    def perm():
        idx = rng.integers(0, n, STEPS_PER_EPOCH * BATCH)
        return idx.reshape(STEPS_PER_EPOCH, BATCH).astype(np.int32)

    key = jax.random.PRNGKey(0)
    # warmup/compile (host transfer of the loss forces real completion —
    # block_until_ready is unreliable over the tunneled TPU)
    key, sub = jax.random.split(key)
    state, loss = run_epoch(state, data, perm(), sub)
    _ = float(loss)

    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        key, sub = jax.random.split(key)
        state, loss = run_epoch(state, data, perm(), sub)
    _ = float(loss)
    dt = time.perf_counter() - t0

    n_chips = max(1, jax.device_count())
    img_per_sec_per_chip = BATCH * STEPS_PER_EPOCH * EPOCHS / dt / n_chips
    print(json.dumps({
        "metric": "vitb32_finetune_images_per_sec_per_chip",
        "value": round(img_per_sec_per_chip, 1),
        "unit": "images/sec/chip",
        "vs_baseline": round(img_per_sec_per_chip / BASELINE_IMG_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
