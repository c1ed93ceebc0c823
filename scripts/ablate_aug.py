"""Ablate the on-device augmentation chain's compute dtype.

The round-3 step decomposition attributes ~4.8 ms of the 71.4 ms cutmix
step to augmentation (bench.py breakdown).  The RRC resample is two 1-D
bicubic tensordots per image (jax.image.scale_and_translate); in f32 those
run the MXU at its slow fp32 path and write a [B,224,224,3] f32 tensor.
This script measures f32 vs bf16 for (a) the aug-only scan epoch and
(b) the full cutmix train step, plus the max pixel deviation bf16 causes.

Run on the real TPU: python scripts/ablate_aug.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
STEPS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.kernels import augment as aug
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.train.scan_loop import ResidentData, make_scan_epoch
    from swat_tpu.train.state import create_train_state

    rng = np.random.default_rng(0)
    n = BATCH * 2
    canv = jax.device_put(
        rng.integers(0, 255, (n, 256, 256, 3)).astype(np.uint8))
    hw = jax.device_put(np.full((n, 2), 256, np.int32))
    labels = jax.device_put(rng.integers(0, 200, n).astype(np.int32))
    source = jax.device_put(rng.integers(0, 2, n).astype(np.int32))
    perm = rng.integers(0, n, STEPS * BATCH).reshape(
        STEPS, BATCH).astype(np.int32)

    def timed(fn, *args, reps=3):
        _ = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / (reps * STEPS) * 1e3

    def make_aug_epoch(dtype):
        @jax.jit
        def aug_epoch(canv, hw, lab, key):
            keys = jax.random.split(key, STEPS)

            def body(carry, xs):
                idx, k = xs
                k_aug, k_mix = jax.random.split(k)
                x = aug.train_augment(canv[idx], hw[idx], k_aug, dtype=dtype)
                x, *_ = aug.cutmix(x, lab[idx], k_mix)
                return carry + x[0, 0, 0, 0].astype(jnp.float32), None

            s, _ = jax.lax.scan(body, jnp.float32(0), (perm, keys))
            return s

        return aug_epoch

    key = jax.random.PRNGKey(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        ms = timed(make_aug_epoch(dtype), canv, hw, labels, key)
        print(f"aug+cutmix epoch, {dtype.__name__}: {ms:.2f} ms/step")

    # pixel deviation of the bf16 resample (same key -> same crops)
    k = jax.random.PRNGKey(1)
    a = aug.random_resized_crop(canv[:32], hw[:32], k)
    b = aug.random_resized_crop(canv[:32], hw[:32], k, dtype=jnp.bfloat16)
    dev = float(jnp.max(jnp.abs(a - b.astype(jnp.float32))))
    print(f"max |f32 - bf16| pixel value (0..255 scale): {dev:.3f}")

    # full cutmix train step, f32 vs bf16 augmentation
    cfg = get_model_config("vitb32_openclip_laion400m")
    model = CLIPModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))
    data = ResidentData(canv, hw, labels, source)

    for dtype in (jnp.float32, jnp.bfloat16):
        state, tx = create_train_state(
            params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
            total_iter=10_000)
        run = make_scan_epoch(model, tx, "cutmix", aug_dtype=dtype)
        holder = {"state": state}

        def epoch(holder=holder, run=run):
            # epoch_fn donates the state: must thread the new one through
            nonlocal key
            key, sub = jax.random.split(key)
            holder["state"], loss = run(holder["state"], data, perm, sub)
            return loss

        ms = timed(epoch)
        print(f"full cutmix step, aug {dtype.__name__}: {ms:.2f} ms/step")


if __name__ == "__main__":
    main()
