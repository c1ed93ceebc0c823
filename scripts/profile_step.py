"""Breakdown of the cutmix train step on the real TPU.

Times, each as a lax.scan over STEPS iterations (one dispatch, amortizing
tunnel latency):
  aug      — random_resized_crop + hflip + normalize + cutmix only
  fwd      — model forward + loss on pre-augmented images
  fwdbwd   — value_and_grad + AdamW update on pre-augmented images
  full     — the production scan_loop step (aug + fwdbwd)

Prints per-step ms and derived img/s + MFU for each.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
STEPS = 20
PEAK_TFLOPS = 197.0  # v5e bf16 (2*M*N*K FLOP convention)
# ViT-B/32 @224: 8.85 GFLOP/img fwd (2*M*N*K; the cited 4.4 is MACs)
FWD_GFLOP_PER_IMG = 8.85
TRAIN_GFLOP_PER_IMG = 3 * FWD_GFLOP_PER_IMG


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.kernels import augment as aug
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.head import head_logits
    from swat_tpu.train.losses import cross_entropy, mixup_criterion
    from swat_tpu.train.scan_loop import ResidentData, make_scan_epoch
    from swat_tpu.train.state import create_train_state

    cfg = get_model_config("vitb32_openclip_laion400m")
    model = CLIPModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))

    state, tx = create_train_state(
        params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
        total_iter=10_000)

    n = BATCH * 2
    rng = np.random.default_rng(0)
    canvases = jax.device_put(
        rng.integers(0, 255, (n, 256, 256, 3)).astype(np.uint8))
    valid_hw = jax.device_put(np.full((n, 2), 256, np.int32))
    labels = jax.device_put(rng.integers(0, 200, n).astype(np.int32))
    source = jax.device_put(rng.integers(0, 2, n).astype(np.int32))
    data = ResidentData(canvases, valid_hw, labels, source)

    def perm():
        idx = rng.integers(0, n, STEPS * BATCH)
        return jnp.asarray(idx.reshape(STEPS, BATCH).astype(np.int32))

    pre_images = jax.device_put(
        rng.standard_normal((BATCH, 224, 224, 3)).astype(np.float32))

    results = {}

    def timeit(name, fn, *args, reps=3):
        out = fn(*args)  # compile + warmup
        jax.tree_util.tree_map(
            lambda x: np.asarray(x) if hasattr(x, "shape") and x.size < 100
            else None, out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        leaves = [x for x in jax.tree_util.tree_leaves(out)
                  if hasattr(x, "size") and x.size < 1000]
        _ = [np.asarray(x) for x in leaves[:1]] or np.asarray(
            jax.tree_util.tree_leaves(out)[0])
        dt = (time.perf_counter() - t0) / (reps * STEPS)
        results[name] = dt * 1e3
        print(f"{name:8s} {dt*1e3:8.2f} ms/step", flush=True)
        return dt

    # --- aug only ---
    @jax.jit
    def aug_epoch(canv, hw, lab, perm, key):
        keys = jax.random.split(key, STEPS)

        def body(carry, xs):
            idx, k = xs
            k_aug, k_mix = jax.random.split(k)
            x = aug.train_augment(canv[idx], hw[idx], k_aug)
            x, ya, yb, lam = aug.cutmix(x, lab[idx], k_mix)
            return carry + jnp.sum(x[0, 0, 0]), None

        s, _ = jax.lax.scan(body, jnp.float32(0), (perm, keys))
        return s

    timeit("aug", aug_epoch, canvases, valid_hw, labels, perm(),
           jax.random.PRNGKey(0))

    # --- RRC only (no cutmix) ---
    @jax.jit
    def rrc_epoch(canv, hw, perm, key):
        keys = jax.random.split(key, STEPS)

        def body(carry, xs):
            idx, k = xs
            x = aug.random_resized_crop(canv[idx], hw[idx], k)
            return carry + jnp.sum(x[0, 0, 0]), None

        s, _ = jax.lax.scan(body, jnp.float32(0), (perm, keys))
        return s

    timeit("rrc", rrc_epoch, canvases, valid_hw, perm(),
           jax.random.PRNGKey(0))

    # --- fwd only ---
    @jax.jit
    def fwd_epoch(params, head, images):
        def body(carry, _):
            feats = model.apply({"params": params}, images, True,
                                method=CLIPModel.encode_image)
            logits = head_logits(head, feats)
            return carry + jnp.sum(logits[0]), None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=STEPS)
        return s

    timeit("fwd", fwd_epoch, state.trainable["model"],
           state.trainable["head"], pre_images)

    # --- fwd+bwd+opt, no aug ---
    @jax.jit
    def fwdbwd_epoch(state, images, labels_b):
        def body(carry, _):
            st, ls = carry

            def loss_fn(tr):
                feats = model.apply({"params": tr["model"]}, images, True,
                                    method=CLIPModel.encode_image)
                logits = head_logits(tr["head"], feats) * jnp.exp(
                    tr["logit_scale"])
                return mixup_criterion(cross_entropy, logits, labels_b,
                                       labels_b, 1.0, None)

            val, grads = jax.value_and_grad(loss_fn)(st.trainable)
            updates, new_opt = tx.update(grads, st.opt_state, st.trainable)
            new_tr = jax.tree_util.tree_map(lambda p, u: p + u,
                                            st.trainable, updates)
            st = st.replace_trainable(new_tr, opt_state=new_opt,
                                      step=st.step + 1)
            return (st, ls + val), None

        (st, ls), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                   length=STEPS)
        return ls

    timeit("fwdbwd", fwdbwd_epoch, state, pre_images, labels[:BATCH])

    # --- full production step ---
    run_epoch = make_scan_epoch(model, tx, "cutmix")

    def full(state, data, p, key):
        st, loss = run_epoch(state, data, p, key)
        return loss

    timeit("full", full, state, data, np.asarray(perm()),
           jax.random.PRNGKey(0))

    for name, gf in [("fwd", FWD_GFLOP_PER_IMG),
                     ("fwdbwd", TRAIN_GFLOP_PER_IMG),
                     ("full", TRAIN_GFLOP_PER_IMG)]:
        ms = results[name]
        tf = BATCH * gf / ms / 1e3  # GFLOP / ms = TFLOP/s
        print(f"{name:8s} {BATCH/ms*1e3:8.0f} img/s  "
              f"{tf:6.1f} TFLOP/s  MFU {tf/PEAK_TFLOPS*100:5.1f}%")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
