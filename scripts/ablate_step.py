"""A/B timing of fwd+bwd+opt variants on the real TPU.

Variants: scan (unroll=1), unroll=0 (full), each x remat on/off.
Each timed as lax.scan over STEPS steps, one dispatch, fresh state per
variant (steps donate nothing here).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
STEPS = 10
PEAK_TFLOPS = 197.0
TRAIN_GFLOP_PER_IMG = 3 * 4.4


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.head import head_logits
    from swat_tpu.train.losses import cross_entropy, mixup_criterion
    from swat_tpu.train.state import create_train_state

    cfg = get_model_config("vitb32_openclip_laion400m")
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.standard_normal((BATCH, 224, 224, 3)).astype(np.float32))
    labels = jax.device_put(rng.integers(0, 200, BATCH).astype(np.int32))

    base = CLIPModel(cfg, unroll=1)
    params = base.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))

    results = {}

    def run_variant(name, model):
        state, tx = create_train_state(
            params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
            total_iter=10_000)

        @jax.jit
        def fwdbwd_epoch(state, images, labels_b):
            def body(carry, _):
                st, ls = carry

                def loss_fn(tr):
                    feats = model.apply({"params": tr["model"]}, images,
                                        True,
                                        method=CLIPModel.encode_image)
                    logits = head_logits(tr["head"], feats) * jnp.exp(
                        tr["logit_scale"])
                    return mixup_criterion(cross_entropy, logits, labels_b,
                                           labels_b, 1.0, None)

                val, grads = jax.value_and_grad(loss_fn)(st.trainable)
                updates, new_opt = tx.update(grads, st.opt_state,
                                             st.trainable)
                new_tr = jax.tree_util.tree_map(lambda p, u: p + u,
                                                st.trainable, updates)
                st = st.replace_trainable(new_tr, opt_state=new_opt,
                                          step=st.step + 1)
                return (st, ls + val), None

            (st, ls), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                       length=STEPS)
            return ls

        t0 = time.perf_counter()
        _ = float(fwdbwd_epoch(state, images, labels))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fwdbwd_epoch(state, images, labels)
        _ = float(out)
        ms = (time.perf_counter() - t0) / (reps * STEPS) * 1e3
        tf = BATCH * TRAIN_GFLOP_PER_IMG / ms
        results[name] = ms
        print(f"{name:24s} {ms:8.2f} ms/step  {BATCH/ms*1e3:7.0f} img/s  "
              f"{tf:6.1f} TFLOP/s  MFU {tf/PEAK_TFLOPS*100:5.1f}%  "
              f"(compile {compile_s:.0f}s)", flush=True)

    from swat_tpu.models import functional as F

    def run_functional(name, model, remat=False):
        state, tx = create_train_state(
            params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
            total_iter=10_000)

        @jax.jit
        def fwdbwd_epoch(state, images, labels_b):
            def body(carry, _):
                st, ls = carry

                def loss_fn(tr):
                    feats = F.vit_encode_image(
                        tr["model"]["visual"], images, cfg.vision,
                        model.precision, normalize=True, remat=remat)
                    logits = head_logits(tr["head"], feats) * jnp.exp(
                        tr["logit_scale"])
                    return mixup_criterion(cross_entropy, logits, labels_b,
                                           labels_b, 1.0, None)

                val, grads = jax.value_and_grad(loss_fn)(st.trainable)
                updates, new_opt = tx.update(grads, st.opt_state,
                                             st.trainable)
                new_tr = jax.tree_util.tree_map(lambda p, u: p + u,
                                                st.trainable, updates)
                st = st.replace_trainable(new_tr, opt_state=new_opt,
                                          step=st.step + 1)
                return (st, ls + val), None

            (st, ls), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                       length=STEPS)
            return ls

        t0 = time.perf_counter()
        _ = float(fwdbwd_epoch(state, images, labels))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = fwdbwd_epoch(state, images, labels)
        _ = float(out)
        ms = (time.perf_counter() - t0) / (reps * STEPS) * 1e3
        tf = BATCH * TRAIN_GFLOP_PER_IMG / ms
        results[name] = ms
        print(f"{name:24s} {ms:8.2f} ms/step  {BATCH/ms*1e3:7.0f} img/s  "
              f"{tf:6.1f} TFLOP/s  MFU {tf/PEAK_TFLOPS*100:5.1f}%  "
              f"(compile {compile_s:.0f}s)", flush=True)

    run_functional("functional", CLIPModel(cfg))
    run_functional("functional+remat", CLIPModel(cfg), remat=True)
    run_variant("unroll", CLIPModel(cfg, unroll=0))
    print(json.dumps(results))


if __name__ == "__main__":
    main()
