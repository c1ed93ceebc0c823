"""Fine-grained ablations on the functional train step (real TPU).

Variants:
  fwd        forward+loss only (loop-index-dependent input, no hoisting)
  grads      value_and_grad, no optimizer
  full       grads + AdamW update (the production step)
  ln_bf16    full, LayerNorm computed in bf16 (no fp32 round trips)
  no_attn    full, attention replaced with identity (=v) — attention cost
  bsz512     full at batch 512
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10
PEAK = 197.0
GF_FWD = 4.4
GF_TRAIN = 3 * GF_FWD


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.head import head_logits
    from swat_tpu.train.losses import cross_entropy, mixup_criterion
    from swat_tpu.train.state import create_train_state

    cfg = get_model_config("vitb32_openclip_laion400m")
    model = CLIPModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))
    rng = np.random.default_rng(0)

    results = {}

    def report(name, ms, batch, gf):
        tf = batch * gf / ms
        results[name] = ms
        print(f"{name:10s} {ms:8.2f} ms/step  {batch/ms*1e3:7.0f} img/s  "
              f"{tf:6.1f} TFLOP/s  MFU {tf/PEAK*100:5.1f}%", flush=True)

    USE_PALLAS = [False]

    def encode(p_visual, images, precision):
        return F.vit_encode_image(p_visual, images, cfg.vision, precision,
                                  normalize=True,
                                  use_pallas=USE_PALLAS[0])

    def run(name, batch=256, mode="full", gf=GF_TRAIN):
        images = jax.device_put(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
        labels = jax.device_put(rng.integers(0, 200, batch).astype(np.int32))
        state, tx = create_train_state(
            params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
            total_iter=10_000)

        @jax.jit
        def epoch(state, images, labels_b):
            def loss_of(tr, x):
                feats = encode(tr["model"]["visual"], x, model.precision)
                logits = head_logits(tr["head"], feats) * jnp.exp(
                    tr["logit_scale"])
                return mixup_criterion(cross_entropy, logits, labels_b,
                                       labels_b, 1.0, None)

            def body(carry, i):
                st, ls = carry
                x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
                if mode == "fwd":
                    ls = ls + loss_of(st.trainable, x)
                    return (st, ls), None
                val, grads = jax.value_and_grad(loss_of)(st.trainable, x)
                if mode == "grads":
                    gsum = sum(jnp.sum(jnp.square(g).astype(jnp.float32))
                               for g in jax.tree_util.tree_leaves(
                                   grads["model"]["visual"]))
                    return (st, ls + val + 0.0 * gsum), None
                updates, new_opt = tx.update(grads, st.opt_state,
                                             st.trainable)
                new_tr = jax.tree_util.tree_map(lambda p, u: p + u,
                                                st.trainable, updates)
                st = st.replace_trainable(new_tr, opt_state=new_opt,
                                          step=st.step + 1)
                return (st, ls + val), None

            (st, ls), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                       jnp.arange(STEPS))
            return ls

        _ = float(epoch(state, images, labels))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = epoch(state, images, labels)
        _ = float(out)
        ms = (time.perf_counter() - t0) / (reps * STEPS) * 1e3
        report(name, ms, batch, gf)


    # --- bf16 LayerNorm ---
    orig_ln = F._layer_norm

    def ln_bf16(p, x, precision, eps=1e-5):
        c = precision.compute_dtype
        x = x.astype(c)
        mu = x.mean(axis=-1, keepdims=True)
        mu2 = (x * x).mean(axis=-1, keepdims=True)
        var = jnp.maximum(0.0, mu2 - mu * mu)
        mul = jax.lax.rsqrt(var + eps) * p["scale"].astype(c)
        return (x - mu) * mul + p["bias"].astype(c)



    USE_PALLAS[0] = True
    run("pallas", mode="full")
    USE_PALLAS[0] = False
    print(json.dumps(results))


if __name__ == "__main__":
    main()
