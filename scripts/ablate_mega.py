"""Megakernel ablation on the real TPU: fused-layer blocks vs XLA.

Measures fwd-only and full train-step (value_and_grad + AdamW) times for
the functional XLA path vs the block-fused megakernel path
(kernels/megablock.py) at the production shape (ViT-B/32, bsz 256).

Usage: python scripts/ablate_mega.py [bsz] [--variants xla,mega]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10
PEAK = 197.0
GF_FWD_BY_MODEL = {  # 2*M*N*K convention (see bench.py)
    "vitb32_openclip_laion400m": 8.85,
    "vitb16_openclip_laion400m": 35.2,
}


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

    bsz = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    variants = ["xla", "mega"]
    model_cfg = "vitb32_openclip_laion400m"
    for a in sys.argv[2:]:
        if a.startswith("--variants"):
            variants = a.split("=", 1)[1].split(",")
        if a.startswith("--model"):
            model_cfg = a.split("=", 1)[1]

    gf_fwd = GF_FWD_BY_MODEL.get(model_cfg, 8.85)
    gf_train = 3 * gf_fwd
    cfg = get_model_config(model_cfg)
    model = CLIPModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))
    rng = np.random.default_rng(0)

    results = {}

    def report(name, ms, gf):
        tf = bsz * gf / ms
        results[name] = round(ms, 2)
        print(f"{name:12s} {ms:8.2f} ms/step  {bsz/ms*1e3:7.0f} img/s  "
              f"{tf:6.1f} TFLOP/s  MFU {tf/PEAK*100:5.1f}%", flush=True)

    images = jax.device_put(
        rng.standard_normal((bsz, 224, 224, 3)).astype(np.float32))
    labels = jax.device_put(rng.integers(0, 200, bsz).astype(np.int32))
    state0, tx = create_train_state(
        params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
        total_iter=10_000)

    def run(name, mega, mode, gf):
        def loss_of(tr, x):
            feats = F.vit_encode_image(
                tr["model"]["visual"], x, cfg.vision, model.precision,
                normalize=True, use_mega=mega)
            logits = head_logits(tr["head"], feats) * jnp.exp(
                tr["logit_scale"])
            return mixup_criterion(cross_entropy, logits, labels,
                                   labels, 1.0, None)

        @jax.jit
        def epoch(state, images):
            def body(carry, i):
                st, ls = carry
                x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
                if mode == "fwd":
                    return (st, ls + loss_of(st.trainable, x)), None
                val, grads = jax.value_and_grad(loss_of)(st.trainable, x)
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

        t0 = time.perf_counter()
        _ = float(epoch(state0, images))
        print(f"  [{name} compile+warm {time.perf_counter()-t0:.1f}s]",
              flush=True)
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = epoch(state0, images)
        _ = float(out)
        ms = (time.perf_counter() - t0) / (reps * STEPS) * 1e3
        report(name, ms, gf)

    for v in variants:
        mega = v == "mega"
        run(f"{v}_fwd", mega, "fwd", gf_fwd)
        run(f"{v}_full", mega, "full", gf_train)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
