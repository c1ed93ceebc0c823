"""Does the fused packed-attention backward win at LONGER sequences?

The training-attention policy (functional._pick_pallas) is based on
S=50 measurements (ViT-B/32), where every fused backward lost to XLA
autodiff.  B/16 runs S=197 and L/14 S=257 — attention is O(S^2) and the
per-head relayout overhead that killed the fused bwd at S=50 amortizes
with S.  This measures the full train step (fwd+bwd+opt, scan-of-steps)
with use_pallas on/off per model.

Usage: python scripts/ablate_train_attn.py [model_cfg ...] [--bsz N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10


def bench_one(model_cfg: str, bsz: int, use_pallas: bool,
              remat=False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.head import head_logits
    from swat_tpu.train.losses import cross_entropy
    from swat_tpu.train.state import create_train_state

    cfg = get_model_config(model_cfg)
    model = CLIPModel(cfg, remat=remat, use_pallas=use_pallas)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                  jnp.float32),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.standard_normal(
        (bsz, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32))
    labels = jax.device_put(rng.integers(0, 200, bsz).astype(np.int32))

    state, tx = create_train_state(params, head, "finetune",
                                   lr_classifier=1e-4, lr_backbone=1e-6,
                                   total_iter=10_000)

    def loss_of(tr, x):
        feats = F.encode_image(model, tr["model"], x, normalize=True)
        logits = head_logits(tr["head"], feats) * jnp.exp(tr["logit_scale"])
        return cross_entropy(logits, labels, None)

    @jax.jit
    def train_epoch(state, images):
        def body(carry, i):
            st, ls = carry
            x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
            val, grads = jax.value_and_grad(loss_of)(st.trainable, x)
            upd, new_opt = tx.update(grads, st.opt_state, st.trainable)
            new_tr = jax.tree_util.tree_map(lambda p, u: p + u,
                                            st.trainable, upd)
            st = st.replace_trainable(new_tr, opt_state=new_opt,
                                      step=st.step + 1)
            return (st, ls + val), None

        (st, ls), _ = jax.lax.scan(body, (state, jnp.float32(0)),
                                   jnp.arange(STEPS))
        return ls

    def timed(fn, *args, reps=2):
        _ = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / (reps * STEPS) * 1e3

    train_ms = timed(train_epoch, state, images)
    print(json.dumps({
        "model_cfg": model_cfg, "bsz": bsz, "use_pallas": use_pallas,
        "remat": bool(remat),
        "train_ms_per_step": round(train_ms, 2),
        "train_img_per_sec": round(bsz / train_ms * 1e3, 1),
    }), flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    from _common import default_bsz, parse_models_bsz

    cfgs, bsz_over = parse_models_bsz(sys.argv[1:])
    cfgs = cfgs or ["vitb16_openclip_laion400m",
                    "vitl14_openclip_laion400m"]
    for c in cfgs:
        bsz = bsz_over or default_bsz(c)
        for use_pallas in (False, True):
            try:
                bench_one(c, bsz, use_pallas, remat="vitl14" in c)
            except Exception as e:
                print(json.dumps({"model_cfg": c, "bsz": bsz,
                                  "use_pallas": use_pallas,
                                  "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
