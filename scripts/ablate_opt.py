"""Ablate the optimizer update's cost in isolation (ROADMAP #2's last
unmeasured lever, "optimizer fusion").

Three scan-over-steps programs on the real ViT-B/32 cutmix param tree
(visual tower + head + logit_scale trainable, text tower frozen):
  1. production: optax.multi_transform(adamw per group) via tx.update
  2. hand-fused AdamW: one tree_map computing m/v/p updates inline with a
     per-leaf lr scalar (what "fusing the optimizer" could ever buy)
  3. memory floor: read+write p/m/v/g once (p += eps*(g+m+v)) — the HBM
     traffic lower bound any AdamW must pay

If (1) ~= (2) ~= (3), the optimizer is memory-bound and already fused by
XLA; there is no headroom.  Run: python scripts/ablate_opt.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 20


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.train.optim import make_lr_schedule
    from swat_tpu.train.state import create_train_state, make_labels

    cfg = get_model_config("vitb32_openclip_laion400m")
    model = CLIPModel(cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 224, 224, 3), jnp.float32),
                        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))
    state, tx = create_train_state(params, head, "cutmix",
                                   lr_classifier=1e-4, lr_backbone=1e-6,
                                   total_iter=10_000)
    labels = make_labels(params, "cutmix", head)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e-4), state.trainable)
    n_train = sum(int(np.prod(l.shape)) for l, lab in zip(
        jax.tree_util.tree_leaves(state.trainable),
        jax.tree_util.tree_leaves(labels)) if lab != "frozen")
    print(f"trainable params: {n_train/1e6:.1f}M")

    def timed(fn, *args, reps=3):
        out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(jax.tree_util.tree_leaves(out)[0].reshape(-1)[0])
        return (time.perf_counter() - t0) / (reps * STEPS) * 1e3

    # 1. production optax path
    @jax.jit
    def optax_epoch(state, grads):
        def body(st, _):
            updates, new_opt = tx.update(grads, st.opt_state, st.trainable)
            new_tr = jax.tree_util.tree_map(lambda p, u: p + u,
                                            st.trainable, updates)
            return st.replace_trainable(new_tr, opt_state=new_opt,
                                        step=st.step + 1), None

        st, _ = jax.lax.scan(body, state, None, length=STEPS)
        return st.model["visual"]["proj"]

    print(f"optax multi_transform AdamW: "
          f"{timed(optax_epoch, state, grads):.2f} ms/step")

    # 2. hand-fused AdamW (same math, one pass, per-leaf lr)
    sched_head = make_lr_schedule(1e-4, 10_000, warmup_lr=1e-6)
    sched_bb = make_lr_schedule(1e-6, 10_000, warmup_lr=1e-6)
    lr_tag = jax.tree_util.tree_map(
        lambda lab: {"head": 1, "backbone": 2, "projector": 2,
                     "frozen": 0}[lab], labels)
    m0 = jax.tree_util.tree_map(jnp.zeros_like, state.trainable)
    v0 = jax.tree_util.tree_map(jnp.zeros_like, state.trainable)
    b1, b2, eps, wd = 0.9, 0.999, 1e-8, 1e-2

    @jax.jit
    def fused_epoch(tr, m, v, grads):
        def body(carry, i):
            tr, m, v = carry
            t = (i + 1).astype(jnp.float32)
            lr_h = sched_head(i)
            lr_b = sched_bb(i)

            def upd(p, g, m_, v_, tag):
                if tag == 0:
                    return p, m_, v_
                lr = lr_h if tag == 1 else lr_b
                m2 = b1 * m_ + (1 - b1) * g
                v2 = b2 * v_ + (1 - b2) * g * g
                mhat = m2 / (1 - b1 ** t)
                vhat = v2 / (1 - b2 ** t)
                p2 = p - lr * (mhat / (jnp.sqrt(vhat) + eps) + wd * p)
                return p2, m2, v2

            out = jax.tree_util.tree_map(upd, tr, grads, m, v, lr_tag)
            tr2 = jax.tree_util.tree_map(lambda o: o[0], out,
                                         is_leaf=lambda x: isinstance(x, tuple))
            m2 = jax.tree_util.tree_map(lambda o: o[1], out,
                                        is_leaf=lambda x: isinstance(x, tuple))
            v2 = jax.tree_util.tree_map(lambda o: o[2], out,
                                        is_leaf=lambda x: isinstance(x, tuple))
            return (tr2, m2, v2), None

        (tr, m, v), _ = jax.lax.scan(body, (tr, m, v),
                                     jnp.arange(STEPS))
        return tr["model"]["visual"]["proj"]

    print(f"hand-fused AdamW:            "
          f"{timed(fused_epoch, state.trainable, m0, v0, grads):.2f} ms/step")

    # 3. memory floor: touch p/m/v/g once
    @jax.jit
    def floor_epoch(tr, m, v, grads):
        def body(carry, _):
            tr, m, v = carry
            tr2 = jax.tree_util.tree_map(
                lambda p, g, m_, v_: p + 1e-12 * (g + m_ + v_),
                tr, grads, m, v)
            m2 = jax.tree_util.tree_map(lambda x: x * 0.999, m)
            v2 = jax.tree_util.tree_map(lambda x: x * 0.999, v)
            return (tr2, m2, v2), None

        (tr, m, v), _ = jax.lax.scan(body, (tr, m, v), None, length=STEPS)
        return tr["model"]["visual"]["proj"]

    print(f"memory floor (p/m/v/g rw):   "
          f"{timed(floor_epoch, state.trainable, m0, v0, grads):.2f} ms/step")


if __name__ == "__main__":
    main()
