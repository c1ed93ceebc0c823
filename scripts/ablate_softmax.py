"""bf16-softmax attention + ViT-B/16 step-time datapoints (real TPU)."""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
STEPS = 10
PEAK = 197.0

def main():
    import jax, jax.numpy as jnp, numpy as np
    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.head import head_logits
    from swat_tpu.train.losses import cross_entropy, mixup_criterion
    from swat_tpu.train.state import create_train_state
    rng = np.random.default_rng(0)
    results = {}

    def run(name, model_cfg, batch, gflop_img, attn_override=None):
        cfg = get_model_config(model_cfg)
        model = CLIPModel(cfg)
        params = model.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, 224, 224, 3), jnp.float32),
                            jnp.zeros((1, 77), jnp.int32))["params"]
        head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))
        images = jax.device_put(
            rng.standard_normal((batch, 224, 224, 3)).astype(np.float32))
        labels = jax.device_put(rng.integers(0, 200, batch).astype(np.int32))
        state, tx = create_train_state(params, head, "cutmix",
                                       lr_classifier=1e-4, lr_backbone=1e-6,
                                       total_iter=10_000)
        import swat_tpu.models.functional as FM
        orig = FM.attention_heads_last
        if attn_override is not None:
            FM.attention_heads_last = attn_override
        try:
            @jax.jit
            def epoch(state, images, labels_b):
                def loss_of(tr, x):
                    feats = F.vit_encode_image(tr["model"]["visual"], x,
                                               cfg.vision, model.precision,
                                               normalize=True)
                    logits = head_logits(tr["head"], feats) * jnp.exp(
                        tr["logit_scale"])
                    return mixup_criterion(cross_entropy, logits, labels_b,
                                           labels_b, 1.0, None)
                def body(carry, i):
                    st, ls = carry
                    x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
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
            _ = float(epoch(state, images, labels))
            t0 = time.perf_counter()
            for _ in range(3):
                out = epoch(state, images, labels)
            _ = float(out)
            ms = (time.perf_counter() - t0) / (3 * STEPS) * 1e3
        finally:
            FM.attention_heads_last = orig
        tf = batch * gflop_img / ms
        results[name] = ms
        print(f"{name:16s} {ms:8.2f} ms/step {batch/ms*1e3:7.0f} img/s  "
              f"MFU {tf/PEAK*100:5.1f}%", flush=True)

    def attn_bf16_softmax(q, k, v, *, causal, accum_dtype=None,
                          matmul_precision=None):
        b, s, h, d = q.shape
        scale = 1.0 / (d ** 0.5)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.bfloat16)
        scores = scores * jnp.bfloat16(scale)
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp((scores - m).astype(jnp.bfloat16))
        p = p / jnp.sum(p, axis=-1, keepdims=True, dtype=jnp.bfloat16)
        out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(q.dtype), v,
                         preferred_element_type=jnp.float32)
        return out.astype(q.dtype)

    run("b32_softbf16", "vitb32_openclip_laion400m", 256, 13.2,
        attn_override=attn_bf16_softmax)
    run("b16_base", "vitb16_openclip_laion400m", 64, 53.0)
    print(json.dumps(results))

if __name__ == "__main__":
    main()
