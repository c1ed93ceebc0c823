"""End-to-end W8A8 quantized inference vs bf16 on the real TPU.

Drives the public inference path (functional.encode_image via
models/quant.quantize_tree) exactly as `--quantize int8` does on the
eval / retrieval-extract CLIs: ViT forward, scan-of-iters (one
dispatch), host transfer forcing completion.  Reports ms/step, img/s,
speedup, and the quantization quality (cosine + top-1 agreement against
the bf16 features with a random 200-class head).

Usage: python scripts/ablate_int8_e2e.py [model_cfg ...] [--bsz N]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = 10


def bench_one(model_cfg: str, bsz: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.quant import quantize_tree

    cfg = get_model_config(model_cfg)
    model = CLIPModel(cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3),
                  jnp.float32),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    qparams = jax.device_put(quantize_tree(params))
    params = jax.device_put(params)
    rng = np.random.default_rng(0)
    images = jax.device_put(rng.standard_normal(
        (bsz, cfg.vision.image_size, cfg.vision.image_size, 3)
    ).astype(np.float32))

    @jax.jit
    def epoch(p, images):
        def body(carry, i):
            x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
            feats = F.encode_image(model, p, x, normalize=True,
                                   mode="infer")
            return carry + feats[0, 0], None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(ITERS))
        return s

    def timed(fn, *args, reps=3):
        _ = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / (reps * ITERS) * 1e3

    bf16_ms = timed(epoch, params, images)
    int8_ms = timed(epoch, qparams, images)

    # quality: cosine + head-prediction agreement vs the bf16 features
    @jax.jit
    def feats_of(p, x):
        return F.encode_image(model, p, x, normalize=True, mode="infer")

    f_ref = np.asarray(feats_of(params, images), np.float64)
    f_q = np.asarray(feats_of(qparams, images), np.float64)
    cos = np.sum(f_ref * f_q, -1) / (
        np.linalg.norm(f_ref, axis=-1) * np.linalg.norm(f_q, axis=-1))
    head = rng.standard_normal((200, f_ref.shape[-1]))
    agree = float(np.mean((f_ref @ head.T).argmax(-1)
                          == (f_q @ head.T).argmax(-1)))

    print(json.dumps({
        "model_cfg": model_cfg, "bsz": bsz,
        "bf16_ms": round(bf16_ms, 2),
        "int8_ms": round(int8_ms, 2),
        "speedup": round(bf16_ms / int8_ms, 3),
        "bf16_img_per_sec": round(bsz / bf16_ms * 1e3, 1),
        "int8_img_per_sec": round(bsz / int8_ms * 1e3, 1),
        "cosine_mean": round(float(cos.mean()), 6),
        "cosine_min": round(float(cos.min()), 6),
        "top1_agreement": round(agree, 4),
    }), flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    from _common import default_bsz, parse_models_bsz

    cfgs, bsz_over = parse_models_bsz(sys.argv[1:])
    cfgs = cfgs or ["vitb32_openclip_laion400m",
                    "vitb16_openclip_laion400m"]
    for c in cfgs:
        bsz = bsz_over or default_bsz(c)
        try:
            bench_one(c, bsz)
        except Exception as e:
            print(json.dumps({"model_cfg": c, "bsz": bsz,
                              "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
