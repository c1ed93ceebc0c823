"""Inference-forward shootout on the real TPU: XLA vs packed pallas
attention (mha_packed) vs block-fused megakernel, per model config.

Decides the infer-mode auto-policy in models/functional._pick_infer_impl.

Usage: python scripts/ablate_infer_fwd.py [model_cfg] [bsz]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config

    model_cfg = sys.argv[1] if len(sys.argv) > 1 else \
        "vitb16_openclip_laion400m"
    bsz = int(sys.argv[2]) if len(sys.argv) > 2 else 128

    cfg = get_model_config(model_cfg)
    model = CLIPModel(cfg)
    params = jax.device_put(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"])
    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.standard_normal((bsz, 224, 224, 3)).astype(np.float32))

    def run(name, **kw):
        @jax.jit
        def epoch(p, images):
            def body(c, i):
                x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
                f = F.vit_encode_image(p["visual"], x, cfg.vision,
                                       model.precision, normalize=True,
                                       **kw)
                return c + f.mean(), None
            s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
            return s

        _ = float(epoch(params, images))
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            out = epoch(params, images)
        _ = float(out)
        ms = (time.perf_counter() - t0) / (reps * STEPS) * 1e3
        print(f"{model_cfg} bsz={bsz} {name:8s} {ms:8.2f} ms/step "
              f"{bsz/ms*1e3:7.0f} img/s", flush=True)

    run("xla")
    run("pallas", use_pallas=True)
    run("mega", use_mega=True)


if __name__ == "__main__":
    main()
