"""Capture a jax.profiler trace of the fwd+bwd+opt step and print top ops.

Writes the trace to /tmp/swat_trace and parses the generated
*.trace.json.gz (Chrome trace format) to rank device ops by total time.
"""

import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = 256
STEPS = 5
TRACE_DIR = "/tmp/swat_trace"


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
    model = CLIPModel(cfg, unroll=0)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"]
    head = jax.random.normal(jax.random.PRNGKey(1), (200, cfg.embed_dim))
    state, tx = create_train_state(
        params, head, "cutmix", lr_classifier=1e-4, lr_backbone=1e-6,
        total_iter=10_000)

    rng = np.random.default_rng(0)
    images = jax.device_put(
        rng.standard_normal((BATCH, 224, 224, 3)).astype(np.float32))
    labels = jax.device_put(rng.integers(0, 200, BATCH).astype(np.int32))

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

    # compile + warmup outside the trace
    _ = float(fwdbwd_epoch(state, images, labels))

    with jax.profiler.trace(TRACE_DIR):
        _ = float(fwdbwd_epoch(state, images, labels))

    files = glob.glob(os.path.join(TRACE_DIR, "**", "*.trace.json.gz"),
                      recursive=True)
    print("trace files:", files)
    if not files:
        print("NO TRACE CAPTURED")
        return
    latest = max(files, key=os.path.getmtime)
    with gzip.open(latest, "rt") as f:
        trace = json.load(f)
    by_name = defaultdict(float)
    count = defaultdict(int)
    pid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
    tpu_pids = {p for p, n in pid_names.items()
                if "TPU" in n or "tpu" in n or "/device" in n.lower()}
    print("processes:", sorted(set(pid_names.values()))[:20])
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        if tpu_pids and ev.get("pid") not in tpu_pids:
            continue
        name = ev.get("name", "?")
        by_name[name] += ev.get("dur", 0)
        count[name] += 1
    total = sum(by_name.values())
    print(f"total device-op time: {total/1e3:.2f} ms "
          f"(over {STEPS} steps -> {total/1e3/STEPS:.2f} ms/step)")
    for name, dur in sorted(by_name.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3:9.2f} ms  x{count[name]:<5d} {name[:110]}")


if __name__ == "__main__":
    main()
