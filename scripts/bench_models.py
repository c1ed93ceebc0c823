"""Train-step + inference-forward throughput per model config on the
real TPU (the reference supports vitb32/vitb16/vitl14/rn50 —
utils/extras.py:97-120; bench.py's headline covers only B/32).

Each timing is a lax.scan over STEPS iterations (one dispatch; the
~18 ms tunnel latency amortizes to <1 ms/step) with a host transfer
forcing completion.  MFU uses the standard 2*M*N*K FLOP convention.

Usage: python scripts/bench_models.py [model_cfg ...] [--bsz N]
Defaults: vitb32/vitb16/vitl14 @ laion400m, bsz 256 (128 for L/14).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STEPS = 10
PEAK_TFLOPS = 197.0
# fwd GFLOP/img at 224px in the 2*M*N*K convention (2x the MAC count);
# train = 3x fwd
FWD_GFLOP = {"vitb32": 8.85, "vitb16": 35.1, "vitl14": 161.4,
             "rn50": 12.2}  # CLIP ModifiedResNet ~6.1 GMAC/img


def bench_one(model_cfg: str, bsz: int, remat: bool = False,
              attn: str = "auto", accum: int = 1):
    """attn: 'auto' (the production _pick_pallas policy), 'pallas'
    (force the fused packed-attention kernel), 'xla' (force XLA
    autodiff attention) — the r4 L/14 MFU sweep co-optimizes this with
    the remat policy (scripts/ablate_l14_mfu.py).  accum>1 measures the
    gradient-accumulation step (train.steps._accum_value_and_grad): the
    zero-recompute alternative to remat for L/14 single-chip."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from swat_tpu.models import functional as F
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.head import head_logits
    from swat_tpu.train.losses import cross_entropy
    from swat_tpu.train.state import create_train_state
    from swat_tpu.train.steps import _accum_value_and_grad

    cfg = get_model_config(model_cfg)
    # L/14 fwd+bwd at bsz 64 needs 16.5G HBM vs the chip's 15.75G —
    # gradient remat is REQUIRED for single-chip L/14 training
    model = CLIPModel(cfg, remat=remat, use_pallas=(attn == "pallas"))
    saved_min_seq = F._PALLAS_TRAIN_MIN_SEQ
    if attn == "xla":
        F._PALLAS_TRAIN_MIN_SEQ = 1 << 30   # auto-enable never fires
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

    def micro_loss(tr, mb):
        feats = F.encode_image(model, tr["model"], mb["images"],
                               normalize=True)
        logits = head_logits(tr["head"], feats) * jnp.exp(tr["logit_scale"])
        return cross_entropy(logits, mb["labels"], None)

    @jax.jit
    def train_epoch(state, images):
        def body(carry, i):
            st, ls = carry
            x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
            if accum > 1:
                val, grads = _accum_value_and_grad(
                    st.trainable, micro_loss,
                    {"images": x, "labels": labels}, accum)
            else:
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

    @jax.jit
    def infer_epoch(params, images):
        def body(carry, i):
            x = images * (1.0 + 1e-7 * i.astype(jnp.float32))
            feats = F.encode_image(model, params, x, normalize=True,
                                   mode="infer")
            return carry + feats[0, 0], None

        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(STEPS))
        return s

    def timed(fn, *args, reps=2):
        _ = float(fn(*args))
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        _ = float(out)
        return (time.perf_counter() - t0) / (reps * STEPS) * 1e3

    try:
        train_ms = timed(train_epoch, state, images)
        infer_ms = timed(infer_epoch, state.model, images)
    finally:
        F._PALLAS_TRAIN_MIN_SEQ = saved_min_seq
    key = model_cfg.split("_")[0]
    gflop = FWD_GFLOP.get(key)
    out = {
        "model_cfg": model_cfg, "bsz": bsz, "remat": remat, "attn": attn,
        "accum": accum,
        "train_ms_per_step": round(train_ms, 2),
        "train_img_per_sec": round(bsz / train_ms * 1e3, 1),
        "infer_fwd_ms": round(infer_ms, 2),
        "infer_img_per_sec": round(bsz / infer_ms * 1e3, 1),
    }
    if gflop:
        out["train_mfu"] = round(
            (bsz / train_ms * 1e3) * 3 * gflop / 1e3 / PEAK_TFLOPS, 3)
        out["infer_mfu"] = round(
            (bsz / infer_ms * 1e3) * gflop / 1e3 / PEAK_TFLOPS, 3)
    print(json.dumps(out), flush=True)


def main():
    import argparse

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
    from _common import default_bsz

    # --remat/--attn exist so ablate_l14_mfu.py can run each grid point
    # in its OWN process: a failed L/14 compile (the HTTP-500 HBM-OOM
    # presentation) leaks device memory in the axon compile helper and
    # every later allocation in the same process RESOURCE_EXHAUSTs
    ap = argparse.ArgumentParser()
    ap.add_argument("model_cfgs", nargs="*")
    ap.add_argument("--bsz", type=int, default=None)
    ap.add_argument("--remat", default=None,
                    help="False/dots/dots_all/full; default: L/14 only")
    ap.add_argument("--attn", default="auto",
                    choices=["auto", "pallas", "xla"])
    ap.add_argument("--accum", type=int, default=1)
    args = ap.parse_args()

    cfgs = args.model_cfgs or ["vitb32_openclip_laion400m",
                               "vitb16_openclip_laion400m",
                               "vitl14_openclip_laion400m"]
    for c in cfgs:
        # HBM on one v5e chip: B/16 train OOMs at 256, L/14 at 128
        bsz = args.bsz or default_bsz(c)
        accum = args.accum
        if args.remat is None:
            # L/14 default = the measured fastest feasible single-chip
            # policy: accum=2 (microbatch 32), no remat (176.8 img/s vs
            # full remat's 159.2 — see auto_memory_policy)
            remat = False
            if "vitl14" in c and accum == 1:
                accum = 2
        else:
            remat = False if args.remat == "False" else args.remat
        try:
            bench_one(c, bsz, remat=remat, attn=args.attn, accum=accum)
        except Exception as e:  # keep later configs running
            print(json.dumps({"model_cfg": c, "bsz": bsz,
                              "remat": str(remat), "attn": args.attn,
                              "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
