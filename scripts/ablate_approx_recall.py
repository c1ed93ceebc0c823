"""approx_max_k recall at the auto-engage regime (VERDICT r3 item 10).

`rank_candidates(approx="auto")` switches to the approx_max_k 2x
shortlist + exact re-rank once N > 4M, but recall was only ever measured
at 200k x 50 (0.999) — two orders of magnitude below the engage point.
This measures top-500 recall (approx vs exact, same pool) at N in the
auto regime on the real device, using the streaming chunked path both
ways so HBM stays bounded.

Recall definition: |approx_top500 ∩ exact_top500| / 500 averaged over
classes.  (The approx path re-ranks its shortlist exactly, so ORDER is
exact; only shortlist misses cost recall.)

Run: python scripts/ablate_approx_recall.py [--n 6000000] [--classes 100]
"""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

from swat_tpu.retrieval.rank import APPROX_AUTO_N, rank_candidates


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6_000_000)
    ap.add_argument("--classes", type=int, default=100)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--top_k", type=int, default=500)
    ap.add_argument("--chunk", type=int, default=262_144)
    args = ap.parse_args()
    assert args.n > APPROX_AUTO_N, "below the auto-engage regime"

    rng = np.random.default_rng(0)
    prompts = rng.standard_normal((args.classes, args.d)).astype(np.float32)
    prompts /= np.linalg.norm(prompts, axis=-1, keepdims=True)
    # host-resident pool streamed in chunks (the corpus-scale mode);
    # mildly clustered so top-k isn't a degenerate uniform tie-break
    cands = (rng.standard_normal((args.n, args.d)).astype(np.float32)
             + 0.1 * prompts[rng.integers(0, args.classes, args.n)])
    cands /= np.linalg.norm(cands, axis=-1, keepdims=True)
    cls = rng.integers(0, args.classes, args.n).astype(np.int32)

    import time

    res = {}
    for label, approx in [("exact", False), ("approx", True)]:
        t0 = time.perf_counter()
        idx, sim = rank_candidates(prompts, cands, cls, top_k=args.top_k,
                                   approx=approx, chunk=args.chunk)
        res[label] = (idx, time.perf_counter() - t0)
        print(json.dumps({label + "_s": round(res[label][1], 1)}),
              flush=True)

    e_idx, a_idx = res["exact"][0], res["approx"][0]
    recalls = []
    for c in range(args.classes):
        e = set(int(i) for i in e_idx[c] if i >= 0)
        a = set(int(i) for i in a_idx[c] if i >= 0)
        if e:
            recalls.append(len(e & a) / len(e))
    print(json.dumps({
        "metric": "approx_max_k_recall_at_scale",
        "n": args.n, "classes": args.classes, "top_k": args.top_k,
        "recall_mean": round(float(np.mean(recalls)), 5),
        "recall_min": round(float(np.min(recalls)), 5),
        "exact_s": round(res["exact"][1], 1),
        "approx_s": round(res["approx"][1], 1),
    }))


if __name__ == "__main__":
    main()
