"""Retrieval-path benchmark (informational; bench.py stays the headline).

Measures the three retrieval stages on synthetic data:
  1. C++ caption-index build + AND-query throughput (vs the python engine)
  2. CLIP text-embedding throughput (captions/sec) on the TPU
  3. ranked top-k sampling QPS over the full candidate pool

Prints one JSON line per stage.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_CAPTIONS = 200_000
N_QUERIES = 200


def bench_index():
    import numpy as np

    rng = np.random.default_rng(0)
    vocab = [f"word{i}" for i in range(5000)]
    captions = [" ".join(rng.choice(vocab, size=rng.integers(4, 16)))
                for _ in range(N_CAPTIONS)]
    queries = [" ".join(rng.choice(vocab, size=2)) for _ in range(N_QUERIES)]

    from swat_tpu.retrieval.indexer import build_library, NativeCaptionIndex

    results = {}
    if build_library():
        t0 = time.perf_counter()
        idx = NativeCaptionIndex(captions)
        build_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        hits = sum(len(idx.query(q)) for q in queries)
        query_s = time.perf_counter() - t0
        results = {
            "metric": "caption_index_cpp",
            "build_captions_per_sec": round(N_CAPTIONS / build_s),
            "query_per_sec": round(N_QUERIES / query_s),
            "hits": hits,
        }
        print(json.dumps(results))

    from swat_tpu.retrieval.stringmatch import CaptionIndex

    t0 = time.perf_counter()
    pidx = CaptionIndex(captions[: N_CAPTIONS // 10])  # python is slow
    build_s = (time.perf_counter() - t0) * 10
    t0 = time.perf_counter()
    _ = sum(len(pidx.query(q)) for q in queries)
    query_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": "caption_index_python",
        "build_captions_per_sec": round(N_CAPTIONS / build_s),
        "query_per_sec": round(N_QUERIES / query_s),
    }))


def bench_embed_and_topk():
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.retrieval.rank import rank_candidates

    cfg = get_model_config("vitb32_openclip_laion400m")
    model = CLIPModel(cfg)
    params = jax.device_put(model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 224, 224, 3), jnp.float32),
        jnp.zeros((1, 77), jnp.int32))["params"])

    B, K = 1024, 8
    rng = np.random.default_rng(0)
    tokens = jax.device_put(
        rng.integers(1, 49000, (B, 77)).astype(np.int32))

    from swat_tpu.models import functional as F

    @jax.jit
    def encode(params, tokens):
        def body(c, i):
            t = jnp.where(tokens == 0, i.astype(jnp.int32), tokens)
            f = F.encode_text(model, params, t, normalize=True,
                              mode="infer")
            return c + f.mean(), None
        s, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(K))
        return s

    _ = float(encode(params, tokens))
    t0 = time.perf_counter()
    _ = float(encode(params, tokens))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "caption_embed_qps",
        "value": round(B * K / dt, 1),
        "unit": "captions/sec/chip",
    }))

    # top-k ranking over a 1M x 512 candidate pool, 200 classes;
    # data transferred once, compiled fn cached, steady-state timed
    import jax

    C, N, D = 200, 1_000_000, 512
    prompts = jax.device_put(rng.normal(size=(C, D)).astype(np.float32))
    cands = jax.device_put(rng.normal(size=(N, D)).astype(np.float32))
    cls = jax.device_put(rng.integers(0, C, N).astype(np.int32))
    for approx in (False, True):
        t0 = time.perf_counter()
        top_idx, _ = rank_candidates(prompts, cands, cls, top_k=500,
                                     approx=approx)
        dt_first = time.perf_counter() - t0
        t0 = time.perf_counter()
        reps = 3
        for _ in range(reps):
            top_idx, _ = rank_candidates(prompts, cands, cls, top_k=500,
                                         approx=approx)
        dt = (time.perf_counter() - t0) / reps
        print(json.dumps({
            "metric": f"rank_topk_candidates_per_sec"
                      f"{'_approx' if approx else ''}",
            "value": round(N / dt),
            "unit": "candidates/sec (200 classes x 1M pool, top-500)",
            "first_call_s": round(dt_first, 1),
        }))

    # corpus-scale streaming mode: pool stays HOST-resident and streams
    # through the running top-k merge in chunks (the path for pools that
    # exceed HBM); per-chunk upload cost is part of the measurement
    host_cands = np.asarray(cands)
    host_cls = np.asarray(cls)
    chunk = 131_072
    _ = rank_candidates(prompts, host_cands[:chunk], host_cls[:chunk],
                        top_k=500, chunk=chunk)  # compile
    t0 = time.perf_counter()
    top_idx, _ = rank_candidates(prompts, host_cands, host_cls,
                                 top_k=500, chunk=chunk)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "rank_topk_candidates_per_sec_streamed",
        "value": round(N / dt),
        "unit": "candidates/sec (host-resident pool, 128k chunks, "
                "incl. H2D upload)",
    }))


def bench_sample_stage(n: int = 500_000, classes: int = 200,
                       d: int = 512):
    """END-TO-END fused sample stage QPS: the exact production path
    (sampler.sample_retrieved_fused — rowwise scores + masked matmul +
    device top-k + host assembly), not just the ranking kernel."""
    import numpy as np

    from swat_tpu.retrieval.sampler import MinedPool, sample_retrieved_fused

    rng = np.random.default_rng(0)
    labels = rng.integers(0, classes, n).astype(np.int32)
    img = rng.standard_normal((n, d)).astype(np.float32) * 0.02
    cap = rng.standard_normal((n, d)).astype(np.float32) * 0.02
    paths = [f"/pool/{i:07d}.jpg" for i in range(n)]
    pool = MinedPool(paths, labels, img, cap)
    prompts = {str(c): {"mean": rng.standard_normal(d).astype(np.float32)}
               for c in range(classes)}

    kw = dict(strategy="T2T-rank-T2I-tshd", num_samples=500,
              t2i_threshold=-1.0)
    _ = sample_retrieved_fused(pool, prompts, **kw)      # compile
    t0 = time.perf_counter()
    res = sample_retrieved_fused(pool, prompts, **kw)
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "sample_stage_candidates_per_sec_fused",
        "value": round(n / dt),
        "unit": f"candidates/sec ({classes} classes x {n} pool, "
                "T2T-rank-T2I-tshd top-500, end-to-end)",
        "sampled": len(res["file_list"]),
    }))


def bench_fts5_race(total: int = 50_000_000, shards: int = 40,
                    work_dir: str = "/tmp/swat_fts5_race",
                    n_zipf_queries: int = 60, keep: bool = False):
    """Head-to-head vs the engine the C++ index replaces: stdlib sqlite3
    FTS5 with the reference's exact schema and MATCH statements
    (laion_parser.py:67-79,157-167) on the SAME corpus (VERDICT r3
    item 4).

    The corpus is realistic where the r3 scale bench was worst-case
    uniform: a Zipfian 100k background vocab, PLUS every class-synonym
    phrase from the reference's shipped metrics JSONs injected at its
    actual LAION-400M frequency scaled to `total`, PLUS each query
    token seeded into the background at ~25x its phrase frequency so
    intersections run over realistically-longer posting lists.  Queries
    are (a) the real synonym phrases and (b) Zipf-banded synthetic
    2-token pairs (common/mid/rare).  Both engines get phrase
    semantics — FTS5's '+' operator IS the phrase operator (r4 fix).
    """
    import glob
    import resource
    import shutil
    import sqlite3

    import numpy as np

    from swat_tpu.retrieval.indexer import NativeCaptionIndex, build_library
    from swat_tpu.retrieval.ingest import ShardedCaptionIndex
    from swat_tpu.retrieval.stringmatch import clean_text

    if not build_library():
        print(json.dumps({"metric": "fts5_race",
                          "error": "native index unavailable"}))
        return
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    rng = np.random.default_rng(0)
    scale = total / 400e6

    # -- real class-synonym phrases + scaled frequencies
    metrics_files = sorted(glob.glob(
        "/root/reference/data/*/*_metrics-LAION400M.json"))
    phrase_freq = {}
    for mf in metrics_files:
        with open(mf) as f:
            for m in json.load(f).values():
                for name, cnt in m.get("alternates", {}).items():
                    toks = clean_text(name).split()
                    if not toks or not isinstance(cnt, (int, float)):
                        continue
                    key = " ".join(toks)
                    phrase_freq[key] = max(phrase_freq.get(key, 0),
                                           int(cnt))
    CAP = 200_000
    capped = sum(1 for c in phrase_freq.values()
                 if round(c * scale) > CAP)
    inj_phrases = [(p, min(CAP, max(1, round(c * scale))))
                   for p, c in phrase_freq.items()
                   if round(c * scale) >= 1]
    # background seeding: each query token at ~5x its phrase freq, so
    # intersections run over longer posting lists than the final hits
    tok_freq = {}
    for p, n in inj_phrases:
        for t in p.split():
            tok_freq[t] = tok_freq.get(t, 0) + n
    inj_tokens = [(t, min(CAP, 5 * n)) for t, n in tok_freq.items()]
    # the raw real-world counts can exceed the synthetic corpus (the
    # shipped metrics span 9 datasets whose synonyms collectively cover
    # ~quarter of LAION captions); bound injection to total/3 with ONE
    # global factor so relative frequencies stay realistic — logged,
    # not silent
    n_inject = sum(n for _, n in inj_phrases) + sum(
        n for _, n in inj_tokens)
    factor = min(1.0, (total // 3) / max(n_inject, 1))
    if factor < 1.0:
        inj_phrases = [(p, max(1, int(n * factor)))
                       for p, n in inj_phrases]
        inj_tokens = [(t, max(1, int(n * factor))) for t, n in inj_tokens]
    print(json.dumps({
        "metric": "fts5_race_corpus",
        "captions": total, "shards": shards,
        "synonym_phrases": len(inj_phrases),
        "injected_phrase_captions": sum(n for _, n in inj_phrases),
        "injected_token_captions": sum(n for _, n in inj_tokens),
        "phrases_capped_at_200k": capped,
        "global_injection_factor": round(factor, 4),
    }), flush=True)

    # -- Zipfian background vocab
    V = 100_000
    vocab = np.asarray([f"word{i}" for i in range(V)])
    w = 1.0 / np.arange(2, V + 2) ** 1.05
    cum = np.cumsum(w / w.sum())

    def zipf_words(k):
        return vocab[np.searchsorted(cum, rng.random(k))]

    # round-robin the injected captions across shards
    inj_all = []
    for p, n in inj_phrases + inj_tokens:
        inj_all += [p] * n
    rng.shuffle(inj_all)

    per = total // shards
    db_path = os.path.join(work_dir, "fts5.db")
    conn = sqlite3.connect(db_path)
    cur = conn.cursor()

    def rss_gb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    counts, offsets = [], [0]
    gen_s = build_cpp_s = build_fts_s = 0.0
    disk_cpp = 0
    for s in range(shards):
        t0 = time.perf_counter()
        inj = inj_all[s::shards]
        n_bg = per - len(inj)
        lens = rng.integers(4, 14, n_bg)
        words = zipf_words(int(lens.sum()))
        caps, pos = [], 0
        for L in lens:
            caps.append(" ".join(words[pos: pos + L]))
            pos += L
        # splice injected phrases into background captions (phrase kept
        # adjacent; filler words around it)
        fill = zipf_words(2 * len(inj)).reshape(-1, 2) if inj else []
        caps += [f"{a} {p} {b}" for p, (a, b) in zip(inj, fill)]
        order = rng.permutation(len(caps))
        caps = [caps[i] for i in order]
        cap_file = os.path.join(work_dir, f"captions_{s:05d}.txt")
        with open(cap_file, "w") as f:
            f.write("\n".join(caps) + "\n")
        gen_s += time.perf_counter() - t0
        del words

        t0 = time.perf_counter()
        idx = NativeCaptionIndex(path=cap_file)
        idx.save(os.path.join(work_dir, f"index_{s:05d}.bin"))
        build_cpp_s += time.perf_counter() - t0
        disk_cpp += os.path.getsize(
            os.path.join(work_dir, f"index_{s:05d}.bin"))
        del idx

        # reference schema: one FTS5 virtual table per shard in one db
        # (laion_parser.py:67-79); ingest normalization is a no-op on
        # this already-clean corpus
        t0 = time.perf_counter()
        cur.execute(f"CREATE VIRTUAL TABLE _fts{s} USING FTS5(TEXT)")
        cur.executemany(f"INSERT INTO _fts{s} (TEXT) values(?)",
                        ((c,) for c in caps))
        conn.commit()
        build_fts_s += time.perf_counter() - t0
        counts.append(len(caps))
        offsets.append(offsets[-1] + len(caps))
        del caps
        print(json.dumps({"shard": s, "gen_s": round(gen_s, 1),
                          "cpp_s": round(build_cpp_s, 1),
                          "fts_s": round(build_fts_s, 1)}), flush=True)

    with open(os.path.join(work_dir, "manifest.json"), "w") as f:
        json.dump({"num_shards": shards, "counts": counts,
                   "offsets": offsets, "sources": []}, f)
    disk_fts = os.path.getsize(db_path)

    def fts_stmt(q, col, s):
        # reference parse_multi_words + branch pick (laion_parser.py:
        # 95-102,157-167): quoted phrase for parens/'.'-'/' names
        m = q.replace(" ", " + ")
        if "(" in m and ")" in m:
            m = m.replace("(", "").replace(")", "")
        if ("(" in q and ")" in q) or "." in q or "/" in q:
            m = f'"{m}"'
        return (f"select {col} from _fts{s} where _fts{s} "
                f"MATCH '{m}' ORDER BY RANK")

    # -- query sets: drop names FTS5 cannot even parse (commas, stray
    # punctuation — the reference's bare `except` swallows these per
    # class, laion_parser.py:178-179; our engine tokenizes them fine,
    # but they can't be timed head-to-head)
    real_qs = [p for p, _ in inj_phrases if " " in p]
    rng.shuffle(real_qs)
    unparseable = 0
    parseable = []
    for q in real_qs:
        if len(parseable) == 150:
            break
        try:
            cur.execute(fts_stmt(q, "rowid", 0) + " LIMIT 1")
            parseable.append(q)
        except sqlite3.OperationalError:
            unparseable += 1
    real_qs = parseable
    bands = {"common": (0, 100), "mid": (1_000, 10_000),
             "rare": (50_000, V)}
    zipf_qs = {b: [f"word{rng.integers(lo, hi)} word{rng.integers(lo, hi)}"
                   for _ in range(n_zipf_queries)]
               for b, (lo, hi) in bands.items()}

    def run_cpp(queries):
        t0 = time.perf_counter()
        hits = sum(len(sidx.query(q, phrase=True)) for q in queries)
        return time.perf_counter() - t0, hits

    def run_fts(queries, fetch_text: bool):
        col = "rowid, text" if fetch_text else "rowid"
        t0 = time.perf_counter()
        hits = 0
        for q in queries:
            for s in range(shards):
                hits += len(cur.execute(fts_stmt(q, col, s)).fetchall())
        return time.perf_counter() - t0, hits

    sidx = ShardedCaptionIndex(work_dir)
    t0 = time.perf_counter()
    _ = sidx.query(real_qs[0], phrase=True)     # cold mmap load
    cold_cpp = time.perf_counter() - t0

    results = {"metric": "fts5_race", "captions": total, "shards": shards,
               "build": {
                   "cpp_captions_per_sec": round(total / build_cpp_s),
                   "fts5_captions_per_sec": round(total / build_fts_s),
                   "cpp_disk_gb": round(disk_cpp / 1e9, 2),
                   "fts5_disk_gb": round(disk_fts / 1e9, 2),
                   "cold_load_cpp_s": round(cold_cpp, 2),
               },
               "peak_rss_gb": round(rss_gb(), 2), "queries": {}}
    for label, qs in [("real_synonyms", real_qs),
                      *[(f"zipf_{b}", zq) for b, zq in zipf_qs.items()]]:
        dt_c, hits_c = run_cpp(qs)
        dt_f, hits_f = run_fts(qs, fetch_text=False)
        dt_ft, _ = run_fts(qs, fetch_text=True)
        assert hits_c == hits_f, (label, hits_c, hits_f)
        results["queries"][label] = {
            "n": len(qs), "hits": hits_c,
            "cpp_qps": round(len(qs) / max(dt_c, 1e-9), 1),
            "fts5_qps": round(len(qs) / max(dt_f, 1e-9), 1),
            "fts5_qps_with_text": round(len(qs) / max(dt_ft, 1e-9), 1),
        }
        print(json.dumps({label: results["queries"][label]}), flush=True)
    print(json.dumps(results))
    if not keep:
        shutil.rmtree(work_dir, ignore_errors=True)


def bench_index_scale(total: int = 10_000_000, shards: int = 8,
                      work_dir: str = "/tmp/swat_index_scale"):
    """Corpus-scale evidence for the 400M-caption story: build `total`
    synthetic captions as `shards` disk-backed index shards, then query
    through ShardedCaptionIndex with per-shard eviction so peak RSS stays
    bounded by ONE shard (the reference holds a 135 GB SQLite db on disk
    and queries 32 FTS tables, laion_parser.py:21-24,157-167 — LAION-400M
    at this sharding is 40 shards of 10M)."""
    import resource
    import shutil

    import numpy as np

    from swat_tpu.retrieval.ingest import ShardedCaptionIndex
    from swat_tpu.retrieval.indexer import NativeCaptionIndex, build_library

    if not build_library():
        print(json.dumps({"metric": "caption_index_scale",
                          "error": "native index unavailable"}))
        return
    shutil.rmtree(work_dir, ignore_errors=True)
    os.makedirs(work_dir)
    rng = np.random.default_rng(0)
    vocab = np.asarray([f"word{i}" for i in range(50_000)])
    per = total // shards

    def rss_gb():
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6

    counts, offsets = [], [0]
    gen_s = build_s = 0.0
    disk = 0
    for s in range(shards):
        t0 = time.perf_counter()
        lens = rng.integers(4, 14, per)
        words = vocab[rng.integers(0, len(vocab), int(lens.sum()))]
        caps, pos = [], 0
        for L in lens:
            caps.append(" ".join(words[pos: pos + L]))
            pos += L
        cap_file = os.path.join(work_dir, f"captions_{s:05d}.txt")
        with open(cap_file, "w") as f:
            f.write("\n".join(caps) + "\n")
        gen_s += time.perf_counter() - t0
        del caps, words

        t0 = time.perf_counter()
        idx = NativeCaptionIndex(path=cap_file)
        idx.save(os.path.join(work_dir, f"index_{s:05d}.bin"))
        build_s += time.perf_counter() - t0
        disk += os.path.getsize(os.path.join(work_dir, f"index_{s:05d}.bin"))
        counts.append(per)
        offsets.append(offsets[-1] + per)
        del idx

    with open(os.path.join(work_dir, "manifest.json"), "w") as f:
        json.dump({"num_shards": shards, "counts": counts,
                   "offsets": offsets, "sources": []}, f)

    sidx = ShardedCaptionIndex(work_dir)
    queries = [f"word{rng.integers(0, 50_000)} word{rng.integers(0, 50_000)}"
               for _ in range(40)]
    t0 = time.perf_counter()
    _ = len(sidx.query(queries[0]))  # cold: loads all shards from disk
    cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    hits = 0
    for q in queries[1:]:
        hits += len(sidx.query(q))
    query_s = (time.perf_counter() - t0) / (len(queries) - 1)
    sidx.evict()  # per-class batching pattern: query all, then evict

    print(json.dumps({
        "metric": "caption_index_scale",
        "captions": total, "shards": shards,
        "build_captions_per_sec": round(total / build_s),
        "build_s": round(build_s, 1),
        "gen_s": round(gen_s, 1),
        "index_disk_gb": round(disk / 1e9, 2),
        "peak_rss_gb": round(rss_gb(), 2),
        "cold_load_s": round(cold_s, 2),
        "warm_query_per_sec": round(1.0 / max(query_s, 1e-9), 1),
        "hits": hits,
        "extrapolated_400m_disk_gb": round(disk / 1e9 * 400e6 / total, 1),
    }))
    shutil.rmtree(work_dir, ignore_errors=True)


if __name__ == "__main__":
    if "--race" in sys.argv:
        i = sys.argv.index("--race")
        total = (int(sys.argv[i + 1]) if len(sys.argv) > i + 1
                 and sys.argv[i + 1].isdigit() else 50_000_000)
        shards = (int(sys.argv[sys.argv.index("--shards") + 1])
                  if "--shards" in sys.argv else 40)
        bench_fts5_race(total, shards)
    elif "--scale" in sys.argv:
        i = sys.argv.index("--scale")
        total = (int(sys.argv[i + 1]) if len(sys.argv) > i + 1
                 and sys.argv[i + 1].isdigit() else 10_000_000)
        shards = (int(sys.argv[sys.argv.index("--shards") + 1])
                  if "--shards" in sys.argv else max(8, total // 1_250_000))
        bench_index_scale(total, shards)
    else:
        bench_index()
        bench_embed_and_topk()
        bench_sample_stage()
