"""Embedding ranking on the mesh — the retrieval pipeline's compute core.

The reference ranks per class with small GPU matmuls in a python loop
(reference retrieval/sample_retrieval.py:335-416,724-771).  Here ranking is
a single jitted (optionally mesh-sharded) matmul over the padded
[num_classes, max_candidates] similarity matrix + lax.top_k — the
"sharded embedding matmul + distributed top-k" north star (BASELINE.json).

Variable per-class candidate counts become fixed shapes by padding with
-inf-masked rows (SURVEY.md §7 'Dynamic shapes').
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def t2t_similarity(class_prompts: np.ndarray,
                   caption_embeddings: np.ndarray) -> np.ndarray:
    """[P, D] x [N, D] -> [N]; mean over prompts when P > 1 (reference
    t2t_similarity, sample_retrieval.py:397-416)."""
    sim = jnp.matmul(jnp.asarray(caption_embeddings),
                     jnp.asarray(class_prompts).T, precision="highest")
    if sim.ndim > 1 and sim.shape[-1] > 1:
        sim = sim.mean(axis=-1)
    return np.asarray(sim).reshape(-1)


def t2i_similarity(class_prompts: np.ndarray,
                   image_embeddings: np.ndarray) -> np.ndarray:
    """Same kernel against image embeddings (sample_retrieval.py:335-353)."""
    return t2t_similarity(class_prompts, image_embeddings)


def i2i_similarity(fewshot_embeddings: np.ndarray,
                   image_embeddings: np.ndarray) -> np.ndarray:
    """Mean similarity to the few-shot exemplars
    (sample_retrieval.py:356-394)."""
    sim = jnp.matmul(jnp.asarray(image_embeddings),
                     jnp.asarray(fewshot_embeddings).T, precision="highest")
    return np.asarray(sim.mean(axis=-1)).reshape(-1)


def i2i_similarity_p2p(fewshot_embeddings: np.ndarray,
                       embeddings: np.ndarray,
                       mode: str = "mean") -> np.ndarray:
    """Point-to-point exemplar similarity, reduced min/max/mean over the
    few-shot set (reference i2i_similarity_p2p, sample_retrieval.py:
    369-394).  ``embeddings`` may be image OR caption embeddings — the
    reference reuses this kernel for its I2T-rank and the I2T/I2I
    threshold gates (:1115, :868, :931)."""
    sim = jnp.matmul(jnp.asarray(embeddings),
                     jnp.asarray(fewshot_embeddings).T, precision="highest")
    if mode == "min":
        out = sim.min(axis=-1)
    elif mode == "max":
        out = sim.max(axis=-1)
    elif mode == "mean":
        out = sim.mean(axis=-1)
    else:
        raise ValueError(f"Invalid mode {mode!r}")
    return np.asarray(out).reshape(-1)


# ---------------------------------------------------------------------------
# batched whole-dataset ranking


import functools


@functools.lru_cache(maxsize=8)
def _p2p_rowwise_fn(mode: str):
    @jax.jit
    def run(x, fs, counts, ls):
        # x [n, D], fs [C, Kmax, D] (zero-padded), counts [C], ls [n]
        sims = jnp.einsum("nd,nkd->nk", x, fs[ls], precision="highest",
                          preferred_element_type=jnp.float32)
        valid = jnp.arange(fs.shape[1])[None, :] < counts[ls][:, None]
        if mode == "max":
            return jnp.where(valid, sims, -jnp.inf).max(axis=-1)
        if mode == "min":
            return jnp.where(valid, sims, jnp.inf).min(axis=-1)
        return (jnp.where(valid, sims, 0.0).sum(axis=-1)
                / jnp.maximum(counts[ls], 1))

    return run


def rowwise_p2p_scores(embeddings: np.ndarray,
                       fewshot_by_class: Dict[int, np.ndarray],
                       labels: np.ndarray, num_classes: int,
                       mode: str = "max",
                       chunk: int = 1 << 17) -> np.ndarray:
    """Fused form of per-class ``i2i_similarity_p2p``: score[n] =
    reduce_mode(sim(embeddings[n], exemplar) for exemplars of class
    labels[n]) in O(1) chunked device dispatches.  Variable exemplar
    counts become fixed shapes via zero-padding + a count mask
    (SURVEY.md §7 'Dynamic shapes')."""
    if mode not in ("min", "max", "mean"):
        raise ValueError(f"Invalid mode {mode!r}")
    d = embeddings.shape[1]
    kmax = max((np.asarray(v).shape[0] for v in fewshot_by_class.values()),
               default=1)
    fs = np.zeros((num_classes, kmax, d), np.float32)
    counts = np.zeros(num_classes, np.int32)
    for c, v in fewshot_by_class.items():
        if c >= num_classes:   # class absent from the candidate pool
            continue
        v = np.asarray(v, np.float32)
        fs[c, : v.shape[0]] = v
        counts[c] = v.shape[0]

    run = _p2p_rowwise_fn(mode)
    fs_d = jnp.asarray(fs)
    counts_d = jnp.asarray(counts)
    emb = jnp.asarray(embeddings, jnp.float32)
    ls = jnp.asarray(labels, jnp.int32)
    out = []
    for i in range(0, emb.shape[0], chunk):
        out.append(np.asarray(run(emb[i: i + chunk], fs_d, counts_d,
                                  ls[i: i + chunk])))
    return (np.concatenate(out) if out
            else np.empty(0, np.float32)).astype(np.float32)


def _masked_sims(prompts, cands, cls_ids, num_classes):
    sims = jnp.einsum("cd,nd->cn", prompts, cands, precision="highest",
                      preferred_element_type=jnp.float32)
    mask = cls_ids[None, :] == jnp.arange(num_classes)[:, None]
    return jnp.where(mask, sims, -jnp.inf)


def _select_top(sims, top_k: int, approx: bool):
    """Exact-ordered top-k rows of a [C, n] similarity matrix.  The approx
    path is a TPU-native `approx_max_k` SHORTLIST (2x oversampled, partial
    reduce, no full per-row sort) followed by an exact re-rank of the
    shortlist — `approx_max_k` alone neither sorts its output nor
    guarantees recall, and the sampler reads result order (its per-class
    score cutoff is the last kept entry)."""
    n = sims.shape[1]
    if approx and n >= 2 * top_k:
        short_sim, short_idx = jax.lax.approx_max_k(
            sims, min(2 * top_k, n), recall_target=0.99)
        top_sim, pos = jax.lax.top_k(short_sim, top_k)
        top_idx = jnp.take_along_axis(short_idx, pos, axis=1)
    else:
        top_sim, top_idx = jax.lax.top_k(sims, top_k)
    return top_sim, jnp.where(jnp.isfinite(top_sim), top_idx, -1)


@functools.lru_cache(maxsize=16)
def _rank_fn(num_classes: int, top_k: int, approx: bool):
    """Compiled once per (C, k, mode) — a fresh jit closure per call would
    recompile every time."""

    @jax.jit
    def run(prompts, cands, cls_ids):
        sims = _masked_sims(prompts, cands, cls_ids, num_classes)
        top_sim, top_idx = _select_top(sims, top_k, approx)
        return top_idx, top_sim

    return run


@functools.lru_cache(maxsize=16)
def _chunk_rank_fn(num_classes: int, top_k: int, approx: bool):
    """One streaming-merge step: rank a candidate chunk, fold its
    shortlist into the running per-class top-k carry (exact merge)."""

    @jax.jit
    def step(prompts, cands, cls_ids, base, carry_sim, carry_idx):
        sims = _masked_sims(prompts, cands, cls_ids, num_classes)
        k_eff = min(top_k, sims.shape[1])
        s, i = _select_top(sims, k_eff, approx)
        gi = jnp.where(i >= 0, base + i, -1)
        all_sim = jnp.concatenate([carry_sim, s], axis=1)
        all_idx = jnp.concatenate([carry_idx, gi], axis=1)
        m_sim, pos = jax.lax.top_k(all_sim, top_k)
        m_idx = jnp.take_along_axis(all_idx, pos, axis=1)
        return m_sim, jnp.where(jnp.isfinite(m_sim), m_idx, -1)

    return step


# Dense [C, N] similarity matrices beyond this many elements (1 GiB f32)
# switch to the chunked streaming merge; pools beyond this many candidates
# switch 'auto' to the approx shortlist path.
MAX_DENSE_ELEMS = 256 * 1024 * 1024
APPROX_AUTO_N = 4_000_000


def rank_candidates(prompt_matrix: np.ndarray,
                    candidate_embeddings: np.ndarray,
                    candidate_class: np.ndarray,
                    top_k: int,
                    mesh=None,
                    approx=False,
                    chunk: Optional[int] = None
                    ) -> Tuple[np.ndarray, np.ndarray]:
    """One fused pass over ALL classes' candidates.

    prompt_matrix:       [C, D]  (per-class mean prompt embeddings)
    candidate_embeddings:[N, D]  (caption or image embeddings)
    candidate_class:     [N]     class id per candidate
    approx: False (exact), True (TPU `approx_max_k` 2x shortlist + exact
    re-rank — exact result ORDER, >=0.99 recall), or "auto" (approx once
    the pool exceeds APPROX_AUTO_N candidates — the corpus-scale regime
    where a full per-row sort dominates).
    chunk: stream candidates through a running per-class top-k merge in
    chunks of this many rows, bounding device memory at [C, chunk]
    instead of [C, N]; auto-engages when C*N exceeds MAX_DENSE_ELEMS
    (LAION-scale pools). Exact chunking == dense exact; the merge is
    always exact, so chunked-approx is an exactly re-ranked union of
    per-chunk shortlists.
    Returns (top_idx [C, top_k] indices into N, top_sim [C, top_k]);
    entries beyond a class's candidate count hold -1 / -inf.
    """
    C = prompt_matrix.shape[0]
    N = candidate_embeddings.shape[0]
    if approx == "auto":
        approx = N > APPROX_AUTO_N
    if chunk is None and C * N > MAX_DENSE_ELEMS:
        chunk = max(top_k, (MAX_DENSE_ELEMS // max(C, 1)) // 1024 * 1024
                    or 1024)
    if chunk is not None:
        return _rank_candidates_chunked(prompt_matrix,
                                        candidate_embeddings,
                                        candidate_class, top_k,
                                        approx=bool(approx),
                                        chunk=int(chunk))
    run = _rank_fn(C, top_k, approx)

    if mesh is not None:
        # shard the candidate axis over the data mesh axis: the big
        # [C, N] similarity matmul runs sharded on N and GSPMD inserts
        # the all-gather feeding the final top_k
        from jax.sharding import NamedSharding, PartitionSpec as P

        n = candidate_embeddings.shape[0]
        axis = mesh.shape.get("data", 1)
        if n % max(axis, 1) == 0:
            candidate_embeddings = jax.device_put(
                candidate_embeddings, NamedSharding(mesh, P("data", None)))
    top_idx, top_sim = run(jnp.asarray(prompt_matrix, jnp.float32),
                           jnp.asarray(candidate_embeddings, jnp.float32),
                           jnp.asarray(candidate_class, jnp.int32))
    return np.asarray(top_idx), np.asarray(top_sim)


def _rank_candidates_chunked(prompt_matrix, candidate_embeddings,
                             candidate_class, top_k: int, *,
                             approx: bool, chunk: int):
    """Streaming per-class top-k: fold fixed-shape candidate chunks into a
    running [C, top_k] carry (one compile for every chunk; the short last
    chunk is padded with class -1 rows, which never match the mask)."""
    C, D = prompt_matrix.shape
    N = candidate_embeddings.shape[0]
    prompts = jnp.asarray(prompt_matrix, jnp.float32)
    step = _chunk_rank_fn(C, top_k, approx)
    carry_sim = jnp.full((C, top_k), -jnp.inf, jnp.float32)
    carry_idx = jnp.full((C, top_k), -1, jnp.int32)
    for b in range(0, N, chunk):
        cands = np.asarray(candidate_embeddings[b: b + chunk], np.float32)
        cls = np.asarray(candidate_class[b: b + chunk], np.int32)
        if cands.shape[0] < chunk:
            pad = chunk - cands.shape[0]
            cands = np.concatenate(
                [cands, np.zeros((pad, D), np.float32)])
            cls = np.concatenate([cls, np.full(pad, -1, np.int32)])
        carry_sim, carry_idx = step(prompts, jnp.asarray(cands),
                                    jnp.asarray(cls), jnp.int32(b),
                                    carry_sim, carry_idx)
    return np.asarray(carry_idx), np.asarray(carry_sim)


@functools.lru_cache(maxsize=8)
def _block_pair_fn(threshold: float):
    """Cached per-threshold jit — a fresh closure per call would
    recompile on every invocation (1.5-10 min over the TPU tunnel)."""

    @jax.jit
    def block_pair(a, b, ia, ib):
        sims = jnp.matmul(a, b.T, precision="highest")
        rows = ia + jnp.arange(a.shape[0])[:, None]
        cols = ib + jnp.arange(b.shape[0])[None, :]
        hit = (sims > threshold) & (rows < cols)
        return hit.any(axis=0)

    return block_pair


def near_duplicate_indices(embeddings: np.ndarray,
                           threshold: float = 0.9,
                           block: int = 4096) -> np.ndarray:
    """Indices j to drop where sim(i, j) > threshold for some i < j
    (reference remove_near_duplicates2, sample_retrieval.py:237-275),
    computed in blocks so the NxN matrix never materializes."""
    n = embeddings.shape[0]
    emb = jnp.asarray(embeddings, jnp.float32)
    drop = np.zeros(n, bool)
    block_pair = _block_pair_fn(float(threshold))

    for jb in range(0, n, block):
        b = emb[jb: jb + block]
        col_hit = np.zeros(b.shape[0], bool)
        for ib in range(0, min(jb + block, n), block):
            a = emb[ib: ib + block]
            col_hit |= np.asarray(block_pair(a, b, ib, jb))
        drop[jb: jb + b.shape[0]] |= col_hit
    return np.where(drop)[0]


@functools.lru_cache(maxsize=8)
def _class_dup_fn(threshold: float):
    @jax.jit
    def class_dup(feats, valid):
        # feats [G, M, D], valid [G, M] -> drop [G, M]: within each
        # class, drop local j where sim(i, j) > threshold for some
        # valid i < j (padding rows are invalid and never match)
        sims = jnp.einsum("gmd,gnd->gmn", feats, feats,
                          precision="highest")
        m = feats.shape[1]
        tri = jnp.arange(m)[:, None] < jnp.arange(m)[None, :]
        hit = (sims > threshold) & tri & valid[:, :, None] \
            & valid[:, None, :]
        return hit.any(axis=1)

    return class_dup


def near_duplicate_indices_by_class(embeddings: np.ndarray,
                                    labels: np.ndarray,
                                    threshold: float = 0.9,
                                    max_elems: int = 1 << 27) -> np.ndarray:
    """Fused per-class near-dup detection for the production sampler:
    all classes padded to the max class size and swept in a few [G, M, M]
    masked pairwise passes — O(ceil(C/G)) device dispatches instead of
    one `near_duplicate_indices` call per class (the reference loops
    classes on the GPU too, remove_near_duplicates2
    sample_retrieval.py:237-275; at ImageNet scale the per-class loop is
    1,000 sequential ~18 ms tunnel dispatches).

    Within-class local order is ascending global index — identical to
    the per-class oracle (`class_indices` returns ascending positions).
    Returns global indices to drop."""
    labels = np.asarray(labels)
    n = labels.shape[0]
    if n == 0:
        return np.empty(0, np.int64)
    order = np.argsort(labels, kind="stable")
    sorted_labels = labels[order]
    starts = np.flatnonzero(np.r_[True, sorted_labels[1:]
                                  != sorted_labels[:-1]])
    ends = np.r_[starts[1:], n]
    counts = ends - starts
    m = int(counts.max())
    c = len(starts)
    d = embeddings.shape[1]

    # padded gather map [C, M] of global indices (-1 = padding)
    gather = np.full((c, m), -1, np.int64)
    for ci, (s, e) in enumerate(zip(starts, ends)):
        gather[ci, : e - s] = order[s:e]

    g = max(1, min(c, max_elems // max(m * m, 1)))
    fn = _class_dup_fn(float(threshold))
    emb = np.asarray(embeddings, np.float32)
    drop_global = []
    for b in range(0, c, g):
        chunk = gather[b: b + g]
        if chunk.shape[0] < g:                  # static shapes: one compile
            chunk = np.concatenate(
                [chunk, np.full((g - chunk.shape[0], m), -1, np.int64)])
        valid = chunk >= 0
        feats = np.zeros((g, m, d), np.float32)
        feats[valid] = emb[chunk[valid]]
        drop = np.asarray(fn(jnp.asarray(feats), jnp.asarray(valid)))
        drop_global.append(chunk[drop & valid])
    return np.sort(np.concatenate(drop_global)) if drop_global \
        else np.empty(0, np.int64)


@jax.jit
def _zs_preds(x, head):
    return jnp.argmax(jnp.matmul(x, head.T, precision="highest"), axis=-1)


def zeroshot_misclassified(embeddings: np.ndarray, labels: np.ndarray,
                           head: np.ndarray,
                           batch: int = 8192) -> np.ndarray:
    """Indices whose zero-shot prediction != label (reference
    zeroshot_clip_img_filter, sample_retrieval.py:278-329)."""
    emb = jnp.asarray(embeddings, jnp.float32)
    hd = jnp.asarray(head, jnp.float32)

    preds = []
    for i in range(0, emb.shape[0], batch):
        preds.append(np.asarray(_zs_preds(emb[i: i + batch], hd)))
    preds = np.concatenate(preds) if preds else np.empty(0, np.int64)
    return np.where(preds != np.asarray(labels))[0]
