"""Retrieval samplers: rank the mined pool per class, apply thresholds /
dedup / zero-shot filters, write the split file training consumes.

Mirrors the 8 strategies of the reference ``sampling()`` dispatch
(reference retrieval/sample_retrieval.py:1471-1670):

  Random            uniform per class
  Random-I2I        random among top-half I2I
  I2I-rank          by mean similarity to few-shot image embeddings
  I2T-rank          image-embedding vs class prompt
  T2T-rank          caption-embedding vs class prompt  (SWAT default, :724)
  T2T-rank-T2I-tshd T2T rank + T2I >= 0.25 filter       (:774-825)
  T2T+I2T           mean of T2T and I2T scores
  T2T+I2I           mean of T2T and I2I scores

Output: ``{prefix}.txt`` with ``path label 0`` lines
(save_sample_file_list, :1457-1469) + sampled/filtered debug lists.
"""

from __future__ import annotations

import os
from collections import defaultdict
from typing import Dict, List, Optional, Sequence

import numpy as np

from swat_tpu.retrieval import rank as R

STRATEGIES = ("Random", "Random-I2I", "I2I-rank", "I2T-rank", "T2T-rank",
              "T2T-rank-T2I-tshd", "T2T+I2T", "T2T+I2I")


class MinedPool:
    """Per-class candidates: file paths + image/caption embeddings.

    Built from the mined-feature bundle (swat_tpu.retrieval.mined) — the
    equivalent of the reference's transform_extracted_fea regrouping
    (sample_retrieval.py:1387-1415)."""

    def __init__(self, file_paths: Sequence[str], labels: np.ndarray,
                 image_feats: np.ndarray,
                 caption_feats: Optional[np.ndarray] = None,
                 captions: Optional[Sequence[str]] = None):
        self.file_paths = list(file_paths)
        self.labels = np.asarray(labels, np.int32)
        self.image_feats = np.asarray(image_feats, np.float32)
        self.caption_feats = (None if caption_feats is None
                              else np.asarray(caption_feats, np.float32))
        self.captions = list(captions) if captions is not None else None

    def classes(self) -> List[int]:
        return sorted(set(int(c) for c in self.labels))

    def class_indices(self, cls: int) -> np.ndarray:
        return np.where(self.labels == cls)[0]


def sample_retrieved(
    pool: MinedPool,
    prompt_tensors: Dict[str, dict],
    strategy: str = "T2T-rank",
    num_samples: int = 500,
    threshold: float = 0.0,
    t2i_threshold: float = 0.25,
    fewshot_feats_by_class: Optional[Dict[int, np.ndarray]] = None,
    remove_duplicates: bool = False,
    zeroshot_filter_head: Optional[np.ndarray] = None,
    seed: int = 0,
) -> Dict[str, list]:
    """Returns {'file_list', 'label_list', 'score_list', 'sampled_info',
    'filtered_info', 'num_sampled'}; feed 'file_list'/'label_list' to
    `write_split_file`."""
    if strategy not in STRATEGIES:
        raise NotImplementedError(f"strategy {strategy}")
    rng = np.random.default_rng(seed)

    drop: Dict[int, set] = defaultdict(set)
    if remove_duplicates:
        for cls in pool.classes():
            idx = pool.class_indices(cls)
            local = R.near_duplicate_indices(pool.image_feats[idx])
            drop[cls].update(int(idx[i]) for i in local)
    if zeroshot_filter_head is not None:
        bad = R.zeroshot_misclassified(
            pool.image_feats, pool.labels, zeroshot_filter_head)
        for i in bad:
            drop[int(pool.labels[i])].add(int(i))

    out = {"file_list": [], "label_list": [], "score_list": [],
           "sampled_info": [], "filtered_info": [], "num_sampled": {}}

    for cls in pool.classes():
        idx = pool.class_indices(cls)
        if idx.size == 0:
            continue
        img = pool.image_feats[idx]
        cap = (pool.caption_feats[idx]
               if pool.caption_feats is not None else None)
        prompt = np.asarray(prompt_tensors[str(cls)]["mean"],
                            np.float32)[None, :]

        t2i = None
        if strategy == "Random":
            score = rng.uniform(size=idx.size)
        elif strategy in ("I2I-rank", "Random-I2I"):
            fs = fewshot_feats_by_class[cls]
            score = R.i2i_similarity(fs, img)
            if strategy == "Random-I2I":
                top_half = np.argsort(-score)[: max(1, idx.size // 2)]
                mask = np.full(idx.size, -np.inf)
                mask[top_half] = rng.uniform(size=top_half.size)
                score = mask
        elif strategy == "I2T-rank":
            score = R.t2i_similarity(prompt, img)
        elif strategy in ("T2T-rank", "T2T-rank-T2I-tshd"):
            score = R.t2t_similarity(prompt, cap)
            if strategy == "T2T-rank-T2I-tshd":
                t2i = R.t2i_similarity(prompt, img)
        elif strategy == "T2T+I2T":
            score = 0.5 * (R.t2t_similarity(prompt, cap)
                           + R.t2i_similarity(prompt, img))
        elif strategy == "T2T+I2I":
            fs = fewshot_feats_by_class[cls]
            score = 0.5 * (R.t2t_similarity(prompt, cap)
                           + R.i2i_similarity(fs, img))

        order = np.argsort(-score, kind="stable")
        ct = 0
        for local_i in order:
            if ct == num_samples:
                break
            gi = int(idx[local_i])
            s = float(score[local_i])
            path = pool.file_paths[gi]
            keep = (s >= threshold and gi not in drop[cls])
            if t2i is not None:
                keep = keep and float(t2i[local_i]) >= t2i_threshold
            info = (f"{round(s, 4)}/{threshold}"
                    + (f", {round(float(t2i[local_i]), 4)}/{t2i_threshold}"
                       if t2i is not None else "")
                    + f", {path}")
            if keep:
                out["file_list"].append(path)
                out["label_list"].append(cls)
                out["score_list"].append(s)
                out["sampled_info"].append(info)
                ct += 1
            else:
                out["filtered_info"].append(info)
        out["num_sampled"][cls] = ct
    return out


def _strategy_matrices(pool: MinedPool, prompt_tensors: Dict[str, dict],
                       strategy: str,
                       fewshot_feats_by_class) -> tuple:
    """Express a strategy's score as ``score[n] = X[n] . W[label[n]]``.

    Every non-random strategy reduces to a per-class vector:
      * T2T / I2T: the class prompt mean
      * I2I: mean similarity over few-shot exemplars == dot with the
        exemplars' MEAN embedding (linearity of the dot product)
      * T2T+I2T: prompt . (0.5*(cap+img))
      * T2T+I2I: concat([0.5*prompt, 0.5*fs_mean]) . concat([cap, img])
    Returns (W [C, D'], X [N, D'], C) with C = max label + 1.
    """
    d = pool.image_feats.shape[1]
    classes = pool.classes()
    C = max(classes) + 1

    P = np.zeros((C, d), np.float32)
    for c in classes:
        P[c] = np.asarray(prompt_tensors[str(c)]["mean"], np.float32)
    M = None
    if strategy in ("I2I-rank", "Random-I2I", "T2T+I2I"):
        M = np.zeros((C, d), np.float32)
        for c in classes:
            M[c] = np.asarray(fewshot_feats_by_class[c],
                              np.float32).mean(axis=0)

    cap, img = pool.caption_feats, pool.image_feats
    if strategy in ("T2T-rank", "T2T-rank-T2I-tshd"):
        return P, cap, C
    if strategy == "I2T-rank":
        return P, img, C
    if strategy in ("I2I-rank", "Random-I2I"):
        return M, img, C
    if strategy == "T2T+I2T":
        return P, 0.5 * (cap + img), C
    if strategy == "T2T+I2I":
        W = np.concatenate([0.5 * P, 0.5 * M], axis=1)
        X = np.concatenate([cap, img], axis=1)
        return W, X, C
    raise NotImplementedError(strategy)


def _rowwise_scores(X, W, labels, chunk: int = 1 << 18) -> np.ndarray:
    """score[n] = X[n] . W[labels[n]] in O(1) chunked device dispatches.
    ``X``/``labels`` may be device arrays (transferred once by the
    caller) — host->device traffic dominates over a tunneled TPU."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, w, ls):
        return jnp.einsum("nd,nd->n", x, w[ls], precision="highest",
                          preferred_element_type=jnp.float32)

    w = jnp.asarray(W, jnp.float32)
    X = jnp.asarray(X, jnp.float32)
    labels = jnp.asarray(labels)
    out = []
    for i in range(0, X.shape[0], chunk):
        out.append(np.asarray(run(X[i:i + chunk], w, labels[i:i + chunk])))
    return (np.concatenate(out) if out
            else np.empty(0, np.float32)).astype(np.float32)


def sample_retrieved_fused(
    pool: MinedPool,
    prompt_tensors: Dict[str, dict],
    strategy: str = "T2T-rank",
    num_samples: int = 500,
    threshold: float = 0.0,
    t2i_threshold: float = 0.25,
    fewshot_feats_by_class: Optional[Dict[int, np.ndarray]] = None,
    remove_duplicates: bool = False,
    zeroshot_filter_head: Optional[np.ndarray] = None,
    seed: int = 0,
    mesh=None,
    approx: bool = False,
) -> Dict[str, list]:
    """Fused production sampler: ONE class-masked [C, N] matmul + top-k
    selects every class's kept candidates in O(1) device dispatches
    (rank.rank_candidates), with thresholds / dedup / zero-shot filters
    applied as batched masks BEFORE the top-k.  ``sample_retrieved`` above
    is the per-class test oracle (tests/test_retrieval.py asserts
    equality).  Matches reference t2t_ranked_sampler + the per-strategy
    dispatch (sample_retrieval.py:724-771, 1471-1670).

    Random strategies keep their host-rng semantics (Random does no device
    work at all; Random-I2I uses one fused I2I scoring pass)."""
    if strategy not in STRATEGIES:
        raise NotImplementedError(f"strategy {strategy}")
    if strategy == "Random":
        return sample_retrieved(
            pool, prompt_tensors, strategy, num_samples, threshold,
            t2i_threshold, fewshot_feats_by_class, remove_duplicates,
            zeroshot_filter_head, seed)

    import jax.numpy as jnp

    labels = pool.labels
    n = labels.shape[0]
    W, X, C = _strategy_matrices(pool, prompt_tensors, strategy,
                                 fewshot_feats_by_class)
    # ONE host->device transfer per matrix, reused by the score pass and
    # the ranking matmul (a tunneled TPU pays ~seconds/GB per upload)
    X = jnp.asarray(X, jnp.float32)
    dev_labels = jnp.asarray(labels)
    score = _rowwise_scores(X, W, dev_labels)

    if strategy == "Random-I2I":
        # top-half by I2I per class, then uniform shuffle — host rng over
        # the single fused score pass (oracle: per-class I2I dispatches)
        rng = np.random.default_rng(seed)
        new_score = np.full(n, -np.inf, np.float32)
        for cls in pool.classes():
            idx = pool.class_indices(cls)
            order = np.argsort(-score[idx])[: max(1, idx.size // 2)]
            new_score[idx[order]] = rng.uniform(size=order.size)
        score = new_score

    t2i = None
    if strategy == "T2T-rank-T2I-tshd":
        P = np.zeros((C, pool.image_feats.shape[1]), np.float32)
        for c in pool.classes():
            P[c] = np.asarray(prompt_tensors[str(c)]["mean"], np.float32)
        # T2T: X is the caption matrix; reuse it for t2i only when the
        # strategy ranks images (it doesn't) — image feats upload once
        t2i = _rowwise_scores(pool.image_feats, P, dev_labels)

    dropped = np.zeros(n, bool)
    if remove_duplicates:
        for cls in pool.classes():
            idx = pool.class_indices(cls)
            local = R.near_duplicate_indices(pool.image_feats[idx])
            dropped[idx[local]] = True
    if zeroshot_filter_head is not None:
        bad = R.zeroshot_misclassified(
            pool.image_feats, labels, zeroshot_filter_head)
        dropped[bad] = True

    keep = (score >= threshold) & ~dropped & np.isfinite(score)
    if t2i is not None:
        keep &= t2i >= t2i_threshold

    # the fused selection: class-masked matmul + top-k on device.
    # Random-I2I's scores are host rng values, not X.W — select on host.
    if strategy == "Random-I2I":
        top_by_class = None
    else:
        cls_for_rank = np.where(keep, labels, -1).astype(np.int32)
        top_idx, _ = R.rank_candidates(W, X, cls_for_rank, num_samples,
                                       mesh=mesh, approx=approx)
        top_by_class = top_idx

    out = {"file_list": [], "label_list": [], "score_list": [],
           "sampled_info": [], "filtered_info": [], "num_sampled": {}}
    cutoff = np.full(C, -np.inf, np.float32)

    def info_line(gi):
        s = float(score[gi])
        return (f"{round(s, 4)}/{threshold}"
                + (f", {round(float(t2i[gi]), 4)}/{t2i_threshold}"
                   if t2i is not None else "")
                + f", {pool.file_paths[gi]}")

    for cls in pool.classes():
        if top_by_class is not None:
            kept = [int(g) for g in top_by_class[cls] if g >= 0]
        else:
            idx = pool.class_indices(cls)
            idx = idx[keep[idx]]
            order = np.argsort(-score[idx], kind="stable")
            kept = [int(g) for g in idx[order][:num_samples]]
        for gi in kept:
            out["file_list"].append(pool.file_paths[gi])
            out["label_list"].append(cls)
            out["score_list"].append(float(score[gi]))
            out["sampled_info"].append(info_line(gi))
        out["num_sampled"][cls] = len(kept)
        if len(kept) == num_samples:
            cutoff[cls] = score[kept[-1]]

    # filtered_info = candidates the oracle walk would have encountered
    # before filling the quota: not kept AND outranking the class cutoff
    filt = ~keep & (score > cutoff[labels])
    fi = np.where(filt)[0]
    fi = fi[np.lexsort((-score[fi], labels[fi]))]
    out["filtered_info"] = [info_line(int(g)) for g in fi]
    return out


def write_split_file(path: str, file_list: Sequence[str],
                     label_list: Sequence[int],
                     relative_to: Optional[str] = None):
    """``path label 0`` lines (reference save_sample_file_list,
    sample_retrieval.py:1457-1469; 0 = retrieved source flag)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        for p, lbl in zip(file_list, label_list):
            if relative_to:
                p = os.path.relpath(p, relative_to)
            f.write(f"{p} {lbl} 0\n")


def write_debug_lists(output_dir: str, prefix: str, result: Dict[str, list]):
    os.makedirs(output_dir, exist_ok=True)
    with open(os.path.join(output_dir, f"{prefix}_sampled_list.txt"),
              "w") as f:
        f.write("\n".join(result["sampled_info"]))
    with open(os.path.join(output_dir, f"{prefix}_filtered_list.txt"),
              "w") as f:
        f.write("\n".join(result["filtered_info"]))
