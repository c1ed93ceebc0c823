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
