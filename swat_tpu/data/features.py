"""Feature extraction & caching.

The reference extracts normalized image features split-by-split and caches
them to .pth for the 'pre_extracted' fast path (utils/features.py:122-148,
utils/dataloader.py:11-104).  Here extraction is one jitted, mesh-sharded
encode over padded batches; caches are .npz keyed by
(dataset, model_cfg, split, tag).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from swat_tpu.core.mesh import shard_batch
from swat_tpu.models.clip import CLIPModel


def make_text_encoder(model: CLIPModel, params):
    """Jitted ``tokens -> [N, D] normalized text features`` with params
    bound as a RUNTIME argument, never a closure.

    Closing a jit over the param tree bakes every touched leaf into the
    lowered module as a dense literal (~2 bytes of MLIR text per byte of
    weight), so the serialized compile request scales with model size:
    an L/14 text tower is ~340 MB of fp32 and the axon remote-compile
    endpoint rejects the resulting body with HTTP 413 (measured; B/32
    slipped under the limit, which is why this survived three rounds).
    Binding params as an argument keeps the program size shape-only and
    re-uses the device-resident tree by reference.  Single home for the
    text-encode jit used by prompt building (train/stages.py), the
    synonym filter (retrieval/cli.py), and mined-caption extraction
    (retrieval/mined.py) — reference utils/features.py:30-59 and
    retrieval/extract_mined_feature.py:103-213 run these eagerly in
    torch and have no analogous constraint."""

    @jax.jit
    def encode(p, tokens):
        from swat_tpu.models import functional as F

        return F.encode_text(model, p, tokens, normalize=True,
                             mode="infer")

    def encode_fn(tokens):
        return encode(params, tokens)

    encode_fn._jitted = encode  # exposed for the no-baked-constants test
    encode_fn._params = params
    return encode_fn


def batched_encode(encode_fn, tokens: "np.ndarray",
                   batch_size: int = 1024) -> "np.ndarray":
    """Encode [N, ctx] token rows through a jitted encode_fn in fixed-size
    chunks, padding the tail (by repeating the last row) so every call
    hits the same compiled shape; padding is stripped from the output.

    Single home for the pad/encode/strip loop used by the prompt encoder,
    the synonym filter, and mined-caption extraction."""
    feats = []
    n = tokens.shape[0]
    for i in range(0, n, batch_size):
        chunk = tokens[i: i + batch_size]
        pad = 0
        if chunk.shape[0] < batch_size and n > batch_size:
            pad = batch_size - chunk.shape[0]
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], pad, 0)], axis=0)
        out = np.asarray(encode_fn(chunk))
        feats.append(out[: out.shape[0] - pad] if pad else out)
    return (np.concatenate(feats, axis=0) if feats
            else np.empty((0,), np.float32))


def extract_image_features(model: CLIPModel, params, loader, mesh=None):
    """loader: EvalLoader-style (padded batches with masks).
    Returns {'image_features': [N, D] normalized fp32, 'labels': [N],
    'source': [N]} (the fewshot-vs-retrieved flag rides along so
    WeightedCE keeps working on pre-extracted features)."""

    @jax.jit
    def encode(params, images):
        from swat_tpu.models import functional as F

        return F.encode_image(model, params, images, normalize=True,
                              mode="infer")

    feats, labels, source = [], [], []
    for batch in loader:
        if mesh is not None:
            batch = shard_batch(mesh, batch)
        out = np.asarray(encode(params, batch["images"]))
        m = np.asarray(batch["mask"])
        feats.append(out[m])
        labels.append(np.asarray(batch["labels"])[m])
        source.append(np.asarray(batch["source"])[m])
    return {"image_features": np.concatenate(feats, axis=0),
            "labels": np.concatenate(labels, axis=0),
            "source": np.concatenate(source, axis=0)}


def feature_cache_path(cache_dir: str, dataset: str, model_cfg: str,
                       split_tag: str, extra: str = "") -> str:
    name = f"{dataset}_{model_cfg}_{split_tag}{('_' + extra) if extra else ''}.npz"
    return os.path.join(cache_dir, name)


def save_features(path: str, feats: dict):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **feats)


def load_features(path: str) -> dict:
    data = np.load(path)
    return {k: data[k] for k in data.files}


def extract_or_load(path: str, recalc: bool, extract_fn, logger=None):
    """The reference's pre_extract_feature contract (utils/
    dataloader.py:35-104): reuse the on-disk features across runs unless
    ``recalc`` (--recal_fea) busts the cache."""
    if not recalc and os.path.exists(path):
        if logger:
            logger.info(f"Loading pre-extracted features: {path}")
        return load_features(path)
    feats = extract_fn()
    try:
        save_features(path, feats)
        if logger:
            logger.info(f"Saved pre-extracted features: {path}")
    except OSError as e:  # read-only dataset roots must not kill the run
        if logger:
            logger.warning(f"Could not save feature cache {path}: {e}")
    return feats


def params_fingerprint(params) -> str:
    """Stable digest of a param tree covering EVERY leaf — keys the
    persistent feature cache so no two distinct checkpoints can reuse
    each other's features (the reference distinguishes these only by
    directory convention).  Per leaf: shape + a strided byte sample +
    exact sums (full tobytes() of ~90M params costs ~seconds; a mid-tower
    edit still flips the sums)."""
    import hashlib

    leaves = jax.tree_util.tree_leaves(params)
    h = hashlib.sha1()
    h.update(str(len(leaves)).encode())
    for leaf in leaves:
        a = np.asarray(leaf)
        h.update(str(a.shape).encode())
        flat = a.reshape(-1)
        stride = max(1, flat.size // 64)
        h.update(np.ascontiguousarray(flat[::stride][:64]).tobytes())
        h.update(np.float64(flat.astype(np.float64).sum()).tobytes())
    return h.hexdigest()[:10]
