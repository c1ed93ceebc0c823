"""Host input pipeline feeding the device.

Replaces torch DataLoader worker processes (reference utils/dataloader.py)
with a threaded decode pool + one-batch prefetch.  Train batches carry uint8
canvases + valid dims; the random crop / flip / normalize / mixing happen
on-device inside the jitted step (`swat_tpu.kernels.augment`).  Eval batches
are fully preprocessed on host (determinism/parity) and padded to a fixed
batch size with a validity mask so every step has a static shape.

`FeatureBatches` is the pre-extracted-features fast path (reference
TensorDataset, utils/datasets/dataset_utils.py:237-255).
"""

from __future__ import annotations

import concurrent.futures as cf
import threading
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from swat_tpu.data.splits import Sample
from swat_tpu.data.transforms import (
    CANVAS_SIZE,
    eval_preprocess,
    host_train_preprocess,
    load_image,
    train_canvas,
)


def _prefetch(gen, depth: int = 2):
    """Run a generator in a background thread with a small queue.

    Abandoning the iteration early (break / exception in the consumer)
    stops the worker promptly: the worker polls a stop flag on every
    bounded put, and the finally block closes the source generator so its
    thread pools exit their with-blocks."""
    import queue

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    END = object()
    err: List[BaseException] = []
    stop = threading.Event()

    def worker():
        try:
            for item in gen:
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # propagate to consumer
            err.append(e)
        finally:
            if not stop.is_set():
                q.put(END)
            gen.close()

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()


def device_prefetch(batches, mesh, depth: int = 1):
    """Double-buffered host->device feed: keep up to ``depth`` sharded
    uploads IN FLIGHT ahead of the consumer.  `jax.device_put` is async,
    so eagerly sharding the next batch while the previous step computes
    overlaps the H2D DMA with device compute — the TPU-VM equivalent of
    the reference's pinned-memory DataLoader + non_blocking copies
    (utils/training.py:1454).  On a tunneled single-host chip dispatch
    serializes and this is a no-op in effect (measured; CLAUDE.md)."""
    from swat_tpu.core.mesh import shard_batch

    it = iter(batches)
    buf: List = []
    try:
        for batch in it:
            buf.append(shard_batch(mesh, batch))
            if len(buf) > depth:
                yield buf.pop(0)
        while buf:
            yield buf.pop(0)
    finally:
        if hasattr(it, "close"):
            it.close()


class EvalLoader:
    """Deterministic order, fixed batch shape, final batch padded + masked."""

    def __init__(self, samples: Sequence[Sample], batch_size: int = 256,
                 n_px: int = 224, num_workers: int = 16):
        self.samples = list(samples)
        self.batch_size = batch_size
        self.n_px = n_px
        # torch DataLoader semantics: num_workers=0 means load in-process
        # (reference utils/dataloader.py passes it straight through); a
        # 1-thread pool is the threaded-loader equivalent.
        self.num_workers = max(1, num_workers)

    def __len__(self):
        return (len(self.samples) + self.batch_size - 1) // self.batch_size

    def _load(self, s: Sample) -> np.ndarray:
        return eval_preprocess(load_image(s.path), self.n_px)

    def _load_chunk(self, chunk, pool) -> np.ndarray:
        """Normalized float32 pixels for a chunk — the native C++ decoder
        when built (GIL-free JPEG decode + PIL-parity bicubic,
        data/native/decoder.cpp), PIL threads otherwise."""
        from swat_tpu.data import native
        from swat_tpu.kernels.augment import CLIP_MEAN, CLIP_STD

        if native.available():
            u8 = native.batch_eval_pixels([s.path for s in chunk],
                                          self.n_px, self.num_workers)
            # host numpy math — a jnp normalize here would cost a device
            # round trip per eval batch (~18 ms tunnel dispatch each)
            x = u8.astype(np.float32) / 255.0
            return ((x - np.asarray(CLIP_MEAN, np.float32))
                    / np.asarray(CLIP_STD, np.float32))
        return np.stack(list(pool.map(self._load, chunk))).astype(
            np.float32)

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        bs = self.batch_size
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(self.samples), bs):
                chunk = self.samples[start: start + bs]
                images = self._load_chunk(chunk, pool)
                n = len(chunk)
                if n < bs:  # pad with zeros, masked out
                    images = np.concatenate(
                        [images, np.zeros((bs - n,) + images.shape[1:],
                                          images.dtype)])
                batch = {
                    "images": images,
                    "labels": np.array(
                        [s.label for s in chunk] + [0] * (bs - n), np.int32),
                    "source": np.array(
                        [s.is_fewshot for s in chunk] + [0] * (bs - n),
                        np.int32),
                    "mask": np.arange(bs) < n,
                }
                yield batch

    def __iter__(self):
        return _prefetch(self._batches())


class TrainSnapshotLoader(EvalLoader):
    """EvalLoader-shaped pass (deterministic order, padded+masked) that
    applies the TRAIN transform once per image: the reference extracts
    pre-extracted TRAIN features with ``transform(224, 'train')`` — one
    random-crop/flip snapshot per image — while val/test use the eval
    transform (reference pre_extract_feature, utils/dataloader.py:72-81,
    and extract_train_dataloader :278-287).  ``seed`` makes the snapshot
    reproducible so the persistent feature cache stays meaningful.

    ``shuffle_drop_bsz``: the stage-2 extract_train_dataloader runs its
    extraction DataLoader with shuffle=True, drop_last=True at bsz=128
    (:285-286), silently discarding up to bsz-1 random samples from the
    probing train set — set it to reproduce that (stage-1
    pre_extract_feature uses shuffle=False, drop_last=False and keeps
    everything, :79-80)."""

    def __init__(self, samples, batch_size: int = 256, n_px: int = 224,
                 num_workers: int = 16, seed: int = 1,
                 shuffle_drop_bsz: int = 0, mode: str = "train"):
        samples = list(samples)
        if shuffle_drop_bsz:
            rng = np.random.default_rng(seed)
            order = rng.permutation(len(samples))
            keep = max(1, len(samples) // shuffle_drop_bsz) \
                * shuffle_drop_bsz
            samples = [samples[i] for i in order[:keep]]
        super().__init__(samples, batch_size, n_px, num_workers)
        self.seed = seed
        self.mode = mode   # 'train' | 'eval' (deterministic, see
        #                    TrainLoader's 'eval' mode)

    def _load_chunk(self, chunk, pool) -> np.ndarray:
        import zlib

        from swat_tpu.data.transforms import (eval_preprocess,
                                              host_train_preprocess)

        def load(s):
            if self.mode == "eval":
                return eval_preprocess(load_image(s.path), self.n_px)
            # per-sample rng keyed on (seed, path): reproducible across
            # runs/processes (unlike builtin hash) so the cached snapshot
            # is stable
            rng = np.random.default_rng(
                (self.seed, zlib.crc32(s.path.encode())))
            return host_train_preprocess(load_image(s.path), rng,
                                         self.n_px)

        return np.stack(list(pool.map(load, chunk))).astype(np.float32)


class TrainLoader:
    """Shuffled, drop-last train batches.

    mode='canvas' (default): uint8 canvases + valid_hw for on-device
    augmentation.  mode='host': fully augmented float images (exact
    reference PIL semantics, parity/debug path).  mode='eval': the
    DETERMINISTIC eval preprocess applied to train batches — the
    differential-oracle harness runs the reference with the same
    substitution (tests/reference_shims/run_reference.py
    --deterministic-train-aug) so the two trajectories can be
    lock-stepped without matching torch-vs-jax augmentation RNG.
    """

    def __init__(self, samples: Sequence[Sample], batch_size: int = 32,
                 seed: int = 1, mode: str = "canvas", n_px: int = 224,
                 num_workers: int = 16, canvas: int = CANVAS_SIZE,
                 tokenized_prompts: Optional[Dict[str, np.ndarray]] = None):
        if batch_size > len(samples):
            raise ValueError(
                f"batch_size {batch_size} > dataset size {len(samples)} "
                "(drop_last leaves no batches)")
        self.samples = list(samples)
        self.batch_size = batch_size
        self.mode = mode
        self.n_px = n_px
        self.canvas = canvas
        self.num_workers = max(1, num_workers)  # 0 = in-process (torch parity)
        self.tokenized_prompts = tokenized_prompts
        self._rng = np.random.default_rng(seed)
        self._epoch = 0

    def __len__(self):
        return len(self.samples) // self.batch_size

    def _load_canvas(self, s: Sample):
        return train_canvas(load_image(s.path), self.canvas)

    def _load_host_aug(self, task):
        s, seed = task  # per-sample rng: Generator is not thread-safe
        rng = np.random.default_rng(seed)
        return host_train_preprocess(load_image(s.path), rng, self.n_px)

    def _load_eval(self, s: Sample):
        from swat_tpu.data.transforms import eval_preprocess

        return eval_preprocess(load_image(s.path), self.n_px)

    def _batches(self) -> Iterator[Dict[str, np.ndarray]]:
        order = self._rng.permutation(len(self.samples))
        bs = self.batch_size
        with cf.ThreadPoolExecutor(self.num_workers) as pool:
            for start in range(0, len(order) - bs + 1, bs):
                chunk = [self.samples[i] for i in order[start: start + bs]]
                batch: Dict[str, np.ndarray] = {
                    "labels": np.array([s.label for s in chunk], np.int32),
                    "source": np.array([s.is_fewshot for s in chunk],
                                       np.int32),
                }
                if self.mode == "canvas":
                    from swat_tpu.data import native

                    if native.available():
                        canvases, valid_hw = native.batch_train_canvases(
                            [s.path for s in chunk], self.canvas,
                            self.num_workers)
                        batch["canvases"] = canvases
                        batch["valid_hw"] = valid_hw
                    else:
                        loaded = list(pool.map(self._load_canvas, chunk))
                        batch["canvases"] = np.stack(
                            [c for c, _ in loaded])
                        batch["valid_hw"] = np.array(
                            [hw for _, hw in loaded], np.int32)
                elif self.mode == "eval":
                    images = list(pool.map(self._load_eval, chunk))
                    batch["images"] = np.stack(images).astype(np.float32)
                else:
                    seeds = self._rng.integers(2 ** 63, size=len(chunk))
                    images = list(pool.map(self._load_host_aug,
                                           zip(chunk, seeds)))
                    batch["images"] = np.stack(images).astype(np.float32)
                if self.tokenized_prompts is not None:
                    toks = []
                    for s in chunk:
                        rows = self.tokenized_prompts[str(s.label)]
                        toks.append(rows[self._rng.integers(rows.shape[0])])
                    batch["prompt_tokens"] = np.stack(toks).astype(np.int32)
                yield batch

    def __iter__(self):
        self._epoch += 1
        return _prefetch(self._batches())


class CyclingLoader:
    """Wraps a loader to cycle forever (the reference's try/except
    StopIteration pattern for the second loader of mixed methods,
    utils/training.py:724-737)."""

    def __init__(self, loader):
        self.loader = loader
        self._it = None

    def next(self):
        if self._it is None:
            self._it = iter(self.loader)
        try:
            return next(self._it)
        except StopIteration:
            self._it = iter(self.loader)
            return next(self._it)


class FeatureBatches:
    """Batches over pre-extracted (features, labels) arrays."""

    def __init__(self, features: np.ndarray, labels: np.ndarray,
                 batch_size: int = 128, shuffle: bool = False,
                 drop_last: bool = False, seed: int = 0, source=None):
        self.features = np.asarray(features)
        self.labels = np.asarray(labels)
        self.source = (np.asarray(source, np.int32) if source is not None
                       else np.full(len(self.labels), -1, np.int32))
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __len__(self):
        n = len(self.labels)
        return n // self.batch_size if self.drop_last else (
            (n + self.batch_size - 1) // self.batch_size)

    def __iter__(self):
        n = len(self.labels)
        order = self._rng.permutation(n) if self.shuffle else np.arange(n)
        bs = self.batch_size
        end = n - bs + 1 if self.drop_last else n
        for start in range(0, end, bs):
            idx = order[start: start + bs]
            feats = self.features[idx]
            labels = self.labels[idx]
            src = self.source[idx]
            k = len(idx)
            if k < bs:  # pad + mask (eval path only)
                feats = np.concatenate(
                    [feats, np.zeros((bs - k,) + feats.shape[1:],
                                     feats.dtype)])
                labels = np.concatenate([labels, np.zeros(bs - k, np.int32)])
                src = np.concatenate([src, np.full(bs - k, -1, np.int32)])
            yield {
                "features": feats,
                "labels": labels.astype(np.int32),
                "source": src.astype(np.int32),
                "mask": np.arange(bs) < k,
            }


class WeightedSampler:
    """Inverse-class-frequency sampling with replacement — the CMO second
    loader (reference utils/dataloader.py:229-246)."""

    def __init__(self, samples: Sequence[Sample], num_classes: int,
                 cmo_alpha: float = 1.0, seed: int = 1):
        counts = np.bincount([s.label for s in samples],
                             minlength=num_classes).astype(np.float64)
        counts = np.maximum(counts, 1)
        cls_weight = 1.0 / (counts ** cmo_alpha)
        cls_weight = cls_weight / cls_weight.sum()
        self.p = np.array([cls_weight[s.label] for s in samples])
        self.p = self.p / self.p.sum()
        self.samples = list(samples)
        self._rng = np.random.default_rng(seed)

    def draw(self, n: int) -> List[Sample]:
        idx = self._rng.choice(len(self.samples), size=n, replace=True,
                               p=self.p)
        return [self.samples[i] for i in idx]


class WeightedTrainLoader(TrainLoader):
    """TrainLoader whose epoch order is drawn from a WeightedSampler."""

    def __init__(self, samples, num_classes: int, cmo_alpha: float = 1.0,
                 **kw):
        super().__init__(samples, **kw)
        self._sampler = WeightedSampler(
            samples, num_classes, cmo_alpha,
            seed=int(self._rng.integers(2 ** 31)))

    def _batches(self):
        drawn = self._sampler.draw(len(self.samples))
        orig = self.samples
        self.samples = drawn
        try:
            yield from super()._batches()
        finally:
            self.samples = orig
