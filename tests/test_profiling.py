"""Profiling hooks (utils/profiling.py) and the host-augmentation
fallback loader mode (data/pipeline.TrainLoader mode='host' — the
reference-parity PIL RandomResizedCrop path, utils/extras.py:66-77)."""

import glob
import os

import numpy as np
import pytest
from PIL import Image

from swat_tpu.utils.profiling import StepMeter, maybe_trace


def test_maybe_trace_noop():
    with maybe_trace(None):
        pass  # must not require jax or create files


def test_maybe_trace_writes_xplane(tmp_path):
    import jax
    import jax.numpy as jnp

    with maybe_trace(str(tmp_path)):
        _ = float(jnp.sum(jnp.ones((8, 8))))
    dumps = glob.glob(str(tmp_path / "**" / "*.xplane.pb"),
                      recursive=True)
    assert dumps, os.listdir(tmp_path)


def test_step_meter():
    m = StepMeter()
    m.tick(32)
    m.tick(32)
    assert m.items_per_sec > 0
    assert m.ms_per_step > 0
    m.reset()
    assert m.elapsed < 1.0


def test_train_loader_host_aug_mode(tmp_path):
    """mode='host': PIL RandomResizedCrop+flip+normalize on host (the
    reference's exact transform), yielding normalized float images."""
    from swat_tpu.data.pipeline import TrainLoader
    from swat_tpu.data.splits import Sample

    rng = np.random.default_rng(0)
    samples = []
    for i in range(6):
        p = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(rng.integers(0, 255, (60, 80, 3)
                                     ).astype(np.uint8)).save(p)
        samples.append(Sample(p, i % 3, 1))

    loader = TrainLoader(samples, batch_size=2, seed=0, mode="host",
                         n_px=32, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    for b in batches:
        assert b["images"].shape == (2, 32, 32, 3)
        assert b["images"].dtype == np.float32
        # CLIP-normalized pixels live roughly in [-2.5, 2.5]
        assert np.abs(b["images"]).max() < 3.0
        assert "canvases" not in b
