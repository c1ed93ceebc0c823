"""Multi-host initialization helpers (core/distributed.py) under mocked
process topology — the real multi-host path needs a pod, but the shard
math and the trigger conditions are testable here."""

import os
from unittest import mock

from swat_tpu.core.distributed import (
    maybe_initialize_distributed,
    process_local_slice,
)


def test_single_host_noop(monkeypatch):
    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    assert maybe_initialize_distributed() is False


def test_pod_env_triggers_initialize(monkeypatch):
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host0,host1,host2,host3")
    calls = {}

    def fake_init(coordinator_address=None, num_processes=None,
                  process_id=None):
        calls["args"] = (coordinator_address, num_processes, process_id)

    with mock.patch("jax.distributed.initialize", fake_init):
        assert maybe_initialize_distributed() is True
    assert calls["args"] == (None, None, None)


def test_explicit_coordinator(monkeypatch):
    monkeypatch.delenv("TPU_WORKER_HOSTNAMES", raising=False)
    with mock.patch("jax.distributed.initialize") as m:
        assert maybe_initialize_distributed(
            "10.0.0.1:1234", num_processes=4, process_id=2) is True
    m.assert_called_once_with(coordinator_address="10.0.0.1:1234",
                              num_processes=4, process_id=2)


def test_already_initialized_falls_back_to_process_count(monkeypatch):
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "10.0.0.1:1234")
    with mock.patch("jax.distributed.initialize",
                    side_effect=RuntimeError("already")), \
         mock.patch("jax.process_count", return_value=4):
        assert maybe_initialize_distributed() is True
    with mock.patch("jax.distributed.initialize",
                    side_effect=RuntimeError("already")), \
         mock.patch("jax.process_count", return_value=1):
        assert maybe_initialize_distributed() is False


def test_process_local_slice_partitions_evenly():
    with mock.patch("jax.process_count", return_value=4):
        slices = []
        for pid in range(4):
            with mock.patch("jax.process_index", return_value=pid):
                slices.append(process_local_slice(100))
    covered = []
    for s in slices:
        assert s.stop - s.start == 25
        covered.extend(range(s.start, s.stop))
    assert covered == list(range(100))


def test_multislice_mesh_shape_and_training_step():
    """Hybrid DCN x ICI mesh: 2 'slices' x 4 chips -> ('data','model')
    axes usable by the standard dp step (virtual CPU devices fall back to
    row-major layout; on real multi-slice hardware
    mesh_utils.create_hybrid_device_mesh keeps DCN on the outer axis)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swat_tpu.core.distributed import create_multislice_mesh

    mesh = create_multislice_mesh(dcn_data=2, ici_data=2, ici_model=2)
    assert mesh.shape == {"data": 4, "model": 2}

    # a sharded computation with a psum over the full data axis must see
    # all 4 data shards (DCN+ICI combined)
    x = jax.device_put(np.arange(8, dtype=np.float32),
                       NamedSharding(mesh, P("data")))
    s = jax.jit(lambda v: jnp.sum(v * 2.0))(x)
    assert float(s) == float(np.arange(8).sum() * 2)

    import pytest

    with pytest.raises(ValueError):
        create_multislice_mesh(dcn_data=3, ici_data=3, ici_model=1)
