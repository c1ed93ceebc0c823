"""Multi-process ("multi-host") worker for tests/test_multihost.py.

Runs the real CE train step over a 2-process x 4-device CPU cluster:
`jax.distributed` init through `core.distributed.maybe_initialize_distributed`,
a DCN x ICI mesh from `create_multislice_mesh` (the 'data' axis spans the
process boundary, so the gradient psum crosses gloo — the CPU stand-in for
DCN), per-process input feeding via `process_local_slice` +
`jax.make_array_from_process_local_data` (each host uploads only its shard,
GSPMD assembles the global batch — the multi-host input recipe of
SURVEY.md §2.3).

The same `compute()` runs single-process (mesh=None) inside the pytest
process as the equivalence oracle: cross-process training must match
single-device training to fp32 rounding.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>
"""

import json
import os
import sys

N_LOCAL_DEVICES = 4
GLOBAL_BATCH = 16
NUM_CLASSES = 3
IMAGE_SIZE = 32


def _make_batch():
    import numpy as np

    r = np.random.default_rng(7)
    return {
        "images": r.normal(size=(GLOBAL_BATCH, IMAGE_SIZE, IMAGE_SIZE, 3))
        .astype(np.float32),
        "labels": r.integers(0, NUM_CLASSES, GLOBAL_BATCH).astype(np.int32),
        "source": r.integers(0, 2, GLOBAL_BATCH).astype(np.int32),
    }


def compute(mesh=None, steps=2):
    """Train `steps` CE iterations on the tiny config; return
    (losses, head). Deterministic given the seeds, so every process —
    and the single-process oracle — computes from identical inputs."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from swat_tpu.core.precision import FP32_PRECISION
    from swat_tpu.models.clip import CLIPModel
    from swat_tpu.models.configs import get_model_config
    from swat_tpu.models.head import init_head_random
    from swat_tpu.train import steps as S
    from swat_tpu.train.state import create_train_state

    cfg = get_model_config("test_tiny")
    model = CLIPModel(cfg, precision=FP32_PRECISION)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMAGE_SIZE, IMAGE_SIZE, 3),
                                         jnp.float32),
        jnp.zeros((1, cfg.text.context_length), jnp.int32))["params"]
    head = init_head_random(jax.random.PRNGKey(1), NUM_CLASSES,
                            cfg.embed_dim)
    state, tx = create_train_state(
        params, head, "finetune", lr_classifier=1e-3, lr_backbone=1e-4,
        total_iter=10)
    step = S.make_ce_step(model, tx, image_size=IMAGE_SIZE)
    batch_np = _make_batch()

    if mesh is None:
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}
    else:
        # every process holds identical host values; feed ONLY the local
        # shard, as a real multi-host input pipeline would
        from swat_tpu.core.distributed import process_local_slice

        rep = NamedSharding(mesh, P())

        def to_global(x):
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, rep,
                                                lambda idx: x[idx])

        state = jax.tree_util.tree_map(to_global, state)
        sl = process_local_slice(GLOBAL_BATCH)

        def feed(x):
            sh = NamedSharding(mesh, P("data", *[None] * (x.ndim - 1)))
            return jax.make_array_from_process_local_data(
                sh, x[sl], x.shape)

        batch = {k: feed(v) for k, v in batch_np.items()}

    losses = []
    for i in range(steps):
        state, loss = step(state, batch, jax.random.PRNGKey(3 + i))
        losses.append(float(loss))
    return losses, np.asarray(state.head)


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["JAX_PLATFORM_NAME"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={N_LOCAL_DEVICES}")
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))

    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-process CPU collectives ride gloo (the CPU stand-in for DCN)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")

    from swat_tpu.core.distributed import (
        create_multislice_mesh,
        maybe_initialize_distributed,
    )

    active = maybe_initialize_distributed(coord, nproc, pid)
    assert active, "maybe_initialize_distributed must report active"
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.local_device_count() == N_LOCAL_DEVICES

    # outer 'data' axis spans the process (DCN) boundary; jax.devices()
    # orders by process index, and the virtual-device branch lays the
    # mesh out row-major, so rows 0..3 are process 0, rows 4..7 process 1
    mesh = create_multislice_mesh(dcn_data=nproc,
                                  ici_data=N_LOCAL_DEVICES)
    dev = mesh.devices
    assert all(d.process_index == r // N_LOCAL_DEVICES
               for r, row in enumerate(dev) for d in row), dev

    # Establish the gloo clique BEFORE the train-step compile. The first
    # collective performs the gloo rendezvous under a fixed 30s key-value
    # deadline; on a small host the two processes jit-compile concurrently
    # on shared cores, and the compile-time skew can blow that window
    # (observed as "Gloo context initialization failed: DEADLINE_EXCEEDED"
    # at the first psum). A barrier here only has to absorb import/init
    # skew; the heavy compile then happens with everyone already connected
    # and the clique is reused by the training psums.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("swat_tpu multihost warmup")

    losses, head = compute(mesh=mesh)
    print(json.dumps({
        "pid": pid,
        "nproc": jax.process_count(),
        "ndev": jax.device_count(),
        "losses": losses,
        "head_sum": float(head.sum()),
        "head_absmax": float(abs(head).max()),
    }), flush=True)


if __name__ == "__main__":
    main()
