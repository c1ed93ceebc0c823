"""True multi-process distributed training (the multi-host path, for real).

`test_multichip.py` proves SPMD equivalence over 8 devices in ONE process;
this spawns TWO separate jax processes (4 CPU devices each) joined through
`jax.distributed` + gloo collectives — the same code path a v5e pod slice
uses across hosts (core/distributed.py) — and asserts that cross-process
data-parallel training reproduces single-process training exactly (fp32).

What this exercises that nothing else does:
  - `maybe_initialize_distributed` actually forming a 2-process cluster
  - `create_multislice_mesh` with the 'data' axis spanning the process
    boundary (gradient all-reduce crosses the inter-host link)
  - per-host input feeding: `process_local_slice` +
    `jax.make_array_from_process_local_data` (no host ever sees the
    whole batch)

The reference has no distributed training at all (SURVEY.md §2.3).
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")
NPROC = 2


def _free_port():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster():
    port = _free_port()
    env = dict(os.environ)
    # the workers set their own platform/device-count vars; scrub the
    # suite's 8-device flags so they don't leak through
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, f"127.0.0.1:{port}", str(NPROC),
             str(pid)],
            env=env, cwd=REPO, stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT, text=True)
        for pid in range(NPROC)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    return outs


@pytest.fixture(scope="module")
def worker_outputs():
    outs = _run_cluster()
    # The gloo rendezvous runs under a fixed 30s deadline; on a loaded
    # 1-core host the two workers' concurrent jax imports/compiles can skew
    # past it even with the worker-side warmup barrier. That is a host
    # scheduling artifact, not a product failure — retry the whole cluster
    # once before declaring it real.
    if any(rc != 0 and "DEADLINE_EXCEEDED" in out for rc, out in outs):
        outs = _run_cluster()
    results = []
    for rc, out in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out[-4000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("{")][-1]
        results.append(json.loads(line))
    return results


def test_cluster_formed(worker_outputs):
    for r in worker_outputs:
        assert r["nproc"] == NPROC
        assert r["ndev"] == 8  # 2 processes x 4 local devices


def test_cross_process_training_matches_single_process(worker_outputs):
    from tests.multihost_worker import compute

    ref_losses, ref_head = compute(mesh=None)
    for r in worker_outputs:
        np.testing.assert_allclose(r["losses"], ref_losses, rtol=1e-5)
        assert r["head_sum"] == pytest.approx(float(ref_head.sum()),
                                              rel=1e-5)
        assert r["head_absmax"] == pytest.approx(
            float(np.abs(ref_head).max()), rel=1e-5)


def test_processes_agree(worker_outputs):
    a, b = worker_outputs
    assert a["losses"] == b["losses"]
    assert a["head_sum"] == b["head_sum"]
