"""Test harness: run everything on a virtual 8-device CPU mesh.

This is the TPU-world substitute for fake backends — pjit/collective code
executes as real SPMD over 8 host devices (SURVEY.md §4).
"""

import os

# NOTE: this environment exports JAX_PLATFORMS=axon (the TPU plugin) and
# pre-imports jax, so setdefault is not enough — override both platform
# vars outright to keep tests on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# jax is pre-imported by site customization with JAX_PLATFORMS=axon baked
# into its config — env vars set above are too late; update the live
# config (legal until the first backend initialization)
jax.config.update("jax_platforms", "cpu")

# NO persistent compile cache for the suite.  Two independent reasons,
# both learned the hard way:
#   1. Cross-host poisoning: XLA:CPU codegen (and thus fp32 reduction
#      rounding) depends on the machine; a cache populated on host A is
#      AOT-loaded on host B with a "machine type doesn't match" warning —
#      observed to flip rounding-zero gradient signs and make the
#      full-scale twin tests host-dependent (r5 item 1; first mitigated
#      by keying the cache dir on the CPU-feature fingerprint).
#   2. A reproducible SIGSEGV in LoadedExecutable.serialize() (the C++
#      half of jax's put_executable_and_time) when a cache write happens
#      late in the suite (~300 tests / hundreds of live executables in
#      the process): 2/2 full-suite runs crashed at the same
#      test_scan_loop compile; the same test + module pass in isolation
#      with writes enabled, and no prefix half reproduces it — the
#      serialize crash needs the accumulated process state.  A segfault
#      kills the whole run, so the suite takes cold compiles instead
#      (a one-shot run pays ~nothing: /tmp is wiped between rounds).
jax.config.update("jax_enable_compilation_cache", False)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.default_backend()}")
assert jax.device_count() >= 8, "xla_force_host_platform_device_count lost"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    XLA:CPU keeps every jitted executable's JIT-code mappings alive for
    the process lifetime; over the full ~430-test suite the process
    accumulates enough mappings that a LATE big compile (or executable
    serialization) segfaults inside XLA (observed 3/3 full-suite runs:
    twice at a test_scan_loop cache write, once — with the persistent
    cache disabled — inside backend_compile_and_load during the
    full-scale FLYP twin; every module passes in isolation).  Dropping
    the jit caches after each module bounds the live-executable count;
    cross-module recompiles are cheap relative to the suite.
    """
    yield
    import jax as _jax

    _jax.clear_caches()
