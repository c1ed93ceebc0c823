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

# Key the persistent compile cache by the host's CPU feature set: XLA:CPU
# codegen (and thus fp32 reduction rounding) depends on the machine, and
# a cache populated on host A is AOT-loaded on host B with a "machine
# type doesn't match" warning — observed to flip rounding-zero gradient
# signs and make the full-scale twin tests host-dependent (r5 item 1).
import hashlib

try:
    with open("/proc/cpuinfo") as _f:
        _cpu_key = hashlib.md5(
            next((l for l in _f if l.startswith("flags")), "").encode()
        ).hexdigest()[:8]
except OSError:
    _cpu_key = "nocpuinfo"
jax.config.update("jax_compilation_cache_dir",
                  f"/tmp/swat_jax_cache_{_cpu_key}")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

assert jax.default_backend() == "cpu", (
    "tests must run on the virtual CPU mesh, got "
    f"{jax.default_backend()}")
assert jax.device_count() >= 8, "xla_force_host_platform_device_count lost"

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
