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
jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
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
