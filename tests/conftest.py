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

jax.config.update("jax_compilation_cache_dir", "/tmp/swat_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
