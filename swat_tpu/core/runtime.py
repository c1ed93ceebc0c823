"""Process-level JAX runtime setup shared by every CLI entry point.

Compiles over the tunneled TPU cost 1.5-10 minutes; the persistent
compilation cache turns repeat CLI invocations (the shell-harness loops,
scripts/run_dataset_seed_*.sh) into cache hits.
"""

from __future__ import annotations

import os

_DEFAULT_CACHE = "/tmp/swat_jax_cache"


def setup_jax(cache_dir: str | None = None) -> None:
    """Idempotent: enable the persistent compilation cache."""
    import jax

    path = cache_dir or os.environ.get("SWAT_JAX_CACHE", _DEFAULT_CACHE)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # config already frozen by an embedding process
