"""Runtime environment helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable JAX's persistent compilation cache so repeated runs (tests,
    CLIs, benchmarks) skip recompiles.  Safe to call multiple times."""
    import jax

    cache_dir = path or os.environ.get(
        "NOPE_TPU_COMPILE_CACHE", os.path.expanduser("~/.cache/nope_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
