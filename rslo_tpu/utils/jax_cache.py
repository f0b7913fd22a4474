"""Enable JAX's persistent compilation cache (huge win on repeated runs:
first XLA compile of e.g. batched SVD takes tens of seconds on this host).

Import for side effect, or call :func:`enable` explicitly with a dir.
"""
from __future__ import annotations

import os


def enable(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "RSLO_TPU_JAX_CACHE", os.path.expanduser("~/.cache/rslo_tpu_jax"))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


enable()
