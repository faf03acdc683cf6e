"""Persistent XLA compilation cache setup.

Compiles through the tunnelled TPU runtime take minutes; caching them on
disk makes every subsequent process start hot. Called by bench.py, the CLI,
and tools. Respects an existing JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_CACHE_DIR = os.path.expanduser("~/.cache/jax_comp_cache")


def enable_compilation_cache(cache_dir: str = None) -> None:
    import jax

    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags
