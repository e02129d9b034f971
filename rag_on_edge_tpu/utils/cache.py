"""Persistent executable cache.

The TPU analog of the reference's compiled-model caching: QNN context
binaries are generated once and reloaded from disk on every subsequent run
(``deploy.sh:200-232``, regenerated only if missing —
``run_all_ivf.sh:72-94``).  Here the compiled units are XLA executables;
JAX's persistent compilation cache plays the context-binary role.
"""

from __future__ import annotations

import os

import jax

__all__ = ["enable_compilation_cache"]

DEFAULT_CACHE_DIR = os.environ.get(
    "RAG_EDGE_TPU_COMPILE_CACHE",
    os.path.join(os.path.dirname(__file__), "..", "..", "data", "jax_cache"),
)


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Enable JAX's persistent compilation cache (idempotent)."""
    cache_dir = os.path.abspath(cache_dir or DEFAULT_CACHE_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return cache_dir
