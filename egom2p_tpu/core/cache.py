"""Persistent XLA compilation cache.

The development/serving environment reaches the TPU through an RPC relay whose
remote compiles are slow (minutes) and occasionally flaky; the on-disk
compilation cache makes every shape compile exactly once per machine.
"""
from __future__ import annotations

import os


def enable_persistent_cache(path: str = None) -> None:
    import jax

    path = path or os.environ.get("EGOM2P_JAX_CACHE", "/root/.jax_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
