"""Persistent XLA compilation cache.

The development/serving environment reaches the TPU through an RPC relay whose
remote compiles are slow (minutes) and occasionally flaky; the on-disk
compilation cache makes every shape compile exactly once per machine.
"""
from __future__ import annotations

import os


def host_fingerprint() -> str:
    """Short hash of the host CPU feature set.

    XLA:CPU AOT cache entries embed the compile machine's features and refuse
    to load on a host missing any ("Target machine feature ... is not
    supported"); when a dev VM migrates between machine types, a shared cache
    dir would fail-to-load (and never overwrite) on every run.  Keying the
    dir by this fingerprint gives each machine type its own cache."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            lines = f.read().splitlines()
        # flags AND model name: XLA:CPU AOT entries also embed LLVM *tuning*
        # features (+prefer-no-scatter/-gather) chosen from the CPU model,
        # which can differ between hosts with identical flag sets
        keys = ("flags", "model name")
        flags = "\n".join(next((l for l in lines if l.startswith(k)), "")
                          for k in keys) or platform.machine()
    except OSError:  # pragma: no cover - non-Linux
        flags = platform.machine()
    return hashlib.md5(flags.encode()).hexdigest()[:10]


def enable_persistent_cache(path: str = None, per_machine: bool = False) -> None:
    import jax

    path = path or os.environ.get("EGOM2P_JAX_CACHE", "/root/.jax_cache")
    if per_machine:
        path = os.path.join(path, host_fingerprint())
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
