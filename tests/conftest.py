"""Test configuration: force CPU with 8 virtual devices so multi-chip sharding
logic is exercised without TPU hardware (JAX's "fake cluster"; see SURVEY.md §4).

Note: this environment's sitecustomize force-registers a remote-TPU PJRT
backend and overrides jax_platforms at interpreter start, so we must override
the *config* after importing jax — env vars alone are not enough.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: the suite is compile-dominated (tiny
# shapes, many jit paths), so repeat runs skip straight to execution.
#
# The cache dir is keyed per machine type (see core/cache.py:host_fingerprint):
# XLA:CPU AOT entries refuse to load on a host with different CPU features,
# and a stale shared dir then forces a full recompile on EVERY run.
from egom2p_tpu.core.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.environ.get("EGOM2P_TEST_JAX_CACHE",
                                       "/root/.jax_cache_tests"),
                        per_machine=True)
