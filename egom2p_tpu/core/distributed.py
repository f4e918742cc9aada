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


def all_reduce_metrics(metrics: dict, mesh=None, force: bool = False) -> dict:
    """Cross-host mean of host-side scalar metrics (reference's MetricLogger
    all_reduce, egom2p/utils/logger.py:52-63).

    Each process contributes its local value once; the result is the mean
    over processes.  Implemented as a shard_map psum over a 1-D mesh of all
    devices: every process places its scalar vector on its first local
    device, the vectors are summed with `lax.psum`, and the sum is divided by
    the *process* count (each process replicates its value onto its local
    devices, so the device-sum equals sum-over-processes × local_device_count,
    which the normalization folds in)."""
    keys = list(metrics)
    if not keys:
        return {}
    if jax.process_count() == 1 and not force:
        return {k: float(v) for k, v in metrics.items()}
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = mesh if mesh is not None else Mesh(devices, ("d",))
    axes = tuple(mesh.axis_names)
    local = jnp.asarray([float(metrics[k]) for k in keys], dtype=jnp.float32)
    # Replicate the local vector across this process's addressable devices,
    # then view the stack as fully sharded over the mesh: a psum over it sums
    # every process's contribution local_device_count times.
    n_local = len([d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])
    stacked = jnp.tile(local[None], (n_local, 1))
    sharding = NamedSharding(mesh, P(axes))
    flat_shape = (int(np.prod(mesh.devices.shape)), len(keys))
    garr = jax.make_array_from_process_local_data(
        sharding, np.asarray(stacked, dtype=np.float32), flat_shape)

    # one compiled reducer per (mesh, vector length): a fresh closure every
    # call would retrace at every logging step
    cache_key = (mesh, len(keys), n_local)
    fn = _REDUCER_CACHE.get(cache_key)
    if fn is None:
        @jax.jit
        def mean_over_processes(x):
            def inner(v):
                total = jax.lax.psum(v, axes)
                return total / (jax.process_count() * n_local)
            return shard_map(inner, mesh=mesh, in_specs=P(axes),
                             out_specs=P(axes))(x)

        fn = _REDUCER_CACHE[cache_key] = mean_over_processes

    out = np.asarray(jax.device_get(fn(garr).addressable_shards[0].data))
    return dict(zip(keys, out.reshape(-1, len(keys))[0].tolist()))


_REDUCER_CACHE: dict = {}
