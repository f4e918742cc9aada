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
    explicit = (
        coordinator_address is not None
        or os.environ.get("COORDINATOR_ADDRESS")
        or int(os.environ.get("EGOM2P_NUM_PROCESSES", "1")) > 1
    )
    # TPU pod VMs carry the full host list in the runtime metadata; a no-arg
    # initialize() auto-discovers coordinator + rank there (the launcher,
    # train_scripts/launch_tpu_pod.sh, runs one identical process per host)
    on_pod = "," in os.environ.get("TPU_WORKER_HOSTNAMES", "")
    if explicit:
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
    elif on_pod:
        jax.distributed.initialize()
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def is_main_process() -> bool:
    return jax.process_index() == 0


def barrier(name: str, timeout_ms: int = 900_000) -> None:
    """Host-level rendezvous through the coordination service (KV store /
    barrier RPC) — NO device collectives, so it is safe before the backend
    collective context (Gloo on CPU fake clusters, ICI on pods) exists.

    Use before the first jitted collective when processes may arrive far
    apart (e.g. one host compiles cold while another hits the persistent
    cache): Gloo's context bootstrap gives peers only ~30s to show up, so
    compile AOT first, barrier here, then execute."""
    if jax.process_count() == 1:
        return
    from jax._src import distributed as _dist
    client = _dist.global_state.client
    assert client is not None, "jax.distributed not initialized"
    try:
        client.wait_at_barrier(f"egom2p_{name}", timeout_in_ms=timeout_ms)
    except AttributeError:  # older jaxlib: emulate with the KV store
        me = jax.process_index()
        client.key_value_set(f"egom2p_b/{name}/{me}", "1")
        for p in range(jax.process_count()):
            client.blocking_key_value_get(f"egom2p_b/{name}/{p}", timeout_ms)


# ------------------------------------------------------- batch assembly
def _local_row_span(sharding, global_rows: int) -> tuple:
    """Contiguous [lo, hi) of leading-dim rows owned by this process'
    devices under `sharding`.  Asserts contiguity (true for the standard
    process-ordered device enumeration TPU pods use)."""
    idx_map = sharding.addressable_devices_indices_map((global_rows,))
    rows = sorted({r for (sl,) in idx_map.values()
                   for r in range(*sl.indices(global_rows))})
    lo, hi = rows[0], rows[-1] + 1
    assert rows == list(range(lo, hi)), (
        "non-contiguous local batch rows — per-process loading needs a "
        "process-contiguous device order in the mesh")
    return lo, hi


def global_batch_from_local(mesh, batch: dict, spec=None):
    """Assemble per-process LOCAL batches into global jax.Arrays.

    Each host loads `local_rows = global_rows / process_span` samples (its
    own shard stream — reference: unified_datasets.py:392 per-rank wds
    splitting); this stitches them into a global batch-sharded array with
    jax.make_array_from_process_local_data.  Single-process: pass-through
    (the jit's in_shardings handles placement with zero extra copies)."""
    if jax.process_count() == 1:
        return batch
    from egom2p_tpu.core.mesh import (BATCH_SPEC, local_num_data_shards,
                                      num_data_shards)
    from jax.sharding import NamedSharding
    spec = BATCH_SPEC if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    factor = num_data_shards(mesh) // local_num_data_shards(mesh)

    def leaf(x):
        x = np.asarray(x)
        gshape = (x.shape[0] * factor,) + x.shape[1:]
        return jax.make_array_from_process_local_data(sharding, x, gshape)

    import jax.tree_util as jtu
    return jtu.tree_map(leaf, batch)


def global_batch_from_replicated(mesh, batch: dict, spec=None):
    """Assemble a global batch every host loaded IDENTICALLY (validation
    streams read un-split so all hosts agree on batch count — required:
    a host that exhausts its shards early would deadlock the others inside
    the per-batch assembly collective).  Each host slices out its local
    rows, then defers to the same process-local assembly."""
    if jax.process_count() == 1:
        return batch
    from egom2p_tpu.core.mesh import BATCH_SPEC
    from jax.sharding import NamedSharding
    import jax.tree_util as jtu
    spec = BATCH_SPEC if spec is None else spec
    sharding = NamedSharding(mesh, spec)
    rows = jtu.tree_leaves(batch)[0].shape[0]
    lo, hi = _local_row_span(sharding, rows)
    local = jtu.tree_map(lambda x: np.asarray(x)[lo:hi], batch)
    return global_batch_from_local(mesh, local, spec)


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
