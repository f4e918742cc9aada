"""Device-mesh setup for EgoM2P-TPU.

The reference trains with plain NCCL data parallelism over 256 GPUs
(reference: egom2p/utils/dist.py:78, run_training_egom2p.py:514).  The
TPU-native equivalent is a 2D ``(replica, data)`` jax.sharding.Mesh where the
``data`` axis maps over ICI within a slice and the ``replica`` axis maps over
DCN across slices.  DDP gradient all-reduce becomes an XLA-fused psum implied
by batch-axis sharding under jit.

A ``model`` axis is kept in the mesh signature (size 1 by default) so tensor
parallelism can be turned on later without changing any call sites.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# Canonical axis names used across the framework.
AXIS_REPLICA = "replica"  # across slices / hosts (DCN)
AXIS_DATA = "data"        # within-slice data parallelism (ICI)
AXIS_MODEL = "model"      # reserved for tensor parallelism

# Shorthand for "the batch is sharded over every data-parallel axis".
BATCH_SPEC = P((AXIS_REPLICA, AXIS_DATA))
REPLICATED_SPEC = P()


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Logical mesh sizes. ``data=-1`` means "all remaining devices"."""
    replica: int = 1
    data: int = -1
    model: int = 1


def make_mesh(cfg: MeshConfig = MeshConfig(), devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build the global device mesh.

    Single-chip (the common dev setup) degenerates to a 1x1x1 mesh and all
    sharding specs become no-ops, so the same jitted train step runs anywhere.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    replica, data, model = cfg.replica, cfg.data, cfg.model
    if data == -1:
        assert n % (replica * model) == 0, (n, replica, model)
        data = n // (replica * model)
    assert replica * data * model == n, f"mesh {replica}x{data}x{model} != {n} devices"
    dev_array = np.asarray(devices).reshape(replica, data, model)
    return Mesh(dev_array, (AXIS_REPLICA, AXIS_DATA, AXIS_MODEL))


def local_mesh() -> Mesh:
    """Mesh over this process' devices only (tests, single-host tools)."""
    return make_mesh(MeshConfig(), jax.local_devices())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, BATCH_SPEC)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, REPLICATED_SPEC)


def num_data_shards(mesh: Mesh) -> int:
    return mesh.shape[AXIS_REPLICA] * mesh.shape[AXIS_DATA]


def local_num_data_shards(mesh: Mesh) -> int:
    """Number of batch shards owned by THIS process.

    Multi-host data loading is per-process (the reference shards its wds
    shard lists per rank, egom2p/data/unified_datasets.py:392): each host
    loads `batch_size * local_num_data_shards` samples and the global batch
    is assembled with jax.make_array_from_process_local_data (see
    egom2p_tpu.core.distributed.global_batch_from_local).  Devices along the
    model axis replicate the same batch rows, so they don't multiply the
    per-process shard count."""
    n_local = len([d for d in mesh.devices.flat
                   if d.process_index == jax.process_index()])
    model = mesh.shape.get(AXIS_MODEL, 1)
    assert n_local % model == 0, (n_local, model)
    return n_local // model
