"""Checkpoint save/load (Orbax).

TPU-native equivalent of the reference checkpoint utilities
(reference: egom2p/utils/checkpoint.py:91-157): periodic `checkpoint-{N}`
directories plus a `checkpoint-final`, and auto-resume that scans for the
latest epoch.  Torch `.pth` interop lives in egom2p_tpu/compat/torch_convert.py.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_path(output_dir: str, tag) -> str:
    return os.path.join(os.path.abspath(output_dir), f"checkpoint-{tag}")


# One process-wide async checkpointer so at most one save is in flight;
# a second async save (or wait_for_saves) joins the previous one first.
_ASYNC_CKPTR: Optional[ocp.AsyncCheckpointer] = None


def _async_ckptr() -> ocp.AsyncCheckpointer:
    global _ASYNC_CKPTR
    if _ASYNC_CKPTR is None:
        _ASYNC_CKPTR = ocp.AsyncCheckpointer(
            ocp.StandardCheckpointHandler())
    return _ASYNC_CKPTR


def save_checkpoint(output_dir: str, tag, state: Any,
                    blocking: bool = True) -> str:
    """Save a pytree under output_dir/checkpoint-{tag} (rank-0 only in
    multiprocess settings; orbax coordinates internally).

    With blocking=False the device->host copy happens now but the disk
    write runs on a background thread, overlapping the next training
    steps (the reference's torch.save blocks the loop for the full write,
    reference: egom2p/utils/checkpoint.py:91-120).  Call wait_for_saves()
    before relying on the file (and before process exit)."""
    path = _ckpt_path(output_dir, tag)
    if blocking:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(path, state, force=True)
        ckptr.wait_until_finished()
    else:
        ckptr = _async_ckptr()
        ckptr.save(path, args=ocp.args.StandardSave(state), force=True)
    return path


def wait_for_saves() -> None:
    """Block until any in-flight async save has committed to disk."""
    if _ASYNC_CKPTR is not None:
        _ASYNC_CKPTR.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a checkpoint.

    With `target`, restores onto the target's shardings (same-topology
    resume).  Without, restores as host numpy so checkpoints move freely
    between topologies (TPU pod -> single chip -> CPU)."""
    path = os.path.abspath(path)
    if target is not None:
        return ocp.StandardCheckpointer().restore(path, target=target)
    import jax
    import numpy as np
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path)
    tree = getattr(meta, "item_metadata", meta)
    tree = getattr(tree, "tree", tree)
    # true host-numpy restore: a pod-sized TrainState must not be forced
    # into one chip's HBM just to be inspected/converted
    restore_args = jax.tree_util.tree_map(
        lambda m: ocp.RestoreArgs(restore_type=np.ndarray), tree)
    return ckptr.restore(path, restore_args=restore_args)


def latest_checkpoint(output_dir: str) -> Optional[str]:
    """Find the checkpoint-{N} with the largest N
    (reference: checkpoint.py:126-136)."""
    candidates = glob.glob(_ckpt_path(output_dir, "*"))
    best, best_n = None, -1
    for c in candidates:
        m = re.search(r"checkpoint-(\d+)$", c)
        if m and int(m.group(1)) > best_n:
            best, best_n = c, int(m.group(1))
    if best is None and os.path.isdir(_ckpt_path(output_dir, "final")):
        best = _ckpt_path(output_dir, "final")
    return best


def auto_load_model(output_dir: str, target: Optional[Any] = None):
    """Resume-from-latest (reference: checkpoint.py:123-157).  Returns
    (state, path) or (None, None)."""
    path = latest_checkpoint(output_dir)
    if path is None:
        return None, None
    return load_checkpoint(path, target), path


def restore_params(path: str, model=None):
    """Restore just the flax params from an orbax checkpoint directory (a
    `checkpoint-N` dir, or a run dir containing them).  Accepts either a bare
    params tree or a full TrainState-style {'params': ...} pytree."""
    target = path if os.path.basename(path).startswith("checkpoint-") \
        else (latest_checkpoint(path) or path)
    state = load_checkpoint(target)
    if isinstance(state, dict) and "params" in state:
        params = state["params"]
        # TrainState stores the flax variables dict under 'params'
        if isinstance(params, dict) and "params" not in params:
            params = {"params": params}
        return params
    return state
