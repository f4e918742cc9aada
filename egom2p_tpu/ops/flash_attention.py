"""Fused (flash) attention for key-padding masks on TPU.

The reference materializes O(N^2) fp32 attention with additive masks
(reference: egom2p/models/egom2p_utils.py:190-199); at the generation-time
encoder lengths (10k+ tokens) that costs ~10 GB of HBM traffic per layer.
This wrapper routes the two mask shapes that dominate EgoM2P --- no mask, and
"blocked padding keys" (B, 1, M) --- onto the Pallas TPU flash-attention
kernel using segment ids, with sequence padding to the kernel's block sizes.

The structured decoder self-attention mask reduces to same-segment ids
(ops/attention.py:SegmentMask) and routes through `segment_flash_attention`
here — or, at head_dim 64, onto the custom kernels in ops/flash64.py
(inference) and ops/flash64_train.py (training).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


@functools.lru_cache()
def _flash_imports():
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes, SegmentIds, flash_attention)
    return flash_attention, SegmentIds, BlockSizes


def _pad_to(x, n, axis):
    pad = n - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


_FLASH_DISABLED = False


def disable_flash(disabled: bool = True) -> None:
    """Force the dense/XLA attention path even on TPU.  Needed under
    tensor parallelism: GSPMD cannot partition a Pallas custom call, so a
    model-axis-sharded train step must trace without the flash kernels
    (jit_train_step(tp=True) callers set this before tracing)."""
    global _FLASH_DISABLED
    _FLASH_DISABLED = disabled


def flash_backend_available() -> bool:
    """Raw accelerator check, ignoring disable_flash().  Used by the
    tensor-parallel routing: TP disables the GSPMD flash path (custom calls
    aren't partitionable) but the shard_map-wrapped flash64 kernels remain
    eligible whenever the backend itself can run Pallas."""
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def supports_flash() -> bool:
    if _FLASH_DISABLED:
        return False
    return flash_backend_available()


def _default_block() -> int:
    # Tunable without code changes for kernel A/B runs (e.g. bench sweeps).
    # 0 = adaptive (see _choose_pad_block).
    import os
    return int(os.environ.get("EGOM2P_FLASH_BLOCK", "0"))


def _choose_pad_block(n: int, block: int):
    """(padded_n, block) for one sequence axis.

    Measured on v5e (3-step ROAR chain, N in 3.5k-9k): 1024-token blocks run
    the kernel ~8% faster than 512, 256 is ~40% slower.  Padding however costs
    linearly (and quadratically for self-attention), so 1024 is only chosen
    when the extra padding it needs stays under ~4% — e.g. 6912->7168 wins,
    8704->9216 loses."""
    if block:  # explicit override
        return n + (-n % block), block
    p512 = n + (-n % 512)
    p1024 = n + (-n % 1024)
    if p1024 <= p512 * 1.04:
        return p1024, 1024
    return p512, 512


def segment_flash_attention(
    q: jnp.ndarray,  # (B, H, N, hd)
    k: jnp.ndarray,
    v: jnp.ndarray,
    segments: jnp.ndarray,  # (B, N) int32; attend only within equal ids
    block: int = 0,
) -> jnp.ndarray:
    """Self-attention restricted to equal segment ids (flash kernel)."""
    flash_attention, SegmentIds, BlockSizes = _flash_imports()
    B, H, N, hd = q.shape
    Np, block = _choose_pad_block(N, block or _default_block())
    n_pad = Np - N
    qp, kp, vp = (_pad_to(t, Np, 2) for t in (q, k, v))
    seg = segments.astype(jnp.int32)
    if n_pad:
        # padded slots get a segment no real token uses
        pad_seg = jnp.full((B, n_pad), jnp.iinfo(jnp.int32).max, jnp.int32)
        seg = jnp.concatenate([seg, pad_seg], axis=1)
    # Backward (dkv/dq) blocks stay at <=512: the bwd kernels carry ~2x the
    # VMEM working set and exceed the 16MB scoped limit at 1024-token blocks.
    bb = min(512, Np)
    bf = min(block, Np)
    bs = BlockSizes(
        block_q=bf, block_k_major=bf,
        block_k=bf, block_b=1,
        block_q_major_dkv=bb, block_k_major_dkv=bb,
        block_k_dkv=bb, block_q_dkv=bb,
        block_k_major_dq=bb, block_k_dq=bb,
        block_q_dq=bb,
    )
    out = flash_attention(qp, kp, vp,
                          segment_ids=SegmentIds(q=seg, kv=seg),
                          sm_scale=hd ** -0.5, block_sizes=bs)
    return out[:, :, :N].astype(q.dtype)


def padding_flash_attention(
    q: jnp.ndarray,  # (B, H, N, hd)
    k: jnp.ndarray,  # (B, H, M, hd)
    v: jnp.ndarray,  # (B, H, M, hd)
    kv_blocked: Optional[jnp.ndarray],  # (B, M) bool, True = blocked key
    block: int = 0,
) -> jnp.ndarray:
    """Flash attention where masking is pure key padding.

    Fully-blocked rows return exactly 0, matching
    egom2p_tpu.ops.attention.masked_attention's empty-conditioning semantics.
    """
    flash_attention, SegmentIds, BlockSizes = _flash_imports()
    B, H, N, hd = q.shape
    M = k.shape[2]
    override = block or _default_block()
    Np, block_q = _choose_pad_block(N, override)
    Mp, block_kv = _choose_pad_block(M, override)
    n_pad, m_pad = Np - N, Mp - M

    qp = _pad_to(q, Np, 2)
    kp = _pad_to(k, Mp, 2)
    vp = _pad_to(v, Mp, 2)

    q_seg = jnp.zeros((B, Np), jnp.int32)
    if kv_blocked is None:
        kv_seg = jnp.zeros((B, Mp), jnp.int32)
        if m_pad:
            kv_seg = kv_seg.at[:, M:].set(1)
    else:
        kv_seg = _pad_to(kv_blocked.astype(jnp.int32), Mp, 1)
        if m_pad:
            kv_seg = kv_seg.at[:, M:].set(1)

    bq, bk = min(block_q, Np), min(block_kv, Mp)
    # Backward blocks capped at 512 (bwd kernels VMEM-OOM at 1024; see
    # segment_flash_attention).
    bqb, bkb = min(512, Np), min(512, Mp)
    bs = BlockSizes(
        block_q=bq, block_k_major=bk,
        block_k=bk, block_b=1,
        block_q_major_dkv=bqb, block_k_major_dkv=bkb,
        block_k_dkv=bkb, block_q_dkv=bqb,
        block_k_major_dq=bkb, block_k_dq=bkb,
        block_q_dq=bqb,
    )
    out = flash_attention(
        qp, kp, vp, segment_ids=SegmentIds(q=q_seg, kv=kv_seg),
        sm_scale=hd ** -0.5, block_sizes=bs)
    out = out[:, :, :N]
    if kv_blocked is not None:
        # flash emits 0/garbage-safe but not guaranteed-zero rows when every
        # key is excluded; enforce the zero-output convention explicitly.
        fully_blocked = kv_blocked.all(axis=-1)  # (B,)
        out = jnp.where(fully_blocked[:, None, None, None], 0.0, out)
    return out.astype(q.dtype)
