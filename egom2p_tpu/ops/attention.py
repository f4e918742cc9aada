"""Masked dense attention for TPU.

The reference materializes O(N^2) attention with additive boolean masks
(reference: egom2p/models/egom2p_utils.py:185-205).  Sequence lengths here are
fixed and small (<= 4096), so the TPU-optimal form is a dense einsum that maps
straight onto the MXU in bf16 with an fp32 softmax.  The mask convention
matches the reference: ``True`` means *blocked*.

`masked_attention` is the single entry point used by both self- and
cross-attention; a fused Pallas flash kernel can be swapped in behind the same
signature (see egom2p_tpu/ops/flash_attention.py).
"""
from __future__ import annotations

import contextlib
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # large negative instead of finfo.min: safe under bf16->fp32 casts

# ---------------------------------------------------------- inference mode
# Generation wraps its jitted step functions in `inference_attention()` so
# traced graphs route eligible attention onto the forward-only flash64
# kernel (ops/flash64.py). Training traces (outside the context) route onto
# the differentiable flash64_train kernels (ops/flash64_train.py); either
# hd-64 path falls back to the stock kernels when its env switch is off.
_INFERENCE_ATTN = False


@contextlib.contextmanager
def inference_attention():
    global _INFERENCE_ATTN
    prev = _INFERENCE_ATTN
    _INFERENCE_ATTN = True
    try:
        yield
    finally:
        _INFERENCE_ATTN = prev


def inference_attention_active() -> bool:
    if os.environ.get("EGOM2P_FLASH64", "1") == "0":  # A/B kill switch
        return False
    return _INFERENCE_ATTN


def generation_trace_active() -> bool:
    """Raw inference-context flag, ignoring the EGOM2P_FLASH64 env switch.

    Routing must distinguish "we are tracing generation" (training kernels
    are never eligible, whatever the env says) from "the inference flash64
    kernel is enabled" — with EGOM2P_FLASH64=0 a generation trace has to
    fall back to the STOCK path, not to the training kernel."""
    return _INFERENCE_ATTN


# ------------------------------------------------------- tensor parallelism
# GSPMD cannot partition a Pallas custom call, so under --tensor_parallel
# the auto-sharded flash path is disabled (flash_attention.disable_flash).
# Attention is head-parallel, though — each head attends independently — so
# the hd-64 kernels still apply per model-axis shard with NO collectives:
# the trainer registers the mesh here and models/transformer.py:_try_flash64
# wraps the kernel call in a shard_map over (batch axes, model axis).
_TP_FLASH_MESH = None


def set_tp_flash_mesh(mesh) -> None:
    """Register the TP mesh so attention routes flash64 through shard_map
    (pass None to clear).  Callers still call disable_flash() so that the
    stock GSPMD-traced kernels stay off."""
    global _TP_FLASH_MESH
    _TP_FLASH_MESH = mesh


def tp_flash_mesh():
    if os.environ.get("EGOM2P_TP_FLASH", "1") == "0":  # A/B kill switch
        return None
    return _TP_FLASH_MESH


def key_padding_mask(mask) -> "tuple[bool, Optional[jnp.ndarray]]":
    """(is_key_padding, (B, M) blocked-bool or None) for a module-level mask."""
    if mask is None or isinstance(mask, SegmentMask):
        return mask is None, None
    if mask.ndim == 3 and mask.shape[1] == 1:
        return True, mask[:, 0]
    if mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1:
        return True, mask[:, 0, 0]
    return False, None


class SegmentMask(NamedTuple):
    """Self-attention restricted to equal segment ids (B, N).

    The EgoM2P decoder's training mask for image-type modalities reduces
    exactly to this: with decoder_sep_mask=True the cumsum component is
    subsumed by the modality separation (every token's budget window covers
    its own contiguous modality block), so attention is "same modality only"
    (reference semantics: egom2p_model.py:446-481 + masking.py:262-264).
    Padding tokens carry a dedicated segment and are ignored downstream.
    """
    segments: jnp.ndarray  # (B, N) int32


def masked_attention(
    q: jnp.ndarray,  # (B, H, N, hd)
    k: jnp.ndarray,  # (B, H, M, hd)
    v: jnp.ndarray,  # (B, H, M, hd)
    mask: Optional[jnp.ndarray] = None,  # broadcastable to (B, H, N, M); True = blocked
    *,
    softmax1: bool = False,
) -> jnp.ndarray:
    """Returns (B, H, N, hd).

    Key-padding masks (and no-mask) and SegmentMask self-attention route to
    the fused Pallas flash kernel on TPU; other structured (B, M, M) masks use
    the dense einsum path."""
    if isinstance(mask, SegmentMask):
        from egom2p_tpu.ops.flash_attention import (segment_flash_attention,
                                                    supports_flash)
        if not softmax1 and supports_flash() and q.shape[2] * k.shape[2] >= 256 * 256:
            return segment_flash_attention(q, k, v, mask.segments)
        # dense fallback: blocked where segments differ
        seg = mask.segments
        mask = (seg[:, None, :] != seg[:, :, None])[:, None]
    if not softmax1:
        is_key_padding = mask is None or (
            mask.ndim == 4 and mask.shape[1] == 1 and mask.shape[2] == 1)
        if is_key_padding:
            from egom2p_tpu.ops.flash_attention import (padding_flash_attention,
                                                        supports_flash)
            if supports_flash() and q.shape[2] * k.shape[2] >= 256 * 256:
                kv_blocked = None if mask is None else mask[:, 0, 0, :]
                return padding_flash_attention(q, k, v, kv_blocked)
    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        logits = jnp.where(mask, _NEG_INF, logits)
    if softmax1:
        # off-by-one softmax: allows attending to "nothing"
        # (reference: egom2p_utils.py:28-30)
        m = jnp.maximum(jax.lax.stop_gradient(logits.max(axis=-1, keepdims=True)), 0.0)
        unnorm = jnp.exp(logits - m)
        denom = unnorm.sum(axis=-1, keepdims=True) + jnp.exp(-m)
        weights = unnorm / denom
    else:
        weights = jax.nn.softmax(logits, axis=-1)
    weights = weights.astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", weights, v)
    if mask is not None:
        # A fully-blocked query row contributes zero, matching the reference's
        # behavior when e.g. classifier-free guidance empties all conditioning
        # and the encoder sequence is effectively length 0
        # (reference: generate.py:407-444 with num_encoder_tokens == 0).
        fully_blocked = jnp.broadcast_to(mask, logits.shape).all(axis=-1)
        out = jnp.where(fully_blocked[..., None], 0.0, out)
    return out
