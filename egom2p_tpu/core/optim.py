"""Optimizer factory (optax).

Equivalent of the reference's timm-style create_optimizer
(reference: egom2p/utils/optim_factory.py:98-200): AdamW with weight decay
disabled for norms, biases and other 1D parameters, global-norm gradient
clipping, and a step-indexed LR schedule.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import optax


def _no_decay(path, value) -> bool:
    """Match the reference skip rule: norm params, biases, 1D tensors,
    modality / mask / register embeddings (reference: optim_factory.py:113-115)."""
    name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
    if value.ndim <= 1:
        return True
    if "norm" in name or name.endswith("bias"):
        return True
    if "mod_emb" in name or "mask_token" in name or "register_tokens" in name:
        return True
    return False


def make_decay_mask(params):
    import jax
    return jax.tree_util.tree_map_with_path(
        lambda path, v: not _no_decay(path, v), params)


def create_optimizer(params, lr_schedule, weight_decay: float = 0.05,
                     betas=(0.9, 0.95), eps: float = 1e-8,
                     clip_grad: Optional[float] = 1.0) -> optax.GradientTransformation:
    """AdamW with decay masking + optional grad clipping.

    `lr_schedule` is an optax schedule (see
    egom2p_tpu.core.schedules.as_optax_schedule)."""
    mask = make_decay_mask(params)
    txs = []
    if clip_grad is not None and clip_grad > 0:
        txs.append(optax.clip_by_global_norm(clip_grad))
    txs.append(optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps))
    if weight_decay > 0:
        txs.append(optax.add_decayed_weights(weight_decay, mask=mask))
    txs.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*txs)
