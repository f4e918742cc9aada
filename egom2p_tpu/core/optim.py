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
    """Match the reference skip rule: ONLY norm params and biases go
    undecayed (reference: optim_factory.py:113-115 — "Only norm and bias
    terms should have no decay"; the model's no_weight_decay() sets are all
    empty, so mod_emb / mask_token / register_tokens ARE decayed)."""
    name = "/".join(str(p.key) if hasattr(p, "key") else str(p) for p in path)
    if value.ndim <= 1:  # biases + norm scales (1D, like the pre-FSDP rule)
        return True
    return "norm" in name or name.endswith("bias")


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


def shared_params_mask(params):
    """True for the shared transformer trunk (encoder/decoder blocks and
    final norms) -- exactly the set the reference freezes during warm-start
    phases (reference: egom2p_model.py:805-807, freeze_shared_params ->
    freeze_encoder/decoder(freeze_embeddings=False); decoder_proj_context
    is a model-level Linear outside those sets and stays trainable)."""
    import jax
    import re

    def is_shared(path, _):
        name = str(path[1].key) if len(path) > 1 else ""
        return bool(re.fullmatch(
            r"(encoder|decoder)_\d+|encoder_norm|decoder_norm", name))

    return jax.tree_util.tree_map_with_path(is_shared, params)


def freeze_until(frozen_steps: int, frozen_mask,
                 inner: optax.GradientTransformation
                 ) -> optax.GradientTransformation:
    """Freeze masked params while step < frozen_steps, wrapping `inner`
    (reference frozen-model phases: run_training_egom2p.py:686-693).

    Matches the reference's requires_grad=False semantics: masked GRADIENTS
    are zeroed BEFORE `inner`, so global-norm clipping sees only trainable
    gradients and Adam moments stay at init for frozen params — and masked
    UPDATES are zeroed AFTER `inner`, so weight decay does not move frozen
    params either (the reference never even adds them to the optimizer)."""
    import jax
    import jax.numpy as jnp

    def init_fn(params):
        return (jnp.zeros([], jnp.int32), inner.init(params))

    def update_fn(updates, state, params=None):
        count, inner_state = state
        keep = (count >= frozen_steps).astype(jnp.float32)

        def gate(tree):
            return jax.tree_util.tree_map(
                lambda u, frozen: u * keep if frozen else u, tree,
                frozen_mask)

        new_updates, new_inner = inner.update(gate(updates), inner_state,
                                              params)
        return gate(new_updates), (count + 1, new_inner)

    return optax.GradientTransformation(init_fn, update_fn)


def freeze_modules_mask(params, module_names=("encoder", "quant_proj")):
    """True for params under the given top-level module names — the
    reference's FREEZE_MODULES encoder freeze for VQ-VAE finetuning
    (reference: egom2p/vq/vqvae.py:32, 200-223)."""
    import jax

    def is_frozen(path, _):
        for seg in path:
            name = getattr(seg, "key", None)
            if name in module_names:
                return True
        return False

    return jax.tree_util.tree_map_with_path(is_frozen, params)


def freeze_masked(frozen_mask) -> optax.GradientTransformation:
    """Permanently zero updates for masked params (freeze_enc semantics)."""
    import jax

    def init_fn(params):
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        new = jax.tree_util.tree_map(
            lambda u, frozen: u * 0.0 if frozen else u, updates, frozen_mask)
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)
