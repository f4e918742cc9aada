"""VQ-VAE tokenizer training step (cam / gaze / video domains).

Functional TPU version of the reference tokenizer train loop
(reference: run_training_vqvae.py:1076-1419):

  * fp32 params, bf16-free (the released tokenizer configs train fp32,
    reference: cfgs/.../Transformer_cam_traj...yaml `dtype: fp32`),
  * reconstruction losses: mse / mse_mask (mask-weighted for gaze)
    (reference: run_training_vqvae.py:1011-1074),
  * codebook loss from the functional EMA quantizer with psum sync across the
    data mesh axis (reference sync_codebook=True, quantize_lucid.py:91-135),
  * per-step cosine LR schedule handled by optax outside this module.
"""
from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from egom2p_tpu.ops.vq import VQConfig, VQState, vq_forward
from egom2p_tpu.tokenizers.seq_vqvae import SeqAutoencoder


class VQVAETrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    vq_state: VQState
    step: jnp.ndarray
    ema_params: Optional[dict] = None  # reference ModelEma
                                       # (run_training_vqvae.py:715-724)


def reconst_loss(pred, target, loss_fn: str, n_channels: int):
    """(reference: run_training_vqvae.py:1011-1074)."""
    if loss_fn == "mse":
        return jnp.mean((pred - target) ** 2)
    if loss_fn == "mse_mask":
        # gaze: last channel of the target is the validity mask
        data, mask = target[..., :n_channels], target[..., n_channels:]
        se = (pred - data) ** 2 * mask
        return jnp.sum(se) / jnp.maximum(jnp.sum(mask) * n_channels, 1.0)
    raise ValueError(f"unknown loss_fn {loss_fn}")


def _ema_update(ema_params, new_params, step, ema_decay: Optional[float],
                ema_update_freq: int):
    """EMA weight tracking every `ema_update_freq` optimizer steps
    (reference ModelEma, run_training_vqvae.py:715-724, 1245-1247)."""
    if ema_decay is None or ema_params is None:
        return ema_params
    do = (step % ema_update_freq) == 0
    return jax.tree_util.tree_map(
        lambda e, p: jnp.where(do, e * ema_decay + p * (1 - ema_decay), e),
        ema_params, new_params)


def make_vqvae_train_step(module, vq_cfg: VQConfig,
                          optimizer: optax.GradientTransformation,
                          loss_fn: str = "mse",
                          codebook_weight: float = 1.0,
                          axis_name: Optional[str] = None,
                          ema_decay: Optional[float] = None,
                          ema_update_freq: int = 1,
                          percept_loss=None,
                          percept_weight: float = 0.0):
    """Build the jittable train step for any autoencoder exposing
    encode_latents/decode_latents (SeqAutoencoder for cam/gaze,
    VideoAutoencoder for rgb/depth).  If `axis_name` is set the caller is
    expected to run it under shard_map/pmap with that mesh axis; codebook
    statistics are then psum-synced like the reference's distributed EMA.
    `percept_loss(pred, target) -> scalar` is the optional perceptual hook
    (reference: run_training_vqvae.py:144-151, 1228)."""
    n_channels = module.n_channels
    enc_method = type(module).encode_latents
    dec_method = type(module).decode_latents

    def train_step(state: VQVAETrainState, batch: jnp.ndarray, rng: jax.Array):
        def loss_and_aux(params):
            lat = module.apply(params, batch, method=enc_method)
            grid = lat.shape[1:-1]  # video latents come as a (t,h,w) grid
            flat = lat.reshape(lat.shape[0], -1, lat.shape[-1])
            quant, commit, tokens, new_vq = vq_forward(
                vq_cfg, state.vq_state, flat, training=True, rng=rng,
                axis_name=axis_name)
            quant = quant.reshape(lat.shape)
            pred = module.apply(params, quant, method=dec_method)
            rec = reconst_loss(pred, batch, loss_fn, n_channels)
            loss = rec + codebook_weight * commit
            if percept_loss is not None and percept_weight > 0.0:
                loss = loss + percept_weight * percept_loss(pred, batch)
            return loss, (rec, commit, tokens, new_vq)

        (loss, (rec, commit, tokens, new_vq)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = _ema_update(state.ema_params, new_params, state.step,
                              ema_decay, ema_update_freq)
        new_state = VQVAETrainState(params=new_params, opt_state=new_opt,
                                    vq_state=new_vq, step=state.step + 1,
                                    ema_params=new_ema)
        # codebook usage % over this batch (reference: vq_utils.py:18-46)
        usage = jnp.bincount(tokens.reshape(-1), length=vq_cfg.codebook_size) > 0
        metrics = {"loss": loss, "reconst_loss": rec, "code_loss": commit,
                   "codebook_usage": jnp.mean(usage.astype(jnp.float32))}
        return new_state, metrics

    return train_step


def init_train_state(params, optimizer, vq_state,
                     use_ema: bool = False) -> VQVAETrainState:
    return VQVAETrainState(params=params, opt_state=optimizer.init(params),
                           vq_state=vq_state, step=jnp.zeros((), jnp.int32),
                           ema_params=(jax.tree_util.tree_map(jnp.array, params)
                                       if use_ema else None))


class GradVQTrainState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray
    ema_params: Optional[dict] = None


def make_grad_vqvae_train_step(module, optimizer,
                               loss_fn: str = "mse",
                               codebook_weight: float = 1.0,
                               axis_name: Optional[str] = None,
                               ema_decay: Optional[float] = None,
                               ema_update_freq: int = 1):
    """Train step for gradient-quantizer models (taming / memcodes): the
    codebook lives in `params` and learns by backprop, so there is no VQState
    (reference trains these quantizers the same way, vqvae.py:169-198)."""
    n_channels = module.n_channels

    def train_step(state: GradVQTrainState, batch: jnp.ndarray,
                   rng: jax.Array):
        def loss_and_aux(params):
            pred, qloss, tokens = module.apply(
                params, batch, True, rng,
                method=type(module).autoencode_train)
            rec = reconst_loss(pred, batch, loss_fn, n_channels)
            return rec + codebook_weight * qloss, (rec, qloss, tokens)

        (loss, (rec, qloss, tokens)), grads = jax.value_and_grad(
            loss_and_aux, has_aux=True)(state.params)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        usage = jnp.bincount(tokens.reshape(-1),
                             length=module.codebook_size) > 0
        metrics = {"loss": loss, "reconst_loss": rec, "code_loss": qloss,
                   "codebook_usage": jnp.mean(usage.astype(jnp.float32))}
        new_ema = _ema_update(state.ema_params, new_params, state.step,
                              ema_decay, ema_update_freq)
        return GradVQTrainState(new_params, new_opt, state.step + 1,
                                new_ema), metrics

    return train_step
