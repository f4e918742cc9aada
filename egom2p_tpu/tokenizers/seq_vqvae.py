"""Camera-trajectory / gaze transformer VQ-VAE tokenizers.

Rebuilds the reference's cam/gaze tokenizers
(reference: egom2p/vq/vqvae.py:34-597, egom2p/vq/models/cam_transformer.py,
egom2p/vq/models/gaze_transformer.py) TPU-natively:

  * encoder: strided temporal Conv1d "patchify" (kernel=stride=temporal
    compress, 2 in the released configs) -> 1D sincos posemb -> 12 ViT blocks
    -> residual tanh post-MLP (reference: cam_transformer.py:153-225),
  * quant_proj / post_quant_proj 1x1 convs become Dense layers on the
    channel-last layout (reference: vqvae.py:166, 430),
  * the lucid cosine-sim EMA quantizer is the functional
    egom2p_tpu.ops.vq with explicit state threading and psum codebook sync,
  * decoder mirrors the encoder and projects each latent step back to
    temporal_compress frames (reference: cam_transformer.py:305-323).

Shapes (released configs): cam 60x9 -> 30 tokens of 256 codes; gaze
60x2(+valid mask) -> 30 tokens of 256 codes (README.md:82-83).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from egom2p_tpu.models.transformer import Block, LayerNorm, Mlp
from egom2p_tpu.ops.posemb import build_1d_sincos_posemb
from egom2p_tpu.ops.vq import (VQConfig, VQState, indices_to_embedding,
                               init_vq_state, vq_forward, vq_lookup)


class SeqEncoder(nn.Module):
    """(B, T, C) -> (B, T/tc, dim) tokens (reference: cam_transformer.py:131-225)."""
    in_channels: int
    num_frames: int = 60
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    temporal_compress: int = 2
    post_mlp: bool = True
    mask_input: bool = False  # gaze: multiply data by validity mask

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        if self.mask_input:
            # x is (B, T, C+1): last channel is the validity mask
            # (reference: gaze_transformer.py:212-215)
            data, mask = x[..., : self.in_channels], x[..., self.in_channels:]
            x = data * mask
        x = nn.Conv(self.dim, kernel_size=(self.temporal_compress,),
                    strides=(self.temporal_compress,), padding="VALID",
                    name="conv")(x)
        n_tok = self.num_frames // self.temporal_compress
        pos = jnp.asarray(build_1d_sincos_posemb(n_tok, self.dim), x.dtype)
        x = x + pos
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=True, name=f"blocks_{i}")(x, deterministic=deterministic)
        if self.post_mlp:
            h = LayerNorm(name="norm_mlp")(x)
            x = x + Mlp(int(self.mlp_ratio * self.dim), act=jnp.tanh,
                        name="post_mlp")(h)
        return x


class SeqDecoder(nn.Module):
    """(B, T/tc, dim) -> (B, T, C) (reference: cam_transformer.py:228-323)."""
    out_channels: int
    num_frames: int = 60
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    temporal_compress: int = 2
    post_mlp: bool = True

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        n_tok = self.num_frames // self.temporal_compress
        pos = jnp.asarray(build_1d_sincos_posemb(n_tok, self.dim), x.dtype)
        x = x + pos
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=True, name=f"blocks_{i}")(x, deterministic=deterministic)
        if self.post_mlp:
            h = LayerNorm(name="norm_mlp")(x)
            x = x + Mlp(int(self.mlp_ratio * self.dim), act=jnp.tanh,
                        name="post_mlp")(h)
        x = nn.Dense(self.out_channels * self.temporal_compress, name="out_proj")(x)
        b, nt, _ = x.shape
        # 'b nt (c pt) -> b (nt pt) c' (reference: cam_transformer.py:319-322)
        x = x.reshape(b, nt, self.out_channels, self.temporal_compress)
        x = x.transpose(0, 1, 3, 2).reshape(b, nt * self.temporal_compress,
                                            self.out_channels)
        return x


class SeqAutoencoder(nn.Module):
    """Encoder + quant/post-quant projections + decoder; the VQ codebook is
    external functional state (egom2p_tpu.ops.vq)."""
    n_channels: int
    num_frames: int = 60
    latent_dim: int = 32
    temporal_compress: int = 2
    mask_input: bool = False  # True for gaze
    dim: int = 768
    depth: int = 12
    num_heads: int = 12

    def setup(self):
        self.encoder = SeqEncoder(
            in_channels=self.n_channels, num_frames=self.num_frames,
            temporal_compress=self.temporal_compress, mask_input=self.mask_input,
            dim=self.dim, depth=self.depth, num_heads=self.num_heads)
        self.decoder = SeqDecoder(
            out_channels=self.n_channels, num_frames=self.num_frames,
            temporal_compress=self.temporal_compress,
            dim=self.dim, depth=self.depth, num_heads=self.num_heads)
        # 1x1 Conv1d == Dense on channel-last (reference: vqvae.py:166, 430)
        self.quant_proj = nn.Dense(self.latent_dim)
        self.post_quant_proj = nn.Dense(self.dim)

    def encode_latents(self, x, deterministic: bool = True):
        h = self.encoder(x, deterministic)
        return self.quant_proj(h)  # (B, T', latent_dim)

    def decode_latents(self, quant, deterministic: bool = True):
        h = self.post_quant_proj(quant)
        return self.decoder(h, deterministic)

    def __call__(self, x):  # init path
        return self.decode_latents(self.encode_latents(x))


@dataclasses.dataclass
class SeqTokenizer:
    """User-facing tokenizer bundling flax params + VQ codebook state.

    API mirrors the reference VQ/VQVAE
    (reference: egom2p/vq/vqvae.py:285-362): tokenize / decode_tokens /
    autoencode, plus a functional train step in egom2p_tpu/train/vqvae_train.py.
    """
    module: SeqAutoencoder
    params: dict
    vq_cfg: VQConfig
    vq_state: VQState

    # -- inference -----------------------------------------------------------
    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lat = self.module.apply(self.params, x, method=SeqAutoencoder.encode_latents)
        quant, tokens = vq_lookup(self.vq_cfg, self.vq_state, lat)
        return quant, tokens

    def tokenize(self, x) -> jnp.ndarray:
        return self.encode(x)[1]

    def decode_tokens(self, tokens) -> jnp.ndarray:
        quant = indices_to_embedding(self.vq_state, tokens)
        return self.module.apply(self.params, quant,
                                 method=SeqAutoencoder.decode_latents)

    def autoencode(self, x) -> jnp.ndarray:
        quant, _ = self.encode(x)
        return self.module.apply(self.params, quant,
                                 method=SeqAutoencoder.decode_latents)


def seq_vqvae_from_config(domain: str, rng: jax.Array,
                          num_frames: int = 60,
                          temporal_compress: int = 2,
                          codebook_size: int = 256,
                          latent_dim: int = 32,
                          ema_decay: float = 0.99,
                          threshold_ema_dead_code: float = 0.25,
                          commitment_weight: float = 1.0,
                          kmeans_init: bool = False,
                          code_replacement_policy: str = "batch_random",
                          dim: int = 768,
                          depth: int = 12,
                          num_heads: int = 12) -> SeqTokenizer:
    """Build a cam or gaze tokenizer with fresh params
    (configs: reference cfgs/default/tokenization/vqvae/{cam_traj,gaze}/*.yaml)."""
    if domain == "cam":
        n_channels, mask_input = 9, False
    elif domain == "gaze":
        n_channels, mask_input = 2, True
    else:
        raise ValueError(f"unknown seq-vqvae domain {domain}")
    module = SeqAutoencoder(n_channels=n_channels, num_frames=num_frames,
                            latent_dim=latent_dim,
                            temporal_compress=temporal_compress,
                            mask_input=mask_input,
                            dim=dim, depth=depth, num_heads=num_heads)
    k1, k2 = jax.random.split(rng)
    in_ch = n_channels + (1 if mask_input else 0)
    x0 = jnp.zeros((1, num_frames, in_ch), jnp.float32)
    params = module.init(k1, x0)
    vq_cfg = VQConfig(codebook_size=codebook_size, dim=latent_dim,
                      decay=ema_decay,
                      threshold_ema_dead_code=threshold_ema_dead_code,
                      commitment_weight=commitment_weight,
                      use_cosine_sim=True, kmeans_init=kmeans_init,
                      code_replacement_policy=code_replacement_policy)
    vq_state = init_vq_state(vq_cfg, k2)
    return SeqTokenizer(module=module, params=params, vq_cfg=vq_cfg,
                        vq_state=vq_state)


class GradVQAutoencoder(nn.Module):
    """Autoencoder with an internal gradient-trained quantizer (taming VQ or
    memcodes), selectable like the reference's `quant_type`
    (reference: egom2p/vq/vqvae.py:169-198).  Wraps any core exposing
    encode_latents/decode_latents (SeqAutoencoder or VideoAutoencoder)."""
    core: nn.Module
    quantizer_type: str  # 'taming' | 'memcodes'
    codebook_size: int
    latent_dim: int
    num_codebooks: int = 1
    beta: float = 0.25

    def setup(self):
        if self.quantizer_type == "taming":
            from egom2p_tpu.ops.quantizers import TamingVectorQuantizer
            self.quantizer = TamingVectorQuantizer(
                num_embeddings=self.codebook_size,
                embedding_dim=self.latent_dim, beta=self.beta)
        elif self.quantizer_type == "memcodes":
            from egom2p_tpu.ops.quantizers import Memcodes
            self.quantizer = Memcodes(dim=self.latent_dim,
                                      codebook_size=self.codebook_size,
                                      heads=self.num_codebooks)
        else:
            raise ValueError(self.quantizer_type)

    @property
    def n_channels(self):
        return self.core.n_channels

    def _flat(self, lat):
        return lat.reshape(lat.shape[0], -1, lat.shape[-1])

    def quantize(self, lat, training: bool = False, rng=None):
        flat = self._flat(lat)
        if self.quantizer_type == "taming":
            quant, qloss, (tokens, *_rest) = self.quantizer(flat, training,
                                                            rng)
        else:
            quant, qloss, tokens = self.quantizer(flat, training, rng)
        return quant.reshape(lat.shape), qloss, tokens

    def autoencode_train(self, x, training: bool = False, rng=None):
        lat = self.core.encode_latents(x, deterministic=not training)
        quant, qloss, tokens = self.quantize(lat, training, rng)
        pred = self.core.decode_latents(quant, deterministic=not training)
        return pred, qloss, tokens

    def tokenize(self, x):
        lat = self.core.encode_latents(x)
        _, _, tokens = self.quantize(lat)
        return tokens

    def decode_tokens(self, tokens):
        if self.quantizer_type == "taming":
            quant = self.quantizer.get_codebook_entry(tokens)
        else:
            quant = self.quantizer.indices_to_embedding(tokens)
        B = tokens.shape[0]
        quant = quant.reshape(B, -1, self.latent_dim)
        return self.core.decode_latents(self._latgrid(quant))

    def _latgrid(self, flat_quant):
        """Restore the core's latent grid shape from flat (B, N, D)."""
        core = self.core
        if hasattr(core, "tubelet_t"):  # VideoAutoencoder grid
            t = core.num_frames // core.tubelet_t
            h = w = core.image_size // core.patch_size
            return flat_quant.reshape(flat_quant.shape[0], t, h, w,
                                      self.latent_dim)
        return flat_quant  # SeqAutoencoder latents are already (B, T', D)

    def __call__(self, x):  # init path
        pred, _, _ = self.autoencode_train(x)
        return pred


@dataclasses.dataclass
class GradVQTokenizer:
    """User-facing tokenizer for gradient-quantizer models (taming/memcodes);
    same tokenize/decode_tokens/autoencode surface as SeqTokenizer."""
    module: GradVQAutoencoder
    params: dict

    def tokenize(self, x) -> jnp.ndarray:
        return self.module.apply(self.params, x,
                                 method=GradVQAutoencoder.tokenize)

    def decode_tokens(self, tokens) -> jnp.ndarray:
        return self.module.apply(self.params, tokens,
                                 method=GradVQAutoencoder.decode_tokens)

    def autoencode(self, x) -> jnp.ndarray:
        pred, _, _ = self.module.apply(
            self.params, x, method=GradVQAutoencoder.autoencode_train)
        return pred
