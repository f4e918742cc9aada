"""ViViT-style video VQ-VAE for rgb/depth domain tokenizer training.

The reference wires a video-domain VQ-VAE train path (run_training_vqvae.py
`--domain rgb|depth` -> VideoDataset, vqvae.py:80 `enc_type='vivit_b_enc'`
with Conv3d quant projections, vqvae.py:163-167/427-431) but its vivit
encoder/decoder bodies are absent upstream (vqvae.py:158-159 raises
NotImplementedError; _init_encoder_weights_from_vivit at :443 maps HF
vivit-b-16x2 weights, implying a ViViT-B layout).  This module supplies the
TPU-native implementation of that intended architecture:

  * encoder: tubelet Conv3D patchify (kernel=stride=(t,p,p), ViViT-B default
    2x16x16) -> 3D sincos posemb -> ViT blocks -> LayerNorm,
  * quant/post-quant 1x1 Conv3d == Dense on the channels-last token grid,
  * decoder: ViT blocks -> Dense to tubelet pixels -> unpatchify,
  * the quantizer is the same functional cosine/euclidean EMA codebook as the
    cam/gaze tokenizers (egom2p_tpu.ops.vq) with psum codebook sync.

Channels-last throughout; convs and matmuls are MXU-shaped (dim 768).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from egom2p_tpu.models.transformer import Block, LayerNorm
from egom2p_tpu.ops.posemb import build_3d_sincos_posemb
from egom2p_tpu.ops.vq import (VQConfig, VQState, indices_to_embedding,
                               init_vq_state, vq_lookup)


class VideoViTEncoder(nn.Module):
    """(B, T, H, W, C) -> (B, t', h', w', dim) token grid."""
    in_channels: int = 3
    num_frames: int = 16
    image_size: int = 256
    tubelet_t: int = 2
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B = x.shape[0]
        t = self.num_frames // self.tubelet_t
        h = w = self.image_size // self.patch_size
        x = nn.Conv(self.dim,
                    kernel_size=(self.tubelet_t, self.patch_size, self.patch_size),
                    strides=(self.tubelet_t, self.patch_size, self.patch_size),
                    padding="VALID", name="patch_embed")(x)
        x = x.reshape(B, t * h * w, self.dim)
        pos = jnp.asarray(build_3d_sincos_posemb(t, h, w, self.dim), x.dtype)
        x = x + pos.reshape(1, t * h * w, self.dim)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=True, name=f"blocks_{i}")(
                          x, deterministic=deterministic)
        x = LayerNorm(name="norm")(x)
        return x.reshape(B, t, h, w, self.dim)


class VideoViTDecoder(nn.Module):
    """(B, t', h', w', dim) -> (B, T, H, W, C)."""
    out_channels: int = 3
    num_frames: int = 16
    image_size: int = 256
    tubelet_t: int = 2
    patch_size: int = 16
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, t, h, w, _ = x.shape
        x = x.reshape(B, t * h * w, x.shape[-1])
        pos = jnp.asarray(build_3d_sincos_posemb(t, h, w, self.dim), x.dtype)
        x = x + pos.reshape(1, t * h * w, self.dim)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=True, name=f"blocks_{i}")(
                          x, deterministic=deterministic)
        x = LayerNorm(name="norm")(x)
        x = nn.Dense(self.tubelet_t * self.patch_size * self.patch_size
                     * self.out_channels, name="out_proj")(x)
        # unpatchify: (B, t*h*w, pt*p*p*c) -> (B, T, H, W, C)
        x = x.reshape(B, t, h, w, self.tubelet_t, self.patch_size,
                      self.patch_size, self.out_channels)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7)
        return x.reshape(B, t * self.tubelet_t, h * self.patch_size,
                         w * self.patch_size, self.out_channels)


class VideoAutoencoder(nn.Module):
    """Encoder + quant/post-quant projections + decoder; the VQ codebook is
    external functional state (egom2p_tpu.ops.vq), like SeqAutoencoder."""
    n_channels: int = 3
    num_frames: int = 16
    image_size: int = 256
    tubelet_t: int = 2
    patch_size: int = 16
    latent_dim: int = 32
    dim: int = 768
    depth: int = 12
    num_heads: int = 12

    def setup(self):
        kw = dict(num_frames=self.num_frames, image_size=self.image_size,
                  tubelet_t=self.tubelet_t, patch_size=self.patch_size,
                  dim=self.dim, depth=self.depth, num_heads=self.num_heads)
        self.encoder = VideoViTEncoder(in_channels=self.n_channels, **kw)
        self.decoder = VideoViTDecoder(out_channels=self.n_channels, **kw)
        # 1x1 Conv3d == Dense on channels-last (reference: vqvae.py:163-167)
        self.quant_proj = nn.Dense(self.latent_dim)
        self.post_quant_proj = nn.Dense(self.dim)

    def encode_latents(self, x, deterministic: bool = True):
        h = self.encoder(x, deterministic)
        return self.quant_proj(h)  # (B, t', h', w', latent_dim)

    def decode_latents(self, quant, deterministic: bool = True):
        h = self.post_quant_proj(quant)
        return self.decoder(h, deterministic)

    def __call__(self, x):  # init path
        return self.decode_latents(self.encode_latents(x))


@dataclasses.dataclass
class VideoVQTokenizer:
    """User-facing video tokenizer: flax params + functional VQ codebook.

    API mirrors the reference VQ/VQVAE (vqvae.py:285-362): tokenize /
    decode_tokens / autoencode on (B, T, H, W, C) videos in [-1, 1]."""
    module: VideoAutoencoder
    params: dict
    vq_cfg: VQConfig
    vq_state: VQState

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lat = self.module.apply(self.params, x,
                                method=VideoAutoencoder.encode_latents)
        B, t, h, w, d = lat.shape
        quant, tokens = vq_lookup(self.vq_cfg, self.vq_state,
                                  lat.reshape(B, t * h * w, d))
        return (quant.reshape(B, t, h, w, d),
                tokens.reshape(B, t, h, w))

    def tokenize(self, x) -> jnp.ndarray:
        return self.encode(x)[1]

    def decode_tokens(self, tokens) -> jnp.ndarray:
        quant = indices_to_embedding(self.vq_state, tokens)
        return self.module.apply(self.params, quant,
                                 method=VideoAutoencoder.decode_latents)

    def autoencode(self, x) -> jnp.ndarray:
        quant, _ = self.encode(x)
        return self.module.apply(self.params, quant,
                                 method=VideoAutoencoder.decode_latents)


def video_vqvae_from_config(domain: str, rng: jax.Array,
                            num_frames: int = 16,
                            image_size: int = 256,
                            tubelet_t: int = 2,
                            patch_size: int = 16,
                            codebook_size: int = 8192,
                            latent_dim: int = 32,
                            ema_decay: float = 0.99,
                            threshold_ema_dead_code: float = 2.0,
                            commitment_weight: float = 1.0,
                            kmeans_init: bool = False,
                            code_replacement_policy: str = "batch_random",
                            norm_codes: bool = True,
                            dim: int = 768,
                            depth: int = 12,
                            num_heads: int = 12) -> VideoVQTokenizer:
    """Build an rgb or depth video tokenizer with fresh params.

    rgb: 3 channels; depth: 1 channel (reference MODALITY_INFO num_channels;
    the reference's dead-code threshold for video is 2.0,
    run_training_vqvae.py:391)."""
    if domain == "rgb":
        n_channels = 3
    elif domain == "depth":
        n_channels = 1
    else:
        raise ValueError(f"unknown video-vqvae domain {domain}")
    module = VideoAutoencoder(
        n_channels=n_channels, num_frames=num_frames, image_size=image_size,
        tubelet_t=tubelet_t, patch_size=patch_size, latent_dim=latent_dim,
        dim=dim, depth=depth, num_heads=num_heads)
    k1, k2 = jax.random.split(rng)
    x0 = jnp.zeros((1, num_frames, image_size, image_size, n_channels),
                   jnp.float32)
    params = module.init(k1, x0)
    vq_cfg = VQConfig(codebook_size=codebook_size, dim=latent_dim,
                      decay=ema_decay,
                      threshold_ema_dead_code=threshold_ema_dead_code,
                      commitment_weight=commitment_weight,
                      use_cosine_sim=norm_codes, kmeans_init=kmeans_init,
                      code_replacement_policy=code_replacement_policy)
    vq_state = init_vq_state(vq_cfg, k2)
    return VideoVQTokenizer(module=module, params=params, vq_cfg=vq_cfg,
                            vq_state=vq_state)
