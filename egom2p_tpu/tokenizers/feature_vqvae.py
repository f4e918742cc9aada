"""Feature-map VQ-VAE for teacher-feature tokenizer training.

The reference trains VQ tokenizers on dense teacher features (CLIP /
DINOv2 / ImageBind patch-token grids or cls vectors): FEAT_MODALITIES at
run_training_vqvae.py:78, `load_sample` reshaping teacher tokens to
(B, d, nh, nw) feature maps at :949-1002, and MODALITY_INFO entries of
`type: 'feature_map'` (modality_info.py:206-210).  Its in-tree `VQVAE`
never grew the matching encoder (vqvae.py:152-159 raises for anything
but Cam/Gaze transformers), so the feature path is vestigial upstream;
this module supplies a working TPU-native architecture for it:

  * encoder: per-cell linear in_proj (the feature grid is already
    token-shaped, so no patchify; reference `patch_proj=False` for
    non-'img' modalities, run_training_vqvae.py:400-402) -> 2D sincos
    posemb -> ViT blocks -> LayerNorm,
  * quant / post-quant 1x1 projections and the same functional EMA
    codebook as the other tokenizers (egom2p_tpu.ops.vq, psum-synced),
  * decoder: ViT blocks -> linear out_proj back to the teacher width.

`-global` domains carry a (1, 1) grid (a single cls vector per image,
reference :979-988); the transformer then degenerates to an MLP stack
over one token, which is exactly the reference's intent for them.

Channels-last throughout; dims are MXU-shaped (default 768).
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from flax import linen as nn

from egom2p_tpu.models.transformer import Block, LayerNorm
from egom2p_tpu.ops.posemb import build_2d_sincos_posemb
from egom2p_tpu.ops.vq import (VQConfig, VQState, indices_to_embedding,
                               init_vq_state, vq_lookup)


class FeatureViT(nn.Module):
    """Shared encoder/decoder body: (B, h, w, in_dim) -> (B, h, w, out_dim)."""
    out_dim: int
    dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        B, h, w, _ = x.shape
        x = nn.Dense(self.dim, name="in_proj")(x)
        x = x.reshape(B, h * w, self.dim)
        if h * w > 1:  # a 1x1 (global) grid needs no positional signal
            pos = jnp.asarray(build_2d_sincos_posemb(h, w, self.dim), x.dtype)
            x = x + pos.reshape(1, h * w, self.dim)
        for i in range(self.depth):
            x = Block(num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                      qkv_bias=True, name=f"blocks_{i}")(
                          x, deterministic=deterministic)
        x = LayerNorm(name="norm")(x)
        x = nn.Dense(self.out_dim, name="out_proj")(x)
        return x.reshape(B, h, w, self.out_dim)


class FeatureAutoencoder(nn.Module):
    """Encoder + quant/post-quant projections + decoder over feature maps;
    the VQ codebook is external functional state like the other tokenizers."""
    n_channels: int          # teacher feature width (512 CLIP-B16, 768 DINO-B)
    latent_dim: int = 32
    dim: int = 768
    depth: int = 12
    num_heads: int = 12

    def setup(self):
        self.encoder = FeatureViT(out_dim=self.dim, dim=self.dim,
                                  depth=self.depth, num_heads=self.num_heads)
        self.decoder = FeatureViT(out_dim=self.n_channels, dim=self.dim,
                                  depth=self.depth, num_heads=self.num_heads)
        self.quant_proj = nn.Dense(self.latent_dim)
        self.post_quant_proj = nn.Dense(self.dim)

    def encode_latents(self, x, deterministic: bool = True):
        return self.quant_proj(self.encoder(x, deterministic))

    def decode_latents(self, quant, deterministic: bool = True):
        return self.decoder(self.post_quant_proj(quant), deterministic)

    def __call__(self, x):  # init path
        return self.decode_latents(self.encode_latents(x))


@dataclasses.dataclass
class FeatureVQTokenizer:
    """User-facing feature tokenizer: tokenize / decode_tokens / autoencode
    on (B, h, w, d) teacher feature maps (API parity with the reference
    VQ/VQVAE surface, vqvae.py:285-362)."""
    module: FeatureAutoencoder
    params: dict
    vq_cfg: VQConfig
    vq_state: VQState

    def encode(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        lat = self.module.apply(self.params, x,
                                method=FeatureAutoencoder.encode_latents)
        B, h, w, d = lat.shape
        quant, tokens = vq_lookup(self.vq_cfg, self.vq_state,
                                  lat.reshape(B, h * w, d))
        return quant.reshape(lat.shape), tokens.reshape(B, h, w)

    def tokenize(self, x) -> jnp.ndarray:
        return self.encode(x)[1]

    def decode_tokens(self, tokens) -> jnp.ndarray:
        quant = indices_to_embedding(self.vq_state, tokens)
        return self.module.apply(self.params, quant,
                                 method=FeatureAutoencoder.decode_latents)

    def autoencode(self, x) -> jnp.ndarray:
        quant, _ = self.encode(x)
        return self.module.apply(self.params, quant,
                                 method=FeatureAutoencoder.decode_latents)


def feature_vqvae_from_config(domain: str, rng: jax.Array,
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
                              num_heads: int = 12) -> FeatureVQTokenizer:
    """Build a feature-domain tokenizer with fresh params.  The feature
    width and grid come from the teacher registry (reference num_channels,
    modality_info.py feature_map entries)."""
    from egom2p_tpu.models.teachers import TEACHER_SPECS

    spec = TEACHER_SPECS[domain]
    grid = 1 if spec.global_pool else spec.grid
    module = FeatureAutoencoder(n_channels=spec.feat_dim,
                                latent_dim=latent_dim, dim=dim, depth=depth,
                                num_heads=num_heads)
    k1, k2 = jax.random.split(rng)
    x0 = jnp.zeros((1, grid, grid, spec.feat_dim), jnp.float32)
    params = module.init(k1, x0)
    vq_cfg = VQConfig(codebook_size=codebook_size, dim=latent_dim,
                      decay=ema_decay,
                      threshold_ema_dead_code=threshold_ema_dead_code,
                      commitment_weight=commitment_weight,
                      use_cosine_sim=norm_codes, kmeans_init=kmeans_init,
                      code_replacement_policy=code_replacement_policy)
    vq_state = init_vq_state(vq_cfg, k2)
    return FeatureVQTokenizer(module=module, params=params, vq_cfg=vq_cfg,
                              vq_state=vq_state)
