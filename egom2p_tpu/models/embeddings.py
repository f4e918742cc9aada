"""Per-modality encoder/decoder embedding modules.

Equivalent to the reference embedding adapters
(reference: egom2p/models/encoder_embeddings.py, decoder_embeddings.py) with
two structural changes for the TPU build:

  * modality embeddings (`mod_emb`) are owned by the parent EgoM2P module and
    passed in, which makes encoder/decoder sharing
    (reference: egom2p_model.py:179-183) explicit rather than parameter
    aliasing,
  * decoder output projections implement weight tying
    (reference: decoder_embeddings.py:89-91) as `x @ token_emb.T`.

Each module maps a modality dict with 'tensor' (+masks) to:
  x   : (B, L, D) value embedding (content)
  emb : (B, L, D) positional + modality embedding (kept separate because the
        decoder re-adds it to the projected encoder context,
        reference: egom2p_model.py:722)
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from egom2p_tpu.ops.posemb import (
    build_1d_sincos_posemb,
    build_2d_sincos_posemb,
    build_3d_sincos_posemb,
)


def _embed_init(std=0.02):
    return nn.initializers.normal(stddev=std)


def _grid_posemb(grid: Tuple[int, ...], dim: int) -> np.ndarray:
    if len(grid) == 1:
        return build_1d_sincos_posemb(grid[0], dim)
    if len(grid) == 2:
        return build_2d_sincos_posemb(grid[0], grid[1], dim)
    return build_3d_sincos_posemb(grid[0], grid[1], grid[2], dim)


class TokenGridEncoderEmbedding(nn.Module):
    """Image/video/gaze-cam token encoder embedding with a fixed positional
    grid (reference: encoder_embeddings.py:124-302)."""
    vocab_size: int
    grid: Tuple[int, ...]
    dim: int

    def setup(self):
        self.token_emb = self.param("token_emb", _embed_init(), (self.vocab_size, self.dim))

    def __call__(self, d: Dict[str, jnp.ndarray], mod_emb: jnp.ndarray, compute_dtype=jnp.bfloat16):
        ids = d["tensor"].reshape(d["tensor"].shape[0], -1)
        x = jnp.take(self.token_emb, ids, axis=0)
        pos = jnp.asarray(_grid_posemb(self.grid, self.dim), dtype=jnp.float32)
        emb = jnp.broadcast_to((pos + mod_emb).astype(compute_dtype), x.shape)
        return x.astype(compute_dtype), emb


class SequenceEncoderEmbedding(nn.Module):
    """Sequence (caption/det) encoder embedding with cumsum positional ids
    (reference: encoder_embeddings.py:23-122)."""
    vocab_size: int
    max_length: int
    dim: int
    max_sincos_pos_emb: int = 512
    padding_idx: int = 0

    def setup(self):
        self.token_emb = self.param("token_emb", _embed_init(), (self.vocab_size, self.dim))

    def __call__(self, d, mod_emb, compute_dtype=jnp.bfloat16):
        ids = d["tensor"]
        x = jnp.take(self.token_emb, ids, axis=0)
        # padding_idx rows contribute zero, like nn.Embedding(padding_idx=...)
        x = jnp.where((ids == self.padding_idx)[..., None], 0.0, x)

        pos = jnp.asarray(
            build_1d_sincos_posemb(self.max_sincos_pos_emb, self.dim)[:, : self.max_length],
            dtype=jnp.float32,
        )  # (1, max_length, D)
        input_mask = d["input_mask"]
        pos_id = jnp.cumsum((~input_mask).astype(jnp.int32), axis=1) - 1
        pos_id = jnp.where(input_mask, 0, pos_id)
        pos_id = jnp.clip(pos_id, 0, self.max_length - 1)
        pos_bc = jnp.broadcast_to(pos, (ids.shape[0],) + pos.shape[1:])
        input_pos = jnp.take_along_axis(pos_bc, pos_id[..., None], axis=1)
        input_pos = jnp.where(input_mask[..., None], 0.0, input_pos)
        emb = (input_pos + mod_emb).astype(compute_dtype)
        return x.astype(compute_dtype), emb


class TokenGridDecoderEmbedding(nn.Module):
    """Decoder-side token embedding + logits head for grid modalities
    (reference: decoder_embeddings.py:156-501)."""
    vocab_size: int
    grid: Tuple[int, ...]
    dim: int
    share_embedding: bool = True

    def setup(self):
        self.token_emb = self.param("token_emb", _embed_init(), (self.vocab_size, self.dim))
        if not self.share_embedding:
            self.to_logits = self.param(
                "to_logits", nn.initializers.xavier_uniform(), (self.vocab_size, self.dim))

    def forward_embed(self, d, mod_emb, compute_dtype=jnp.bfloat16):
        ids = d["tensor"].reshape(d["tensor"].shape[0], -1)
        x = jnp.take(self.token_emb, ids, axis=0)
        pos = jnp.asarray(_grid_posemb(self.grid, self.dim), dtype=jnp.float32)
        emb = jnp.broadcast_to((pos + mod_emb).astype(compute_dtype), x.shape)
        return x.astype(compute_dtype), emb, ids

    def forward_logits(self, y: jnp.ndarray) -> jnp.ndarray:
        w = self.token_emb if self.share_embedding else self.to_logits
        return jnp.einsum("...d,vd->...v", y, w.astype(y.dtype),
                          preferred_element_type=jnp.float32)

    def __call__(self, d, mod_emb):  # pragma: no cover - setup trigger
        return self.forward_embed(d, mod_emb)


class SequenceDecoderEmbedding(nn.Module):
    """Decoder-side sequence embedding + logits head
    (reference: decoder_embeddings.py:24-152)."""
    vocab_size: int
    max_length: int
    dim: int
    max_sincos_pos_emb: int = 512
    padding_idx: int = 0
    share_embedding: bool = True

    def setup(self):
        self.token_emb = self.param("token_emb", _embed_init(), (self.vocab_size, self.dim))
        if not self.share_embedding:
            self.to_logits = self.param(
                "to_logits", nn.initializers.xavier_uniform(), (self.vocab_size, self.dim))

    def forward_embed(self, d, mod_emb, compute_dtype=jnp.bfloat16):
        ids = d["tensor"]
        x = jnp.take(self.token_emb, ids, axis=0)
        x = jnp.where((ids == self.padding_idx)[..., None], 0.0, x)

        pos = jnp.asarray(
            build_1d_sincos_posemb(self.max_sincos_pos_emb, self.dim)[:, : self.max_length],
            dtype=jnp.float32,
        )
        target_mask = d["target_mask"]
        pos_id = jnp.cumsum((~target_mask).astype(jnp.int32), axis=1) - 1
        pos_id = jnp.where(target_mask, 0, pos_id)
        # Over-length targets are truncated later in the decoder gather
        # (reference: decoder_embeddings.py:127-128)
        pos_id = jnp.where(pos_id >= self.max_length, 0, pos_id)
        pos_bc = jnp.broadcast_to(pos, (ids.shape[0],) + pos.shape[1:])
        target_pos = jnp.take_along_axis(pos_bc, pos_id[..., None], axis=1)
        target_pos = jnp.where(target_mask[..., None], 0.0, target_pos)
        emb = (target_pos + mod_emb).astype(compute_dtype)
        return x.astype(compute_dtype), emb, ids

    def forward_logits(self, y: jnp.ndarray) -> jnp.ndarray:
        w = self.token_emb if self.share_embedding else self.to_logits
        return jnp.einsum("...d,vd->...v", y, w.astype(y.dtype),
                          preferred_element_type=jnp.float32)

    def __call__(self, d, mod_emb):  # pragma: no cover - setup trigger
        return self.forward_embed(d, mod_emb)


class ImagePatchEncoderEmbedding(nn.Module):
    """Raw-pixel patch-projection encoder embedding
    (reference: encoder_embeddings.py:395-492).

    TPU layout: channels-last (B, H, W, C).  The bias-free patch projection
    keeps the modality embedding as the only additive term, like the
    reference (:455-456).  Per-patch feature order is (ph, pw, C) to match
    the reference's rearrange '(ph pw d)' so converted weights line up."""
    num_channels: int
    patch_size: int
    image_size: int
    dim: int
    dtype: Any = None  # matmul compute dtype (params stay fp32)

    def setup(self):
        self.proj = nn.Dense(self.dim, use_bias=False, dtype=self.dtype)

    def __call__(self, d: Dict[str, jnp.ndarray], mod_emb: jnp.ndarray,
                 compute_dtype=jnp.bfloat16):
        x = d["tensor"]
        B, H, W, C = x.shape
        ph = pw = self.patch_size
        nh, nw = H // ph, W // pw
        x = x.reshape(B, nh, ph, nw, pw, C).transpose(0, 1, 3, 2, 4, 5)
        x = x.reshape(B, nh * nw, ph * pw * C)
        x = self.proj(x.astype(compute_dtype))
        g = self.image_size // self.patch_size
        pos = jnp.asarray(build_2d_sincos_posemb(g, g, self.dim),
                          dtype=jnp.float32)
        emb = jnp.broadcast_to((pos + mod_emb).astype(compute_dtype), x.shape)
        return x, emb


class SequenceEmbEncoderEmbedding(nn.Module):
    """Adapter for precomputed sequence embeddings (T5-XXL / CLIP text)
    (reference: encoder_embeddings.py:493-602).  Input-only: the reference
    defines no decoder counterpart."""
    max_length: int
    orig_emb_dim: int
    dim: int
    max_sincos_pos_emb: int = 512
    use_bottleneck: bool = False
    bottleneck_dim: int = 64
    dtype: Any = None  # matmul compute dtype (params stay fp32)

    def setup(self):
        if self.use_bottleneck:
            self.emb_proj_0 = nn.Dense(self.bottleneck_dim, dtype=self.dtype)
            self.emb_proj_1 = nn.Dense(self.dim, dtype=self.dtype)
        else:
            self.emb_proj = nn.Dense(self.dim, dtype=self.dtype)

    def __call__(self, d, mod_emb, compute_dtype=jnp.bfloat16):
        x = d["tensor"].astype(compute_dtype)  # (B, L, E)
        if self.use_bottleneck:
            x = self.emb_proj_1(self.emb_proj_0(x))
        else:
            x = self.emb_proj(x)

        pos = jnp.asarray(
            build_1d_sincos_posemb(self.max_sincos_pos_emb,
                                   self.dim)[:, : self.max_length],
            dtype=jnp.float32)
        input_mask = d["input_mask"]
        pos_id = jnp.cumsum((~input_mask).astype(jnp.int32), axis=1) - 1
        pos_id = jnp.where(input_mask, 0, pos_id)
        pos_id = jnp.clip(pos_id, 0, self.max_length - 1)
        pos_bc = jnp.broadcast_to(pos, (x.shape[0],) + pos.shape[1:])
        input_pos = jnp.take_along_axis(pos_bc, pos_id[..., None], axis=1)
        input_pos = jnp.where(input_mask[..., None], 0.0, input_pos)
        emb = (input_pos + mod_emb).astype(compute_dtype)
        return x, emb


def make_encoder_embedding(spec: Dict, dim: int, dtype=None) -> nn.Module:
    kind = spec["kind"]
    if kind in ("video_token", "image_token"):
        return TokenGridEncoderEmbedding(spec["vocab_size"], tuple(spec["grid"]), dim)
    if kind == "gazecam_token":
        return TokenGridEncoderEmbedding(spec["vocab_size"], (spec["length"],), dim)
    if kind == "sequence":
        return SequenceEncoderEmbedding(spec["vocab_size"], spec["max_length"], dim,
                                        padding_idx=spec.get("padding_idx", 0))
    if kind == "image_raw":
        return ImagePatchEncoderEmbedding(
            spec.get("num_channels", 3), spec["patch_size"],
            spec["image_size"], dim, dtype=dtype)
    if kind == "sequence_emb":
        return SequenceEmbEncoderEmbedding(
            spec["max_length"], spec.get("orig_emb_dim", 4096), dim,
            use_bottleneck=spec.get("use_bottleneck", False),
            bottleneck_dim=spec.get("bottleneck_dim", 64), dtype=dtype)
    raise ValueError(kind)


def make_decoder_embedding(spec: Dict, dim: int, share_embedding: bool = True) -> nn.Module:
    kind = spec["kind"]
    if kind in ("video_token", "image_token"):
        return TokenGridDecoderEmbedding(spec["vocab_size"], tuple(spec["grid"]), dim,
                                         share_embedding)
    if kind == "gazecam_token":
        return TokenGridDecoderEmbedding(spec["vocab_size"], (spec["length"],), dim,
                                         share_embedding)
    if kind == "sequence":
        return SequenceDecoderEmbedding(spec["vocab_size"], spec["max_length"], dim,
                                        padding_idx=spec.get("padding_idx", 0),
                                        share_embedding=share_embedding)
    raise ValueError(kind)
