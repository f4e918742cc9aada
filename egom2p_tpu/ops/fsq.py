"""Finite Scalar Quantization (FSQ).

TPU-native reimplementation of the reference FSQuantizer
(reference: cosmos_tokenizer/modules/quantizers.py:71-227; FSQ paper
arXiv 2309.15505).  The DV4x8x8 video tokenizer uses levels (8,8,8,5,5,5)
-> implicit codebook of 64,000 entries over 6 channels.

All quantization math runs in fp32 regardless of the network compute dtype;
`round_ste` provides straight-through gradients for tokenizer training.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FSQ:
    def __init__(self, levels: Sequence[int] = (8, 8, 8, 5, 5, 5)):
        self.levels = np.asarray(levels, dtype=np.int32)
        self.dim = len(levels)
        # mixed-radix basis (reference: quantizers.py:96-99)
        # int32 is ample: max index 63999 (8*8*8*5*5*5 - 1)
        self.basis = np.concatenate([[1], np.cumprod(self.levels[:-1])]).astype(np.int32)
        self.codebook_size = int(np.prod(self.levels))

    def bound(self, z: jnp.ndarray, eps: float = 1e-3) -> jnp.ndarray:
        """(reference: quantizers.py:136-141)"""
        levels = jnp.asarray(self.levels, jnp.float32)
        half_l = (levels - 1) * (1 + eps) / 2
        offset = jnp.where(levels % 2 == 0, 0.5, 0.0)
        shift = jnp.arctanh(offset / half_l)
        return jnp.tanh(z + shift) * half_l - offset

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (..., dim) fp32 -> normalized quantized codes in [-1, 1]
        with straight-through gradients (reference: quantizers.py:143-147)."""
        z = z.astype(jnp.float32)
        bounded = self.bound(z)
        rounded = jnp.round(bounded)
        quantized = bounded + jax.lax.stop_gradient(rounded - bounded)
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        return quantized / half_width

    def codes_to_indices(self, zhat: jnp.ndarray) -> jnp.ndarray:
        """normalized codes (..., dim) -> int32 indices (...)."""
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        shifted = zhat * half_width + half_width  # in [0, levels-1]
        return jnp.sum(shifted * jnp.asarray(self.basis, jnp.float32),
                       axis=-1).astype(jnp.int32)

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        """int indices (...) -> normalized codes (..., dim)."""
        idx = indices.astype(jnp.int32)[..., None]
        codes_nc = (idx // jnp.asarray(self.basis)) % jnp.asarray(
            self.levels, jnp.int32)
        half_width = jnp.asarray(self.levels // 2, jnp.float32)
        return (codes_nc.astype(jnp.float32) - half_width) / half_width

    def __call__(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """z: (..., dim) -> (indices (...), codes (..., dim))."""
        codes = self.quantize(z)
        indices = self.codes_to_indices(jax.lax.stop_gradient(codes))
        return indices, codes


class ResidualFSQ:
    """Residual FSQ stack (reference: quantizers.py:36-68, arXiv 2107.03312
    Algorithm 1): each stage quantizes the previous residual."""

    def __init__(self, levels: Sequence[int] = (8, 8, 8, 5, 5, 5),
                 num_quantizers: int = 4):
        self.layers = [FSQ(levels) for _ in range(num_quantizers)]
        self.num_quantizers = num_quantizers

    def __call__(self, z: jnp.ndarray):
        residual = z.astype(jnp.float32)
        out = jnp.zeros_like(residual)
        indices = []
        for layer in self.layers:
            idx, codes = layer(residual)
            indices.append(idx)
            residual = residual - jax.lax.stop_gradient(codes)
            out = out + codes
        return jnp.stack(indices, axis=1), out

    def indices_to_codes(self, indices_stack: jnp.ndarray) -> jnp.ndarray:
        """indices_stack: (B, num_quantizers, ...)."""
        out = 0
        for i, layer in enumerate(self.layers):
            out = out + layer.indices_to_codes(indices_stack[:, i])
        return out


class LFQ:
    """Lookup-free (sign) quantization (reference: quantizers.py:392-534,
    MagViT2): each latent dim quantizes to +-1; the index is the sign
    bit-pattern.  Entropy/commit losses are the caller's concern."""

    def __init__(self, codebook_dim: int):
        self.dim = codebook_dim
        self.codebook_size = 2 ** codebook_dim
        self.basis = (2 ** np.arange(codebook_dim)).astype(np.int32)

    def quantize(self, z: jnp.ndarray) -> jnp.ndarray:
        q = jnp.where(z > 0, 1.0, -1.0)
        return z + jax.lax.stop_gradient(q - z)

    def codes_to_indices(self, codes: jnp.ndarray) -> jnp.ndarray:
        bits = (codes > 0).astype(jnp.int32)
        return jnp.sum(bits * jnp.asarray(self.basis), axis=-1)

    def indices_to_codes(self, indices: jnp.ndarray) -> jnp.ndarray:
        bits = (indices[..., None] // jnp.asarray(self.basis)) % 2
        return bits.astype(jnp.float32) * 2.0 - 1.0

    def __call__(self, z: jnp.ndarray):
        codes = self.quantize(z.astype(jnp.float32))
        indices = self.codes_to_indices(jax.lax.stop_gradient(codes))
        return indices, codes
