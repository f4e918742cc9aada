"""Gradient-trained quantizers: taming-style VectorQuantizer and Memcodes.

Complements the functional EMA codebook in egom2p_tpu.ops.vq:

  * `TamingVectorQuantizer` — the taming-transformers VQ
    (reference: cosmos_tokenizer/modules/quantizers.py:230-389): nearest-code
    euclidean lookup, codebook trained by gradient through the embedding loss
    `emb + beta*commit` (legacy weighting), straight-through estimator,
    perplexity diagnostic, optional index remapping, `get_codebook_entry`
    decode (the role the reference wraps as InvQuantizerJit for TorchScript
    export, quantizers.py:537-546 — unnecessary here since the decode path is
    a plain jitted function).
  * `Memcodes` — NWT-style multi-head attention quantizer
    (reference: egom2p/vq/quantizers/quantize_memcodes.py:25-124): queries
    attend over learned codes with a hard gumbel-softmax at train time and an
    argmax at eval.

Both operate channels-last on (B, N, D) token sequences (fold any spatial
grid before calling); codebooks are ordinary flax params updated by the
optimizer, unlike the EMA VQState.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class TamingVectorQuantizer(nn.Module):
    """(reference: cosmos_tokenizer/modules/quantizers.py:230-389)."""
    num_embeddings: int
    embedding_dim: int
    beta: float = 0.25
    legacy: bool = True
    use_norm: bool = False
    remap: Optional[tuple] = None          # used-index list for remapping
    unknown_index: str = "random"          # 'random' | 'extra' | int

    def setup(self):
        bound = 1.0 / self.num_embeddings

        def _uniform_sym(key, shape):
            # torch nn.Embedding-style uniform [-1/n, 1/n) baked into the
            # initializer so the stored param IS the codebook — torch
            # checkpoints converted verbatim stay unshifted
            return jax.random.uniform(key, shape, jnp.float32,
                                      minval=-bound, maxval=bound)

        self.embedding = self.param(
            "embedding", _uniform_sym,
            (self.num_embeddings, self.embedding_dim))

    def _codes(self):
        return self.embedding

    def _norm(self, t):
        if not self.use_norm:
            return t
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True),
                               1e-12)

    def __call__(self, z: jnp.ndarray, training: bool = False,
                 rng: Optional[jax.Array] = None):
        """z: (B, N, D) -> (z_q straight-through, loss, (indices, commit,
        emb_loss, perplexity))."""
        codes = self._codes()
        flat = z.reshape(-1, self.embedding_dim).astype(jnp.float32)
        d = (jnp.sum(flat ** 2, axis=1, keepdims=True)
             + jnp.sum(codes ** 2, axis=1)[None]
             - 2 * flat @ codes.T)
        ind = jnp.argmin(d, axis=1)
        z_q = jnp.take(codes, ind, axis=0).reshape(z.shape)

        zf = z.astype(jnp.float32)
        z_qn, zn = self._norm(z_q), self._norm(zf)
        commit = jnp.mean((z_qn - jax.lax.stop_gradient(zn)) ** 2)
        emb_loss = jnp.mean((jax.lax.stop_gradient(z_qn) - zn) ** 2)
        if self.legacy:
            loss = emb_loss + self.beta * commit
        else:
            loss = self.beta * emb_loss + commit

        # straight-through
        z_q = zf + jax.lax.stop_gradient(z_q - zf)

        onehot = jax.nn.one_hot(ind, self.num_embeddings)
        avg = onehot.mean(axis=0)
        perplexity = jnp.exp(-jnp.sum(avg * jnp.log(avg + 1e-10)))

        indices = ind.reshape(z.shape[:-1])
        if self.remap is not None:
            indices = self.remap_to_used(indices, rng)
        return z_q.astype(z.dtype), loss, (indices, commit, emb_loss,
                                           perplexity)

    # -- index remapping (reference: quantizers.py:282-306) ------------------
    def remap_to_used(self, inds, rng: Optional[jax.Array] = None):
        used = jnp.asarray(self.remap)
        match = inds[..., None] == used
        new = jnp.argmax(match, axis=-1)
        unknown = ~match.any(-1)
        if self.unknown_index == "random":
            rng = rng if rng is not None else jax.random.PRNGKey(0)
            rand = jax.random.randint(rng, new.shape, 0, len(self.remap))
            new = jnp.where(unknown, rand, new)
        elif self.unknown_index == "extra":
            new = jnp.where(unknown, len(self.remap), new)
        else:
            new = jnp.where(unknown, int(self.unknown_index), new)
        return new

    def unmap_to_all(self, inds):
        used = jnp.asarray(self.remap)
        inds = jnp.where(inds >= len(self.remap), 0, inds)
        return jnp.take(used, inds)

    def get_codebook_entry(self, indices):
        """indices (...,) -> codes (..., D) (reference: quantizers.py:374-389;
        decode-side role of InvQuantizerJit, :537-546)."""
        if self.remap is not None:
            indices = self.unmap_to_all(indices)
        return jnp.take(self._codes(), indices, axis=0)


class Memcodes(nn.Module):
    """NWT-style multi-head attention quantizer
    (reference: egom2p/vq/quantizers/quantize_memcodes.py:25-124)."""
    dim: int
    codebook_size: int
    heads: int = 1
    temperature: float = 1.0

    def setup(self):
        assert self.dim % self.heads == 0
        hd = self.dim // self.heads
        self.codes = self.param("codes", nn.initializers.normal(1.0),
                                (self.heads, self.codebook_size, hd))
        self.to_k = self.param("to_k", nn.initializers.lecun_normal(),
                               (self.heads, hd, hd))
        self.to_v = self.param("to_v", nn.initializers.lecun_normal(),
                               (self.heads, hd, hd))

    def _kv(self):
        k = jnp.einsum("hnd,hdc->hnc", self.codes, self.to_k)
        v = jnp.einsum("hnd,hdc->hnc", self.codes, self.to_v)
        return k, v

    def __call__(self, x: jnp.ndarray, training: bool = False,
                 rng: Optional[jax.Array] = None):
        """x: (B, N, D) -> (out (B, N, D), zero codebook loss,
        indices (B, heads, N) or (B, N) for heads == 1)."""
        B, N, _ = x.shape
        hd = self.dim // self.heads
        q = x.reshape(B, N, self.heads, hd).transpose(0, 2, 1, 3)
        q = q * (hd ** -0.5)
        k, v = self._kv()
        logits = jnp.einsum("bhid,hjd->bhij", q.astype(jnp.float32),
                            k.astype(jnp.float32))

        if training:
            assert rng is not None, "Memcodes training needs an rng"
            g = -jnp.log(-jnp.log(
                jax.random.uniform(rng, logits.shape, minval=1e-9,
                                   maxval=1.0 - 1e-9)))
            noisy = (logits + g) / self.temperature
            soft = jax.nn.softmax(noisy, axis=-1)
            ind = jnp.argmax(noisy, axis=-1)
            hard = jax.nn.one_hot(ind, self.codebook_size)
            attn = soft + jax.lax.stop_gradient(hard - soft)  # hard=True ST
        else:
            ind = jnp.argmax(logits, axis=-1)
            attn = jax.nn.one_hot(ind, self.codebook_size)

        out = jnp.einsum("bhij,hjd->bhid", attn,
                         v.astype(attn.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        if self.heads == 1:
            ind = ind[:, 0]
        return out.astype(x.dtype), jnp.zeros((), jnp.float32), ind

    def indices_to_embedding(self, indices):
        """(reference: quantize_memcodes.py:54-68)."""
        _, v = self._kv()
        if indices.ndim == 2 and self.heads == 1:  # (B, N)
            return jnp.take(v[0], indices, axis=0)
        # (B, heads, N) -> (B, N, dim)
        out = jnp.stack([jnp.take(v[h], indices[:, h], axis=0)
                         for h in range(self.heads)], axis=1)
        return out.transpose(0, 2, 1, 3).reshape(
            indices.shape[0], indices.shape[-1], self.dim)
