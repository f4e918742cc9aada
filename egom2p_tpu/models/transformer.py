"""Transformer primitives for the EgoM2P encoder-decoder.

Functionally equivalent to the reference blocks
(reference: egom2p/models/egom2p_utils.py:118-412) but written as flax.linen
modules with a bf16-compute / fp32-param precision policy and mask semantics
shared with egom2p_tpu.ops.attention (True = blocked).

Parameter names deliberately mirror the reference state_dict keys
(qkv / proj / fc1 / fc2 / fc3 / norm1 / ...) so the torch->jax checkpoint
converter (egom2p_tpu/compat/torch_convert.py) is a mechanical key mapping.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from egom2p_tpu.ops.attention import SegmentMask, masked_attention


class LayerNorm(nn.Module):
    """LayerNorm with optional bias (reference: egom2p_utils.py:118-133)."""
    eps: float = 1e-6
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        w = self.param("weight", nn.initializers.ones, (dim,))
        b = self.param("bias", nn.initializers.zeros, (dim,)) if self.use_bias else None
        xf = x.astype(jnp.float32)
        mean = xf.mean(-1, keepdims=True)
        var = jnp.square(xf - mean).mean(-1, keepdims=True)
        y = (xf - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * w
        if b is not None:
            y = y + b
        return y.astype(x.dtype)


class Mlp(nn.Module):
    hidden_dim: int
    act: Callable = nn.gelu
    use_bias: bool = True
    out_dim: Optional[int] = None
    # compute dtype for the matmuls (params stay fp32).  None = flax
    # promotion, which with fp32 params means fp32 matmuls — on TPU that
    # runs the MXU at a fraction of its bf16 rate, so the model passes
    # bf16 here (EgoM2PConfig.compute_dtype).
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        out_dim = self.out_dim or x.shape[-1]
        x = nn.Dense(self.hidden_dim, use_bias=self.use_bias, dtype=self.dtype,
                     name="fc1")(x)
        x = self.act(x)
        x = nn.Dense(out_dim, use_bias=self.use_bias, dtype=self.dtype,
                     name="fc2")(x)
        return x


class GatedMlp(nn.Module):
    """SwiGLU-style gated feed-forward.  Hidden dim is scaled by 2/3 to keep
    FLOPs comparable (reference: egom2p_utils.py:154-169)."""
    hidden_dim: int
    act: Callable = nn.silu
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        hidden = int(2 * self.hidden_dim / 3)
        gate = nn.Dense(hidden, use_bias=self.use_bias, dtype=self.dtype,
                        name="fc1")(x)
        val = nn.Dense(hidden, use_bias=self.use_bias, dtype=self.dtype,
                       name="fc3")(x)
        return nn.Dense(dim, use_bias=self.use_bias, dtype=self.dtype,
                        name="fc2")(self.act(gate) * val)


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _tp_shard_mapped(mesh, call, q, k, v, mask_arr):
    """Run `call(q, k, v, mask_arr)` per model-axis shard via shard_map.

    Attention is head-parallel, so sharding channels (= whole heads) over
    the 'model' axis needs no collectives inside the kernel; batch stays
    split over the data axes and the (B, N|M) mask row is replicated across
    the model axis."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    batch = tuple(a for a in ("replica", "data") if a in mesh.axis_names)
    xs = P(batch, None, "model")
    # check_vma=False: the Pallas kernels' out_shape ShapeDtypeStructs carry
    # no varying-mesh-axes annotation, which the new checker requires
    if mask_arr is None:
        return shard_map(lambda a, b, c: call(a, b, c, None), mesh=mesh,
                         in_specs=(xs, xs, xs), out_specs=xs,
                         check_vma=False)(q, k, v)
    ms = P(batch, None)
    return shard_map(call, mesh=mesh, in_specs=(xs, xs, xs, ms),
                     out_specs=xs, check_vma=False)(q, k, v, mask_arr)


def _try_flash64(q, k, v, mask, num_heads, softmax1):
    """head_dim-64 Pallas fast path in projection layout (B, N, C) — skips
    the split/merge-head transposes entirely.  Inference routes to the
    forward-only kernel (ops/flash64.py); training traces route to the
    differentiable fwd+bwd kernels (ops/flash64_train.py, custom_vjp).
    Under tensor parallelism the same kernels run per model-axis shard
    through shard_map (attention is head-parallel).  Returns the (B, N, C)
    output or None when ineligible."""
    import os

    from egom2p_tpu.ops.attention import (SegmentMask,
                                          generation_trace_active,
                                          inference_attention_active,
                                          key_padding_mask, tp_flash_mesh)
    from egom2p_tpu.ops.flash_attention import (flash_backend_available,
                                                supports_flash)

    C = q.shape[-1]
    if (softmax1 or C % 128 != 0 or C // num_heads != 64
            or q.shape[1] * k.shape[1] < 256 * 256 or k.shape[1] > 16384):
        return None
    tp_mesh = tp_flash_mesh()
    if tp_mesh is not None:
        # per-shard eligibility: whole head PAIRS per model shard
        n_model = tp_mesh.shape.get("model", 1)
        if (num_heads % n_model or (C // n_model) % 128
                or not flash_backend_available()):
            return None
    elif not supports_flash():
        return None

    # ------- pick the kernel + mask array (None = reject to stock path)
    if isinstance(mask, SegmentMask):
        # training-only: generation's decoder subsets pass mask=None
        if (generation_trace_active() or q.shape[1] != k.shape[1]
                or os.environ.get("EGOM2P_FLASH64_TRAIN", "1") == "0"
                or os.environ.get("EGOM2P_F64T_SEG", "1") == "0"):
            return None

        def call(q, k, v, seg):
            from egom2p_tpu.ops.flash64_train import flash64_train_attention
            return flash64_train_attention(q, k, v, segments=seg)

        mask_arr = mask.segments
    else:
        is_kp, kv_blocked = key_padding_mask(mask)
        if not is_kp:
            return None
        if generation_trace_active():
            # EGOM2P_FLASH64=0 A/B: generation falls back to the STOCK path
            # (never the training kernel, whose L2 output is dead weight)
            if not inference_attention_active():
                return None

            def call(q, k, v, kvb):
                from egom2p_tpu.ops.flash64 import flash64_attention
                return flash64_attention(
                    q, k, v, kvb,
                    bq=int(os.environ.get("EGOM2P_F64_BQ", "0")),  # 0=adaptive
                    bk=int(os.environ.get("EGOM2P_F64_BK", "0")))
        elif os.environ.get("EGOM2P_FLASH64_TRAIN", "1") == "0":  # A/B switch
            return None
        else:
            def call(q, k, v, kvb):
                from egom2p_tpu.ops.flash64_train import flash64_train_attention
                return flash64_train_attention(q, k, v, kvb)

        mask_arr = kv_blocked
    if tp_mesh is not None:
        return _tp_shard_mapped(tp_mesh, call, q, k, v, mask_arr)
    return call(q, k, v, mask_arr)


def _merge_heads(x):
    b, h, n, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * hd)


class Attention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    norm_bias: bool = True
    softmax1: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None):
        dim = x.shape[-1]
        qkv = nn.Dense(dim * 3, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.qk_norm:
            hd = dim // self.num_heads
            per_head = lambda t, m: m(  # noqa: E731  per-head LN, layout-free
                t.reshape(*t.shape[:-1], self.num_heads, hd)).reshape(t.shape)
            q = per_head(q, LayerNorm(use_bias=self.norm_bias, name="q_norm"))
            k = per_head(k, LayerNorm(use_bias=self.norm_bias, name="k_norm"))
        fast = _try_flash64(q, k, v, mask, self.num_heads, self.softmax1)
        if fast is not None:
            return nn.Dense(dim, use_bias=self.proj_bias, dtype=self.dtype,
                            name="proj")(fast)
        q, k, v = (_split_heads(t, self.num_heads) for t in (q, k, v))
        if mask is not None and not isinstance(mask, SegmentMask) and mask.ndim == 3:
            mask = mask[:, None]  # add head dim
        out = masked_attention(q, k, v, mask, softmax1=self.softmax1)
        return nn.Dense(dim, use_bias=self.proj_bias, dtype=self.dtype,
                        name="proj")(_merge_heads(out))


class CrossAttention(nn.Module):
    num_heads: int
    qkv_bias: bool = True
    proj_bias: bool = True
    qk_norm: bool = False
    norm_bias: bool = True
    softmax1: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context, mask=None):
        dim = x.shape[-1]
        q = nn.Dense(dim, use_bias=self.qkv_bias, dtype=self.dtype,
                     name="q")(x)
        kv = nn.Dense(dim * 2, use_bias=self.qkv_bias, dtype=self.dtype,
                      name="kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)
        if self.qk_norm:
            hd = dim // self.num_heads
            per_head = lambda t, m: m(  # noqa: E731
                t.reshape(*t.shape[:-1], self.num_heads, hd)).reshape(t.shape)
            q = per_head(q, LayerNorm(use_bias=self.norm_bias, name="q_norm"))
            k = per_head(k, LayerNorm(use_bias=self.norm_bias, name="k_norm"))
        fast = _try_flash64(q, k, v, mask, self.num_heads, self.softmax1)
        if fast is not None:
            return nn.Dense(dim, use_bias=self.proj_bias, dtype=self.dtype,
                            name="proj")(fast)
        q, k, v = (_split_heads(t, self.num_heads) for t in (q, k, v))
        if mask is not None and not isinstance(mask, SegmentMask) and mask.ndim == 3:
            mask = mask[:, None]
        out = masked_attention(q, k, v, mask, softmax1=self.softmax1)
        return nn.Dense(dim, use_bias=self.proj_bias, dtype=self.dtype,
                        name="proj")(_merge_heads(out))


def _drop_path(x, rate: float, deterministic: bool, rng):
    """Stochastic depth per sample (reference: egom2p_utils.py:89-100)."""
    if rate == 0.0 or deterministic:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape).astype(x.dtype)
    return x / keep * mask


class Block(nn.Module):
    """Pre-norm self-attention block (reference: egom2p_utils.py:335-359)."""
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    norm_bias: bool = True
    gated_mlp: bool = False
    qk_norm: bool = False
    act: Callable = nn.gelu
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, mask=None, deterministic: bool = True):
        dim = x.shape[-1]
        attn = Attention(self.num_heads, self.qkv_bias, self.proj_bias,
                         self.qk_norm, self.norm_bias, dtype=self.dtype,
                         name="attn")
        h = attn(LayerNorm(use_bias=self.norm_bias, name="norm1")(x), mask)
        if self.drop_path > 0 and not deterministic:
            h = _drop_path(h, self.drop_path, deterministic, self.make_rng("dropout"))
        x = x + h
        mlp_cls = GatedMlp if self.gated_mlp else Mlp
        h = mlp_cls(int(dim * self.mlp_ratio), act=self.act, use_bias=self.mlp_bias,
                    dtype=self.dtype,
                    name="mlp")(LayerNorm(use_bias=self.norm_bias, name="norm2")(x))
        if self.drop_path > 0 and not deterministic:
            h = _drop_path(h, self.drop_path, deterministic, self.make_rng("dropout"))
        return x + h


class DecoderBlock(nn.Module):
    """Self-attn + cross-attn + MLP (reference: egom2p_utils.py:362-391)."""
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    proj_bias: bool = True
    mlp_bias: bool = True
    norm_bias: bool = True
    gated_mlp: bool = False
    qk_norm: bool = False
    act: Callable = nn.gelu
    drop_path: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context, sa_mask=None, xa_mask=None, deterministic: bool = True):
        dim = x.shape[-1]
        h = Attention(self.num_heads, self.qkv_bias, self.proj_bias,
                      self.qk_norm, self.norm_bias, dtype=self.dtype,
                      name="self_attn")(
            LayerNorm(use_bias=self.norm_bias, name="norm1")(x), sa_mask)
        if self.drop_path > 0 and not deterministic:
            h = _drop_path(h, self.drop_path, deterministic, self.make_rng("dropout"))
        x = x + h
        h = CrossAttention(self.num_heads, self.qkv_bias, self.proj_bias,
                           self.qk_norm, self.norm_bias, dtype=self.dtype,
                           name="cross_attn")(
            LayerNorm(use_bias=self.norm_bias, name="query_norm")(x),
            LayerNorm(use_bias=self.norm_bias, name="context_norm")(context),
            xa_mask)
        if self.drop_path > 0 and not deterministic:
            h = _drop_path(h, self.drop_path, deterministic, self.make_rng("dropout"))
        x = x + h
        mlp_cls = GatedMlp if self.gated_mlp else Mlp
        h = mlp_cls(int(dim * self.mlp_ratio), act=self.act, use_bias=self.mlp_bias,
                    dtype=self.dtype,
                    name="mlp")(LayerNorm(use_bias=self.norm_bias, name="norm2")(x))
        if self.drop_path > 0 and not deterministic:
            h = _drop_path(h, self.drop_path, deterministic, self.make_rng("dropout"))
        return x + h
