"""LoRA adapters for EgoM2P finetuning.

Functional equivalent of the reference LoRA utilities
(reference: egom2p/models/lora_utils.py:44-177): low-rank A/B factors per
target linear layer, trained with the base weights frozen, then fused back
into the dense weights for inference.

TPU-first design: instead of wrapper modules, LoRA lives as a separate param
pytree; `merge_lora` produces effective weights (W + scale * A @ B) which the
unchanged model consumes.  The merge is a handful of small matmuls per step,
negligible next to the forward, and keeps a single code path under jit.
"""
from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp


# Attention-module linears only, like the reference's default
# target_replace_modules=ATTENTION_MODULES (lora_utils.py:128-134); the
# attention-ancestor check keeps e.g. the raw-pixel patch-embed "proj" out.
DEFAULT_TARGETS = ("qkv", "kv", "qk", "qv", "q", "proj")

# packed projections get an n-times-wider bottleneck
# (reference: lora_utils.py:146-153)
_PACKED = {"qkv": 3, "kv": 2, "qk": 2, "qv": 2}


def _is_target(path: Tuple[str, ...], targets) -> bool:
    return (len(path) >= 2 and path[-1] == "kernel" and path[-2] in targets
            and any("attn" in seg for seg in path[:-2]))


def init_lora_params(params: Dict, rng: jax.Array, rank: int = 4,
                     targets=DEFAULT_TARGETS) -> Dict:
    """Create {path: {'a': (in, r'), 'b': (r', out)}} for every attention
    linear, with r' = num_packed * rank for packed qkv/kv projections.

    a ~ N(0, 1/r), b = 0 so the initial adapter is a no-op
    (reference: lora_utils.py:59-69)."""
    flat = jax.tree_util.tree_leaves_with_path(params)
    lora = {}
    for path, leaf in flat:
        keys = tuple(p.key for p in path)
        if not _is_target(keys, targets):
            continue
        d_in, d_out = leaf.shape
        r_eff = _PACKED.get(keys[-2], 1) * rank
        rng, k = jax.random.split(rng)
        lora["/".join(keys)] = {
            "a": jax.random.normal(k, (d_in, r_eff), jnp.float32) / rank,
            "b": jnp.zeros((r_eff, d_out), jnp.float32),
        }
    return lora


def merge_lora(params: Dict, lora: Dict, scale: float = 1.0) -> Dict:
    """Return params with W + scale * (a @ b) applied to each adapted kernel
    (reference fuse: lora_utils.py:156-177)."""

    def visit(path, leaf):
        key = "/".join(p.key for p in path)
        if key in lora:
            ab = lora[key]["a"] @ lora[key]["b"]
            return leaf + scale * ab.astype(leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, params)


def lora_train_step_fn(model_apply: Callable, base_params: Dict,
                       scale: float = 1.0):
    """Build loss_fn(lora, *args) that differentiates only the adapters
    (reference: inject_trainable_LoRA freezes the base, lora_utils.py:128-153)."""

    def apply_with_lora(lora, *args, **kwargs):
        merged = merge_lora(base_params, lora, scale)
        return model_apply(merged, *args, **kwargs)

    return apply_with_lora
