"""Mixed-precision policy.

The reference uses torch.cuda.amp autocast bf16 with fp32 master params and a
GradScaler (reference: run_training_egom2p.py:725, egom2p/utils/native_scaler.py:21).
On TPU, bf16 is native: we keep parameters and optimizer state in fp32 and run
matmuls/activations in bf16; no loss scaling is needed.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Softmax / layernorm statistics always accumulate in fp32.
    norm_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return x.astype(self.compute_dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x


DEFAULT_PRECISION = Precision()
FP32_PRECISION = Precision(compute_dtype=jnp.float32)


def resolve(dtype_str: str) -> Precision:
    """Map the reference's config dtype strings to a precision policy
    (reference: cfgs/.../ego-b...yaml `dtype: bfloat16`)."""
    s = dtype_str.lower()
    if s in ("bf16", "bfloat16"):
        return DEFAULT_PRECISION
    if s in ("fp32", "float32"):
        return FP32_PRECISION
    if s in ("fp16", "float16"):
        # TPU has no fast fp16; bf16 is the hardware-native choice.
        return DEFAULT_PRECISION
    raise ValueError(f"unknown dtype {dtype_str}")
