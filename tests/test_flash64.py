"""flash64 inference attention kernel: numerical parity vs the dense
reference path (interpret mode, CPU), mask semantics, and the
inference_attention routing flag."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egom2p_tpu.ops.attention import masked_attention
from egom2p_tpu.ops.flash64 import flash64_attention


def _dense_reference(q, k, v, kv_blocked, num_heads):
    """(B, N, C) in/out via the existing dense path, at the kernel's bf16
    matmul precision (flash64 always feeds the MXU bf16)."""
    B, N, C = q.shape
    hd = C // num_heads
    tr = lambda t: t.astype(jnp.bfloat16).reshape(
        B, -1, num_heads, hd).transpose(0, 2, 1, 3)
    mask = None
    if kv_blocked is not None:
        mask = kv_blocked[:, None, None, :]
    out = masked_attention(tr(q), tr(k), tr(v), mask)
    return np.asarray(out.transpose(0, 2, 1, 3).reshape(B, N, C),
                      np.float32)


def _rand(shape, key, dtype=jnp.float32):
    return jax.random.normal(key, shape, dtype)


@pytest.mark.parametrize("N,M", [(640, 640), (384, 1111)])
def test_flash64_matches_dense(N, M):
    """Self- and cross-attention shapes, including non-block-aligned M
    (exercises the padding bias path)."""
    B, H = 2, 4
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    q = _rand((B, N, H * 64), keys[0])
    k = _rand((B, M, H * 64), keys[1])
    v = _rand((B, M, H * 64), keys[2])
    out = flash64_attention(q, k, v, bq=256, bk=256, interpret=True)
    ref = _dense_reference(q, k, v, None, H)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2e-2, rtol=2e-2)


def test_flash64_key_padding_mask():
    B, H, N = 2, 2, 256
    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    q = _rand((B, N, H * 64), keys[0])
    k = _rand((B, N, H * 64), keys[1])
    v = _rand((B, N, H * 64), keys[2])
    blocked = jnp.asarray(
        np.random.default_rng(0).uniform(size=(B, N)) > 0.6)
    out = flash64_attention(q, k, v, blocked, bq=128, bk=128, interpret=True)
    ref = _dense_reference(q, k, v, blocked, H)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2e-2, rtol=2e-2)


def test_flash64_fully_blocked_rows_zero():
    """A batch row whose every key is blocked must output exactly 0
    (emptied-CFG-conditioning convention)."""
    B, H, N = 2, 2, 256
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    q = _rand((B, N, H * 64), keys[0])
    k = _rand((B, N, H * 64), keys[1])
    v = _rand((B, N, H * 64), keys[2])
    blocked = jnp.zeros((B, N), bool).at[1].set(True)
    out = np.asarray(flash64_attention(q, k, v, blocked, bq=128, bk=128,
                                       interpret=True))
    assert (out[1] == 0).all()
    ref = _dense_reference(q, k, v, blocked, H)
    np.testing.assert_allclose(out[0].astype(np.float32), ref[0],
                               atol=2e-2, rtol=2e-2)


def test_flash64_bf16():
    B, H, N = 1, 2, 512
    keys = jax.random.split(jax.random.PRNGKey(3), 3)
    q = _rand((B, N, H * 64), keys[0], jnp.bfloat16)
    k = _rand((B, N, H * 64), keys[1], jnp.bfloat16)
    v = _rand((B, N, H * 64), keys[2], jnp.bfloat16)
    out = flash64_attention(q, k, v, bq=256, bk=256, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = _dense_reference(q, k, v, None, H)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=3e-2, rtol=3e-2)


def test_block_choosers():
    from egom2p_tpu.ops.flash64 import _adaptive_block, _divisor_block

    # adaptive: largest candidate whose padding waste fits the budget
    assert _adaptive_block(5120, (1024, 512), 0.04) == 1024  # exact
    assert _adaptive_block(6912, (1024, 512), 0.04) == 1024  # 3.7% waste
    assert _adaptive_block(8704, (1024, 512), 0.04) == 512   # 5.9% > 4%
    assert _adaptive_block(8704, (1024, 512), 0.08) == 1024
    # equal-padding tie (1707 -> 2048 either way) goes to the larger block
    assert _adaptive_block(1707, (1024, 512), 0.04) == 1024
    # divisor: minimize padded length, tie-break toward larger blocks
    assert _divisor_block(5120, 2560) == 2560  # 2 exact iterations
    assert _divisor_block(6912, 2560) == 2304  # 3 exact iterations
    assert _divisor_block(8704, 2560) == 2176  # 4 exact iterations
    assert _divisor_block(1111, 2560) == 1152  # nothing divides; min pad


def test_inference_attention_flag():
    from egom2p_tpu.ops.attention import (inference_attention,
                                          inference_attention_active)

    assert not inference_attention_active()
    with inference_attention():
        assert inference_attention_active()
    assert not inference_attention_active()


def test_try_flash64_eligibility_cpu_disabled():
    """On the CPU test backend supports_flash() is False, so the module path
    must fall back to dense even inside inference_attention()."""
    from egom2p_tpu.models.transformer import _try_flash64
    from egom2p_tpu.ops.attention import inference_attention

    q = jnp.zeros((1, 512, 128))
    with inference_attention():
        assert _try_flash64(q, q, q, None, 2, False) is None


@pytest.mark.parametrize("safemax", [True, False])
def test_flash64_softmax_modes_match_dense(safemax):
    """Both softmax modes (classic running-max and the default clamp-only
    no-shift form) must match the dense path, including under a partial
    key mask and a wider-than-typical logit spread (4x-scaled queries)."""
    B, H, N = 2, 2, 256
    keys = jax.random.split(jax.random.PRNGKey(11), 3)
    q = _rand((B, N, H * 64), keys[0]) * 4.0  # logit spread ~ +-40 exp2 units
    k = _rand((B, N, H * 64), keys[1])
    v = _rand((B, N, H * 64), keys[2])
    blocked = jnp.asarray(
        np.random.default_rng(1).uniform(size=(B, N)) > 0.7)
    out = flash64_attention(q, k, v, blocked, bq=128, bk=128,
                            interpret=True, safemax=safemax)
    ref = _dense_reference(q, k, v, blocked, H)
    np.testing.assert_allclose(np.asarray(out, np.float32), ref,
                               atol=2e-2, rtol=2e-2)


def test_flash64_noshift_saturation_is_bounded():
    """Scores beyond the +80 exp2-unit clamp saturate toward uniform
    weights over the clamped entries instead of producing inf/nan (the
    documented out-of-contract behavior of the clamp-only softmax)."""
    B, H, N = 1, 2, 128
    keys = jax.random.split(jax.random.PRNGKey(12), 3)
    q = _rand((B, N, H * 64), keys[0]) * 32.0  # scores far past the clamp
    k = _rand((B, N, H * 64), keys[1]) * 32.0
    v = _rand((B, N, H * 64), keys[2])
    out = np.asarray(flash64_attention(q, k, v, bq=128, bk=128,
                                       interpret=True, safemax=False),
                     np.float32)
    assert np.isfinite(out).all()
    # every output row is a convex combination of value rows
    assert np.abs(out).max() <= np.abs(np.asarray(v, np.float32)).max() + 1e-2
