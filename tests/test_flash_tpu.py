"""Flash-attention TPU smoke: fwd AND bwd of both wrappers compile and match
the dense path numerically on the real chip.

The rest of the suite runs on CPU where supports_flash() is False, so the
Pallas kernels (and especially their VMEM-hungry backward) would otherwise
ship untested — a 1024-block bwd once compiled-failed only on hardware.
Runs in a subprocess because conftest pins this interpreter to CPU.
"""
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_CHECK = r"""
import numpy as np
import jax, jax.numpy as jnp
from egom2p_tpu.core.cache import enable_persistent_cache
enable_persistent_cache()
from egom2p_tpu.ops.flash_attention import (padding_flash_attention,
                                            segment_flash_attention,
                                            supports_flash)
assert supports_flash(), "no accelerator backend"

B, H, N, hd = 2, 4, 1024, 64
k0 = jax.random.PRNGKey(0)
q = jax.random.normal(k0, (B, H, N, hd), jnp.bfloat16)
k = jax.random.normal(jax.random.fold_in(k0, 1), (B, H, N, hd), jnp.bfloat16)
v = jax.random.normal(jax.random.fold_in(k0, 2), (B, H, N, hd), jnp.bfloat16)
blocked = np.zeros((B, N), bool); blocked[:, 900:] = True
seg = np.zeros((B, N), np.int32); seg[:, 512:] = 1

def dense(q, k, v, mask4):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * hd ** -0.5
    s = jnp.where(mask4, -1e30, s)
    w = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", w, v)

for name, fn, ref_mask in (
    ("padding", lambda q, k, v: padding_flash_attention(
        q, k, v, jnp.asarray(blocked)),
     jnp.asarray(blocked)[:, None, None, :]),
    ("segment", lambda q, k, v: segment_flash_attention(
        q, k, v, jnp.asarray(seg)),
     (seg[:, None, :] != seg[:, :, None])[:, None]),
):
    out = jax.jit(fn)(q, k, v)
    ref = jax.jit(lambda q, k, v, m=ref_mask: dense(q, k, v, m))(q, k, v)
    d = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
    assert d < 0.05, f"{name} fwd diff {d}"
    # backward: sum-of-output gradient wrt q must match dense within bf16
    g = jax.jit(jax.grad(lambda q: fn(q, k, v).astype(jnp.float32).sum()))(q)
    gr = jax.jit(jax.grad(
        lambda q, m=ref_mask: dense(q, k, v, m).astype(jnp.float32).sum()))(q)
    dg = np.abs(np.asarray(g, np.float32) - np.asarray(gr, np.float32)).max()
    assert dg < 0.25, f"{name} bwd diff {dg}"
    print(name, "ok", float(d), float(dg))

# flash64 inference kernel on hardware: projection layout, padding mask,
# vs the same dense reference (tests/test_flash64.py covers interpret mode)
from egom2p_tpu.ops.flash64 import flash64_attention
q2 = q.transpose(0, 2, 1, 3).reshape(B, N, H * hd)
k2 = k.transpose(0, 2, 1, 3).reshape(B, N, H * hd)
v2 = v.transpose(0, 2, 1, 3).reshape(B, N, H * hd)
out64 = jax.jit(lambda q, k, v: flash64_attention(
    q, k, v, jnp.asarray(blocked)))(q2, k2, v2)
ref = dense(q, k, v, jnp.asarray(blocked)[:, None, None, :])
ref2 = np.asarray(ref.transpose(0, 2, 1, 3).reshape(B, N, H * hd), np.float32)
d64 = np.abs(np.asarray(out64, np.float32) - ref2).max()
assert d64 < 0.05, f"flash64 fwd diff {d64}"
print("flash64 ok", float(d64))

# flash64 TRAINING kernels on hardware: fwd + dq/dk/dv vs dense grads
# (tests/test_flash64_train.py covers interpret mode)
from egom2p_tpu.ops.flash64_train import flash64_train_attention
kvb = jnp.asarray(blocked)

def loss_fast(q2, k2, v2):
    o = flash64_train_attention(q2, k2, v2, kvb)
    return jnp.sum(o.astype(jnp.float32) ** 2)

def loss_ref(q2, k2, v2):
    qh = q2.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    kh = k2.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    vh = v2.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    o = dense(qh, kh, vh, kvb[:, None, None, :])
    return jnp.sum(o.astype(jnp.float32) ** 2)

oT = jax.jit(lambda q, k, v: flash64_train_attention(q, k, v, kvb))(
    q2, k2, v2)
dT = np.abs(np.asarray(oT, np.float32) - ref2).max()
assert dT < 0.05, f"flash64_train fwd diff {dT}"
gT = jax.jit(jax.grad(loss_fast, argnums=(0, 1, 2)))(q2, k2, v2)
gR = jax.jit(jax.grad(loss_ref, argnums=(0, 1, 2)))(q2, k2, v2)
for name, a, b in zip(("dq", "dk", "dv"), gT, gR):
    a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
    scale = max(np.abs(b).max(), 1e-3)
    dd = np.abs(a - b).max() / scale
    assert dd < 0.05, f"flash64_train {name} rel diff {dd}"
print("flash64_train ok", float(dT))

# segment mode (decoder same-modality self-attention) fwd+bwd on hardware
segj = jnp.asarray(seg)

def loss_seg_fast(q2, k2, v2):
    o = flash64_train_attention(q2, k2, v2, segments=segj)
    return jnp.sum(o.astype(jnp.float32) ** 2)

def loss_seg_ref(q2, k2, v2):
    qh = q2.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    kh = k2.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    vh = v2.reshape(B, N, H, hd).transpose(0, 2, 1, 3)
    m = (seg[:, None, :] != seg[:, :, None])[:, None]
    o = dense(qh, kh, vh, m)
    return jnp.sum(o.astype(jnp.float32) ** 2)

gS = jax.jit(jax.grad(loss_seg_fast, argnums=(0, 1, 2)))(q2, k2, v2)
gSR = jax.jit(jax.grad(loss_seg_ref, argnums=(0, 1, 2)))(q2, k2, v2)
for name, a, b in zip(("dq", "dk", "dv"), gS, gSR):
    a = np.asarray(a, np.float32); b = np.asarray(b, np.float32)
    scale = max(np.abs(b).max(), 1e-3)
    dd = np.abs(a - b).max() / scale
    assert dd < 0.05, f"flash64_train seg {name} rel diff {dd}"
print("flash64_train seg ok")
print("FLASH_TPU_OK")
"""


def _tpu_available() -> bool:
    return os.environ.get("JAX_PLATFORMS", "").lower() not in ("cpu",) and (
        os.path.exists("/root/.axon_site") or "TPU_NAME" in os.environ)


_PROBE = ("import jax, numpy as np, jax.numpy as jnp\n"
          "x = jnp.ones((8, 8))\n"
          "print(np.asarray(jax.jit(lambda a: (a @ a).reshape(-1)[0])(x)))\n")


def _tpu_reachable(env) -> bool:
    """A present axon/TPU backend can still have a dead tunnel; a tiny
    computation with a short timeout separates 'down' (skip) from broken
    kernels (fail)."""
    try:
        proc = subprocess.run([sys.executable, "-c", _PROBE], env=env,
                              capture_output=True, text=True, timeout=180)
        return proc.returncode == 0
    except subprocess.TimeoutExpired:
        return False


@pytest.mark.skipif(not _tpu_available(), reason="no TPU backend")
def test_flash_fwd_bwd_matches_dense_on_tpu():
    env = {k: v for k, v in os.environ.items()
           if not k.startswith("XLA_FLAGS")}
    if not _tpu_reachable(env):
        pytest.skip("TPU backend present but unreachable (tunnel down)")
    proc = subprocess.run(
        [sys.executable, "-c", _CHECK], env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "FLASH_TPU_OK" in proc.stdout
