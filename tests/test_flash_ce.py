"""Parity tests for the Pallas flash-CE forward (ops/flash_ce.py).

All run in interpret mode on CPU; the dense reference materializes the
full logits matrix the kernel is designed to avoid.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import flatten_util

from egom2p_tpu.ops.flash_ce import _pick_bv, _row_stats, flash_ce_total


def _dense_total(y, w_mat, t, wts):
    logits = jnp.einsum("rd,vd->rv", y, w_mat.astype(y.dtype),
                        preferred_element_type=jnp.float32)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, t[:, None], axis=-1)[:, 0]
    return jnp.sum((logz - gold) * wts)


def _case(R=300, D=256, V=1000, seed=3):
    rng = np.random.default_rng(seed)
    y = jnp.asarray(rng.normal(0, 1, (R, D)), jnp.bfloat16)
    w_mat = jnp.asarray(rng.normal(0, 0.02, (V, D)), jnp.float32)
    t = jnp.asarray(rng.integers(0, V, R), jnp.int32)
    wts = jnp.asarray(rng.random(R) < 0.6, jnp.float32)
    return y, w_mat, t, wts


@pytest.mark.parametrize("V", [1000, 2048])  # padded+masked vs exact tiling
def test_row_stats_matches_dense(V):
    y, w_mat, t, _ = _case(V=V)
    logz, gold = _row_stats(y, w_mat.astype(y.dtype), t, interpret=True)
    logits = jnp.einsum("rd,vd->rv", y, w_mat.astype(y.dtype),
                        preferred_element_type=jnp.float32)
    np.testing.assert_allclose(np.asarray(logz),
                               np.asarray(jax.nn.logsumexp(logits, -1)),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(gold),
        np.asarray(jnp.take_along_axis(logits, t[:, None], -1)[:, 0]),
        rtol=1e-6, atol=1e-6)


def test_pick_bv():
    assert _pick_bv(64000) == (64000, 6400)   # exact divisor, no padding
    assert _pick_bv(1000) == (4096, 4096)     # padded + masked
    vp, bv = _pick_bv(2048)
    assert vp == 2048 and vp % bv == 0


def test_total_and_grads_match_dense():
    y, w_mat, t, wts = _case()

    def flash(y, w_mat):
        return flash_ce_total(y, w_mat, t, wts, chunk=128, interpret=True)

    def dense(y, w_mat):
        return _dense_total(y, w_mat, t, wts)

    tf, (dyf, dwf) = jax.value_and_grad(flash, argnums=(0, 1))(y, w_mat)
    td, (dyd, dwd) = jax.value_and_grad(dense, argnums=(0, 1))(y, w_mat)
    np.testing.assert_allclose(float(tf), float(td), rtol=1e-5)
    # dy is bf16 in both paths; dW fp32 accumulated from bf16 matmuls
    np.testing.assert_allclose(np.asarray(dyf, np.float32),
                               np.asarray(dyd, np.float32),
                               rtol=0, atol=3e-2)
    np.testing.assert_allclose(np.asarray(dwf), np.asarray(dwd),
                               rtol=0, atol=3e-2)


def test_zero_weight_rows_do_not_contribute():
    y, w_mat, t, wts = _case(R=128)
    base = flash_ce_total(y, w_mat, t, wts, interpret=True)
    # poison the zero-weight rows' activations; total must not move
    poison = jnp.where((wts == 0)[:, None], 50.0, 0.0).astype(y.dtype)
    moved = flash_ce_total(y + poison, w_mat, t, wts, interpret=True)
    np.testing.assert_allclose(float(base), float(moved), rtol=1e-4)


def test_ce_routing_ignores_attention_probe(monkeypatch):
    """Regression (round-4 red tier): tests that monkeypatch the attention
    routing probe ``supports_flash -> True`` on CPU must NOT drag the CE
    loss into a non-interpret pallas_call.  CE gates on the raw backend
    probe and must take the chunked XLA path here, not crash."""
    import egom2p_tpu.ops.flash64_train as f64t
    import egom2p_tpu.ops.flash_attention as fa
    import egom2p_tpu.ops.flash_ce as fce
    from egom2p_tpu.data import MODALITY_INFO
    from egom2p_tpu.models import create_model
    from tests.test_model import make_mod_dict

    MODS = ("tok_rgb", "tok_cam")
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", MODS, MODS)
    rng = np.random.default_rng(1)
    md = make_mod_dict(rng, batch=1, mods=MODS, n_in=128, n_tgt=128,
                       info=MODALITY_INFO)
    params = model.init(jax.random.PRNGKey(0), md, 128, 128)

    def boom(*a, **kw):
        raise AssertionError("flash_ce_total reached on CPU backend")

    # attention routes to the interpret-mode train kernels (same setup as
    # test_flash64_train.py's routing-parity test)...
    real = f64t.flash64_train_attention
    monkeypatch.setattr(f64t, "flash64_train_attention",
                        lambda *a, **kw: real(*a, **{**kw,
                                                     "interpret": True}))
    monkeypatch.setattr(fa, "supports_flash", lambda: True)
    monkeypatch.setattr(fa, "flash_backend_available", lambda: True)
    # ...but CE must NOT follow either attention probe onto the CPU backend
    monkeypatch.setattr(fce, "flash_ce_total", boom)
    loss = model.apply(params, md, 128, 128, "mod")[0]
    assert np.isfinite(float(loss))


def test_model_loss_routes_flash_ce(monkeypatch):
    """Model-level: loss and grads identical between the flash-CE path
    (interpret) and the chunked-scan path."""
    from egom2p_tpu.data import MODALITY_INFO
    from egom2p_tpu.models import create_model
    from tests.test_model import make_mod_dict

    MODS = ("tok_rgb", "tok_cam")
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", MODS, MODS)
    rng = np.random.default_rng(0)
    md = make_mod_dict(rng, batch=2, mods=MODS, n_in=128, n_tgt=128,
                       info=MODALITY_INFO)
    params = model.init(jax.random.PRNGKey(0), md, 128, 128)

    def loss_fn(p):
        return model.apply(p, md, 128, 128, "mod")[0]

    monkeypatch.setenv("EGOM2P_FLASH_CE", "interpret")
    l_flash, g_flash = jax.value_and_grad(loss_fn)(params)
    monkeypatch.setenv("EGOM2P_FLASH_CE", "0")
    l_ref, g_ref = jax.value_and_grad(loss_fn)(params)

    np.testing.assert_allclose(float(l_flash), float(l_ref), rtol=1e-5)
    flat_f, _ = flatten_util.ravel_pytree(g_flash)
    flat_r, _ = flatten_util.ravel_pytree(g_ref)
    np.testing.assert_allclose(np.asarray(flat_f), np.asarray(flat_r),
                               rtol=0, atol=3e-2)


def test_pallas_bwd_matches_chunked(monkeypatch):
    """The fused one-pass Pallas backward (EGOM2P_CE_PALLAS_BWD=1) must
    reproduce the chunked-XLA backward's dy/dW (interpret mode on CPU),
    including padded-vocab masking and zero-weight rows."""
    import egom2p_tpu.ops.flash_ce as fce

    rng = np.random.default_rng(5)
    R, D, V = 200, 128, 5000  # V % every bv candidate != 0 -> padded rows
    y = jnp.asarray(rng.normal(size=(R, D)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(V, D)) * 0.05, jnp.float32)
    t = jnp.asarray(rng.integers(0, V, size=(R,)), jnp.int32)
    wts = jnp.asarray((rng.random(R) > 0.3).astype(np.float32))

    def total(y, w):
        return fce.flash_ce_total(y, w, t, wts, chunk=64, interpret=True)

    monkeypatch.setenv("EGOM2P_CE_PALLAS_BWD", "0")
    l_ref, (dy_ref, dw_ref) = jax.value_and_grad(total, argnums=(0, 1))(y, w)
    monkeypatch.setenv("EGOM2P_CE_PALLAS_BWD", "1")
    l_pl, (dy_pl, dw_pl) = jax.value_and_grad(total, argnums=(0, 1))(y, w)

    np.testing.assert_allclose(float(l_pl), float(l_ref), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(dy_pl), np.asarray(dy_ref),
                               atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(dw_pl), np.asarray(dw_ref),
                               atol=2e-3, rtol=1e-3)
