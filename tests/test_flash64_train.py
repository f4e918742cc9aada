"""flash64 TRAINING kernels (ops/flash64_train.py): forward and gradient
parity vs the dense reference path in interpret mode (CPU), including
key-padding masks, sequence padding, and fully-masked rows."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from egom2p_tpu.ops.attention import masked_attention
from egom2p_tpu.ops.flash64_train import flash64_train_attention

pytestmark = pytest.mark.slow


def _dense(q, k, v, kv_blocked, num_heads):
    """(B, N, C) dense reference at the kernel's bf16 matmul precision."""
    B, N, C = q.shape
    hd = C // num_heads
    tr = lambda t: t.astype(jnp.bfloat16).reshape(  # noqa: E731
        B, -1, num_heads, hd).transpose(0, 2, 1, 3)
    mask = None if kv_blocked is None else kv_blocked[:, None, None, :]
    out = masked_attention(tr(q), tr(k), tr(v), mask)
    return out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(jnp.float32)


def _rand(key, shape):
    return jax.random.normal(key, shape, jnp.float32)


@pytest.mark.parametrize("n,m,mask", [(256, 256, False), (256, 384, True),
                                      (300, 200, True)])
def test_fwd_parity(n, m, mask):
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    B, H = 2, 4
    q, k, v = (_rand(ks[i], (B, nn, H * 64))
               for i, nn in enumerate((n, m, m)))
    kvb = (jax.random.bernoulli(ks[3], 0.3, (B, m)) if mask else None)
    out = flash64_train_attention(q, k, v, kvb, interpret=True)
    ref = _dense(q, k, v, kvb, H)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("mask", [False, True])
def test_grad_parity(mask):
    ks = jax.random.split(jax.random.PRNGKey(1), 4)
    B, H, n, m = 2, 2, 256, 256
    q, k, v = (_rand(ks[i], (B, nn, H * 64))
               for i, nn in enumerate((n, m, m)))
    kvb = (jax.random.bernoulli(ks[3], 0.25, (B, m)) if mask else None)

    def loss_fast(q, k, v):
        o = flash64_train_attention(q, k, v, kvb, interpret=True)
        return jnp.sum(o.astype(jnp.float32) * jnp.cos(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        o = _dense(q, k, v, kvb, H)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        # bf16 matmuls in both paths; grads accumulate over 256-length
        # contractions, so tolerances scale with magnitude
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-2,
                                   err_msg=name)


def test_fully_masked_rows_zero_grads():
    """A batch row whose every key is blocked: output AND all grads for that
    row must be exactly zero (matching the dense path's emptied-CFG
    convention)."""
    ks = jax.random.split(jax.random.PRNGKey(2), 3)
    B, H, n, m = 2, 2, 128, 128
    q, k, v = (_rand(ks[i], (B, nn, H * 64))
               for i, nn in enumerate((n, m, m)))
    kvb = jnp.zeros((B, m), bool).at[1].set(True)  # row 1 fully blocked

    out = flash64_train_attention(q, k, v, kvb, interpret=True)
    assert np.abs(np.asarray(out[1], np.float32)).max() == 0.0

    def loss(q, k, v):
        o = flash64_train_attention(q, k, v, kvb, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    dq, dk, dv = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.abs(np.asarray(dq[1], np.float32)).max() == 0.0
    assert np.abs(np.asarray(dk[1], np.float32)).max() == 0.0
    assert np.abs(np.asarray(dv[1], np.float32)).max() == 0.0
    # the unmasked row still flows gradients
    assert np.abs(np.asarray(dq[0], np.float32)).max() > 0.0


def _dense_seg(q, k, v, segments, num_heads):
    """Dense reference for segment self-attention (same-segment visible)."""
    blocked = segments[:, None, :] != segments[:, :, None]
    B, N, C = q.shape
    hd = C // num_heads
    tr = lambda t: t.astype(jnp.bfloat16).reshape(  # noqa: E731
        B, -1, num_heads, hd).transpose(0, 2, 1, 3)
    out = masked_attention(tr(q), tr(k), tr(v), blocked[:, None])
    return out.transpose(0, 2, 1, 3).reshape(B, N, C).astype(jnp.float32)


@pytest.mark.parametrize("n", [256, 300])
def test_segment_fwd_parity(n):
    """Same-segment masking vs the dense path, incl. non-block-aligned
    lengths (pad rows must come back exactly zero... they are sliced off)
    and a -1 padding segment like the decoder's mod_k."""
    ks = jax.random.split(jax.random.PRNGKey(4), 4)
    B, H = 2, 4
    q, k, v = (_rand(ks[i], (B, n, H * 64)) for i in range(3))
    segments = jax.random.randint(ks[3], (B, n), -1, 3)
    out = flash64_train_attention(q, k, v, segments=segments, interpret=True)
    ref = _dense_seg(q, k, v, segments, H)
    np.testing.assert_allclose(np.asarray(out, np.float32), np.asarray(ref),
                               atol=2e-2, rtol=2e-2)


def test_segment_grad_parity():
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    B, H, n = 2, 2, 256
    q, k, v = (_rand(ks[i], (B, n, H * 64)) for i in range(3))
    segments = jax.random.randint(ks[3], (B, n), 0, 4)

    def loss_fast(q, k, v):
        o = flash64_train_attention(q, k, v, segments=segments,
                                    interpret=True)
        return jnp.sum(o.astype(jnp.float32) * jnp.cos(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        o = _dense_seg(q, k, v, segments, H)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(gf, gr, ("dq", "dk", "dv")):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=4e-2,
                                   err_msg=name)


def test_segment_module_routing(monkeypatch):
    """models/transformer.py Attention with a SegmentMask must route through
    flash64_train_attention (when flash is supported) and reproduce the
    stock dense path's output; the EGOM2P_F64T_SEG=0 switch and the
    generation trace context must each send it back to the dense path."""
    import egom2p_tpu.ops.flash64_train as f64t
    import egom2p_tpu.ops.flash_attention as fa
    from egom2p_tpu.models.transformer import Attention
    from egom2p_tpu.ops.attention import SegmentMask, inference_attention

    ks = jax.random.split(jax.random.PRNGKey(6), 2)
    B, H, n = 1, 2, 256
    x = _rand(ks[0], (B, n, H * 64))
    segments = jnp.asarray(np.repeat([0, 1, 2, -1], n // 4)[None])
    mask = SegmentMask(segments=segments)
    module = Attention(num_heads=H)
    params = module.init(ks[1], x, mask)
    ref = module.apply(params, x, mask)  # CPU default: dense path

    calls = {"n": 0}
    real = f64t.flash64_train_attention

    def counted(*a, **kw):
        calls["n"] += 1
        return real(*a, **{**kw, "interpret": True})

    monkeypatch.setattr(f64t, "flash64_train_attention", counted)
    monkeypatch.setattr(fa, "supports_flash", lambda: True)
    out = module.apply(params, x, mask)
    assert calls["n"] == 1, "SegmentMask did not route to flash64_train"
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32),
                               atol=2e-2, rtol=2e-2)

    # gate checks (on _try_flash64 directly: the module fallback would hit
    # the stock segment kernel, which can't run non-interpret on CPU)
    from egom2p_tpu.models.transformer import _try_flash64
    q = k = v = x
    monkeypatch.setenv("EGOM2P_F64T_SEG", "0")
    assert _try_flash64(q, k, v, mask, H, False) is None, \
        "EGOM2P_F64T_SEG=0 must disable the seg kernel"
    monkeypatch.delenv("EGOM2P_F64T_SEG")
    with inference_attention():  # generation traces never take the train path
        assert _try_flash64(q, k, v, mask, H, False) is None, \
            "generation trace must not reach flash64_train"
    assert calls["n"] == 1


def test_generation_kill_switch_falls_back_to_stock(monkeypatch):
    """With EGOM2P_FLASH64=0 inside a generation trace, _try_flash64 must
    return None (stock path) — not fall through to the training kernel
    (regression: the documented inference A/B switch)."""
    import egom2p_tpu.ops.flash_attention as fa
    from egom2p_tpu.models.transformer import _try_flash64
    from egom2p_tpu.ops.attention import inference_attention

    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    B, H, n = 1, 2, 256
    q, k, v = (_rand(ks[i], (B, n, H * 64)) for i in range(3))
    kp = jnp.zeros((B, 1, n), bool)
    monkeypatch.setattr(fa, "supports_flash", lambda: True)
    monkeypatch.setenv("EGOM2P_FLASH64", "0")
    with inference_attention():
        assert _try_flash64(q, k, v, kp, H, False) is None


def test_model_level_training_routing_parity(monkeypatch):
    """End-to-end: the FULL EgoM2P training trace (encoder self + decoder
    self/cross attention, models/transformer.py:_try_flash64 routing) run
    through the interpret-mode flash64_train kernels reproduces the dense
    path's loss and parameter gradients.  Also asserts the kernel actually
    fired for every attention call and that no stock Pallas kernel was
    reached (which would crash on CPU anyway)."""
    import egom2p_tpu.ops.flash64_train as f64t
    import egom2p_tpu.ops.flash_attention as fa
    from egom2p_tpu.data.modality_info import MODALITY_INFO
    from egom2p_tpu.models.egom2p import create_model
    from tests.test_model import make_mod_dict

    mods = ("tok_rgb", "tok_depth", "tok_cam", "tok_gaze")
    model = create_model("egom2p_tiny_6e_6d_swiglu_nobias", mods, mods)
    md = make_mod_dict(np.random.default_rng(7), batch=2, mods=mods,
                       n_in=256, n_tgt=256, info=MODALITY_INFO)
    params = jax.jit(lambda k: model.init(k, md, 256, 256))(
        jax.random.PRNGKey(0))

    def loss_fn(p):
        loss, _ = model.apply(p, md, 256, 256, "mod")
        return loss

    # dense baseline (CPU default: supports_flash() is False)
    l_ref, g_ref = jax.jit(jax.value_and_grad(loss_fn))(params)

    # flash64_train path: force eligibility, run the kernels in interpret
    # mode, count invocations, and make reaching a stock kernel an error
    calls = {"n": 0}
    real = f64t.flash64_train_attention

    def counted(*a, **kw):
        calls["n"] += 1
        return real(*a, **{**kw, "interpret": True})

    def boom(*a, **kw):
        raise AssertionError("stock flash kernel reached under routing")

    monkeypatch.setattr(f64t, "flash64_train_attention", counted)
    monkeypatch.setattr(fa, "supports_flash", lambda: True)
    monkeypatch.setattr(fa, "padding_flash_attention", boom)
    monkeypatch.setattr(fa, "segment_flash_attention", boom)
    l_fast, g_fast = jax.jit(jax.value_and_grad(loss_fn))(params)

    # 6 encoder self + 6 decoder self + 6 decoder cross per forward trace
    assert calls["n"] >= 18, calls["n"]
    np.testing.assert_allclose(float(l_fast), float(l_ref), rtol=1e-2)
    flat_f, _ = jax.tree_util.tree_flatten(g_fast)
    flat_r, _ = jax.tree_util.tree_flatten(g_ref)
    for a, b in zip(flat_f, flat_r):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        scale = max(np.abs(b).max(), 1e-3)
        np.testing.assert_allclose(a / scale, b / scale, atol=8e-2)


def test_under_remat():
    """jax.checkpoint over the custom_vjp (the per-block remat the trainer
    uses) must reproduce the un-rematerialized gradients exactly."""
    ks = jax.random.split(jax.random.PRNGKey(3), 3)
    B, H, n = 1, 2, 128
    q, k, v = (_rand(ks[i], (B, n, H * 64)) for i in range(3))

    def loss(q, k, v):
        o = flash64_train_attention(q, k, v, None, interpret=True)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    g_plain = jax.grad(loss)(q, k, v)
    g_remat = jax.grad(jax.checkpoint(loss))(q, k, v)
    np.testing.assert_allclose(np.asarray(g_plain, np.float32),
                               np.asarray(g_remat, np.float32), atol=1e-6)


@pytest.mark.parametrize("safemax", [True, False])
def test_fwd_and_grad_parity_softmax_modes(safemax):
    """Both forward softmax modes (classic running-max and the default
    clamp-only no-shift form) must match dense forward AND gradients —
    the no-shift forward emits L2 = log2(l), which the backward's
    p = exp2(s - L2) must reproduce exactly."""
    ks = jax.random.split(jax.random.PRNGKey(5), 4)
    B, H, n, m = 2, 2, 256, 384
    q, k, v = (_rand(ks[i], (B, nn, H * 64))
               for i, nn in enumerate((n, m, m)))
    kvb = jax.random.bernoulli(ks[3], 0.25, (B, m))

    def loss_fast(q, k, v):
        o = flash64_train_attention(q, k, v, kvb, interpret=True,
                                    safemax=safemax)
        return jnp.sum(o.astype(jnp.float32) * jnp.cos(o.astype(jnp.float32)))

    def loss_ref(q, k, v):
        o = _dense(q, k, v, kvb, H)
        return jnp.sum(o * jnp.cos(o))

    gf = jax.grad(loss_fast, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   atol=3e-2, rtol=3e-2)


def test_clamp_mode_grads_finite_past_contract():
    """Clamp-only mode: when scores exceed the +80 exp2-unit clamp, the
    backward must recompute p with the SAME clamp as the forward — grads
    stay finite and track the saturated forward (regression: an unclamped
    recompute gave exp2(s - L2) -> inf -> NaN grads on logit spikes)."""
    ks = jax.random.split(jax.random.PRNGKey(7), 3)
    B, H, n = 1, 2, 256
    # scale 4.0: scores ~ 64 * 16 / 8 * log2(e) ~ 180 exp2 units >> 80
    q = _rand(ks[0], (B, n, H * 64)) * 4.0
    k = _rand(ks[1], (B, n, H * 64)) * 4.0
    v = _rand(ks[2], (B, n, H * 64))

    def loss(q, k, v):
        o = flash64_train_attention(q, k, v, None, interpret=True,
                                    safemax=False)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    val, grads = jax.value_and_grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert np.isfinite(float(val))
    for g in grads:
        g = np.asarray(g, np.float32)
        assert np.isfinite(g).all()
    # the forward saturates but stays a convex combination of v rows, so
    # dv (= p^T do) must be bounded by |do| ~ 2|o| <= 2 max|v|
    dv = np.abs(np.asarray(grads[2], np.float32))
    assert dv.max() < 4 * float(jnp.abs(v).max()) * n


@pytest.mark.parametrize("mask", ["kp", "seg"])
def test_fused_bwd_matches_split(monkeypatch, mask):
    """The fused single-pass backward (EGOM2P_F64T_FUSED_BWD=1, opt-in —
    the on-chip sweep keeps the split passes as default) must produce the
    same dq/dk/dv as the split dq/dkv passes."""
    rng = np.random.default_rng(17)
    B, N, C = 2, 256, 128
    q = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(0, 1, (B, N, C)), jnp.bfloat16)
    kw = (dict(kv_blocked=jnp.zeros((B, N), bool).at[:, -32:].set(True))
          if mask == "kp" else
          dict(segments=jnp.asarray(
              np.repeat(np.arange(4), N // 4)[None].repeat(B, 0))))

    def grads():
        def loss(q, k, v):
            o = flash64_train_attention(q, k, v, interpret=True, **kw)
            return jnp.sum(o.astype(jnp.float32) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    monkeypatch.setenv("EGOM2P_F64T_FUSED_BWD", "1")
    fused = grads()
    monkeypatch.setenv("EGOM2P_F64T_FUSED_BWD", "0")
    split = grads()
    for name, a, b in zip("dq dk dv".split(), fused, split):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=0, atol=2e-2, err_msg=name)
