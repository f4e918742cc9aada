"""Cosmos DV tokenizer tests: FSQ, Haar wavelet, and network shapes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egom2p_tpu.ops.fsq import FSQ
from egom2p_tpu.ops.wavelet import (dwt3d, idwt3d, patch3d_haar,
                                    unpatch3d_haar)
from egom2p_tpu.tokenizers.cosmos import (CausalVideoTokenizer,
                                          DiscreteVideoConfig)


def test_fsq_roundtrip():
    fsq = FSQ((8, 8, 8, 5, 5, 5))
    assert fsq.codebook_size == 64000
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(4, 7, 6)), jnp.float32)
    indices, codes = fsq(z)
    assert indices.shape == (4, 7)
    assert int(indices.min()) >= 0 and int(indices.max()) < 64000
    codes2 = fsq.indices_to_codes(indices)
    assert np.allclose(np.asarray(codes), np.asarray(codes2), atol=1e-6)
    # all indices reachable: round-trip the full codebook
    all_idx = jnp.arange(64000)
    all_codes = fsq.indices_to_codes(all_idx)
    back = fsq.codes_to_indices(all_codes)
    assert np.array_equal(np.asarray(back), np.asarray(all_idx))


def test_fsq_gradient_straight_through():
    fsq = FSQ((8, 8, 8, 5, 5, 5))

    def f(z):
        return jnp.sum(fsq.quantize(z) ** 2)

    g = jax.grad(f)(jnp.ones((2, 6)) * 0.3)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_haar_invertible():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8, 8, 3)), jnp.float32)
    y = dwt3d(x)
    assert y.shape == (2, 2, 4, 4, 24)
    x2 = idwt3d(y)
    assert np.allclose(np.asarray(x), np.asarray(x2), atol=1e-5)
    # DC preservation: constant input -> lll band holds the value, rest 0
    c = jnp.ones((1, 2, 2, 2, 1))
    y = dwt3d(c)
    assert np.allclose(np.asarray(y[..., 0]), 1.0)
    assert np.allclose(np.asarray(y[..., 1:]), 0.0)


def test_patch3d_causal_shape():
    """17 frames with patch 4 -> 5 latent frames (reference behavior:
    first frame repeated 4x, then 2 DWT levels)."""
    x = jnp.zeros((1, 17, 32, 32, 3))
    y = patch3d_haar(x, 4)
    assert y.shape == (1, 5, 8, 8, 3 * 64)
    x2 = unpatch3d_haar(y, 4)
    assert x2.shape == (1, 17, 32, 32, 3)


def test_patch3d_roundtrip_content():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(1, 9, 16, 16, 3)), jnp.float32)
    y = patch3d_haar(x, 4)
    x2 = unpatch3d_haar(y, 4)
    assert np.allclose(np.asarray(x), np.asarray(x2), atol=1e-5)


@pytest.fixture(scope="module")
def small_tokenizer():
    # small channel counts for CPU speed; same topology as DV4x8x8
    cfg = DiscreteVideoConfig(channels=16, channels_mult=(1, 2, 2),
                              z_channels=8)
    return CausalVideoTokenizer.random_init(
        jax.random.PRNGKey(0), cfg, frames=9, size=64,
        compute_dtype=jnp.float32)


def test_dv_encode_decode_shapes(small_tokenizer):
    tok = small_tokenizer
    rng = np.random.default_rng(0)
    video = rng.integers(0, 255, size=(1, 16, 64, 64, 3)).astype(np.uint8)
    tokens = tok.forward(video, temporal_window=17)
    # 16 frames -> padded to 17 -> 5 latent frames; 64px -> 8x8
    assert tokens.shape == (1, 5, 8, 8)
    assert tokens.min() >= 0 and tokens.max() < 64000
    recon = tok.decode(jnp.asarray(tokens))
    assert recon.shape == (1, 17, 64, 64, 3)
    assert np.isfinite(np.asarray(recon, dtype=np.float32)).all()


def test_dv_reconstruct_video(small_tokenizer):
    """Sliding-window autoencoder reconstruction keeps the input geometry
    (reference: video_lib_ori.py:122-154)."""
    tok = small_tokenizer
    rng = np.random.default_rng(1)
    video = rng.integers(0, 255, size=(1, 20, 64, 64, 3)).astype(np.uint8)
    recon = tok.reconstruct(video, temporal_window=17)
    assert recon.shape == video.shape
    assert recon.dtype == np.uint8


def test_conv3d_unroll_ab_path_matches_native(small_tokenizer, monkeypatch):
    """EGOM2P_CONV3D_UNROLL=1 (tap-unrolled conv decomposition, kept as an
    on-chip A/B reference — see layers._Conv3dCore) is parameter-tree
    identical to the native nn.Conv path and numerically equivalent."""
    tok = small_tokenizer
    rng = np.random.default_rng(2)
    video = jnp.asarray(
        (rng.random((1, 9, 64, 64, 3), dtype=np.float32) * 2.0) - 1.0)
    idx_native, codes_native = jax.jit(
        lambda p, x: tok.module.apply(p, x, method=type(tok.module).encode)
    )(tok.params, video)
    monkeypatch.setenv("EGOM2P_CONV3D_UNROLL", "1")
    idx_unroll, codes_unroll = jax.jit(
        lambda p, x: tok.module.apply(p, x, method=type(tok.module).encode)
    )(tok.params, video)
    assert np.mean(np.asarray(idx_native) == np.asarray(idx_unroll)) > 0.999
    np.testing.assert_allclose(np.asarray(codes_native),
                               np.asarray(codes_unroll), atol=2e-2)
