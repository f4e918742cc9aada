"""Cosmos image (CI/DI) + continuous video (CV) tokenizer tests
(reference: cosmos_tokenizer/image_lib.py, image_cli.py,
networks/continuous_video.py)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from egom2p_tpu.tokenizers.cosmos.image_api import (ImageTokenizer,
                                                    pad_image_batch,
                                                    unpad_image_batch)
from egom2p_tpu.tokenizers.cosmos.image_network import (
    ContinuousImageTokenizer, DiscreteImageTokenizer, ImageTokenizerConfig)

TINY = ImageTokenizerConfig(channels=32, channels_mult=(1, 2),
                            attn_resolutions=(8,), num_res_blocks=1,
                            resolution=32, patch_size=2,
                            spatial_compression=4, z_channels=16,
                            embedding_dim=6)


_CACHE = {}


def _tiny_tokenizer(discrete=True, **over):
    key = (discrete, tuple(sorted(over.items())))
    if key in _CACHE:  # init/compile once per config across the module
        return _CACHE[key]
    cfg = dataclasses.replace(TINY, **over)
    cls = DiscreteImageTokenizer if discrete else ContinuousImageTokenizer
    module = cls(cfg)
    x0 = jnp.zeros((1, 32, 32, 3), jnp.float32)
    params = jax.jit(lambda k: module.init(k, x0))(jax.random.PRNGKey(0))
    _CACHE[key] = ImageTokenizer(params, cfg, discrete=discrete,
                                 compute_dtype=jnp.float32)
    return _CACHE[key]


def test_pad_unpad_image_batch_roundtrip():
    x = np.random.RandomState(0).randint(0, 255, (2, 37, 53, 3), np.uint8)
    padded, crop = pad_image_batch(x, 16)
    assert padded.shape[1] % 16 == 0 and padded.shape[2] % 16 == 0
    assert np.array_equal(unpad_image_batch(padded, crop), x)


def test_discrete_image_forward_uint8():
    tok = _tiny_tokenizer(discrete=True)
    img = np.random.RandomState(1).randint(0, 255, (1, 30, 34, 3), np.uint8)
    out = tok.forward(img)
    assert out.shape == img.shape and out.dtype == np.uint8
    indices, codes = tok.encode(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert indices.shape == (1, 8, 8)
    assert codes.shape == (1, 8, 8, 6)
    # decode from indices round-trips the quantized codes
    rec = tok.decode(indices)
    assert rec.shape == (1, 32, 32, 3)


def test_discrete_image_fsq_code_consistency():
    """encode -> indices -> decode_code equals encode -> codes -> decode."""
    tok = _tiny_tokenizer(discrete=True)
    x = jnp.asarray(np.random.RandomState(2).uniform(-1, 1, (2, 32, 32, 3))
                    .astype(np.float32))
    indices, codes, _ = tok.module.apply(tok.params, x,
                                         method=DiscreteImageTokenizer.encode)
    via_idx = tok.module.apply(tok.params, indices,
                               method=DiscreteImageTokenizer.decode_code)
    via_codes = tok.module.apply(tok.params, codes,
                                 method=DiscreteImageTokenizer.decode)
    np.testing.assert_allclose(np.asarray(via_idx), np.asarray(via_codes),
                               atol=1e-5)


def test_continuous_image_vae_and_ae():
    ae = _tiny_tokenizer(discrete=False, formulation="AE")
    (latent,) = ae.encode(jnp.zeros((1, 32, 32, 3), jnp.float32))
    assert latent.shape == (1, 8, 8, 16)
    rec = ae.decode(latent)
    assert rec.shape == (1, 32, 32, 3)

    vae = _tiny_tokenizer(discrete=False, formulation="VAE", z_factor=2,
                          latent_channels=16)
    x = jnp.asarray(np.random.RandomState(3).uniform(-1, 1, (1, 32, 32, 3))
                    .astype(np.float32))
    # deterministic eval path returns the mean
    mean1, _ = vae.module.apply(vae.params, x,
                                method=ContinuousImageTokenizer.encode)
    mean2, _ = vae.module.apply(vae.params, x,
                                method=ContinuousImageTokenizer.encode)
    np.testing.assert_array_equal(np.asarray(mean1), np.asarray(mean2))
    # sampled path differs from the mean but decodes to the right shape
    samp, (mu, logvar) = vae.module.apply(
        vae.params, x, rng=jax.random.PRNGKey(1),
        method=ContinuousImageTokenizer.encode)
    assert mu.shape == samp.shape == (1, 8, 8, 16)
    assert not np.array_equal(np.asarray(samp), np.asarray(mu))


def test_continuous_video_tokenizer_api():
    from egom2p_tpu.tokenizers.cosmos.network import ContinuousVideoConfig
    from egom2p_tpu.tokenizers.cosmos.video_api import ContinuousVideoTokenizer

    cfg = ContinuousVideoConfig(channels=16, channels_mult=(1, 2),
                                num_res_blocks=1, resolution=64, patch_size=2,
                                spatial_compression=4, temporal_compression=2,
                                z_channels=16, latent_channels=8, num_groups=4)
    tok = ContinuousVideoTokenizer.random_init(
        jax.random.PRNGKey(0), cfg, frames=5, size=16,
        compute_dtype=jnp.float32)
    vid = np.random.RandomState(4).randint(0, 255, (1, 5, 16, 16, 3), np.uint8)
    out = tok.forward(vid)
    assert out.shape == vid.shape and out.dtype == np.uint8
    (latent,) = tok.encode(jnp.zeros((1, 5, 16, 16, 3), jnp.float32))
    assert latent.shape == (1, 3, 4, 4, 8)


def test_continuous_video_temporal4_decoder_quirk():
    """temporal_compression==4 drops the decoder to channels_mult=[2,4]
    (reference: networks/continuous_video.py:44-45) — params reflect it."""
    from egom2p_tpu.tokenizers.cosmos.network import (
        CausalContinuousVideoTokenizer, ContinuousVideoConfig)
    cfg = ContinuousVideoConfig(channels=8, channels_mult=(2, 4, 4),
                                num_res_blocks=1, resolution=256,
                                patch_size=4, spatial_compression=8,
                                temporal_compression=4,
                                z_channels=4, latent_channels=4, num_groups=4)
    m = CausalContinuousVideoTokenizer(cfg)
    x0 = jnp.zeros((1, 5, 32, 32, 3), jnp.float32)
    params = jax.eval_shape(lambda k: m.init(k, x0), jax.random.PRNGKey(0))
    dec = params["params"]["decoder"]
    assert "up_2_block_0" not in dec          # only 2 decoder levels
    assert "up_1_block_0" in dec
    recon, _post, latent = m.apply(
        jax.jit(lambda k: m.init(k, x0))(jax.random.PRNGKey(0)), x0)
    assert recon.shape == x0.shape


def test_tokenize_images_cli(tmp_path, monkeypatch):
    """CLI glue: glob -> autoencode -> written reconstruction + codes."""
    from PIL import Image

    import tokenize_images

    rs = np.random.RandomState(5)
    for i in range(2):
        Image.fromarray(rs.randint(0, 255, (40, 44, 3), np.uint8)).save(
            tmp_path / f"img_{i}.png")

    monkeypatch.setattr(tokenize_images, "build_tokenizer",
                        lambda args: _tiny_tokenizer(discrete=True))
    out_dir = tmp_path / "recon"
    tokenize_images.main([
        "--image_pattern", str(tmp_path / "*.png"),
        "--tokenizer_type", "DI",
        "--output_dir", str(out_dir),
        "--save_input", "--save_codes",
    ])
    for i in range(2):
        rec = np.asarray(Image.open(out_dir / f"img_{i}.png"))
        assert rec.shape == (40, 44, 3)
        codes = np.load(out_dir / f"img_{i}_codes.npy")
        assert codes.ndim == 2
    assert (out_dir / "img_0_input.png").exists()


def test_discrete_image_lfq_quantizer():
    """LFQ consumes codebook_dim channels — quant_conv must emit that width
    (regression: it used to emit embedding_dim and crash at trace time)."""
    tok = _tiny_tokenizer(discrete=True, quantizer="LFQ", codebook_dim=10)
    x = np.random.RandomState(0).uniform(-1, 1, (1, 32, 32, 3)).astype(
        np.float32)
    indices, codes = tok.encode(x)
    assert int(np.asarray(indices).max()) < 2 ** 10
    out = np.asarray(tok.autoencode(x))
    assert out.shape == (1, 32, 32, 3) and np.isfinite(out).all()
