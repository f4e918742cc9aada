"""Video-domain VQ-VAE: model round-trip, dataset sampler, training smoke,
and the image-metric suite (VERDICT round-1 items 3 and 4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

TINY = dict(num_frames=4, image_size=32, tubelet_t=2, patch_size=8,
            codebook_size=64, latent_dim=8, dim=48, depth=2, num_heads=4)


@pytest.fixture(scope="module")
def tiny_tok():
    from egom2p_tpu.tokenizers.video_vqvae import video_vqvae_from_config
    return video_vqvae_from_config("rgb", jax.random.PRNGKey(0), **TINY)


@pytest.mark.slow
def test_video_vqvae_shapes(tiny_tok):
    x = jnp.asarray(np.random.default_rng(0)
                    .uniform(-1, 1, (2, 4, 32, 32, 3)).astype(np.float32))
    tokens = tiny_tok.tokenize(x)
    assert tokens.shape == (2, 2, 4, 4)  # t/2, 32/8, 32/8
    assert (np.asarray(tokens) >= 0).all()
    assert (np.asarray(tokens) < TINY["codebook_size"]).all()
    rec = tiny_tok.decode_tokens(tokens)
    assert rec.shape == x.shape
    auto = tiny_tok.autoencode(x)
    np.testing.assert_allclose(np.asarray(auto), np.asarray(rec), atol=1e-5)


def test_video_vqvae_depth_single_channel():
    from egom2p_tpu.tokenizers.video_vqvae import video_vqvae_from_config
    tok = video_vqvae_from_config("depth", jax.random.PRNGKey(1), **TINY)
    x = jnp.zeros((1, 4, 32, 32, 1), jnp.float32)
    assert tok.autoencode(x).shape == x.shape


@pytest.mark.slow
def test_video_training_loss_falls(tiny_tok):
    """A few steps on a fixed batch must reduce the reconstruction loss
    (the VERDICT 'done' criterion for the video VQ-VAE trainer)."""
    import optax
    from egom2p_tpu.train.vqvae_train import (init_train_state,
                                              make_vqvae_train_step)

    batch = jnp.asarray(np.random.default_rng(1)
                        .uniform(-1, 1, (4, 4, 32, 32, 3)).astype(np.float32))
    opt = optax.adam(1e-3)
    step = jax.jit(make_vqvae_train_step(tiny_tok.module, tiny_tok.vq_cfg, opt))
    state = init_train_state(tiny_tok.params, opt, tiny_tok.vq_state)
    losses = []
    key = jax.random.PRNGKey(2)
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        losses.append(float(metrics["reconst_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert float(metrics["codebook_usage"]) > 0


def test_video_dataset_sampler(tmp_path):
    from egom2p_tpu.data.video_dataset import VideoClipDataset

    rng = np.random.default_rng(0)
    for i in range(2):
        np.save(tmp_path / f"clip{i}.npy",
                rng.integers(0, 255, (40, 48, 48, 3)).astype(np.uint8))
    ds = VideoClipDataset(str(tmp_path), mode="train", clip_len=4,
                          crop_size=32, frame_sample_rate=4, use_npy=True)
    clip = ds[0]
    assert clip.shape == (4, 32, 32, 3)
    assert clip.dtype == np.float32
    assert clip.min() >= -1.0 and clip.max() <= 1.0
    batch = next(ds.iter_batches(2))
    assert batch.shape == (2, 4, 32, 32, 3)
    # depth mode collapses to 1 channel
    dsd = VideoClipDataset(str(tmp_path), mode="val", clip_len=4,
                           crop_size=32, domain="depth", use_npy=True)
    assert dsd[0].shape == (4, 32, 32, 1)


def test_video_dataset_on_example_mp4():
    """End-to-end on a real mp4 through the native ingest."""
    from egom2p_tpu.data.video_dataset import VideoClipDataset

    path = "/root/reference/example_data/rgb2dep_h2o.mp4"
    if not os.path.exists(path):
        pytest.skip("example mp4 unavailable")
    ds = VideoClipDataset(path, mode="val", clip_len=16, crop_size=256,
                          frame_sample_rate=1)
    clip = ds[0]
    assert clip.shape == (16, 256, 256, 3)


def test_video_augmentations():
    from egom2p_tpu.data.video_dataset import (adjust_brightness,
                                               horizontal_flip,
                                               random_rotation, random_scaling)

    rng = np.random.default_rng(3)
    v = rng.integers(0, 255, (4, 32, 32, 3)).astype(np.uint8)
    assert np.array_equal(horizontal_flip(horizontal_flip(v)), v)
    assert random_rotation(v, rng).shape == v.shape
    assert adjust_brightness(v, rng).dtype == np.uint8
    assert random_scaling(v, rng).shape == v.shape


@pytest.mark.slow
def test_vqvae_cli_video_train_and_tokenize(tmp_path):
    """Drive run_training_vqvae.py --domain rgb end-to-end on tiny npy clips:
    train 2 epochs, write checkpoints + image logs, then tokenize."""
    import sys
    sys.path.insert(0, "/root/repo")
    import run_training_vqvae as cli

    rng = np.random.default_rng(0)
    data_dir = tmp_path / "vids"
    data_dir.mkdir()
    for i in range(4):
        np.save(data_dir / f"c{i}.npy",
                rng.integers(0, 255, (20, 32, 32, 3)).astype(np.uint8))
    out = tmp_path / "out"
    argv = ["--domain", "rgb", "--data_path", str(data_dir), "--use_npy",
            "--num_frames", "4", "--input_size", "32", "--patch_size", "8",
            "--tubelet_size", "2", "--codebook_size", "64", "--latent_dim",
            "8", "--vq_dim", "48", "--vq_depth", "1", "--vq_heads", "4",
            "--batch_size", "2", "--epochs", "2", "--warmup_epochs", "0",
            "--output_dir", str(out), "--print_freq", "1"]
    args = cli.get_args(argv)
    cli.run_train(args)
    assert (out / "image_logs").exists()
    logs = os.listdir(out / "image_logs")
    assert any("gt" in f for f in logs) and any("recon" in f for f in logs)

    # tokenize mode over the same clips with the trained checkpoint
    ckpts = [p for p in os.listdir(out) if p.startswith("checkpoint")]
    assert ckpts
    argv_tok = argv + ["--tokenize", "--tokenize_path", str(data_dir),
                       "--tokenize_save_path", str(tmp_path),
                       "--resume", str(out / sorted(ckpts)[-1])]
    args = cli.get_args(argv_tok)
    outs = cli.run_tokenize(args)
    assert len(outs) == 4 and all(o.endswith("-tok.npz") for o in outs)
    toks = np.load(outs[0])
    assert toks[toks.files[0]].shape == (2, 4, 4)


# ------------------------------------------------------------ image metrics
def test_ms_ssim_identity_and_noise():
    from egom2p_tpu.core.image_metrics import ms_ssim

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (2, 192, 192, 3)).astype(np.float32)
    assert ms_ssim(img, img) == pytest.approx(1.0, abs=1e-6)
    noisy = np.clip(img + rng.normal(0, 0.5, img.shape), -1, 1)
    val = ms_ssim(img, noisy)
    assert 0.0 < val < 0.95


def test_fid_closed_form_gaussians():
    """FID of two Gaussian feature sets must approach the closed-form
    Frechet distance."""
    from egom2p_tpu.core.image_metrics import (fid_from_features,
                                               frechet_distance)

    rng = np.random.default_rng(0)
    d = 8
    mu2 = np.full(d, 1.5)
    f1 = rng.normal(0, 1, (20000, d))
    f2 = rng.normal(0, 1, (20000, d)) + mu2
    exact = frechet_distance(np.zeros(d), np.eye(d), mu2, np.eye(d))
    est = fid_from_features(f1, f2)
    assert est == pytest.approx(exact, rel=0.05)
    assert fid_from_features(f1, f1) == pytest.approx(0.0, abs=1e-6)


def test_inception_score_bounds():
    from egom2p_tpu.core.image_metrics import inception_score_from_probs

    n, c = 1000, 10
    # perfectly confident + uniform marginal -> IS = n_classes
    onehot = np.eye(c)[np.arange(n) % c]
    assert inception_score_from_probs(onehot, splits=1) == pytest.approx(c)
    # uniform predictions -> IS = 1
    uniform = np.full((n, c), 1.0 / c)
    assert inception_score_from_probs(uniform) == pytest.approx(1.0)


def test_lpips_from_features_properties():
    from egom2p_tpu.core.image_metrics import lpips_from_features

    rng = np.random.default_rng(1)
    fa = [rng.normal(0, 1, (2, 8, 8, 16)), rng.normal(0, 1, (2, 4, 4, 32))]
    fb = [a.copy() for a in fa]
    assert lpips_from_features(fa, fb) == pytest.approx(0.0)
    fc = [rng.normal(0, 1, a.shape) for a in fa]
    assert lpips_from_features(fa, fc) > 0.1


def test_perceptual_metrics_registered():
    import egom2p_tpu.core.image_metrics  # noqa: F401  (registers on import)
    from egom2p_tpu.core.metrics import PERCEPTUAL_METRICS

    for name in ("ms_ssim", "fid_from_features",
                 "inception_score_from_probs", "lpips_from_features", "lpips"):
        assert name in PERCEPTUAL_METRICS


def test_lpips_full_raises_without_weights():
    from egom2p_tpu.core.image_metrics import (MissingPretrainedWeights,
                                               make_lpips)
    if os.path.exists("./ckpt/lpips_vgg.npz"):
        pytest.skip("weights present")
    with pytest.raises(MissingPretrainedWeights):
        make_lpips()


def test_vgg_features_jax_shapes():
    """The LPIPS backbone graph runs with synthetic weights."""
    from egom2p_tpu.core.vgg_features import _BLOCKS, vgg16_features

    rng = np.random.default_rng(0)
    weights = {}
    cin = 3
    i = 0
    widths = (8, 8, 16, 16, 16)
    for b, n in enumerate(_BLOCKS):
        for _ in range(n):
            weights[f"conv{i}_w"] = rng.normal(
                0, 0.05, (3, 3, cin, widths[b])).astype(np.float32)
            weights[f"conv{i}_b"] = np.zeros(widths[b], np.float32)
            cin = widths[b]
            i += 1
    x = rng.uniform(-1, 1, (1, 64, 64, 3)).astype(np.float32)
    feats = vgg16_features(x, weights)
    assert len(feats) == 5
    assert feats[0].shape == (1, 64, 64, 8)
    assert feats[-1].shape == (1, 4, 4, 16)
