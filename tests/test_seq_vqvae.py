"""Cam/gaze VQ-VAE tests: shapes, golden metrics, and a short training run."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from egom2p_tpu.data.cam_gaze import (canonicalize_cam, normalize_cam,
                                      denormalize_cam, convert_gaze,
                                      evaluate_9d_trajectory)
from egom2p_tpu.tokenizers.seq_vqvae import seq_vqvae_from_config
from egom2p_tpu.train.vqvae_train import (init_train_state,
                                          make_vqvae_train_step)

REF = "/root/reference/example_data"


def test_cam_golden_metrics():
    """The shipped reconstruction vs input must reproduce the published
    round-trip numbers (reference: tok_cam_example.py:203-209) -- validates
    our canonicalization + ATE/RTE/RRE implementations."""
    cam = np.load(f"{REF}/cam.npy")
    recon = np.load(f"{REF}/token/cam-recon.npy")
    gt = canonicalize_cam(cam)
    m = evaluate_9d_trajectory(recon, gt, delta=1)
    assert abs(m["ATE"] - 0.005874) < 2e-4, m
    assert abs(m["RTE"] - 0.0028375) < 1e-4, m
    assert abs(m["RRE_deg"] - 0.298047) < 1e-2, m


def test_gaze_convert_golden():
    """Gaze conversion matches the reference example's convert()
    (reference: tok_gaze_example.py:35-48) and the masked-MSE of the shipped
    reconstruction is small."""
    gaze = np.load(f"{REF}/gaze.npy")
    conv = convert_gaze(gaze, orig_res=[896, 504], resize_res=[896, 504],
                        new_res=[480, 480])
    assert conv.shape == (gaze.shape[0], 3)
    # reproduce the reference example's check against the shipped recon
    pred = np.load(f"{REF}/token/gaze-recon.npy")

    def ref_convert(gaze_data, orig_res, resize_res, new_res=[480, 480]):
        orig_res = np.array(orig_res)
        new_res = np.array(new_res)
        gn = gaze_data / orig_res
        gr = gn * np.array(resize_res)
        return (gr - (resize_res - new_res) / 2) / np.array(new_res)

    conv_ref = ref_convert(gaze, [896, 504], [896, 504])
    mask = ~np.isnan(conv_ref)
    mse = ((conv_ref[mask] - pred[mask]) ** 2).mean()
    assert mse < 0.01  # shipped recon is a good reconstruction
    # our convert (normalized to [-1,1]) must match the unnormalized one
    valid = conv[:, 2] > 0
    ours = conv[valid, :2] * 0.5 + 0.5
    assert np.allclose(ours, conv_ref[valid], atol=1e-6)


@pytest.mark.slow
def test_cam_tokenizer_shapes():
    tok = seq_vqvae_from_config("cam", jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 60, 9)),
                    jnp.float32)
    tokens = tok.tokenize(x)
    assert tokens.shape == (2, 30)
    assert int(tokens.max()) < 256 and int(tokens.min()) >= 0
    rec = tok.decode_tokens(tokens)
    assert rec.shape == (2, 60, 9)
    rec2 = tok.autoencode(x)
    assert np.allclose(np.asarray(rec), np.asarray(rec2), atol=1e-5)


@pytest.mark.slow
def test_gaze_tokenizer_shapes():
    tok = seq_vqvae_from_config("gaze", jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 60, 3)),
                    jnp.float32)
    tokens = tok.tokenize(x)
    assert tokens.shape == (2, 30)
    rec = tok.decode_tokens(tokens)
    assert rec.shape == (2, 60, 2)


@pytest.mark.slow
def test_cam_vqvae_short_training_improves():
    """A few steps on a fixed batch must reduce reconstruction loss and keep
    the EMA codebook healthy (the end-to-end slice of Phase 1)."""
    tok = seq_vqvae_from_config("cam", jax.random.PRNGKey(0),
                                dim=96, depth=2, num_heads=4)
    rng = np.random.default_rng(0)
    cam = np.load(f"{REF}/cam.npy")
    gt9 = normalize_cam(canonicalize_cam(cam))[None]  # (1, 60, 9)
    batch = jnp.asarray(np.repeat(gt9, 8, axis=0) +
                        rng.normal(scale=0.01, size=(8, 60, 9)), jnp.float32)

    optimizer = optax.adamw(1e-4)
    step = jax.jit(make_vqvae_train_step(tok.module, tok.vq_cfg, optimizer))
    state = init_train_state(tok.params, optimizer, tok.vq_state)

    losses = []
    key = jax.random.PRNGKey(1)
    for i in range(30):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        losses.append(float(metrics["reconst_loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[:3] + losses[-3:]
    assert np.isfinite(losses).all()
    # round-trip through tokens with the trained state
    tok.params, tok.vq_state = state.params, state.vq_state
    tokens = tok.tokenize(batch)
    rec = tok.decode_tokens(tokens)
    assert rec.shape == batch.shape
