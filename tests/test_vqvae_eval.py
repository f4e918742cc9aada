"""In-training VQ-VAE evaluation + ModelEma wiring (round-2 VERDICT items
2 and 3): the metric suite runs from the trainer, --eval_only works, EMA
params track/diverge from live params and survive checkpoint resume."""
import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

TINY_CAM = ["--domain", "cam", "--vq_dim", "32", "--vq_depth", "1",
            "--vq_heads", "4", "--codebook_size", "16", "--latent_dim", "8",
            "--num_frames", "12", "--batch_size", "8", "--warmup_epochs", "0",
            "--print_freq", "100"]


def _cam_npy(tmp_path, n=16, name="cam.npy"):
    rng = np.random.default_rng(0)
    base = np.array([1, 0, 0, 0, 1, 0, 0, 0, 0], np.float32)
    data = base + rng.normal(0, 0.05, (n, 12, 9)).astype(np.float32)
    path = tmp_path / name
    np.save(path, data)
    return str(path)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train a tiny cam VQ-VAE for 2 epochs with EMA + per-epoch eval."""
    import run_training_vqvae as cli

    tmp_path = tmp_path_factory.mktemp("vqeval")
    out = tmp_path / "out"
    argv = TINY_CAM + ["--data_path", _cam_npy(tmp_path), "--epochs", "2",
                       "--model_ema", "true", "--model_ema_decay", "0.9",
                       "--eval_freq", "1", "--output_dir", str(out)]
    args = cli.get_args(argv)
    state = cli.run_train(args)
    return cli, tmp_path, out, argv, state


@pytest.mark.slow
def test_eval_metrics_logged_every_epoch(trained):
    _, _, out, _, _ = trained
    lines = [json.loads(l) for l in open(out / "log.txt")]
    assert len(lines) == 2
    for rec in lines:
        for key in ("eval_loss", "eval_reconst_loss", "eval_mse",
                    "eval_mae_transl", "eval_psnr", "eval_cam_rot_deg",
                    "eval_codebook_usage", "ema_mse", "ema_cam_rot_deg"):
            assert key in rec, (key, sorted(rec))
            assert np.isfinite(rec[key]), (key, rec[key])


@pytest.mark.slow
def test_ema_params_differ_from_live(trained):
    _, _, _, _, state = trained
    assert state.ema_params is not None
    diffs = jax.tree_util.tree_map(
        lambda e, p: float(jnp.abs(e - p).max()), state.ema_params,
        state.params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 1e-6


@pytest.mark.slow
def test_state_payload_roundtrip(trained, tmp_path):
    """Full train state (params, opt, step, vq_state, EMA) round-trips
    through the checkpoint payload."""
    cli, _, _, _, state = trained
    from egom2p_tpu.core.checkpoint import load_checkpoint, save_checkpoint

    path = save_checkpoint(str(tmp_path / "ck"), 0, cli._state_payload(state))
    loaded = load_checkpoint(path)
    fresh = state._replace(
        params=jax.tree_util.tree_map(jnp.zeros_like, state.params),
        ema_params=jax.tree_util.tree_map(jnp.zeros_like, state.ema_params),
        step=jnp.zeros((), jnp.int32))
    restored = cli._restore_state(fresh, loaded)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.ema_params),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree_util.tree_leaves(restored.opt_state),
                    jax.tree_util.tree_leaves(state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(np.asarray(restored.vq_state.embed),
                               np.asarray(state.vq_state.embed))


@pytest.mark.slow
def test_resume_restores_ema_and_continues(trained, capsys):
    """Re-running with more epochs resumes from the checkpoint: start epoch
    advances and EMA params carry over (VERDICT item 3 'done' criterion)."""
    cli, _, out, argv, state = trained
    args = cli.get_args([a if a != "2" or argv[argv.index(a) - 1] != "--epochs"
                         else "3" for a in argv])
    state2 = cli.run_train(args)
    assert "resumed from" in capsys.readouterr().out
    assert int(state2.step) > int(state.step)
    assert state2.ema_params is not None


@pytest.mark.slow
def test_eval_only_writes_results(trained):
    cli, tmp_path, out, _, _ = trained
    ckpts = sorted(p for p in os.listdir(out) if p.startswith("checkpoint"))
    argv = TINY_CAM + ["--eval_only", "--resume", str(out / ckpts[-1]),
                       "--eval_data_path", _cam_npy(tmp_path, n=8, name="ev.npy"),
                       "--output_dir", str(out / "evalonly")]
    results = cli.run_eval_only(cli.get_args(argv))
    for key in ("eval_loss", "mse", "mae_transl", "psnr", "cam_rot_deg",
                "codebook_usage"):
        assert key in results and np.isfinite(results[key])
    saved = json.load(open(out / "evalonly" / "eval_results.json"))
    assert saved["mse"] == pytest.approx(results["mse"])


def test_gaze_eval_metrics_masked():
    """Gaze metrics only count valid-mask positions
    (reference: run_training_vqvae.py:1664-1672)."""
    from egom2p_tpu.train.vqvae_eval import _gaze_metrics

    rng = np.random.default_rng(1)
    gt = rng.uniform(-1, 1, (4, 12, 3)).astype(np.float32)
    gt[..., 2] = (rng.uniform(size=(4, 12)) > 0.5).astype(np.float32)
    pred = gt[..., :2].copy()
    # corrupt only invalid positions: metrics must stay zero-error
    invalid = gt[..., 2] < 0.5
    pred[invalid] += 10.0
    m = _gaze_metrics(pred, gt)
    assert m["mse"] == pytest.approx(0.0, abs=1e-10)
    # corrupting a valid position must register
    pred2 = gt[..., :2].copy()
    pred2[~invalid] += 1.0
    assert _gaze_metrics(pred2, gt)["mse"] > 0.01


def test_video_eval_metrics_keys():
    """rgb-domain metric suite on a tiny random tokenizer: base metrics are
    always live; FID/LPIPS only with their weight checkpoints on disk."""
    from egom2p_tpu.tokenizers.video_vqvae import video_vqvae_from_config
    from egom2p_tpu.train.vqvae_eval import eval_metrics

    tok = video_vqvae_from_config(
        "rgb", jax.random.PRNGKey(0), num_frames=4, image_size=32,
        tubelet_t=2, patch_size=8, codebook_size=64, latent_dim=8, dim=48,
        depth=1, num_heads=4)
    rng = np.random.default_rng(0)
    data = rng.uniform(-1, 1, (4, 4, 32, 32, 3)).astype(np.float32)
    m = eval_metrics(tok, data, "rgb", 64, batch_size=2)
    for key in ("mse", "mae", "psnr", "codebook_usage"):
        assert key in m and np.isfinite(m[key])
    assert "ms_ssim" not in m  # 32px is below the 5-scale MS-SSIM minimum


def test_restore_state_seeds_ema_from_loaded_params():
    """Resuming with --model_ema from a pre-EMA checkpoint must seed the EMA
    tree from the restored weights, not keep the fresh random init."""
    import jax.numpy as jnp

    import run_training_vqvae as T
    from egom2p_tpu.train.vqvae_train import VQVAETrainState

    fresh = {"params": {"w": jnp.zeros(3)}}
    state = VQVAETrainState(params=fresh, opt_state=(), vq_state=None,
                            step=jnp.zeros((), jnp.int32),
                            ema_params=jax.tree_util.tree_map(jnp.array,
                                                              fresh))
    restored_w = jnp.ones(3)
    new = T._restore_state(state, {"params": {"params": {"w": restored_w}}})
    np.testing.assert_array_equal(np.asarray(new.ema_params["params"]["w"]),
                                  np.asarray(restored_w))
