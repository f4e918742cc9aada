"""Golden-checkpoint gate (round-3 VERDICT item 5).

The reference publishes golden artifacts for its two de-facto golden tests
(reference: example_data/tok_cam_example.py:203-209, tok_gaze_example.py,
example_data/token/{cam,gaze}-{tok.npz,recon.npy}):

  cam:  ATE 0.0058740415749732955 / RTE 0.002837537725354713 /
        RRE 0.2980470115530609 deg, plus the exact 30 token indices
  gaze: masked MSE 4.1835731e-05, plus the exact 30 token indices

Two tiers here:

1. Always-on: the repo's canonicalization + metric + gaze-conversion code
   must reproduce the golden numbers from the PUBLISHED recon artifacts —
   no weights needed.  This pins the full evaluation path bit-for-bit.
2. Auto-skipping: when `ckpt/checkpoint-{cam,gaze}.pth` appear (no published
   URL works in this zero-egress env), convert them, run the repo's
   tokenize/reconstruct pipeline, and assert exact token-index equality with
   `{cam,gaze}-tok.npz` and golden metrics within 10%.  The gate activates
   the day weights land.
"""
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DATA = "/root/reference/example_data"

GOLDEN_CAM = {"ATE": 0.0058740415749732955, "RTE": 0.002837537725354713,
              "RRE_deg": 0.2980470115530609}
GOLDEN_GAZE_MSE = 4.183573137445972e-05

needs_ref = pytest.mark.skipif(not os.path.isdir(REF_DATA),
                               reason="reference example_data not present")


@needs_ref
def test_cam_metrics_reproduce_golden_from_published_recon():
    """evaluate_9d_trajectory + canonicalize_cam must reproduce the golden
    ATE/RTE/RRE from the reference's published cam-recon.npy (reference:
    example_data/tok_cam_example.py:203-209)."""
    from egom2p_tpu.data.cam_gaze import canonicalize_cam, evaluate_9d_trajectory

    cano = canonicalize_cam(np.load(f"{REF_DATA}/cam.npy"))
    recon = np.load(f"{REF_DATA}/token/cam-recon.npy")
    m = evaluate_9d_trajectory(recon, cano, delta=1)
    for k, v in GOLDEN_CAM.items():
        # ATE/RTE reproduce to ~1e-16 relative; RRE to ~5e-5 relative (the
        # golden comment was produced by a different scipy Rotation build)
        assert abs(m[k] - v) < 1e-3 * abs(v), (k, m[k], v)


@needs_ref
def test_gaze_conversion_reproduces_golden_mse_from_published_recon():
    """convert_gaze must match the reference's inline convert() formula
    (reference: example_data/tok_gaze_example.py convert()) so the masked
    MSE against the published gaze-recon.npy is the golden value."""
    from egom2p_tpu.data.cam_gaze import convert_gaze

    conv = convert_gaze(np.load(f"{REF_DATA}/gaze.npy"),
                        orig_res=[896, 504], resize_res=[896, 504],
                        new_res=[480, 480])
    gt = conv[:, :2] * 0.5 + 0.5  # convert_gaze returns [-1, 1]
    valid = conv[:, 2] > 0
    pred = np.load(f"{REF_DATA}/token/gaze-recon.npy")
    mse = ((gt[valid] - pred[valid]) ** 2).mean()
    assert abs(mse - GOLDEN_GAZE_MSE) < 1e-12, mse


def _run_example(script, ckpt, tmp_path, extra=()):
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "example_data", script),
         "--ckpt", ckpt, "--out", str(tmp_path), *extra],
        capture_output=True, text=True, cwd=REPO)
    assert out.returncode == 0, out.stdout + out.stderr
    return out.stdout


@needs_ref
@pytest.mark.skipif(not os.path.exists(os.path.join(REPO, "ckpt", "checkpoint-cam.pth")),
                    reason="released checkpoint-cam.pth not present (zero-egress env)")
@pytest.mark.slow
def test_cam_checkpoint_golden_gate(tmp_path):
    """With the released cam checkpoint: exact cam-tok.npz index equality and
    golden ATE/RTE/RRE within 10%."""
    from egom2p_tpu.data.cam_gaze import canonicalize_cam, evaluate_9d_trajectory

    _run_example("tok_cam_example.py",
                 os.path.join(REPO, "ckpt", "checkpoint-cam.pth"), tmp_path)
    tok = np.load(tmp_path / "token" / "cam-tok.npz")["arr_0"]
    golden_tok = np.load(f"{REF_DATA}/token/cam-tok.npz")["arr_0"]
    np.testing.assert_array_equal(tok, golden_tok)

    recon = np.load(tmp_path / "token" / "cam-recon.npy")
    cano = canonicalize_cam(np.load(f"{REF_DATA}/cam.npy"))
    m = evaluate_9d_trajectory(recon, cano, delta=1)
    for k, v in GOLDEN_CAM.items():
        assert abs(m[k] - v) <= 0.10 * v, (k, m[k], v)


@needs_ref
@pytest.mark.skipif(not os.path.exists(os.path.join(REPO, "ckpt", "checkpoint-gaze.pth")),
                    reason="released checkpoint-gaze.pth not present (zero-egress env)")
@pytest.mark.slow
def test_gaze_checkpoint_golden_gate(tmp_path):
    from egom2p_tpu.data.cam_gaze import convert_gaze

    _run_example("tok_gaze_example.py",
                 os.path.join(REPO, "ckpt", "checkpoint-gaze.pth"), tmp_path)
    tok = np.load(tmp_path / "token" / "gaze-tok.npz")["arr_0"]
    golden_tok = np.load(f"{REF_DATA}/token/gaze-tok.npz")["arr_0"]
    np.testing.assert_array_equal(tok, golden_tok)

    conv = convert_gaze(np.load(f"{REF_DATA}/gaze.npy"),
                        orig_res=[896, 504], resize_res=[896, 504],
                        new_res=[480, 480])
    gt = conv[:, :2] * 0.5 + 0.5
    valid = conv[:, 2] > 0
    pred = np.load(tmp_path / "token" / "gaze-recon.npy")
    mse = ((gt[valid] - pred[valid]) ** 2).mean()
    assert mse <= GOLDEN_GAZE_MSE * 1.10, mse


@needs_ref
@pytest.mark.slow
def test_cam_example_random_init_smoke(tmp_path):
    """--random-init self-consistency mode: the full tokenize->reconstruct
    pipeline runs end-to-end without any checkpoint (round-3 VERDICT: the
    de-facto golden scripts must at least smoke-run in this env)."""
    out = _run_example("tok_cam_example.py", "unused", tmp_path,
                       extra=("--random-init",))
    assert "ATE" in out, out
    tok = np.load(tmp_path / "token" / "cam-tok.npz")["arr_0"]
    assert tok.shape == (30,)


@needs_ref
@pytest.mark.slow
def test_gaze_example_random_init_smoke(tmp_path):
    out = _run_example("tok_gaze_example.py", "unused", tmp_path,
                       extra=("--random-init",))
    assert "MSE" in out, out
    tok = np.load(tmp_path / "token" / "gaze-tok.npz")["arr_0"]
    assert tok.shape == (30,)
