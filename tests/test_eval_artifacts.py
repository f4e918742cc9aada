"""On-disk eval artifacts for all four tasks (round-2 VERDICT item 7).

The eval_model_* scripts are run with --smoke --seed 0 (no released
checkpoints exist in this zero-egress environment, so artifacts come from
the fixed-seed random-weights pipeline — same as rounds 1-2) and their
outputs are committed under eval_out/.  This smoke check asserts all four
task artifacts exist and are well-formed.
"""
import os

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EVAL_OUT = os.path.join(REPO, "eval_out")

EXPECTED = {
    "rgb2depth": (".mp4", "tok_depth"),
    "depth2rgb": (".mp4", "tok_rgb"),
    "rgb2cam": (".npy", "tok_cam"),
    "rgb2gaze": (".npy", "tok_gaze"),
}


@pytest.mark.parametrize("task", sorted(EXPECTED))
def test_eval_artifact_exists(task):
    ext, target = EXPECTED[task]
    d = os.path.join(EVAL_OUT, task)
    assert os.path.isdir(d), f"missing eval_out/{task} — run eval_model_{task}.py"
    files = [f for f in os.listdir(d) if f.endswith(ext) and target in f]
    assert files, (task, os.listdir(d))
    path = os.path.join(d, files[0])
    assert os.path.getsize(path) > 1024, path


def test_cam_artifact_decodes_to_trajectory():
    """The rgb2cam output is a decoded 9D trajectory whose rotations are
    valid (Gram-Schmidt invertible) — checked against the published
    round-trip metric implementation (reference: tok_cam_example.py:46-201)."""
    path = os.path.join(EVAL_OUT, "rgb2cam", "rgb2cam_egoexo.npz_tok_cam.npy")
    if not os.path.exists(path):
        pytest.skip("artifact missing")
    from egom2p_tpu.data.cam_gaze import cam_9d_to_mat

    traj = np.load(path)
    assert traj.shape[-1] == 9
    mats = cam_9d_to_mat(traj.reshape(-1, 9))
    rot = mats[..., :3, :3]
    # orthonormality of the reconstructed rotations
    eye = np.einsum("...ij,...kj->...ik", rot, rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)


def test_gaze_artifact_range():
    path = os.path.join(EVAL_OUT, "rgb2gaze",
                        "rgb2gaze_egoexo.npz_tok_gaze.npy")
    if not os.path.exists(path):
        pytest.skip("artifact missing")
    g = np.load(path)
    assert g.shape[-1] == 2 and np.isfinite(g).all()
    # decoded gaze is denormalized to ~[-1, 1] viewport coordinates
    # (data/cam_gaze.py denormalize_gaze); unnormalized pixel coords
    # (hundreds) would mean the decode path skipped denormalization
    assert np.abs(g).max() < 10.0, np.abs(g).max()
