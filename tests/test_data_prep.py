"""Offline data-prep specifics (round-1 verdict item 10): HoloAssist
eye-gaze projection geometry and neighbor-clip temporal-overlap windows."""
import os

import numpy as np
import pytest


def test_eye_gaze_point_along_ray():
    from egom2p_tpu.data.prep import get_eye_gaze_point

    row = np.array([0, 0, 1.0, 2.0, 3.0, 0.0, 0.0, 2.0])  # direction +z (x2)
    p = get_eye_gaze_point(row, dist=0.5)
    np.testing.assert_allclose(p, [1.0, 2.0, 3.5])  # normalized direction


def test_project_eye_gaze_geometry():
    """A gaze point straight ahead of an identity camera must project to the
    principal point; known off-axis points land at fx*x/z + cx."""
    from egom2p_tpu.data.prep import AXIS_TRANSFORM, project_eye_gaze

    fx = fy = 200.0
    cx, cy = 120.0, 100.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    # build a world point whose camera-frame position (after the HoloLens
    # axis transform) is exactly (x, y, z): invert the transform chain
    def world_from_cam(p_cam, pose):
        ph = np.linalg.inv(AXIS_TRANSFORM) @ np.concatenate([p_cam, [1.0]])
        return (pose @ ph)[:3]

    pose = np.eye(4)
    pose[:3, 3] = [0.3, -0.2, 0.1]  # translated camera
    for p_cam, expected in [
        (np.array([0.0, 0.0, 0.5]), (cx, cy)),
        (np.array([0.1, -0.05, 0.5]), (fx * 0.2 + cx, fy * -0.1 + cy)),
    ]:
        w = world_from_cam(p_cam, pose)
        # gaze row: origin at w, any direction, dist 0 => point == origin
        row = np.array([0, 0, *w, 0, 0, 1.0])
        uv = project_eye_gaze(row[None], pose[None], K, eye_dist=1e-12)
        np.testing.assert_allclose(uv[0], expected, atol=1e-6)


def test_holoassist_txt_readers(tmp_path):
    from egom2p_tpu.data.prep import (read_gaze_txt, read_intrinsics_txt,
                                      read_pose_txt)

    pose = np.eye(4).reshape(-1)
    lines = "\n".join("\t".join(map(str, [i, i * 33] + list(pose)))
                      for i in range(3))
    (tmp_path / "Pose_sync.txt").write_text(lines + "\n")
    poses = read_pose_txt(str(tmp_path / "Pose_sync.txt"))
    assert poses.shape == (3, 4, 4)
    np.testing.assert_allclose(poses[0], np.eye(4))

    gaze_lines = "\n".join("\t".join(map(str, [i, i * 33, 0, 0, 0, 0, 0, 1]))
                           for i in range(3))
    (tmp_path / "Eyes_sync.txt").write_text(gaze_lines + "\n")
    assert read_gaze_txt(str(tmp_path / "Eyes_sync.txt")).shape == (3, 8)

    K = np.arange(9, dtype=float)
    (tmp_path / "Intrinsics.txt").write_text(
        "\t".join(map(str, list(K) + [896.0, 504.0])))
    k, w, h = read_intrinsics_txt(str(tmp_path / "Intrinsics.txt"))
    assert k.shape == (3, 3) and (w, h) == (896.0, 504.0)


def test_concat_neighbor_windows(tmp_path):
    from egom2p_tpu.data.prep import concat_neighbor_windows

    rng = np.random.default_rng(0)
    # clips 0,1 are neighbors; clip 5 is not
    for i in (0, 1, 5):
        np.save(tmp_path / f"seq_a_{i}.npy",
                rng.normal(0, 1, (40, 4, 4)))
    files = [str(tmp_path / f"seq_a_{i}.npy") for i in (0, 1, 5)]
    wins = concat_neighbor_windows(files, np.load, stride=10, clip_len=60)
    # one neighbor pair -> 80 combined frames -> windows at 0,10,20
    assert len(wins) == 3
    assert all(w.shape == (60, 4, 4) for w in wins)
    # window 0 spans the seam: second half equals the start of clip 1
    a0 = np.load(files[0])
    a1 = np.load(files[1])
    np.testing.assert_allclose(wins[0][:40], a0)
    np.testing.assert_allclose(wins[0][40:], a1[:20])


def test_full_holoassist_style_pipeline(tmp_path):
    """End-to-end: synthetic HoloAssist-layout export -> projected gaze ->
    converted gaze training windows (reference flow: holoassist_eye_proj.py
    then load_gaze.py)."""
    from egom2p_tpu.data.cam_gaze import convert_gaze
    from egom2p_tpu.data.prep import (project_eye_gaze,
                                      temporal_overlap_augmentation)

    rng = np.random.default_rng(1)
    T = 80
    K = np.array([[450.0, 0, 448], [0, 450.0, 252], [0, 0, 1]])
    poses = np.tile(np.eye(4)[None], (T, 1, 1))
    poses[:, :3, 3] = rng.normal(0, 0.05, (T, 3))
    gaze_rows = np.concatenate([
        np.arange(T)[:, None], np.arange(T)[:, None] * 33,
        rng.normal(0, 0.1, (T, 3)),                 # origins
        rng.normal(0, 1, (T, 3)) + [0, 0, 2.0],     # directions ~ forward
    ], axis=1)
    uv = project_eye_gaze(gaze_rows, poses, K)
    assert uv.shape == (T, 2) and np.isfinite(uv).all()
    conv = convert_gaze(uv, orig_res=[896, 504], resize_res=[896, 504],
                        new_res=[480, 480])
    wins = temporal_overlap_augmentation(conv, stride=10, sequence_length=60)
    assert len(wins) == 3 and wins[0].shape == (60, 3)


def test_cam_viz_tool_html(tmp_path):
    """Interactive trajectory viewer writes a self-contained HTML file with
    both tracks embedded (reference: vis_3d/cam_viz_tool.py SLAMFrontend)."""
    import json
    import re
    import sys

    sys.path.insert(0, "vis_3d")
    import cam_viz_tool

    T = 12
    poses = np.tile(np.eye(4), (T, 1, 1))
    poses[:, 0, 3] = np.linspace(0, 1, T)
    fe = cam_viz_tool.SLAMFrontend(str(tmp_path)).start()
    fe.update_cam_trajectory(poses, gt=True)
    for i, p in enumerate(poses):
        fe.update_pose(i, p, gt=False)
    out = fe.join()
    html = open(out).read()
    data = json.loads(re.search(r"const DATA = (\{.*?\});\n", html,
                                re.S).group(1))
    assert len(data["est"]["traj"]) == T and len(data["gt"]["traj"]) == T
    segs = data["est"]["frusta"]["0"]
    assert len(segs) == 12 and len(segs[0][0]) == 3
    assert "__DATA__" not in html
