"""Offline training-data preparation for the cam/gaze tokenizers.

Generic equivalents of the reference's dataset builders
(reference: egom2p/data/load_cam.py, egom2p/data/load_gaze.py,
cam_traj_dataset.py): read raw pose/gaze streams, apply per-dataset camera
coordinate conventions, cut into 60-frame (2 s @ 30 fps) windows with temporal
overlap augmentation, canonicalize + standardize, and write the stacked npy
training sets consumed by run_training_vqvae.py.
"""
from __future__ import annotations

import glob
import os
import re
from typing import Iterable, List, Optional, Sequence

import numpy as np

from egom2p_tpu.data.cam_gaze import (CW90, HOLOCAM_TO_OPENCV,
                                      OPENGL_TO_OPENCV, canonicalize_cam,
                                      convert_gaze)

CONVENTIONS = {
    "opencv": np.eye(4),
    "opengl": OPENGL_TO_OPENCV,
    "holoassist": HOLOCAM_TO_OPENCV,
    "cw90": CW90,
}


def natural_sort_key(s, _nsre=re.compile(r"([0-9]+)")):
    """(reference: load_cam.py:8-9)"""
    return [int(t) if t.isdigit() else t.lower() for t in _nsre.split(s)]


def temporal_overlap_augmentation(data: np.ndarray, stride: int = 10,
                                  sequence_length: int = 60) -> List[np.ndarray]:
    """Sliding windows with overlap (reference: load_cam.py:17-21)."""
    return [data[s:s + sequence_length]
            for s in range(0, len(data) - sequence_length + 1, stride)]


def read_pose_txt(path: str) -> np.ndarray:
    """Tab-separated pose export (id, ts, 16 matrix entries) -> (T, 4, 4)
    (reference: load_cam.py:34-44)."""
    rows = []
    with open(path) as f:
        for line in f.read().split("\n"):
            if not line:
                break
            rows.append(list(map(float, line.strip().split("\t"))))
    return np.asarray(rows)[:, 2:].reshape(-1, 4, 4)


def build_cam_training_set(pose_files: Sequence[str], out_path: str,
                           convention: str = "opencv", stride: int = 10,
                           clip_len: int = 60) -> np.ndarray:
    """Poses -> stacked canonicalized 9D windows (N, clip_len, 9).

    Note: standardization uses the published CAM_MEAN/STD at train time
    (applied by run_training_vqvae.py), so the npy stores raw canonicalized 9D.
    """
    conv = CONVENTIONS[convention]
    windows = []
    for f in sorted(pose_files, key=natural_sort_key):
        poses = (np.load(f) if f.endswith((".npy", ".npz")) else read_pose_txt(f))
        if hasattr(poses, "files"):
            poses = poses[poses.files[0]]
        poses = poses @ conv
        for w in temporal_overlap_augmentation(poses, stride, clip_len):
            if np.isnan(w).any():
                continue
            windows.append(canonicalize_cam(w))
    out = np.stack(windows) if windows else np.zeros((0, clip_len, 9))
    np.save(out_path, out)
    print(f"wrote {out.shape} -> {out_path}")
    return out


def build_gaze_training_set(gaze_files: Sequence[str], out_path: str,
                            orig_res, resize_res=None, new_res=(480, 480),
                            stride: int = 10, clip_len: int = 60) -> np.ndarray:
    """2D gaze streams -> stacked converted windows (N, clip_len, 3)
    with x/y normalized to [-1, 1] plus validity mask
    (reference: load_gaze.py + gaze_dataset.convert)."""
    resize_res = resize_res or orig_res
    windows = []
    for f in sorted(gaze_files, key=natural_sort_key):
        gaze = np.load(f)
        if hasattr(gaze, "files"):
            gaze = gaze[gaze.files[0]]
        conv = convert_gaze(gaze, orig_res=orig_res, resize_res=resize_res,
                            new_res=new_res)
        windows.extend(temporal_overlap_augmentation(conv, stride, clip_len))
    out = np.stack(windows) if windows else np.zeros((0, clip_len, 3))
    np.save(out_path, out)
    print(f"wrote {out.shape} -> {out_path}")
    return out


def compute_cam_stats(cam_9d_windows: np.ndarray):
    """Per-dim mean/std of the canonicalized 9D training set
    (how CAM_MEAN/CAM_STD were produced, reference: data_constants.py:46)."""
    flat = cam_9d_windows.reshape(-1, 9)
    return flat.mean(0), flat.std(0)
