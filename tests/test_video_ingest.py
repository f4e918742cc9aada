"""Native video ingest/egress tests (C++ libav library via ctypes)."""
import os

import numpy as np
import pytest

from egom2p_tpu.data.video_ingest import read_video, write_video

REF_MP4 = "/root/reference/example_data/rgb2dep_h2o.mp4"


def test_read_reference_clip():
    v = read_video(REF_MP4, out_size=256)
    assert v.shape == (16, 256, 256, 3)
    assert v.dtype == np.uint8
    assert v.max() > 100  # real content


def test_write_read_roundtrip(tmp_path):
    frames = np.stack([np.full((64, 64, 3), i * 16, dtype=np.uint8)
                       for i in range(16)])
    p = str(tmp_path / "clip.mp4")
    write_video(p, frames, fps=8.0)
    rt = read_video(p, out_size=64)
    assert rt.shape == frames.shape
    # frame ORDER and VALUES survive (lossy codec: small tolerance)
    means = rt.reshape(16, -1).mean(axis=1)
    assert np.all(np.diff(means) > 8)  # strictly increasing ramp
    assert np.abs(rt.astype(int) - frames.astype(int)).mean() < 3


def test_fps_resampling(tmp_path):
    frames = np.stack([np.full((64, 64, 3), i * 16, dtype=np.uint8)
                       for i in range(16)])
    p = str(tmp_path / "clip8fps.mp4")
    write_video(p, frames, fps=8.0)
    half = read_video(p, out_size=64, target_fps=4.0)
    assert half.shape[0] == 8
    # every other frame selected
    sel = half.reshape(8, -1).mean(axis=1)
    full = frames.reshape(16, -1).mean(axis=1)
    assert np.allclose(sel, full[::2], atol=4)


def test_center_crop_and_scale(tmp_path):
    # non-square source: left/right borders differ from center
    frames = np.zeros((4, 64, 128, 3), dtype=np.uint8)
    frames[:, :, 32:96] = 200  # center square bright
    p = str(tmp_path / "wide.mp4")
    write_video(p, frames, fps=8.0)
    v = read_video(p, out_size=32)
    assert v.shape == (4, 32, 32, 3)
    assert v.mean() > 150  # cropped to the bright center square


def test_max_frames(tmp_path):
    frames = np.random.default_rng(0).integers(
        0, 255, size=(20, 64, 64, 3)).astype(np.uint8)
    p = str(tmp_path / "long.mp4")
    write_video(p, frames, fps=8.0)
    v = read_video(p, out_size=64, max_frames=5)
    assert v.shape[0] == 5


def test_missing_file_raises():
    with pytest.raises(RuntimeError):
        read_video("/nonexistent/clip.mp4")


def test_read_videos_pooled_matches_serial():
    """Thread-pooled decode returns the same frames in input order."""
    from egom2p_tpu.data.video_ingest import read_video, read_videos_pooled
    path = "/root/reference/example_data/rgb2dep_h2o.mp4"
    serial = read_video(path, out_size=64)
    pooled = read_videos_pooled([path] * 3, out_size=64, workers=3)
    assert len(pooled) == 3
    for arr in pooled:
        np.testing.assert_array_equal(arr, serial)
