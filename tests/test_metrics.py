"""Metrics sanity tests."""
import numpy as np

from egom2p_tpu.core.metrics import (codebook_usage, masked_gaze_mse, mse,
                                     psnr, rotation_distance_deg, ssim)
from egom2p_tpu.data.cam_gaze import canonicalize_cam


def test_psnr_ssim_identity():
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, size=(2, 32, 32, 3))
    assert psnr(x, x) == float("inf")
    assert abs(ssim(x, x) - 1.0) < 1e-6
    y = x + rng.normal(scale=0.1, size=x.shape)
    p = psnr(y, x)
    assert 20 < p < 30  # 0.1 noise on range-2 data ~= 26 dB
    assert 0 < ssim(y, x) < 1


def test_codebook_usage():
    toks = np.arange(128)
    assert codebook_usage(toks, 256) == 0.5
    assert codebook_usage(np.zeros(1000, dtype=int), 256) == 1 / 256
    # window-sensitive data: first window all-zeros (1 code), second window
    # 100 distinct codes -> windowed mean differs from the global value
    toks2 = np.concatenate([np.zeros(100, int), np.arange(100) + 1])
    windowed = codebook_usage(toks2, 256, window=100)
    assert abs(windowed - (1 / 256 + 100 / 256) / 2) < 1e-9
    unwindowed = codebook_usage(toks2, 256)
    assert abs(unwindowed - 101 / 256) < 1e-9
    assert windowed != unwindowed  # the window branch must be live


def test_rotation_distance_zero_for_identical():
    cam = np.load("/root/reference/example_data/cam.npy")
    g = canonicalize_cam(cam)
    assert rotation_distance_deg(g, g) < 1e-4


def test_masked_gaze_mse():
    p = np.array([[0.5, 0.5], [0.0, 0.0]])
    t = np.array([[0.5, 0.5], [1.0, 1.0]])
    m = np.array([[True, True], [False, False]])
    assert masked_gaze_mse(p, t, m) == 0.0
    m2 = np.ones_like(m)
    assert masked_gaze_mse(p, t, m2) == 0.5
