"""Python bindings for the native video ingest library (ctypes).

`read_video` replaces the reference's decord VideoReader + ffmpeg subprocess
preprocessing in one native call (reference: eval_model_rgb2depth.py:26-32,
cosmos_tokenizer/video_cli.py:211-240); `write_video` replaces the mediapy
mp4 writers (reference: egom2p/utils/plotting_utils.py:103-131).

The shared library is compiled on demand from native/video_ingest.cpp with
the system toolchain (g++ + libav*), cached under native/build/.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "video_ingest.cpp")
_BUILD_DIR = os.path.join(_REPO_ROOT, "native", "build")
_SO = os.path.join(_BUILD_DIR, "libvideoingest.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None


def _build() -> None:
    os.makedirs(_BUILD_DIR, exist_ok=True)
    # compile to a process-unique temp path and os.replace() atomically:
    # forked data-loader workers may race this build, and dlopen of a
    # half-written .so fails with cryptic ELF errors
    tmp = f"{_SO}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp,
        "-lavformat", "-lavcodec", "-lavutil", "-lswscale",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True)
    if proc.returncode != 0:
        raise RuntimeError(
            f"native video ingest build failed (see compiler output):\n"
            f"{' '.join(cmd)}\n{proc.stderr}")
    os.replace(tmp, _SO)


def _load() -> ctypes.CDLL:
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO) or (
                os.path.exists(_SRC)
                and os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            # a deployed prebuilt .so without the C++ source is fine;
            # staleness only applies when the source is present
            _build()
        lib = ctypes.CDLL(_SO)
        lib.vi_read_video.restype = ctypes.c_int
        lib.vi_read_video.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_int, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int),
        ]
        lib.vi_free.argtypes = [ctypes.POINTER(ctypes.c_uint8)]
        lib.vi_write_video.restype = ctypes.c_int
        lib.vi_write_video.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ]
        _lib = lib
        return lib


def read_video(path: str, out_size: int = 256, target_fps: float = 0.0,
               max_frames: int = 0) -> np.ndarray:
    """Decode a video to (T, out_size, out_size, 3) uint8 RGB with center
    square crop + Lanczos scaling.  target_fps <= 0 keeps the native rate."""
    lib = _load()
    data = ctypes.POINTER(ctypes.c_uint8)()
    n = ctypes.c_int(0)
    rc = lib.vi_read_video(path.encode(), out_size, out_size,
                           float(target_fps), int(max_frames),
                           ctypes.byref(data), ctypes.byref(n))
    if rc != 0:
        raise RuntimeError(f"vi_read_video({path}) failed with code {rc}")
    try:
        nbytes = n.value * out_size * out_size * 3
        arr = np.ctypeslib.as_array(data, shape=(nbytes,)).copy()
    finally:
        lib.vi_free(data)
    return arr.reshape(n.value, out_size, out_size, 3)


def read_videos_pooled(paths, out_size: int = 256, target_fps: float = 0.0,
                       max_frames: int = 0, workers: int = 0):
    """Decode many clips concurrently on a thread pool.

    ctypes releases the GIL for the duration of vi_read_video, and the
    native decoder is self-contained per call, so N Python threads run N
    libav decodes truly in parallel — the pod-serving answer to one chip
    host feeding 8 chips (the reference fans out one ffmpeg/decord process
    per GPU instead, cosmos_tokenizer/video_cli.py:283-299).  workers=0
    uses os.cpu_count().  Returns results in input order."""
    from concurrent.futures import ThreadPoolExecutor
    workers = workers or os.cpu_count() or 1
    if workers == 1 or len(paths) <= 1:
        return [read_video(p, out_size, target_fps, max_frames)
                for p in paths]
    with ThreadPoolExecutor(max_workers=workers) as ex:
        return list(ex.map(
            lambda p: read_video(p, out_size, target_fps, max_frames), paths))


def write_video(path: str, frames: np.ndarray, fps: float = 8.0) -> None:
    """Encode (T, H, W, 3) uint8 RGB frames to an mp4."""
    lib = _load()
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    t, h, w, c = frames.shape
    assert c == 3
    rc = lib.vi_write_video(
        path.encode(), frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        t, w, h, float(fps))
    if rc != 0:
        raise RuntimeError(f"vi_write_video({path}) failed with code {rc}")
