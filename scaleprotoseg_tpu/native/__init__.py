"""Native (C++) data-path components.

The hot host-side op — training augmentation — is implemented as a fused
C++ kernel (``fastaug.cc``) compiled with g++ at first use and bound via
ctypes (no pybind11 dependency).  The numpy pipeline in
``data/dataset.py`` is the behavioral reference and automatic fallback
when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(__file__), "fastaug.cc")


def _build_dir() -> str:
    d = os.environ.get("SPS_NATIVE_CACHE") or os.path.join(
        os.path.expanduser("~"), ".cache", "scaleprotoseg_tpu")
    os.makedirs(d, exist_ok=True)
    return d


def load_library() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None on failure."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        so_path = os.path.join(_build_dir(), "libfastaug.so")
        try:
            if (not os.path.exists(so_path) or
                    os.path.getmtime(so_path) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                     "-o", so_path, _SRC],
                    check=True, capture_output=True, timeout=120)
            lib = ctypes.CDLL(so_path)
            lib.fastaug.argtypes = [
                ctypes.POINTER(ctypes.c_uint8),   # img
                ctypes.POINTER(ctypes.c_uint8),   # label
                ctypes.c_int, ctypes.c_int,       # in_h, in_w
                ctypes.POINTER(ctypes.c_uint8),   # lut
                ctypes.c_int, ctypes.c_int,       # rs_h, rs_w
                ctypes.POINTER(ctypes.c_int32),   # row_idx
                ctypes.POINTER(ctypes.c_int32),   # col_idx
                ctypes.c_int, ctypes.c_int,       # win_h, win_w
                ctypes.c_int, ctypes.c_int,       # start_h, start_w
                ctypes.c_int,                     # flip
                ctypes.POINTER(ctypes.c_float),   # mean
                ctypes.POINTER(ctypes.c_float),   # std
                ctypes.c_int,                     # normalize
                ctypes.POINTER(ctypes.c_float),   # out_img
                ctypes.POINTER(ctypes.c_int32),   # out_label
            ]
            lib.fastaug.restype = None
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def native_available() -> bool:
    return load_library() is not None


def fastaug(image: np.ndarray, label: np.ndarray, lut: np.ndarray,
            scale: float, window, start, flip: bool,
            mean: np.ndarray, std: np.ndarray, normalize: bool):
    # resized dims computed host-side with python float64, matching the
    # numpy pipeline's int(h * scale) exactly
    """Fused augmentation via the native kernel.

    Args mirror the python pipeline in ``data/dataset.py.__getitem__``;
    returns (image float32 (win_h, win_w, 3), label int32 (win_h, win_w)).
    Raises RuntimeError if the native library is unavailable.
    """
    lib = load_library()
    if lib is None:
        raise RuntimeError("native fastaug unavailable")
    image = np.ascontiguousarray(image, np.uint8)
    label = np.ascontiguousarray(label, np.uint8)
    lut = np.ascontiguousarray(lut, np.uint8)
    assert lut.size == 256
    win_h, win_w = window
    mean32 = np.ascontiguousarray(mean, np.float32)
    std32 = np.ascontiguousarray(std, np.float32)
    out_img = np.empty((win_h, win_w, 3), np.float32)
    out_label = np.empty((win_h, win_w), np.int32)
    u8 = ctypes.POINTER(ctypes.c_uint8)
    f32 = ctypes.POINTER(ctypes.c_float)
    i32 = ctypes.POINTER(ctypes.c_int32)
    rs_h = int(image.shape[0] * scale)
    rs_w = int(image.shape[1] * scale)
    from scaleprotoseg_tpu.ops.resize import _nearest_index
    row_idx = np.ascontiguousarray(_nearest_index(rs_h, image.shape[0]),
                                   np.int32)
    col_idx = np.ascontiguousarray(_nearest_index(rs_w, image.shape[1]),
                                   np.int32)
    lib.fastaug(
        image.ctypes.data_as(u8), label.ctypes.data_as(u8),
        image.shape[0], image.shape[1], lut.ctypes.data_as(u8),
        rs_h, rs_w, row_idx.ctypes.data_as(i32),
        col_idx.ctypes.data_as(i32),
        win_h, win_w, int(start[0]), int(start[1]),
        int(bool(flip)), mean32.ctypes.data_as(f32),
        std32.ctypes.data_as(f32), int(bool(normalize)),
        out_img.ctypes.data_as(f32), out_label.ctypes.data_as(i32))
    return out_img, out_label
