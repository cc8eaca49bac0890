"""ctypes bindings for the native host-pipeline kernels (native/motionkit.cpp).

Auto-builds the .so on first use (make -C native); every entry point has a
pure-numpy fallback (metrics/motion.py), so the framework works without a
toolchain — the native path just keeps the input pipeline off the training
critical path (the reference's cv2 per-sample work was its bottleneck,
SURVEY §3.1).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libmotionkit.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True, timeout=120, check=True)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.moved_area_mask.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_float, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.motion_score.restype = ctypes.c_int64
    lib.motion_score.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.resize_bilinear_u8.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def moved_area_mask(frames: np.ndarray, move_th: float = 5.0, area_th: int = 0) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    f, h, w, _ = frames.shape
    out = np.zeros((h, w), np.uint8)
    lib.moved_area_mask(_u8ptr(frames), f, h, w, ctypes.c_float(move_th),
                        int(area_th), _u8ptr(out))
    return out


def motion_score(frames: np.ndarray) -> Optional[int]:
    lib = _load()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    f, h, w, _ = frames.shape
    return int(lib.motion_score(_u8ptr(frames), f, h, w))


def resize_bilinear(frame: np.ndarray, oh: int, ow: int) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    frame = np.ascontiguousarray(frame, np.uint8)
    h, w, _ = frame.shape
    out = np.zeros((oh, ow, 3), np.uint8)
    lib.resize_bilinear_u8(_u8ptr(frame), h, w, _u8ptr(out), oh, ow)
    return out
