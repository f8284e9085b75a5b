"""ctypes bindings for the native radar decode/resize library.

Builds native/libradar_io.so on first use (g++ available in this image)
and exposes ``decode_resize_clip``; the Shanghai pipeline uses it when
available and falls back to jax.image.resize otherwise.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "libradar_io.so")
_SRC_PATH = os.path.join(_NATIVE_DIR, "radar_io.cpp")

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _SO_PATH, _SRC_PATH, "-lpthread"],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if os.environ.get("ADNM_NATIVE", "1") == "0":
        return None
    if not os.path.exists(_SO_PATH) and os.path.exists(_SRC_PATH):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.decode_resize_clip.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.decode_resize_clip.restype = None
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def decode_resize_clip(frames_u8: np.ndarray, out_size: int, n_threads: int = 4) -> Optional[np.ndarray]:
    """(T, H, W) uint8 -> (T, S, S) float32 in [0,1]; None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    frames_u8 = np.ascontiguousarray(frames_u8, np.uint8)
    t, h, w = frames_u8.shape
    out = np.empty((t, out_size, out_size), np.float32)
    lib.decode_resize_clip(
        frames_u8.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), t, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_size, n_threads,
    )
    return out
