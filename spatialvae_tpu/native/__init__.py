"""ctypes bindings for the native host-runtime library.

Builds lazily with make on first use; every entry point has a pure-Python
fallback so the framework works without a toolchain.  ``available()`` tells
callers whether the fast path is active.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(__file__)
_LIB_PATH = os.path.join(_DIR, "libspatialvae_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int32)
    i64 = ctypes.c_int64

    lib.mrc_header_info.argtypes = [u8p, i64, i32p, i32p, i32p, i32p, i32p]
    lib.mrc_header_info.restype = ctypes.c_int
    lib.mrc_decode_f32.argtypes = [u8p, i64, ctypes.c_int32, f32p]
    lib.mrc_decode_f32.restype = ctypes.c_int
    lib.u8_to_f32_scale.argtypes = [u8p, i64, ctypes.c_float, f32p]
    lib.u8_to_f32_scale.restype = None
    lib.f32_normalize_whole.argtypes = [f32p, i64, i64]
    lib.f32_normalize_whole.restype = None
    lib.grid_tile_u8.argtypes = [f32p, i64, i64, i64, i64, i64, i64, i64,
                                 ctypes.c_float, u8p]
    lib.grid_tile_u8.restype = None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _as_f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def u8_to_f32_scale(arr: np.ndarray, scale: float = 1.0 / 255.0
                    ) -> Optional[np.ndarray]:
    """uint8 array -> float32 * scale; None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    out = np.empty(arr.shape, dtype=np.float32)
    lib.u8_to_f32_scale(_as_u8p(arr), arr.size, np.float32(scale),
                        _as_f32p(out))
    return out


def normalize_whole_inplace(stack: np.ndarray) -> bool:
    """Per-image standardisation in place over (N, ...) float32; False if
    the library is unavailable."""
    lib = _load()
    if lib is None or stack.dtype != np.float32 \
            or not stack.flags.c_contiguous:
        return False
    n = stack.shape[0]
    pixels = stack.size // max(n, 1)
    lib.f32_normalize_whole(_as_f32p(stack), n, pixels)
    return True


# bytes per element for each supported MRC mode (0 int8, 1 int16,
# 2 float32, 6 uint16)
_MRC_ITEMSIZE = {0: 1, 1: 2, 2: 4, 6: 2}


def mrc_decode_f32(data: bytes, count: int, mode: int
                   ) -> Optional[np.ndarray]:
    lib = _load()
    itemsize = _MRC_ITEMSIZE.get(mode)
    if lib is None or itemsize is None:
        return None
    if count < 0 or len(data) < count * itemsize:
        # truncated stack: the C decoder would read out of bounds —
        # return None so the caller falls back to the pure-Python codec,
        # which raises a proper error for short buffers
        return None
    out = np.empty(count, dtype=np.float32)
    buf = np.frombuffer(data, dtype=np.uint8)
    rc = lib.mrc_decode_f32(_as_u8p(buf), count, np.int32(mode),
                            _as_f32p(out))
    return out if rc == 0 else None


def grid_tile(images: np.ndarray, xmaps: int, ymaps: int, padding: int,
              pad_value: float) -> Optional[np.ndarray]:
    """(B, n, m, c) float32 -> uint8 canvas, or None without the library."""
    lib = _load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images, dtype=np.float32)
    b, n, m, c = images.shape
    if b > xmaps * ymaps:
        return None  # canvas too small — C tiler would write out of bounds
    h = (n + padding) * ymaps + padding
    w = (m + padding) * xmaps + padding
    canvas = np.empty((h, w, c), dtype=np.uint8)
    lib.grid_tile_u8(_as_f32p(images), b, n, m, c, xmaps, ymaps, padding,
                     np.float32(pad_value), _as_u8p(canvas))
    return canvas
