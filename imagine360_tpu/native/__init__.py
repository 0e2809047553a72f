"""ctypes bindings for the native host-preprocessing kernels (native/remap.cc).

Auto-builds with `make` on first use when a compiler is present; all entry
points fall back to numpy when the shared library is unavailable, so the
framework never hard-depends on the native build.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libi360remap.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    f32p = ctypes.POINTER(ctypes.c_float)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.remap_bilinear_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
    lib.remap_bilinear_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, f32p, f32p,
        ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int, ctypes.c_int]
    lib.u8_to_model_range.argtypes = [u8p, ctypes.c_int64, f32p,
                                      ctypes.c_int]
    lib.max_inscribed_rect_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                          ctypes.POINTER(ctypes.c_int)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def remap_bilinear(src: np.ndarray, gx: np.ndarray, gy: np.ndarray,
                   wrap_x: bool = True, num_threads: int = 8) -> np.ndarray:
    """src [H, W, C] float32/uint8; gx/gy [oh, ow] -> [oh, ow, C] float32.
    Native multi-threaded path with a numpy fallback."""
    lib = _load()
    src = np.ascontiguousarray(src)
    gx = np.ascontiguousarray(gx, np.float32)
    gy = np.ascontiguousarray(gy, np.float32)
    H, W, C = src.shape
    oh, ow = gx.shape
    if lib is not None:
        out = np.empty((oh, ow, C), np.float32)
        if src.dtype == np.uint8:
            lib.remap_bilinear_u8(
                src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                H, W, C, _as_f32p(gx), _as_f32p(gy), oh, ow, _as_f32p(out),
                int(wrap_x), num_threads)
        else:
            lib.remap_bilinear_f32(
                _as_f32p(src.astype(np.float32, copy=False)), H, W, C,
                _as_f32p(gx), _as_f32p(gy), oh, ow, _as_f32p(out),
                int(wrap_x), num_threads)
        return out
    # numpy fallback
    from ..pipeline.anchor import _remap_np
    return _remap_np(src.astype(np.float32), gx, gy, wrap=wrap_x)


def u8_to_model_range(frames: np.ndarray, num_threads: int = 8) -> np.ndarray:
    lib = _load()
    frames = np.ascontiguousarray(frames)
    if lib is None or frames.dtype != np.uint8:
        return frames.astype(np.float32) / 127.5 - 1.0
    out = np.empty(frames.shape, np.float32)
    lib.u8_to_model_range(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        frames.size, _as_f32p(out), num_threads)
    return out


def max_inscribed_rect(mask: np.ndarray):
    """Largest all-ones rectangle -> (top, left, width, height); native with
    python fallback."""
    lib = _load()
    if lib is None:
        from ..pipeline.anchor import _max_inscribed_rect_py
        return _max_inscribed_rect_py(mask)
    m = np.ascontiguousarray(mask.astype(np.uint8))
    out = (ctypes.c_int * 4)()
    lib.max_inscribed_rect_u8(
        m.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        m.shape[0], m.shape[1], out)
    return int(out[0]), int(out[1]), int(out[2]), int(out[3])
