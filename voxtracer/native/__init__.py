"""ctypes bindings for the native IO runtime (native/voxio.cpp).

Auto-builds the shared library on first import when a toolchain is present;
every consumer has a pure-Python fallback, so absence of g++/zlib only
costs speed.  Use `available()` to check."""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REPO = os.path.dirname(os.path.dirname(_HERE))
_SO = os.path.join(_HERE, "libvoxio.so")
_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if not os.path.exists(_SO):
        script = os.path.join(_REPO, "native", "build.sh")
        if os.path.exists(script):
            try:
                subprocess.run(["sh", script], check=True,
                               capture_output=True, timeout=120)
            except Exception:
                return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.vox_dims.restype = ctypes.c_int
    lib.vox_dims.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                             ctypes.POINTER(ctypes.c_int32)]
    lib.vox_fill.restype = ctypes.c_int
    lib.vox_fill.argtypes = [ctypes.c_char_p, ctypes.c_int64,
                             ctypes.c_void_p, ctypes.c_void_p]
    lib.vox_build_bricks.restype = None
    lib.vox_build_bricks.argtypes = [ctypes.c_void_p, ctypes.c_int32,
                                     ctypes.c_void_p, ctypes.c_int32,
                                     ctypes.c_uint8]
    lib.png_write.restype = ctypes.c_int
    lib.png_write.argtypes = [ctypes.c_char_p, ctypes.c_void_p,
                              ctypes.c_int32, ctypes.c_int32]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def parse_vox_native(data: bytes):
    """Returns (grid uint8 [sx, sy, sz], palette float32 [256, 4]) or None
    if the native library is unavailable/fails."""
    lib = _load()
    if lib is None:
        return None
    dims = (ctypes.c_int32 * 3)()
    if lib.vox_dims(data, len(data), dims) != 0:
        return None
    sx, sy, sz = dims[0], dims[1], dims[2]
    grid = np.zeros((sx, sy, sz), np.uint8)
    palette = np.zeros((256, 4), np.float32)
    rc = lib.vox_fill(data, len(data),
                      grid.ctypes.data_as(ctypes.c_void_p),
                      palette.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return None
    return grid, palette


def build_bricks_native(grid: np.ndarray, gridsize: int):
    """Uniform-brick macro grid via C++; None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    g = np.ascontiguousarray(grid[:gridsize, :gridsize, :gridsize], np.uint8)
    m = max(1, -(-gridsize // 8))
    out = np.zeros((m, m, m), np.int32)
    lib.vox_build_bricks(g.ctypes.data_as(ctypes.c_void_p), gridsize,
                         out.ctypes.data_as(ctypes.c_void_p), m, 255)
    return out


def write_png_native(path: str, rgb: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    img = np.ascontiguousarray(rgb, np.uint8)
    h, w = img.shape[:2]
    return lib.png_write(path.encode(), img.ctypes.data_as(ctypes.c_void_p),
                         w, h) == 0
