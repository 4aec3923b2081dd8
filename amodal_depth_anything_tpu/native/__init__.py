"""ctypes bindings for the native host-preprocessing library.

Builds `libpreprocess.so` from `preprocess.cpp` on first use (g++ -O3
-fopenmp) and caches it next to the source. Falls back cleanly: callers
check `available()` and use the numpy path otherwise (data pipeline is
correct either way; the native path is the fast one).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

__all__ = ["available", "resize_u8_to_f32", "resize_u16_to_f32",
           "resize_f32", "lib_path"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_LIB = os.path.join(_DIR, "libpreprocess.so")
_lib = None
_tried = False


def lib_path() -> str:
    return _LIB


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC,
             "-o", _LIB],
            check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logging.debug("native preprocess build failed: %s", e)
        return False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB) or (os.path.getmtime(_LIB) <
                                    os.path.getmtime(_SRC)):
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        return None
    i32, f32 = ctypes.c_int32, ctypes.c_float
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    u16p = np.ctypeslib.ndpointer(np.uint16, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.resize_u8_to_f32.argtypes = [u8p, i32, i32, i32, f32p, i32, i32,
                                     f32, f32]
    lib.resize_u16_to_f32.argtypes = [u16p, i32, i32, f32p, i32, i32, f32]
    lib.resize_f32.argtypes = [f32p, i32, i32, i32, f32p, i32, i32]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def resize_u8_to_f32(img: np.ndarray, out_hw, scale: float = 1.0,
                     shift: float = 0.0) -> np.ndarray:
    """[H,W,C] uint8 -> [h,w,C] float32 NEAREST_EXACT, value*scale+shift."""
    lib = _load()
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty((out_hw[0], out_hw[1], ch), np.float32)
    lib.resize_u8_to_f32(img.reshape(h, w, ch), h, w, ch, out,
                         out_hw[0], out_hw[1], scale, shift)
    return out


def resize_u16_to_f32(img: np.ndarray, out_hw,
                      scale: float = 1.0 / 65535.0) -> np.ndarray:
    """[H,W] uint16 -> [h,w] float32 NEAREST_EXACT, value*scale."""
    lib = _load()
    img = np.ascontiguousarray(img)
    h, w = img.shape[:2]
    out = np.empty((out_hw[0], out_hw[1]), np.float32)
    lib.resize_u16_to_f32(img, h, w, out, out_hw[0], out_hw[1], scale)
    return out


def resize_f32(img: np.ndarray, out_hw) -> np.ndarray:
    """[H,W,C] float32 -> [h,w,C] float32 NEAREST_EXACT."""
    lib = _load()
    img = np.ascontiguousarray(img, np.float32)
    h, w = img.shape[:2]
    ch = 1 if img.ndim == 2 else img.shape[2]
    out = np.empty((out_hw[0], out_hw[1], ch), np.float32)
    lib.resize_f32(img.reshape(h, w, ch), h, w, ch, out, out_hw[0],
                   out_hw[1])
    return out if img.ndim == 3 else out[..., 0]
