"""ctypes bindings for the native PNG/JPEG decoder (imagecodec.cpp).

Native fast path for the data loader's image decode — the role the torch
DataLoader's C++ workers play in the reference stack (SURVEY.md §2.11).
ctypes releases the GIL during the call, so the loader's Python prefetch
threads decode in parallel on real cores.

`decode(buf)` -> numpy array with PIL-identical layout/dtype, or None if
the library is unavailable or the format unsupported (caller falls back
to PIL; correctness never depends on the native path)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

__all__ = ["available", "decode", "lib_path"]

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "imagecodec.cpp")
_LIB = os.path.join(_DIR, "libimagecodec.so")
_lib = None
_tried = False
_lock = threading.Lock()  # loader prefetch threads race on first use


def lib_path() -> str:
    return _LIB


def _build() -> bool:
    # compile to a temp name + atomic rename: concurrent PROCESSES (e.g.
    # pytest-xdist, multiple trainers) must never observe a half-written .so
    tmp = f"{_LIB}.{os.getpid()}.tmp"
    try:
        subprocess.run(
            ["g++", "-O2", "-shared", "-fPIC", _SRC, "-lpng", "-ljpeg",
             "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _LIB)
        return True
    except (subprocess.SubprocessError, FileNotFoundError, OSError) as e:
        logging.debug("native imagecodec build failed: %s", e)
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    with _lock:
        return _load_locked()


def _load_locked():
    global _lib, _tried
    if _tried:  # lost the race; another thread finished the load
        return _lib
    _tried = True
    if not os.path.exists(_LIB) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError as e:
        logging.debug("native imagecodec load failed: %s", e)
        return None
    u8p = ctypes.POINTER(ctypes.c_uint8)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.png_probe.argtypes = [u8p, ctypes.c_size_t, ip, ip, ip, ip]
    lib.png_probe.restype = ctypes.c_int
    lib.png_decode.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.png_decode.restype = ctypes.c_int
    lib.jpeg_probe.argtypes = [u8p, ctypes.c_size_t, ip, ip, ip]
    lib.jpeg_probe.restype = ctypes.c_int
    lib.jpeg_decode.argtypes = [u8p, ctypes.c_size_t, u8p]
    lib.jpeg_decode.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _as_u8p(buf: bytes):
    return ctypes.cast(ctypes.c_char_p(buf), ctypes.POINTER(ctypes.c_uint8))


def decode(buf: bytes) -> np.ndarray | None:
    """Decode PNG/JPEG bytes to [H,W] / [H,W,C] uint8 (or uint16 PNG)."""
    lib = _load()
    if lib is None or len(buf) < 8:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    src = _as_u8p(buf)

    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        depth = ctypes.c_int()
        if lib.png_probe(src, len(buf), ctypes.byref(h), ctypes.byref(w),
                         ctypes.byref(c), ctypes.byref(depth)):
            return None
        dtype = np.uint16 if depth.value == 16 else np.uint8
        out = np.empty((h.value, w.value, c.value), dtype)
        if lib.png_decode(src, len(buf),
                          out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))):
            return None
        return out[..., 0] if c.value == 1 else out

    if buf[:2] == b"\xff\xd8":
        if lib.jpeg_probe(src, len(buf), ctypes.byref(h), ctypes.byref(w),
                          ctypes.byref(c)):
            return None
        out = np.empty((h.value, w.value, c.value), np.uint8)
        if lib.jpeg_decode(src, len(buf),
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))):
            return None
        return out[..., 0] if c.value == 1 else out

    return None
