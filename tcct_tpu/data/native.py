"""ctypes bindings for the native C++ data plane (csrc/oct_loader.cpp).

Builds ``liboct_loader.so`` lazily with g++ (cached next to the source)
and exposes:

- ``png_info`` / ``decode_png``   — from-scratch native PNG decode
- ``load_batch``                  — multithreaded decode + geometry prep
                                    (crop band, pad/resize, label //divide)
                                    straight into caller-owned numpy arenas

Falls back cleanly (``available() == False``) when no compiler/zlib is
present; tcct_tpu/data/eyeset.py then uses the cv2 path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc", "oct_loader.cpp")
_LIB = os.path.join(os.path.dirname(_SRC), "liboct_loader.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> Optional[str]:
    src = os.path.abspath(_SRC)
    lib = os.path.abspath(_LIB)
    if os.path.exists(lib) and os.path.getmtime(lib) >= os.path.getmtime(src):
        return lib
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", lib, src, "-lz", "-lpthread"]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return lib
    except Exception:
        return None


def _get() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        path = _build()
        if path is None:
            return None
        lib = ctypes.CDLL(path)
        lib.oct_png_info.argtypes = [ctypes.c_char_p] + [ctypes.POINTER(ctypes.c_int)] * 3
        lib.oct_png_info.restype = ctypes.c_int
        lib.oct_decode_png.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.oct_decode_png.restype = ctypes.c_int
        lib.oct_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
        ]
        lib.oct_load_batch.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _get() is not None


def png_info(path: str) -> Tuple[int, int, int]:
    lib = _get()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h = ctypes.c_int()
    w = ctypes.c_int()
    c = ctypes.c_int()
    if lib.oct_png_info(path.encode(), ctypes.byref(h), ctypes.byref(w), ctypes.byref(c)):
        raise ValueError(f"failed to read PNG {path}")
    return h.value, w.value, c.value


def decode_png(path: str, channels: int = 3) -> np.ndarray:
    lib = _get()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    h, w, _ = png_info(path)
    out = np.empty((h, w, channels) if channels == 3 else (h, w), np.uint8)
    rc = lib.oct_decode_png(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w, channels
    )
    if rc:
        raise ValueError(f"failed to decode PNG {path} (rc={rc})")
    return out


def load_batch(
    img_paths: Sequence[str],
    lab_paths: Optional[Sequence[Optional[str]]],
    hw: Tuple[int, int],
    height_stt: int = 0,
    height_end: int = 1 << 30,
    prep_mode: str = "pad",
    prep_reflect: bool = False,
    divide: int = 30,
    n_threads: int = 0,
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Decode + geometry-prep a batch in native threads.

    Returns (imgs [n,H,W,3] u8, labs [n,H,W] u8, n_ok)."""
    lib = _get()
    if lib is None:
        raise RuntimeError("native loader unavailable")
    n = len(img_paths)
    H, W = hw
    imgs = np.zeros((n, H, W, 3), np.uint8)
    labs = np.zeros((n, H, W), np.uint8)
    ArrN = ctypes.c_char_p * n
    c_imgs = ArrN(*[p.encode() for p in img_paths])
    if lab_paths is None:
        lab_paths = [""] * n
    c_labs = ArrN(*[(p or "").encode() for p in lab_paths])
    n_ok = lib.oct_load_batch(
        c_imgs,
        c_labs,
        n,
        imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        labs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        H,
        W,
        height_stt,
        height_end,
        1 if prep_mode == "resize" else 0,
        1 if prep_reflect else 0,
        divide,
        n_threads,
    )
    return imgs, labs, n_ok
