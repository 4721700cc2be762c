"""Native (C++) host ops with ctypes bindings and numpy fallbacks.

Build happens lazily on first import: g++ -O3 compiles fastops.cpp into a
shared library cached next to the source (rebuilt when the source changes).
Every wrapper has a pure-numpy fallback so the package works without a
compiler; `available()` reports which path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "fastops.cpp"
_LIB_CACHE: list = [None, False]  # [lib, attempted]


def _build_and_load():
    if _LIB_CACHE[1]:
        return _LIB_CACHE[0]
    _LIB_CACHE[1] = True
    src = _SRC.read_text()
    tag = hashlib.sha256(src.encode()).hexdigest()[:12]
    lib_path = _SRC.parent / f"_fastops_{tag}.so"
    try:
        if not lib_path.exists():
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 str(_SRC), "-o", str(lib_path)],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(str(lib_path))
        lib.resize_bilinear_u8.argtypes = [
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ]
        lib.u8_to_normalized_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_float, ctypes.c_float,
        ]
        lib.assemble_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_float, ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.fastops_abi_version.restype = ctypes.c_int
        assert lib.fastops_abi_version() == 1
        _LIB_CACHE[0] = lib
    except Exception:
        _LIB_CACHE[0] = None
    return _LIB_CACHE[0]


def available() -> bool:
    return _build_and_load() is not None


def resize_bilinear(img: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 [H, W, C] -> uint8 [dh, dw, C] (cv2 INTER_LINEAR convention)."""
    lib = _build_and_load()
    img = np.ascontiguousarray(img, np.uint8)
    h, w, c = img.shape
    if lib is not None:
        out = np.empty((dh, dw, c), np.uint8)
        lib.resize_bilinear_u8(
            img.ctypes.data, h, w, c, out.ctypes.data, dh, dw
        )
        return out
    import cv2

    return cv2.resize(img, (dw, dh), interpolation=cv2.INTER_LINEAR)


def normalize_u8(img: np.ndarray, scale: float = 2.0 / 255.0, offset: float = -1.0) -> np.ndarray:
    """uint8 [...] -> float32 x*scale + offset, one fused pass."""
    lib = _build_and_load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is not None:
        out = np.empty(img.shape, np.float32)
        lib.u8_to_normalized_f32(
            img.ctypes.data, out.ctypes.data, img.size,
            ctypes.c_float(scale), ctypes.c_float(offset),
        )
        return out
    return img.astype(np.float32) * scale + offset


def assemble_batch(frames: list[np.ndarray], dh: int, dw: int,
                   scale: float = 2.0 / 255.0, offset: float = -1.0) -> np.ndarray:
    """N uint8 [h_i, w_i, C] frames -> normalized float32 [N, dh, dw, C]
    with per-frame resize fused (the batching server's gather step)."""
    lib = _build_and_load()
    frames = [np.ascontiguousarray(f, np.uint8) for f in frames]
    c = frames[0].shape[-1]
    if lib is not None:
        n = len(frames)
        ptrs = (ctypes.c_void_p * n)(*[f.ctypes.data for f in frames])
        shs = np.asarray([f.shape[0] for f in frames], np.int32)
        sws = np.asarray([f.shape[1] for f in frames], np.int32)
        scratch = np.empty((dh, dw, c), np.uint8)
        out = np.empty((n, dh, dw, c), np.float32)
        lib.assemble_batch_f32(
            ptrs, shs.ctypes.data, sws.ctypes.data, n, c, dh, dw,
            ctypes.c_float(scale), ctypes.c_float(offset),
            scratch.ctypes.data, out.ctypes.data,
        )
        return out
    out = np.stack([
        resize_bilinear(f, dh, dw) if f.shape[:2] != (dh, dw) else f for f in frames
    ])
    return out.astype(np.float32) * scale + offset
