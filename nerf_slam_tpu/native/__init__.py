"""ctypes bindings for the native frame-preprocessing library.

Builds libframeops.so on first use (g++ -O3 -fopenmp); every entry point
has a numpy fallback so the package works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libframeops.so")
_SRC = os.path.join(_DIR, "frameops.cpp")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= \
            os.path.getmtime(_SRC):
        return ctypes.CDLL(_SO)
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC,
             "-o", _SO],
            check=True, capture_output=True, timeout=120)
        return ctypes.CDLL(_SO)
    except Exception as e:
        print(f"frameops native build failed ({e}); using numpy fallback")
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        with _lock:
            if _lib is None and not _build_failed:
                lib = _build()
                if lib is not None:
                    _declare(lib)
                _lib = lib
    return _lib


def _declare(lib):
    u8p = ctypes.POINTER(ctypes.c_uint8)
    u16p = ctypes.POINTER(ctypes.c_uint16)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.resize_bilinear_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, u8p,
        ctypes.c_int, ctypes.c_int]
    lib.normalize_image_u8.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, f32p, f32p, f32p]
    lib.srgb_u8_to_linear_f32.argtypes = [u8p, ctypes.c_int64, f32p]
    lib.depth_u16_to_f32.argtypes = [u16p, ctypes.c_int64,
                                     ctypes.c_float, f32p]
    lib.resize_nearest_f32.argtypes = [
        f32p, ctypes.c_int, ctypes.c_int, f32p, ctypes.c_int,
        ctypes.c_int]


def _ptr(a, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def resize_bilinear_u8(img: np.ndarray, h: int, w: int) -> np.ndarray:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W, C = img.shape
    lib = get_lib()
    if lib is None:
        import cv2
        return cv2.resize(img, (w, h), interpolation=cv2.INTER_LINEAR)
    out = np.empty((h, w, C), np.uint8)
    lib.resize_bilinear_u8(_ptr(img, ctypes.c_uint8), H, W, C,
                           _ptr(out, ctypes.c_uint8), h, w)
    return out


def normalize_image_u8(img: np.ndarray,
                       mean=(0.485, 0.456, 0.406),
                       stdv=(0.229, 0.224, 0.225)) -> np.ndarray:
    """uint8 HWC -> normalized float32 (DROID normalization,
    visual_frontend.py:964-973)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    H, W, C = img.shape
    lib = get_lib()
    mean = np.asarray(mean, np.float32)
    stdv = np.asarray(stdv, np.float32)
    if lib is None:
        return ((img.astype(np.float32) / 255.0 - mean) / stdv)
    out = np.empty((H, W, C), np.float32)
    lib.normalize_image_u8(_ptr(img, ctypes.c_uint8), H * W, C,
                           _ptr(mean, ctypes.c_float),
                           _ptr(stdv, ctypes.c_float),
                           _ptr(out, ctypes.c_float))
    return out


def srgb_u8_to_linear(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    lib = get_lib()
    if lib is None:
        x = img.astype(np.float32) / 255.0
        return np.where(x <= 0.04045, x / 12.92,
                        ((x + 0.055) / 1.055) ** 2.4).astype(np.float32)
    out = np.empty(img.shape, np.float32)
    lib.srgb_u8_to_linear_f32(_ptr(img, ctypes.c_uint8), img.size,
                              _ptr(out, ctypes.c_float))
    return out


def depth_u16_to_f32(depth: np.ndarray, scale: float) -> np.ndarray:
    depth = np.ascontiguousarray(depth, dtype=np.uint16)
    lib = get_lib()
    if lib is None:
        return depth.astype(np.float32) * scale
    out = np.empty(depth.shape, np.float32)
    lib.depth_u16_to_f32(_ptr(depth, ctypes.c_uint16), depth.size,
                         ctypes.c_float(scale),
                         _ptr(out, ctypes.c_float))
    return out


def resize_nearest_f32(img: np.ndarray, h: int, w: int) -> np.ndarray:
    img = np.ascontiguousarray(img, dtype=np.float32)
    H, W = img.shape
    lib = get_lib()
    if lib is None:
        ys = np.minimum((np.arange(h) * H / h).astype(int), H - 1)
        xs = np.minimum((np.arange(w) * W / w).astype(int), W - 1)
        return img[ys][:, xs]
    out = np.empty((h, w), np.float32)
    lib.resize_nearest_f32(_ptr(img, ctypes.c_float), H, W,
                           _ptr(out, ctypes.c_float), h, w)
    return out
