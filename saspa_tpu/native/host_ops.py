"""ctypes bindings for the native host library, with numpy fallbacks.

Every function keeps the same contract whether the .so built or not, so the
framework runs anywhere; the native path is the fast one used by the input
pipelines (resize + fused crop-normalize run over a C++ thread pool instead
of per-image python).
"""

from __future__ import annotations

import ctypes
import logging
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    from saspa_tpu.native.build import build

    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(str(path))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i = ctypes.c_int
    f = ctypes.c_float
    lib.resize_bilinear_u8.argtypes = [u8p, i, i, i, u8p, i, i]
    lib.resize_batch_u8.argtypes = [u8p, i, i, i, i, u8p, i, i, i]
    lib.normalize_crop_batch_f32.argtypes = [u8p, i, i, i, i, i, i, i, i, f32p, f32p, f32p, i]
    lib.canny_u8.argtypes = [u8p, i, i, i, f, f, u8p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return _load() is not None


def _u8p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def _f32p(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def resize_bilinear_u8(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """uint8 (H, W, C) -> (dh, dw, C), half-pixel bilinear."""
    src = np.ascontiguousarray(src, np.uint8)
    sh, sw, c = src.shape
    lib = _load()
    dst = np.empty((dh, dw, c), np.uint8)
    if lib is None:
        from PIL import Image

        return np.asarray(Image.fromarray(src).resize((dw, dh), Image.BILINEAR))
    lib.resize_bilinear_u8(_u8p(src), sh, sw, c, _u8p(dst), dh, dw)
    return dst


def resize_batch_u8(srcs: np.ndarray, dh: int, dw: int, num_threads: int = 8) -> np.ndarray:
    """uint8 (N, H, W, C) -> (N, dh, dw, C) over the C++ thread pool."""
    srcs = np.ascontiguousarray(srcs, np.uint8)
    n, sh, sw, c = srcs.shape
    lib = _load()
    if lib is None:
        return np.stack([resize_bilinear_u8(s, dh, dw) for s in srcs])
    dst = np.empty((n, dh, dw, c), np.uint8)
    lib.resize_batch_u8(_u8p(srcs), n, sh, sw, c, _u8p(dst), dh, dw, num_threads)
    return dst


def normalize_crop_batch_f32(
    srcs: np.ndarray, y0: int, x0: int, th: int, tw: int,
    mean, std, num_threads: int = 8,
) -> np.ndarray:
    """uint8 (N, H, W, C) -> float32 (N, th, tw, C): crop + /255 + normalize."""
    srcs = np.ascontiguousarray(srcs, np.uint8)
    n, sh, sw, c = srcs.shape
    mean = np.ascontiguousarray(mean, np.float32)
    std = np.ascontiguousarray(std, np.float32)
    lib = _load()
    if lib is None:
        crop = srcs[:, y0 : y0 + th, x0 : x0 + tw].astype(np.float32) / 255.0
        return (crop - mean) / std
    dst = np.empty((n, th, tw, c), np.float32)
    lib.normalize_crop_batch_f32(
        _u8p(srcs), n, sh, sw, c, y0, x0, th, tw, _f32p(mean), _f32p(std), _f32p(dst), num_threads
    )
    return dst


def canny_u8(src: np.ndarray, low: float, high: float) -> np.ndarray:
    """Host canny fallback; the device Pallas/JAX version is primary."""
    src = np.ascontiguousarray(src, np.uint8)
    if src.ndim == 2:
        src = src[:, :, None]
    h, w, c = src.shape
    lib = _load()
    if lib is None:
        from saspa_tpu.ops.canny import canny_numpy

        return canny_numpy(src, low, high)
    dst = np.empty((h, w), np.uint8)
    lib.canny_u8(_u8p(src), h, w, c, float(low), float(high), _u8p(dst))
    return dst
