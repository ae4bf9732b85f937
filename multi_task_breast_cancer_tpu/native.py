"""ctypes bindings for the native (C++) data-path library.

Compiles ``native/mtbc_native.cpp`` with g++ on first use (cached .so).
Every binding has a pure-numpy fallback so the framework works without a
toolchain; ``available()`` reports whether the native path is active.
"""

from __future__ import annotations

import ctypes
import logging
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libmtbc_native.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR)], check=True,
                       capture_output=True, timeout=120)
        return _LIB_PATH.exists()
    except Exception as e:  # pragma: no cover
        logging.warning("mtbc_native build failed (%s); using numpy fallbacks", e)
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    u8p = ctypes.POINTER(ctypes.c_uint8)
    f32p = ctypes.POINTER(ctypes.c_float)
    i64p = ctypes.POINTER(ctypes.c_int64)
    lib.nearest_resize_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                      u8p, ctypes.c_int, ctypes.c_int]
    lib.nearest_resize_u8_batch.argtypes = [u8p, ctypes.c_int, ctypes.c_int,
                                            ctypes.c_int, u8p, ctypes.c_int,
                                            ctypes.c_int]
    lib.add_saturate_u8.argtypes = [u8p, u8p, ctypes.c_int64]
    lib.binarize_u8.argtypes = [u8p, ctypes.c_int64, ctypes.c_uint8]
    lib.mask_stats.argtypes = [u8p, ctypes.c_int, ctypes.c_int, i64p]
    lib.u8_to_f32.argtypes = [u8p, f32p, ctypes.c_int64, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _u8(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def nearest_resize(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """cv2.INTER_NEAREST-semantics resize of a (H, W) uint8 image."""
    src = np.ascontiguousarray(src, np.uint8)
    lib = _load()
    if lib is None:
        # bit-identical to the C kernel (and cv2): index = int(y * (sh/dh))
        # with the scale computed FIRST as a double — (y*sh)/dh rounds
        # differently for non-power-of-2 sizes and would make preprocessed
        # images depend on whether the native lib is present
        sh, sw = src.shape
        ys = np.minimum((np.arange(dh, dtype=np.float64) * (sh / dh))
                        .astype(np.int64), sh - 1)
        xs = np.minimum((np.arange(dw, dtype=np.float64) * (sw / dw))
                        .astype(np.int64), sw - 1)
        return src[np.ix_(ys, xs)]
    dst = np.empty((dh, dw), np.uint8)
    lib.nearest_resize_u8(_u8(src), src.shape[0], src.shape[1], _u8(dst), dh, dw)
    return dst


def nearest_resize_batch(src: np.ndarray, dh: int, dw: int) -> np.ndarray:
    """Batched resize of (N, H, W) uint8 images (OpenMP-parallel natively)."""
    src = np.ascontiguousarray(src, np.uint8)
    lib = _load()
    if lib is None:
        return np.stack([nearest_resize(s, dh, dw) for s in src])
    n, sh, sw = src.shape
    dst = np.empty((n, dh, dw), np.uint8)
    lib.nearest_resize_u8_batch(_u8(src), n, sh, sw, _u8(dst), dh, dw)
    return dst


def add_saturate(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Saturating uint8 add (cv2.add) — multi-mask merging."""
    a = np.ascontiguousarray(a, np.uint8).copy()
    b = np.ascontiguousarray(b, np.uint8)
    lib = _load()
    if lib is None:
        return np.clip(a.astype(np.int32) + b.astype(np.int32), 0, 255).astype(np.uint8)
    lib.add_saturate_u8(_u8(a), _u8(b), a.size)
    return a


def binarize(m: np.ndarray, thresh: int = 128) -> np.ndarray:
    m = np.ascontiguousarray(m, np.uint8).copy()
    lib = _load()
    if lib is None:
        return (m >= thresh).astype(np.uint8)
    lib.binarize_u8(_u8(m), m.size, thresh)
    return m


def mask_stats(mask: np.ndarray) -> dict:
    """{tumor_pixels, y_max, y_min, x_max, x_min, y_size, x_size} — the
    preprocessing tool's bbox/count metadata (zeros when empty)."""
    mask = np.ascontiguousarray(mask, np.uint8)
    lib = _load()
    if lib is None:
        ys, xs = np.nonzero(mask)
        if len(ys) == 0:
            vals = [0] * 7
        else:
            vals = [int(len(ys)), int(ys.max() + 1), int(ys.min()),
                    int(xs.max() + 1), int(xs.min()),
                    int(ys.max() + 1 - ys.min()), int(xs.max() + 1 - xs.min())]
    else:
        out = np.zeros(7, np.int64)
        lib.mask_stats(_u8(mask), mask.shape[0], mask.shape[1],
                       out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)))
        vals = [int(v) for v in out]
    keys = ["tumor_pixels", "y_max", "y_min", "x_max", "x_min", "y_size", "x_size"]
    return dict(zip(keys, vals))


def u8_to_f32(src: np.ndarray, normalize: bool = False) -> np.ndarray:
    src = np.ascontiguousarray(src, np.uint8)
    lib = _load()
    if lib is None:
        out = src.astype(np.float32)
        if normalize:
            # mirror the C kernel bit-for-bit: float32 reciprocal-multiply
            # (scale computed once), zero when the image is constant
            lo, hi = int(src.min()), int(src.max())
            scale = np.float32(1.0) / np.float32(hi - lo) if hi > lo \
                else np.float32(0.0)
            out = (out - np.float32(lo)) * scale
        return out
    dst = np.empty(src.shape, np.float32)
    lib.u8_to_f32(_u8(src), dst.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                  src.size, int(normalize))
    return dst
