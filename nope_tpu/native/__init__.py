"""ctypes bindings for the native data plane (with numpy fallbacks).

The host-side preprocessing hot path — RGBA compositing, perspective
warp, and the fused batch preprocess — in C++ (``warp.cpp``), loaded
lazily.  When the shared library hasn't been built (or g++ is absent)
every entry point falls back to the pure-Python implementation, so the
framework never *requires* the native layer — it's a throughput
multiplier for the input pipeline.

Build once with ``python -m nope_tpu.native.build``; the loader also
attempts an automatic build on first use.
"""

from __future__ import annotations

import ctypes
import logging
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so_path = os.path.join(os.path.dirname(__file__), "libnope_native.so")
    if not os.path.exists(so_path):
        try:
            from nope_tpu.native.build import build

            so_path = build()
        except Exception as e:  # no compiler / build failure: fall back
            logging.info("native library unavailable (%s); using numpy fallbacks", e)
            return None
    lib = ctypes.CDLL(so_path)
    i64, f32p, f64p, u8p = (
        ctypes.c_int64,
        np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    )
    lib.warp_perspective_f32.argtypes = [f32p, i64, i64, i64, f64p, f32p, i64]
    lib.warp_perspective_u8.argtypes = [u8p, i64, i64, i64, f64p, u8p, i64]
    lib.composite_rgba_black.argtypes = [u8p, i64, i64, u8p]
    lib.preprocess_batch.argtypes = [u8p, i64, i64, i64, f64p, f32p, i64, i64]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def warp_perspective(img: np.ndarray, M: np.ndarray, out_size: int) -> np.ndarray:
    """cv2.warpPerspective-semantics warp (native when available)."""
    lib = _load()
    M = np.ascontiguousarray(M, dtype=np.float64)
    if lib is None:
        import jax.numpy as jnp

        from nope_tpu.geometry.cropping import warp_perspective_jax

        out = np.asarray(
            warp_perspective_jax(jnp.asarray(img, jnp.float32), jnp.asarray(M), out_size)
        )
        if img.dtype == np.uint8:
            out = np.clip(np.rint(out), 0, 255).astype(np.uint8)
        return out
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, C = img.shape
    if img.dtype == np.uint8:
        dst = np.empty((out_size, out_size, C), np.uint8)
        lib.warp_perspective_u8(np.ascontiguousarray(img), H, W, C, M, dst, out_size)
    else:
        src = np.ascontiguousarray(img, dtype=np.float32)
        dst = np.empty((out_size, out_size, C), np.float32)
        lib.warp_perspective_f32(src, H, W, C, M, dst, out_size)
    return dst[..., 0] if squeeze else dst


def composite_rgba_black(rgba: np.ndarray) -> np.ndarray:
    """(H, W, 4) uint8 → (H, W, 3) uint8 over black."""
    lib = _load()
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    h, w = rgba.shape[:2]
    if lib is None:
        alpha = rgba[..., 3:4].astype(np.uint16)
        return ((rgba[..., :3].astype(np.uint16) * alpha + 127) // 255).astype(np.uint8)
    rgb = np.empty((h, w, 3), np.uint8)
    lib.composite_rgba_black(rgba, h, w, rgb)
    return rgb


def preprocess_batch(
    rgba: np.ndarray, homographies: np.ndarray, out_size: int,
    num_threads: int = 0,
) -> np.ndarray:
    """Fused composite+warp+normalize for a whole batch:
    (B, H, W, 4) u8 + (B, 3, 3) f64 → (B, S, S, 3) f32 in [-1, 1]."""
    lib = _load()
    rgba = np.ascontiguousarray(rgba, dtype=np.uint8)
    Ms = np.ascontiguousarray(homographies, dtype=np.float64)
    b, h, w = rgba.shape[:3]
    if lib is None:
        out = np.empty((b, out_size, out_size, 3), np.float32)
        for i in range(b):
            rgb = composite_rgba_black(rgba[i]).astype(np.float32)
            out[i] = warp_perspective(rgb, Ms[i], out_size) * (2.0 / 255.0) - 1.0
        return out
    out = np.empty((b, out_size, out_size, 3), np.float32)
    lib.preprocess_batch(rgba, b, h, w, Ms, out, out_size, num_threads)
    return out
