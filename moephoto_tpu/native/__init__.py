"""ctypes binding for the native frame codec, with transparent numpy
fallback and on-demand build (make; g++ is in the base image)."""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("Moe")
_dir = os.path.dirname(os.path.abspath(__file__))
_libPath = os.path.join(_dir, "libframecodec.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_libPath):
        try:
            subprocess.run(["make", "-C", _dir], check=True, capture_output=True)
        except Exception as e:  # pragma: no cover
            log.info("native framecodec build failed (%s); numpy fallback", e)
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_libPath)
        lib.u16x3_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
        ]
        lib.f32x3_to_u16.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int
        ]
        lib.u8_to_f32.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        lib.f32_to_u8.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
        _lib = lib
    except Exception as e:  # pragma: no cover
        log.info("native framecodec load failed (%s); numpy fallback", e)
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def u16FrameToFloat(buffer: bytes, height: int, width: int, swapBGR: bool = False) -> np.ndarray:
    """Raw 16-bit interleaved 3-channel frame -> float32 HWC in [0, 1)."""
    lib = _load()
    npx = height * width
    if lib:
        src = np.frombuffer(buffer, dtype=np.uint16, count=npx * 3)
        dst = np.empty((height, width, 3), np.float32)
        lib.u16x3_to_f32(
            src.ctypes.data, dst.ctypes.data, ctypes.c_int64(npx), int(swapBGR)
        )
        return dst
    arr = np.frombuffer(buffer, dtype=np.uint16, count=npx * 3).reshape(height, width, 3)
    arr = arr[..., ::-1] if swapBGR else arr
    return arr.astype(np.float32) / 65536.0


def floatFrameToU16(img: np.ndarray, swapBGR: bool = False) -> bytes:
    """float32 HWC [0,1] -> raw 16-bit interleaved bytes."""
    lib = _load()
    img = np.ascontiguousarray(img, dtype=np.float32)
    npx = img.shape[0] * img.shape[1]
    if lib:
        dst = np.empty((npx * 3,), np.uint16)
        lib.f32x3_to_u16(
            img.ctypes.data, dst.ctypes.data, ctypes.c_int64(npx), int(swapBGR)
        )
        return dst.tobytes()
    x = img[..., ::-1] if swapBGR else img
    x = np.clip(x * 65536.0, 0, 65535)
    return x.astype(np.uint16).tobytes()
