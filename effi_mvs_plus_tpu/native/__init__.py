"""ctypes bindings for the native data-plane library (libeffi_native).

Builds on demand with g++ (cached .so next to the source, rebuilt when the
source is newer); every entry point has a pure-Python/numpy fallback, so
the package works without a toolchain.  See src/effi_native.cc.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "src", "effi_native.cc")
_SO = os.path.join(_DIR, "libeffi_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _build():
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-fopenmp", "-std=c++17",
           _SRC, "-o", _SO]
    subprocess.run(cmd, check=True, capture_output=True)


def get_lib():
    """Load (building if stale) the native library, or None if unavailable."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_SO)
            f32p = ctypes.POINTER(ctypes.c_float)
            u8p = ctypes.POINTER(ctypes.c_uint8)
            i32p = ctypes.POINTER(ctypes.c_int)
            lib.effi_pfm_header.argtypes = [
                ctypes.c_char_p, i32p, i32p, i32p, i32p,
                ctypes.POINTER(ctypes.c_long), f32p]
            lib.effi_pfm_read.argtypes = [ctypes.c_char_p, f32p]
            lib.effi_pfm_write.argtypes = [
                ctypes.c_char_p, f32p, ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.c_float]
            lib.effi_resize_bilinear_f32.argtypes = [
                f32p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                f32p, ctypes.c_int, ctypes.c_int]
            lib.effi_resize_bilinear_f32.restype = None
            lib.effi_resize_nearest_f32.argtypes = \
                lib.effi_resize_bilinear_f32.argtypes
            lib.effi_resize_nearest_f32.restype = None
            lib.effi_ply_write.argtypes = [
                ctypes.c_char_p, f32p, u8p, ctypes.c_long]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def _fptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def available() -> bool:
    return get_lib() is not None


def pfm_read(path):
    """Native PFM read -> (array (H,W) or (H,W,3) float32, scale).
    Raises OSError on failure; returns None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    w = ctypes.c_int()
    h = ctypes.c_int()
    ch = ctypes.c_int()
    little = ctypes.c_int()
    off = ctypes.c_long()
    scale = ctypes.c_float()
    rc = lib.effi_pfm_header(os.fspath(path).encode(), ctypes.byref(w), ctypes.byref(h),
                             ctypes.byref(ch), ctypes.byref(little),
                             ctypes.byref(off), ctypes.byref(scale))
    if rc != 0:
        raise OSError(f"PFM header parse failed ({rc}): {path}")
    shape = (h.value, w.value, 3) if ch.value == 3 else (h.value, w.value)
    out = np.empty(shape, np.float32)
    rc = lib.effi_pfm_read(os.fspath(path).encode(), _fptr(out))
    if rc != 0:
        raise OSError(f"PFM read failed ({rc}): {path}")
    return out, float(scale.value)


def pfm_write(path, image, scale=1.0):
    """Native PFM write; returns False if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    img = np.ascontiguousarray(image, np.float32)
    ch = 3 if img.ndim == 3 and img.shape[2] == 3 else 1
    if ch == 1:
        img = img.reshape(img.shape[0], img.shape[1])
    rc = lib.effi_pfm_write(os.fspath(path).encode(), _fptr(img), img.shape[1],
                            img.shape[0], ch, float(scale))
    if rc != 0:
        raise OSError(f"PFM write failed ({rc}): {path}")
    return True


def resize(img, wh, nearest=False):
    """cv2-compatible float32 resize; returns None if unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(img, np.float32)
    dw, dh = wh
    ch = 1 if src.ndim == 2 else src.shape[2]
    sh, sw = src.shape[:2]
    out = np.empty((dh, dw) if src.ndim == 2 else (dh, dw, ch), np.float32)
    fn = lib.effi_resize_nearest_f32 if nearest else lib.effi_resize_bilinear_f32
    fn(_fptr(src), sh, sw, ch, _fptr(out), dh, dw)
    return out


def ply_write(path, xyz, rgb=None):
    """Binary little-endian PLY write; returns False if unavailable."""
    lib = get_lib()
    if lib is None:
        return False
    xyz = np.ascontiguousarray(xyz, np.float32)
    n = len(xyz)
    if rgb is not None:
        rgb = np.ascontiguousarray(rgb, np.uint8)
        rc = lib.effi_ply_write(
            os.fspath(path).encode(), _fptr(xyz),
            rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), n)
    else:
        rc = lib.effi_ply_write(os.fspath(path).encode(), _fptr(xyz), None, n)
    if rc != 0:
        raise OSError(f"PLY write failed ({rc}): {path}")
    return True
