"""ctypes bindings for the native (C++) scene-loading kernels.

The shared library (`nsff_pl_tpu/native/ray_table.cpp`, shipped with the
package) is built lazily on first use with the system g++ (no external
deps) and cached next to the source. Everything degrades to the
pure-Python path when no compiler is available (or the install dir is
read-only) — `available()` gates usage.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libnsff_native.so")
_lib = None
_tried = False


def _build() -> bool:
    src = os.path.join(_NATIVE_DIR, "ray_table.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared",
             "-std=c++17", "-o", _LIB_PATH, src],
            check=True, capture_output=True, timeout=120)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "ray_table.cpp")
        if (not os.path.exists(src)) or (not _build()):
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.build_frame_rays.argtypes = [
        f32p, f32p, f32p, f32p, f32p,
        ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, f32p]
    lib.build_frame_rays.restype = None

    lib.parse_flo.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, f32p,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
    lib.parse_flo.restype = ctypes.c_int
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_frame_rays(K: np.ndarray, c2w: np.ndarray, img: np.ndarray,
                     disp: np.ndarray, mask: np.ndarray,
                     flow_fw: Optional[np.ndarray],
                     flow_bw: Optional[np.ndarray],
                     t: float, near: float = 1.0,
                     shift_near: float = 1.0) -> np.ndarray:
    """One frame's (H*W, 16) ray-table rows via the native kernel.

    img: (H, W, 3); disp/mask: (H, W); flows: (H, W, 2) or None.
    """
    lib = _load()
    assert lib is not None, "native library unavailable"
    H, W = img.shape[:2]
    out = np.empty((H * W, 16), np.float32)

    def prep(a, shape):
        a = np.ascontiguousarray(a, np.float32).reshape(shape)
        return a

    K = prep(K, (3, 3))
    c2w = prep(c2w[:3, :4], (3, 4))
    img = prep(img, (H, W, 3))
    disp = prep(disp, (H, W))
    mask = prep(mask, (H, W))

    def flow_ptr(f):
        if f is None:
            return None
        f = np.ascontiguousarray(f, np.float32)
        return f.ctypes.data_as(ctypes.c_void_p), f  # keep alive

    fw = flow_ptr(flow_fw)
    bw = flow_ptr(flow_bw)
    lib.build_frame_rays(
        K, c2w, img, disp, mask,
        fw[0] if fw else None, bw[0] if bw else None,
        W, H, float(t), float(near), float(shift_near), out)
    return out


def parse_flo(path: str) -> np.ndarray:
    """Read a .flo file with the native parser."""
    lib = _load()
    assert lib is not None, "native library unavailable"
    with open(path, "rb") as f:
        buf = f.read()
    # validate the header before sizing the output buffer
    if len(buf) < 12 or np.frombuffer(buf[:4], np.float32)[0] != 202021.25:
        raise ValueError(f"{path}: invalid .flo file")
    w = int(np.frombuffer(buf[4:8], np.int32)[0])
    h = int(np.frombuffer(buf[8:12], np.int32)[0])
    if w <= 0 or h <= 0 or 12 + 8 * w * h > len(buf):
        raise ValueError(f"{path}: invalid .flo file")
    out = np.empty((h, w, 2), np.float32)
    ww, hh = ctypes.c_int(), ctypes.c_int()
    rc = lib.parse_flo(buf, len(buf), out, ctypes.byref(ww),
                       ctypes.byref(hh))
    if rc != 0:
        raise ValueError(f"{path}: invalid .flo file")
    return out[:hh.value, :ww.value]
