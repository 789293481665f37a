"""ctypes binding for the native preprocessing library (native/viditq_data.cc)
with transparent numpy/PIL fallback.

Builds on demand with `make -C native`; `preprocess_frames` is the loader
hot path (resize -> center crop -> normalize + CHW pack in one C call).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")


def _load(build: bool = True) -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    so = os.path.abspath(os.path.join(_NATIVE_DIR, "libviditq_data.so"))
    if not os.path.exists(so) and build:
        try:
            subprocess.run(["make", "-C", os.path.abspath(_NATIVE_DIR)],
                           check=True, capture_output=True)
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    lib = ctypes.CDLL(so)
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.viditq_preprocess_frames.argtypes = [
        u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        f32p, ctypes.c_int, ctypes.c_int, u8p]
    lib.viditq_preprocess_frames.restype = None
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def preprocess_frames(frames: np.ndarray, size: Tuple[int, int]
                      ) -> np.ndarray:
    """frames: uint8 [T, H, W, C] -> float32 [C, T, th, tw] in [-1, 1]."""
    t, sh, sw, c = frames.shape
    th, tw = size
    lib = _load()
    if lib is None:
        from viditq_tpu.data.datasets import center_crop_resize, normalize
        out = np.stack([center_crop_resize(f, size) for f in frames])
        return normalize(out).transpose(3, 0, 1, 2).copy()
    frames = np.ascontiguousarray(frames)
    scale = max(th / sh, tw / sw)
    rh, rw = int(sh * scale + 0.5), int(sw * scale + 0.5)
    scratch = np.empty(2 * rh * rw * c, np.uint8)
    dst = np.empty((c, t, th, tw), np.float32)
    lib.viditq_preprocess_frames(frames, t, sh, sw, c, dst, th, tw, scratch)
    return dst
