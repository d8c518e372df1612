"""ctypes bindings to the native C++ runtime (native/).

Builds the shared library on first use (g++, no external deps).  Provides
:func:`estimate_pose_native` - the in-tree replacement for OpenCV's
findEssentialMat/recoverPose (reference metrics.py:83-93), algorithmically
identical to the JAX solver in loftr_tpu/eval/ransac.py.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libloftr_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True)
    lib = ctypes.CDLL(_LIB_PATH)
    lib.estimate_pose_essential.restype = ctypes.c_int
    lib.estimate_pose_essential.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.c_double, ctypes.c_int, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        _load()
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def estimate_pose_native(kpts0: np.ndarray, kpts1: np.ndarray,
                         K0: np.ndarray, K1: np.ndarray,
                         pixel_thr: float = 0.5,
                         num_hypotheses: int = 1024,
                         seed: int = 0
                         ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                             np.ndarray]]:
    """LO-RANSAC essential pose.  Returns (R, t, inlier_mask) or None."""
    lib = _load()
    n = len(kpts0)
    if n < 8:
        return None
    p0 = np.ascontiguousarray(kpts0, np.float32)
    p1 = np.ascontiguousarray(kpts1, np.float32)
    K0d = np.ascontiguousarray(K0, np.float64)
    K1d = np.ascontiguousarray(K1, np.float64)
    R = np.zeros(9, np.float64)
    t = np.zeros(3, np.float64)
    mask = np.zeros(n, np.uint8)
    fptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    dptr = lambda a: a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    n_inl = lib.estimate_pose_essential(
        fptr(p0), fptr(p1), n, dptr(K0d), dptr(K1d),
        float(pixel_thr), int(num_hypotheses), int(seed),
        dptr(R), dptr(t),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    if n_inl < 8:
        return None
    return R.reshape(3, 3), t, mask.astype(bool)
