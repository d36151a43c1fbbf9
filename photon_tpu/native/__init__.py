"""ctypes bindings for the C++ host-runtime kernels (photon_native).

The shared library is built on demand with ``build()`` (or
``make -C photon_tpu/native``).  Every entry point has a pure-Python
fallback elsewhere in the package, so the native path is an accelerator,
not a hard dependency — consumers call :func:`available` first.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libphoton_native.so")
_lib: Optional[ctypes.CDLL] = None


def build(force: bool = False) -> bool:
    """Compile the shared library with g++. Returns True on success."""
    if os.path.exists(_SO) and not force:
        return True
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                       capture_output=True)
        return os.path.exists(_SO)
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.nrrd_probe.restype = ctypes.c_int
    lib.nrrd_probe.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int64),
    ]
    lib.gradient_field.restype = None
    lib.gradient_field.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.bspline_prefilter_3d.restype = None
    lib.bspline_prefilter_3d.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def nrrd_probe(path: str):
    """Fast NRRD header probe -> (sizes, spacings, origin, payload_offset)
    or None if the file needs the Python reader."""
    lib = _load()
    if lib is None:
        return None
    sizes = (ctypes.c_int64 * 3)()
    spacings = (ctypes.c_double * 3)()
    origin = (ctypes.c_double * 3)()
    off = ctypes.c_int64()
    rc = lib.nrrd_probe(path.encode(), sizes, spacings, origin,
                        ctypes.byref(off))
    if rc != 0:
        return None
    return (tuple(sizes), tuple(spacings), tuple(origin), off.value)


def gradient_field(n_minus_1: np.ndarray, spacing) -> Optional[np.ndarray]:
    """Native FD gradient precompute; input (W, H, D) [x,y,z], output
    (D, H, W, 4).  Returns None if the library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(n_minus_1, dtype=np.float32)
    W, H, D = data.shape
    out = np.empty((D, H, W, 4), dtype=np.float32)
    dx, dy, dz = (float(s) for s in np.asarray(spacing).ravel())
    lib.gradient_field(
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        W, H, D, dx, dy, dz,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def bspline_prefilter(field: np.ndarray) -> Optional[np.ndarray]:
    """Native separable B-spline prefilter over (D, H, W, C) float32."""
    lib = _load()
    if lib is None:
        return None
    out = np.ascontiguousarray(field, dtype=np.float32).copy()
    D, H, W, C = out.shape
    lib.bspline_prefilter_3d(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), D, H, W, C)
    return out
