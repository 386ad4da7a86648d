"""ctypes bridge to the C++ ISM kernel (built via sarssl_tpu/data/csrc).

Falls back gracefully when the shared library hasn't been compiled; callers
check :func:`available` first. Build with::

    python -m sarssl_tpu.data.build_native
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_LIB_PATH = os.path.join(os.path.dirname(__file__), "csrc", "libism.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.ism_core.restype = None
        lib.ism_core.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def ensure_built(verbose: bool = True) -> bool:
    """Build the kernel on demand (the .so is gitignored, so fresh checkouts
    and rebooted build boxes lack it; the numpy fallback is ~2.5x slower).
    Returns availability; never raises — generation proceeds on the
    fallback path if the toolchain is missing."""
    global _TRIED
    if available():
        return True
    try:
        from . import build_native
        build_native.build(verbose=verbose)
    except Exception as e:  # no g++, read-only tree, ...
        import warnings
        warnings.warn(f"native ISM kernel unavailable and build failed ({e}); "
                      "using the slower numpy fallback. Build manually with "
                      "`python -m sarssl_tpu.data.build_native`.")
        return False
    _TRIED = False  # retry the load now that the .so exists
    return available()


def ism_core(cx, ax, cy, ay, cz, az, mics, nsamp: int, fs: int, c: float,
             t_lim: float) -> np.ndarray:
    """C++ image accumulation. Same contract as the numpy loop in ism.py."""
    lib = _load()
    assert lib is not None
    nmic = mics.shape[0]
    rir = np.zeros((nmic, nsamp), np.float64)

    def p(a):
        a = np.ascontiguousarray(a, np.float64)
        return a, a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    cx, pcx = p(cx); ax_, pax = p(ax)
    cy, pcy = p(cy); ay_, pay = p(ay)
    cz, pcz = p(cz); az_, paz = p(az)
    mics_, pm = p(mics)
    rir_c = rir.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
    lib.ism_core(pcx, pax, len(cx), pcy, pay, len(cy), pcz, paz, len(cz),
                 pm, nmic, rir_c, nsamp, float(fs), float(c),
                 float(t_lim))
    return rir
