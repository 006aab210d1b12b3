"""ctypes bindings to the native host library (native/libmzt.so).

The reference's host runtime is C++; this engine keeps the IO-bound host
pieces native too (fast LAMMPS data parsing -- ~3x the pure-Python reader on
multi-MB files) with transparent pure-Python fallback when the library has
not been built (`make -C native`).
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("MZT_NATIVE", "1") == "0":
        return None
    path = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                        "libmzt.so")
    try:
        lib = ctypes.CDLL(os.path.abspath(path))
    except OSError:
        return None
    lib.mzt_read_data.restype = ctypes.c_long
    lib.mzt_read_data.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int)),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.mzt_free.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def read_data_native(path: str):
    """Returns (x [N,3], types [N], v or None, box_lo, box_hi, n_types)
    or None if the native library is unavailable or parsing failed."""
    lib = _load()
    if lib is None:
        return None
    xp = ctypes.POINTER(ctypes.c_double)()
    tp = ctypes.POINTER(ctypes.c_int)()
    vp = ctypes.POINTER(ctypes.c_double)()
    mp = ctypes.POINTER(ctypes.c_double)()
    has_v = ctypes.c_int(0)
    has_m = ctypes.c_int(0)
    lo = (ctypes.c_double * 3)()
    hi = (ctypes.c_double * 3)()
    ntypes = ctypes.c_int(0)
    n = lib.mzt_read_data(path.encode(), ctypes.byref(xp), ctypes.byref(tp),
                          ctypes.byref(vp), ctypes.byref(has_v),
                          ctypes.byref(mp), ctypes.byref(has_m), lo, hi,
                          ctypes.byref(ntypes))
    if n < 0:
        return None
    try:
        x = np.ctypeslib.as_array(xp, shape=(n, 3)).copy()
        types = np.ctypeslib.as_array(tp, shape=(n,)).copy()
        v = np.ctypeslib.as_array(vp, shape=(n, 3)).copy() if has_v.value \
            else None
        masses = (np.ctypeslib.as_array(mp, shape=(ntypes.value,)).copy()
                  if has_m.value and ntypes.value > 0 else None)
    finally:
        lib.mzt_free(xp)
        lib.mzt_free(tp)
        lib.mzt_free(vp)
        lib.mzt_free(mp)
    return (x, types.astype(np.int32), v, masses, np.array(lo[:]),
            np.array(hi[:]), int(ntypes.value))
