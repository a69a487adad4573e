"""Native host engine: builds and wraps csrc/gridpp_native.cpp.

Compiled lazily with g++ on first use (cached as a shared library next to
the package); every query interface has a scipy fallback in
core/index.py, so the framework works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_lock = threading.Lock()
_lib = None
_tried = False

_SRC = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "csrc",
    "gridpp_native.cpp")
_SO = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "_gridpp_native.so")


def _build() -> str | None:
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= \
            os.path.getmtime(_SRC):
        return _SO
    cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
           "-o", _SO, _SRC]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return _SO
    except Exception:
        return None


def get_lib():
    """The loaded native library, or None when unavailable."""
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_SRC):
            return None
        so = _build()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.index_build.restype = ctypes.c_void_p
        lib.index_build.argtypes = [ctypes.c_void_p, ctypes.c_int64,
                                    ctypes.c_double]
        lib.index_free.argtypes = [ctypes.c_void_p]
        lib.index_nearest.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                      ctypes.c_int64, ctypes.c_void_p]
        lib.index_knearest.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                       ctypes.c_int64, ctypes.c_int32,
                                       ctypes.c_void_p, ctypes.c_void_p]
        lib.index_radius_count.argtypes = [ctypes.c_void_p, ctypes.c_void_p,
                                           ctypes.c_int64, ctypes.c_double,
                                           ctypes.c_void_p]
        _lib = lib
        return _lib


class NativeIndex:
    """ctypes wrapper over the cell-hash index."""

    def __init__(self, xyz: np.ndarray):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native engine unavailable")
        self._lib = lib
        self._xyz = np.ascontiguousarray(xyz, dtype=np.float64)
        self._handle = lib.index_build(
            self._xyz.ctypes.data_as(ctypes.c_void_p),
            self._xyz.shape[0], 0.0)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.index_free(self._handle)
                self._handle = None
        except Exception:
            pass

    def nearest(self, q: np.ndarray) -> np.ndarray:
        q = np.ascontiguousarray(q, dtype=np.float64)
        out = np.empty(q.shape[0], dtype=np.int32)
        self._lib.index_nearest(self._handle,
                                q.ctypes.data_as(ctypes.c_void_p),
                                q.shape[0],
                                out.ctypes.data_as(ctypes.c_void_p))
        return out

    def knearest(self, q: np.ndarray, k: int):
        q = np.ascontiguousarray(q, dtype=np.float64)
        nq = q.shape[0]
        idx = np.empty((nq, k), dtype=np.int32)
        dist = np.empty((nq, k), dtype=np.float64)
        self._lib.index_knearest(self._handle,
                                 q.ctypes.data_as(ctypes.c_void_p), nq,
                                 np.int32(k),
                                 idx.ctypes.data_as(ctypes.c_void_p),
                                 dist.ctypes.data_as(ctypes.c_void_p))
        return idx, dist

    def radius_count(self, q: np.ndarray, radius: float) -> np.ndarray:
        q = np.ascontiguousarray(q, dtype=np.float64)
        out = np.empty(q.shape[0], dtype=np.int32)
        self._lib.index_radius_count(self._handle,
                                     q.ctypes.data_as(ctypes.c_void_p),
                                     q.shape[0], float(radius),
                                     out.ctypes.data_as(ctypes.c_void_p))
        return out
