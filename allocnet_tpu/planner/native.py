"""ctypes bindings for the C++ host runtime (runtime/allocnet_native.cpp).

Auto-builds the shared library on first use (make -C runtime); every entry
point has a pure-Python fallback (planner/rrt.py), so the framework works
without a toolchain — just slower on the host front-end.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_RUNTIME_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "runtime")
_LIB_PATH = os.path.join(_RUNTIME_DIR, "liballocnet_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _RUNTIME_DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None

    d = ctypes.POINTER(ctypes.c_double)
    lib.grid_create.restype = ctypes.c_void_p
    lib.grid_create.argtypes = [d, ctypes.c_int, d, d,
                                ctypes.c_double, ctypes.c_double]
    lib.grid_destroy.argtypes = [ctypes.c_void_p]
    lib.grid_query.restype = ctypes.c_int
    lib.grid_query.argtypes = [ctypes.c_void_p, d]
    lib.rrt_plan.restype = ctypes.c_int
    lib.rrt_plan.argtypes = [ctypes.c_void_p, d, d, ctypes.c_double,
                             ctypes.c_int, ctypes.c_double,
                             ctypes.c_ulonglong, d, ctypes.c_int]
    lib.simplify_path.restype = ctypes.c_int
    lib.simplify_path.argtypes = [ctypes.c_void_p, d, ctypes.c_int, d,
                                  ctypes.c_int]
    if hasattr(lib, "rrt_star_plan"):   # absent in pre-round-3 builds
        lib.rrt_star_plan.restype = ctypes.c_int
        lib.rrt_star_plan.argtypes = [ctypes.c_void_p, d, d, ctypes.c_double,
                                      ctypes.c_int, ctypes.c_double,
                                      ctypes.c_ulonglong, ctypes.c_double,
                                      d, ctypes.c_int]
    if hasattr(lib, "cloud_crop_windows"):   # absent in pre-round-2 builds
        lib.cloud_crop_windows.restype = ctypes.c_int
        lib.cloud_crop_windows.argtypes = [d, ctypes.c_int, d, d,
                                           ctypes.c_int, ctypes.c_double,
                                           d, d, ctypes.c_int]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dp(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def crop_windows(points: np.ndarray, lo_bs: np.ndarray, hi_bs: np.ndarray,
                 n_max: int, cell: float = 1.0):
    """Batched corridor-window crop via the C++ CSR grid index
    (cloud_crop_windows).  Returns (pts (W, n_max, 3) padded with 1e9,
    mask (W, n_max)) with the same semantics as the NumPy `_crop` in
    planner/sfc.py: strictly-inside points, original cloud order, first
    n_max.  Raises RuntimeError when the native runtime is unavailable —
    callers fall back to the NumPy path."""
    lib = _load()
    if lib is None or not hasattr(lib, "cloud_crop_windows"):
        raise RuntimeError("native runtime unavailable")
    pts = np.ascontiguousarray(points, dtype=np.float64).reshape(-1, 3)
    lo = np.ascontiguousarray(lo_bs, dtype=np.float64).reshape(-1, 3)
    hi = np.ascontiguousarray(hi_bs, dtype=np.float64).reshape(-1, 3)
    W = len(lo)
    out = np.empty((W, n_max, 3), dtype=np.float64)
    mask = np.empty((W, n_max), dtype=np.float64)
    lib.cloud_crop_windows(_dp(pts), len(pts), _dp(lo), _dp(hi), W, cell,
                           _dp(out), _dp(mask), n_max)
    return out, mask


class NativeGrid:
    """Dilated occupancy grid with O(1) collision queries."""

    def __init__(self, points: np.ndarray, lo, hi, scale: float = 0.25,
                 safe_dis: float = 0.5):
        lib = _load()
        if lib is None:
            raise RuntimeError("native runtime unavailable")
        self._lib = lib
        pts = np.ascontiguousarray(points, dtype=np.float64)
        self._lo = np.ascontiguousarray(lo, dtype=np.float64)
        self._hi = np.ascontiguousarray(hi, dtype=np.float64)
        self._handle = lib.grid_create(_dp(pts), len(pts), _dp(self._lo),
                                       _dp(self._hi), scale, safe_dis)

    def __del__(self):
        try:
            self._lib.grid_destroy(self._handle)
        except Exception:
            pass

    def blocked(self, p) -> bool:
        p = np.ascontiguousarray(p, dtype=np.float64)
        return bool(self._lib.grid_query(self._handle, _dp(p)))

    def rrt(self, start, goal, step: float = 1.0, max_iter: int = 5000,
            goal_bias: float = 0.1, seed: int = 0,
            max_pts: int = 4096) -> np.ndarray | None:
        start = np.ascontiguousarray(start, dtype=np.float64)
        goal = np.ascontiguousarray(goal, dtype=np.float64)
        out = np.zeros((max_pts, 3), dtype=np.float64)
        n = self._lib.rrt_plan(self._handle, _dp(start), _dp(goal), step,
                               max_iter, goal_bias, seed, _dp(out), max_pts)
        if n <= 0:
            return None
        return out[:n].copy()

    def rrt_star(self, start, goal, step: float = 1.0, max_iter: int = 5000,
                 goal_bias: float = 0.1, seed: int = 0,
                 time_budget_s: float = 0.0,
                 max_pts: int = 4096) -> np.ndarray | None:
        """Informed RRT* (the reference front-end, sfc_gen.hpp:45-114):
        asymptotically-optimal path within max_iter / time_budget_s.
        Falls back to plain RRT on pre-round-3 .so builds."""
        if not hasattr(self._lib, "rrt_star_plan"):
            return self.rrt(start, goal, step, max_iter, goal_bias, seed,
                            max_pts)
        start = np.ascontiguousarray(start, dtype=np.float64)
        goal = np.ascontiguousarray(goal, dtype=np.float64)
        out = np.zeros((max_pts, 3), dtype=np.float64)
        n = self._lib.rrt_star_plan(self._handle, _dp(start), _dp(goal), step,
                                    max_iter, goal_bias, seed, time_budget_s,
                                    _dp(out), max_pts)
        if n <= 0:
            return None
        return out[:n].copy()

    def simplify(self, path: np.ndarray, max_pts: int = 4096) -> np.ndarray:
        path = np.ascontiguousarray(path, dtype=np.float64)
        out = np.zeros((max_pts, 3), dtype=np.float64)
        n = self._lib.simplify_path(self._handle, _dp(path), len(path),
                                    _dp(out), max_pts)
        if n <= 0:
            return path
        return out[:n].copy()
