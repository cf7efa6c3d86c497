"""ctypes bindings for the native host runtime (native/ltpl_native.cpp).

The library is built on first use (``make`` in native/); all entry points
degrade gracefully to pure-Python/NumPy fallbacks when no toolchain is
available, so the framework never hard-depends on the native build.

Provides: fast track-CSV loading, the variable-step-size walk, and scalar
oracles (min-plus DP, fb velocity solver) used as independent goldens.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libltpl_native.so")

_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH):
            try:
                subprocess.run(["make", "-C", _NATIVE_DIR],
                               capture_output=True, check=True, timeout=120)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ltpl_load_csv.restype = ctypes.c_int
        lib.ltpl_load_csv.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"), ctypes.c_int]
        lib.ltpl_variable_step_size.restype = ctypes.c_int
        lib.ltpl_variable_step_size.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, np.ctypeslib.ndpointer(np.int32, flags="C")]
        lib.ltpl_minplus_dp.restype = ctypes.c_int
        lib.ltpl_minplus_dp.argtypes = [
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            np.ctypeslib.ndpointer(np.float32, flags="C"),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_float,
            np.ctypeslib.ndpointer(np.int32, flags="C"),
            ctypes.POINTER(ctypes.c_float)]
        lib.ltpl_fb_profile.restype = None
        lib.ltpl_fb_profile.argtypes = [
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int,
            np.ctypeslib.ndpointer(np.float64, flags="C"),
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_double, ctypes.c_double, ctypes.c_double,
            np.ctypeslib.ndpointer(np.float64, flags="C")]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def load_csv(path: str, n_cols: int = 12, max_rows: int = 100000):
    """Native CSV parse; returns (rows, n_cols) float64 array or None."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty((max_rows, n_cols), np.float64)
    n = lib.ltpl_load_csv(path.encode(), n_cols, out, max_rows)
    if n < 0:
        return None
    return out[:n].copy()


def variable_step_size(kappa, dist, d_curve, d_straight, curve_th,
                       force_last=False):
    lib = _load()
    if lib is None:
        return None
    kappa = np.ascontiguousarray(kappa, np.float64)
    dist = np.ascontiguousarray(dist, np.float64)
    out = np.empty((len(kappa) + 1,), np.int32)
    n = lib.ltpl_variable_step_size(kappa, dist, len(kappa), d_curve,
                                    d_straight, curve_th, int(force_last), out)
    return list(out[:n])


def minplus_dp(w, vg, start, h_goal, shrink=True, inf_thresh=1e29):
    """Scalar DP oracle: returns (h_eff, nodes (H+1,), cost)."""
    lib = _load()
    if lib is None:
        return None
    w = np.ascontiguousarray(w, np.float32)
    vg = np.ascontiguousarray(vg, np.float32)
    H, N, _ = w.shape
    nodes = np.empty((H + 1,), np.int32)
    cost = ctypes.c_float()
    h_eff = lib.ltpl_minplus_dp(w, vg, H, N, int(start), int(h_goal),
                                int(shrink), np.float32(inf_thresh), nodes,
                                ctypes.byref(cost))
    return h_eff, nodes, float(cost.value)


def fb_profile(kappa, el, gg, machines, v_max, v_start, v_end=None,
               dyn_exp=1.0, drag=0.85, mass=1000.0):
    """Scalar fb velocity-profile oracle; returns (P,) array or None."""
    lib = _load()
    if lib is None:
        return None
    kappa = np.ascontiguousarray(kappa, np.float64)
    el = np.ascontiguousarray(el, np.float64)
    gg = np.ascontiguousarray(gg, np.float64)
    machines = np.ascontiguousarray(machines, np.float64)
    out = np.empty_like(kappa)
    lib.ltpl_fb_profile(kappa, el, gg, len(kappa), machines,
                        machines.shape[0], float(v_max), float(v_start),
                        float(v_end if v_end is not None else 0.0),
                        int(v_end is not None), float(dyn_exp), float(drag),
                        float(mass), out)
    return out
