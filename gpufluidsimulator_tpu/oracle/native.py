"""ctypes bindings for the native C++ CPU reference engine (csrc/fluidcore).

Reference counterpart: the reference's C++ host runtime / updateCPU path
(SURVEY.md §2).  Provides the same step semantics as oracle/numpy_ref.py in
double precision, multithreaded, with O(N^2) or cell-list neighbor modes —
the fast oracle for validation at particle counts where NumPy is too slow.

The shared library is built lazily with ``make -C csrc`` (g++, no external
deps).  ``available()`` reports whether the native path can be used; callers
must degrade gracefully (pure-Python envs stay fully functional).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_CSRC = os.path.join(_REPO, "csrc")
_LIB_PATH = os.path.join(_CSRC, "libfluidcore.so")
_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _CSRC], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.fluid_steps.restype = ctypes.c_int
    lib.fluid_steps.argtypes = [
        ctypes.POINTER(ctypes.c_double)] * 4 + [
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ] + [ctypes.c_double] * 6 + [
        ctypes.POINTER(ctypes.c_double)] * 3 + [
        ctypes.c_double, ctypes.c_int32, ctypes.c_int32, ctypes.c_double,
        ctypes.c_int32, ctypes.POINTER(ctypes.c_double),
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _obs_array(params) -> np.ndarray:
    rows = []
    for ob in params.obstacles:
        kind = 0.0 if ob[0] == "box" else 1.0
        center = list(ob[1]) + [0.0] * (3 - len(ob[1]))
        if ob[0] == "sphere":
            extra = [ob[2], 0.0, 0.0]
        else:
            extra = list(ob[2]) + [0.0] * (3 - len(ob[2]))
        rows.append([kind] + center + extra)
    return np.asarray(rows, np.float64).reshape(-1, 7)


def run(pos, vel, params, n_steps: int, use_grid: bool = True
        ) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Advance n_steps in the native engine; returns (pos, vel, rho, pres).

    Semantics match oracle/numpy_ref.run (same physics, double precision).
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native fluidcore unavailable (g++/make failed?)")
    pos = np.ascontiguousarray(pos, np.float64).copy()
    vel = np.ascontiguousarray(vel, np.float64).copy()
    n, dim = pos.shape
    rho = np.zeros(n, np.float64)
    pres = np.zeros(n, np.float64)
    grav = np.asarray(params.gravity, np.float64)
    lo = np.asarray(params.bounds_min, np.float64)
    hi = np.asarray(params.bounds_max, np.float64)
    obs = _obs_array(params)

    def p64(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))

    rc = lib.fluid_steps(
        p64(pos), p64(vel), p64(rho), p64(pres),
        n, n_steps, 1 if use_grid else 0, dim,
        params.h, params.rest_density, params.stiffness, params.viscosity,
        params.particle_mass, params.dt,
        p64(grav), p64(lo), p64(hi), params.restitution,
        1 if params.clamp_negative_pressure else 0,
        1 if params.eos == "tait" else 0, params.tait_gamma,
        obs.shape[0], p64(obs))
    if rc != 0:
        raise RuntimeError(f"fluid_steps failed: rc={rc}")
    return pos, vel, rho, pres
