"""ctypes bindings to the native C++ oracle (``native/spectral_oracle.cpp``).

A third, fully independent implementation (C++20, Eigen-free, pivoted LU)
of the reference algorithm, used to cross-check both the NumPy oracle and
the JAX framework, and as the multithreaded CPU baseline for bench
comparisons.  Builds on demand via ``make`` (g++ is in the image; no
external deps).
"""

from __future__ import annotations

import ctypes
import functools
import pathlib
import subprocess

import numpy as np

__all__ = [
    "is_available",
    "cgl_points",
    "diff_matrix",
    "legendre",
    "solve_rod",
    "solve_rod_batch",
    "num_threads",
    "bench_path",
]

_NATIVE_DIR = pathlib.Path(__file__).resolve().parents[2] / "native"
_LIB_PATH = _NATIVE_DIR / "build" / "libspectral_oracle.so"


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)], check=True,
            capture_output=True, text=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


@functools.lru_cache(maxsize=1)
def _lib():
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    dp = ctypes.POINTER(ctypes.c_double)
    lib.oracle_cgl_points.argtypes = [ctypes.c_int, ctypes.c_double, dp]
    lib.oracle_diff_matrix.argtypes = [ctypes.c_int, ctypes.c_double, dp]
    lib.oracle_legendre.argtypes = [ctypes.c_int, ctypes.c_double]
    lib.oracle_legendre.restype = ctypes.c_double
    lib.oracle_solve_rod.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        dp, dp, dp, dp, dp,
    ]
    lib.oracle_solve_rod.restype = ctypes.c_int
    lib.oracle_solve_rod_batch.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
        ctypes.c_int, dp, dp, dp, dp, dp,
    ]
    lib.oracle_solve_rod_batch.restype = ctypes.c_int
    lib.oracle_num_threads.restype = ctypes.c_int
    return lib


def is_available() -> bool:
    return _lib() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def cgl_points(n: int, length: float = 1.0) -> np.ndarray:
    out = np.empty(n)
    _lib().oracle_cgl_points(n, length, _ptr(out))
    return out


def diff_matrix(n: int, length: float = 1.0) -> np.ndarray:
    out = np.empty((n, n))
    _lib().oracle_diff_matrix(n, length, _ptr(out))
    return out


def legendre(order: int, t: float) -> float:
    return _lib().oracle_legendre(order, t)


def solve_rod(qe, n: int = 16, na: int = 3, ne: int = 3, length: float = 1.0,
              q_init=(1.0, 0.0, 0.0, 0.0), r_init=(0.0, 0.0, 0.0)):
    """Returns ``(q_stack (4*(n-1),), r_stack (n-1, 3))`` — reference layout."""
    qe = np.ascontiguousarray(qe, np.float64)
    q0 = np.ascontiguousarray(q_init, np.float64)
    r0 = np.ascontiguousarray(r_init, np.float64)
    m = n - 1
    q_out = np.empty(4 * m)
    r_out = np.empty((m, 3))
    rc = _lib().oracle_solve_rod(n, na, ne, length, _ptr(qe), _ptr(q0),
                                 _ptr(r0), _ptr(q_out), _ptr(r_out))
    if rc:
        raise RuntimeError("native oracle solve failed (singular system?)")
    return q_out, r_out


def solve_rod_batch(qes, n: int = 16, na: int = 3, ne: int = 3,
                    length: float = 1.0, q_init=(1.0, 0.0, 0.0, 0.0),
                    r_init=(0.0, 0.0, 0.0)):
    qes = np.ascontiguousarray(qes, np.float64)
    batch = qes.shape[0]
    q0 = np.ascontiguousarray(q_init, np.float64)
    r0 = np.ascontiguousarray(r_init, np.float64)
    m = n - 1
    q_out = np.empty((batch, 4 * m))
    r_out = np.empty((batch, m, 3))
    rc = _lib().oracle_solve_rod_batch(n, na, ne, length, batch, _ptr(qes),
                                       _ptr(q0), _ptr(r0), _ptr(q_out),
                                       _ptr(r_out))
    if rc:
        raise RuntimeError(f"native oracle batch solve: {rc} failures")
    return q_out, r_out


def num_threads() -> int:
    return _lib().oracle_num_threads()


def bench_path() -> pathlib.Path:
    """Path of the CPU-baseline benchmark executable (built by make)."""
    return _NATIVE_DIR / "build" / "oracle_bench"
