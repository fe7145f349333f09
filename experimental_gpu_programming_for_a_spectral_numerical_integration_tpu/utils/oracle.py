"""Algorithm-exact f64 oracle replicating the reference's code path.

A pure-NumPy, step-for-step re-execution of `/root/reference/main.cpp` used
as ground truth in tests (SURVEY.md §4: the reference itself has no tests;
its measured outputs are the golden values).  Deliberately mirrors the
reference's quirks — explicit matrix inverse (`main.cpp:113,159`),
unnormalized quaternion→rotation (`main.cpp:130-136`), component-major
stacking (`main.cpp:80-81`) — rather than our TPU design, so the two
implementations are independent down to the linear-algebra calls.

A second, fully independent C++ oracle lives in ``native/`` (ctypes-loaded
via :mod:`..utils.native_oracle`); tests cross-check all three.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "cgl_points",
    "diff_matrix",
    "legendre_p",
    "phi",
    "update_a",
    "integrate_quaternions",
    "update_position_b",
    "integrate_position",
    "demo_qe",
]


def cgl_points(n: int, length: float = 1.0) -> np.ndarray:
    """≙ ``ComputeChebyshevPoints<N,L>`` (`chebyshev_differentiation.h:19-30`)."""
    j = np.arange(n, dtype=np.float64)
    return (length / 2.0) * (1.0 + np.cos(np.pi * j / (n - 1)))


def coefficients_c(n: int) -> np.ndarray:
    """≙ ``GetCoefficients_c<N>`` (`chebyshev_differentiation.h:37-52`)."""
    c = np.array([2.0 if i in (0, n - 1) else 1.0 for i in range(n)])
    return c * (-1.0) ** np.arange(n)


def diff_matrix(n: int, length: float = 1.0) -> np.ndarray:
    """≙ ``getDn<N>`` (`chebyshev_differentiation.h:59-108`)."""
    x = cgl_points(n, length)
    c = coefficients_c(n)
    dx = x[:, None] - x[None, :] + np.eye(n)
    dn = (c[:, None] / c[None, :]) / dx
    dn[np.diag_indices(n)] -= dn.sum(axis=1)
    return dn


def legendre_p(order: int, x: float) -> float:
    """≙ ``boost::math::legendre_p`` via the Bonnet recurrence."""
    p0, p1 = 1.0, x
    if order == 0:
        return p0
    for n in range(1, order):
        p0, p1 = p1, ((2 * n + 1) * x * p1 - n * p0) / (n + 1)
    return p1


def phi(X: float, na: int = 3, ne: int = 3, begin: float = 0.0, end: float = 1.0):
    """≙ ``Phi<na, ne>`` (`utilities.h:49-67`): ``I_na ⊗ P(x)^T``."""
    x = (2.0 * X - (end + begin)) / (end - begin)
    p = np.array([legendre_p(i, x) for i in range(ne)])
    return np.kron(np.eye(na), p[None, :])


def quat_a_matrix(k: np.ndarray) -> np.ndarray:
    """The 4x4 block written at `main.cpp:72-75`."""
    k0, k1, k2 = k
    return np.array(
        [
            [0.0, -k0, -k1, -k2],
            [k0, 0.0, k2, -k1],
            [k1, -k2, 0.0, k0],
            [k2, k1, -k0, 0.0],
        ]
    )


def update_a(qe, d_nn, n: int = 16, na: int = 3, ne: int = 3, length: float = 1.0):
    """≙ ``updateA`` (`main.cpp:55-88`): A_NN = D_NN - 1/2 A_hat, scattered
    component-major."""
    x = cgl_points(n, length)
    npts = n - 1
    a_nn = d_nn.copy()
    for i in range(npts):
        # Arc length normalized to [0, 1] for the basis — the reference
        # hard-codes L=1 so its un-normalized phi(x[i]) coincides; the
        # normalized form matches the framework and native oracle for any L.
        k = phi(x[i] / length, na, ne) @ qe
        blk = quat_a_matrix(k)
        for row in range(4):
            for col in range(4):
                ri, ci = row * npts + i, col * npts + i
                a_nn[ri, ci] = d_nn[ri, ci] - 0.5 * blk[row, col]
    return a_nn


def integrate_quaternions(qe, q_init=(1.0, 0.0, 0.0, 0.0), n: int = 16,
                          na: int = 3, ne: int = 3, length: float = 1.0):
    """≙ ``integrateQuaternions`` (`main.cpp:91-118`): returns the flat
    component-major ``Q_stack`` (4*(n-1),) — explicit inverse and all."""
    dn = diff_matrix(n, length)
    dn_nn = dn[: n - 1, : n - 1]
    dn_in = dn[: n - 1, n - 1 : n]
    d_nn = np.kron(np.eye(4), dn_nn)
    d_in = np.kron(np.eye(4), dn_in)
    a_nn = update_a(np.asarray(qe, np.float64), d_nn, n, na, ne, length)
    ivp = d_in @ np.asarray(q_init, np.float64)
    b = np.zeros(4 * (n - 1))
    return np.linalg.inv(a_nn) @ (b - ivp)


def update_position_b(q_stack: np.ndarray, n: int = 16) -> np.ndarray:
    """≙ ``updatePositionb`` (`main.cpp:121-140`): unnormalized Eigen
    ``toRotationMatrix`` applied to the component-major stack, times e1."""
    npts = n - 1
    b = np.zeros((npts, 3))
    for i in range(npts):
        w, x, y, z = (q_stack[i], q_stack[i + npts],
                      q_stack[i + 2 * npts], q_stack[i + 3 * npts])
        b[i] = [
            1.0 - 2.0 * (y * y + z * z),
            2.0 * (x * y + w * z),
            2.0 * (x * z - w * y),
        ]
    return b


def integrate_position(qe, q_init=(1.0, 0.0, 0.0, 0.0), r_init=(0.0, 0.0, 0.0),
                       n: int = 16, na: int = 3, ne: int = 3, length: float = 1.0):
    """≙ ``integratePosition`` (`main.cpp:145-176`): returns ``r_stack``
    ``(n-1, 3)``.  Also returns the quaternion stack so callers get the
    chained pair without the reference's double solve."""
    q_stack = integrate_quaternions(qe, q_init, n, na, ne, length)
    dn = diff_matrix(n, length)
    dn_nn = dn[: n - 1, : n - 1]
    dn_in = dn[: n - 1, n - 1 : n]
    ivp = dn_in @ np.asarray(r_init, np.float64)[None, :]
    b_nn = update_position_b(q_stack, n)
    r_stack = np.linalg.inv(dn_nn) @ (b_nn - ivp)
    return q_stack, r_stack


def demo_qe() -> np.ndarray:
    """≙ `main.cpp:187-195`."""
    return np.array(
        [0.0, 0.0, 0.0,
         1.2877691307032, -1.63807499160786, 0.437406679142598,
         0.0, 0.0, 0.0]
    )
