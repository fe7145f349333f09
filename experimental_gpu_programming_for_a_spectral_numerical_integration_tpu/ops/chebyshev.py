"""Chebyshev–Gauss–Lobatto (CGL) spectral primitives.

TPU-native re-design of the reference's L1 layer
(`/root/reference/include/chebyshev_differentiation.h:19-108`):

* :func:`cgl_points` ≙ ``ComputeChebyshevPoints<N,L>()`` (h:19-30) — the CGL
  grid on ``[0, L]`` in the reference's **descending** order, so ``x[0] = L``
  (rod tip) and ``x[N-1] = 0`` (rod base / known initial point).
* :func:`coefficients_c` ≙ ``GetCoefficients_c<N>()`` (h:37-52).
* :func:`diff_matrix` ≙ ``getDn<N>()`` (h:59-108), including the
  numerically-critical negative-row-sum diagonal trick (h:104).
* :func:`split_endpoint` ≙ the ``Dn_NN`` / ``Dn_IN`` block slicing at
  `/root/reference/main.cpp:94-95`, generalized to either endpoint.

Design notes (TPU-first):
  The grid and differentiation matrix are **static** given ``N`` — they are
  computed at trace time in float64 NumPy (host) and embedded as constants in
  the jitted program, exactly as the reference bakes them in via C++
  templates.  Nothing here ever runs per-step on device; only their
  *products* with traced data do.  ``N`` plays the role of the reference's
  template parameter: changing it recompiles, matching the C++-template
  spirit noted in SURVEY.md §5.
"""

from __future__ import annotations

import functools

import numpy as np

def _frozen(a: np.ndarray) -> np.ndarray:
    """Cached host constants are shared across every SpectralGrid/RodConfig
    in the process; freeze them so caller-side in-place edits fail loudly
    instead of silently corrupting all subsequent solves."""
    a.setflags(write=False)
    return a


__all__ = [
    "cgl_points",
    "coefficients_c",
    "diff_matrix",
    "split_endpoint",
    "integration_matrix",
    "partial_integral_matrix",
    "clenshaw_curtis_weights",
    "interpolation_matrix",
]


@functools.lru_cache(maxsize=None)
def cgl_points(n: int, length: float = 1.0) -> np.ndarray:
    """Chebyshev–Gauss–Lobatto points on ``[0, length]``, descending.

    ``x_j = (length/2) * (1 + cos(pi * j / (n-1)))`` so that ``x[0] = length``
    and ``x[-1] = 0`` — the reference's ordering
    (`chebyshev_differentiation.h:26`), where the *last* grid point is the
    rod base carrying the initial condition.
    """
    if n < 2:
        raise ValueError(f"need at least 2 CGL points, got {n}")
    j = np.arange(n, dtype=np.float64)
    return _frozen((float(length) / 2.0) * (1.0 + np.cos(np.pi * j / (n - 1))))


@functools.lru_cache(maxsize=None)
def coefficients_c(n: int) -> np.ndarray:
    """Trefethen ``c`` weights: ``c_i = (-1)^i * (2 at endpoints, 1 inside)``.

    Mirrors ``GetCoefficients_c<N>()`` (`chebyshev_differentiation.h:37-52`).
    """
    c = np.ones(n, dtype=np.float64)
    c[0] = 2.0
    c[-1] = 2.0
    c *= (-1.0) ** np.arange(n)
    return _frozen(c)


@functools.lru_cache(maxsize=None)
def diff_matrix(n: int, length: float = 1.0) -> np.ndarray:
    """The ``n x n`` Chebyshev differentiation matrix on the CGL grid.

    Off-diagonal ``D_ij = (c_i / c_j) / (x_i - x_j)``; the diagonal is set by
    the negative-row-sum trick: seed the diagonal denominator with 1 via
    ``dX = X - X^T + I`` (so the raw diagonal is ``c_i/c_i = 1``) and then
    subtract the full row sum — ``D_ii = -sum_{j != i} D_ij`` exactly as
    `chebyshev_differentiation.h:89-104` does.  This guarantees rows sum to
    zero (constants differentiate to zero) to machine precision.
    """
    x = cgl_points(n, length)
    c = coefficients_c(n)
    dx = x[:, None] - x[None, :] + np.eye(n)
    d = (c[:, None] / c[None, :]) / dx
    d[np.diag_indices(n)] -= d.sum(axis=1)
    return _frozen(d)


def split_endpoint(d: np.ndarray, known: str = "last"):
    """Split ``D`` into the unknown-block ``D_NN`` and known-column ``D_IN``.

    With the known (initial-condition) point at the **last** grid index — the
    reference's case, `/root/reference/main.cpp:94-95` — the unknown points
    are ``0..n-2``:

    ``D_NN = D[:n-1, :n-1]`` (square, acts on unknowns),
    ``D_IN = D[:n-1, n-1:]`` (column, couples the known endpoint in).

    ``known='first'`` gives the mirrored split for an IC at ``x[0]``
    (ascending-grid conventions), a generalization the reference hard-codes
    away.
    """
    n = d.shape[0]
    if known == "last":
        return d[: n - 1, : n - 1], d[: n - 1, n - 1 :]
    if known == "first":
        return d[1:, 1:], d[1:, :1]
    raise ValueError(f"known must be 'first' or 'last', got {known!r}")


@functools.lru_cache(maxsize=None)
def integration_matrix(n: int, length: float = 1.0, known: str = "last") -> np.ndarray:
    """``D_NN^{-1}`` — the discrete spectral integration operator.

    The reference computes this explicitly for the position solve
    (`/root/reference/main.cpp:159`).  Here it is a trace-time host constant
    (float64 LU solve, not ``.inverse()``), reused as the Picard/Neumann
    preconditioner for the quaternion solve (see ``ops/linsolve.py``).
    """
    d_nn, _ = split_endpoint(diff_matrix(n, length), known)
    m = d_nn.shape[0]
    return _frozen(np.linalg.solve(d_nn, np.eye(m)))


@functools.lru_cache(maxsize=None)
def partial_integral_matrix(n: int, length: float = 1.0) -> np.ndarray:
    """``T``: values on the full grid -> tail integrals ``int_{x_i}^{L} f``.

    Built from the spectral antiderivative ``F = G f`` (``F(0) = 0``):
    ``int_{x_i}^L f = F(tip) - F(x_i)`` with the tip at grid index 0
    (descending order).  Row ``n-1`` (the base) gives the full integral;
    the base column is zero (the derivative is collocated at the unknown
    points only).  Used by distributed-load statics.
    """
    g = integration_matrix(n, length)
    t = np.zeros((n, n))
    t[: n - 1, : n - 1] = g[0][None, :] - g
    t[n - 1, : n - 1] = g[0]
    return _frozen(t)


@functools.lru_cache(maxsize=None)
def interpolation_matrix(n: int, xs: tuple, length: float = 1.0) -> np.ndarray:
    """``P (k, n)``: values on the CGL grid -> values at arclengths ``xs``.

    Barycentric Lagrange interpolation from the descending CGL nodes
    (spectrally accurate for smooth fields, exact for polynomials of degree
    ``<= n-1``).  The CGL barycentric weights are ``w_j = 1/c_j`` with the
    Trefethen coefficients of :func:`coefficients_c` — the same ``c``
    weights the reference builds for the differentiation matrix
    (`chebyshev_differentiation.h:37-52`), reused here for evaluation
    *between* nodes, which the reference (grid-values-only, `main.cpp:198`)
    never needed.  Targets that coincide with a node get the exact unit
    row.  ``xs`` is a tuple of absolute arclengths in ``[0, length]``
    (hashable, so the matrix is a cached trace-time host f64 constant like
    every other operator here).  Used by the shape-sensing measurement
    model (``models/sensing.py``) to evaluate marker positions off-grid.
    """
    x = cgl_points(n, length)
    w = 1.0 / coefficients_c(n)
    ts = np.asarray(xs, np.float64)
    if ts.ndim != 1:
        raise ValueError(f"xs must be a flat tuple of arclengths, got {xs!r}")
    if np.any(ts < -1e-12) or np.any(ts > length * (1 + 1e-12)):
        raise ValueError(f"interpolation targets {xs!r} outside [0, {length}]")
    p = np.zeros((ts.size, n))
    for i, t in enumerate(ts):
        diff = t - x
        hit = np.abs(diff) < 1e-14 * max(length, 1.0)
        if np.any(hit):
            p[i, np.argmax(hit)] = 1.0
        else:
            r = w / diff
            p[i] = r / r.sum()
    return _frozen(p)


@functools.lru_cache(maxsize=None)
def gram_matrix(n: int, length: float = 1.0) -> np.ndarray:
    """``Q``: the exact Gram quadrature on CGL grid values —
    ``f_vals^T Q g_vals = int_0^L f_h g_h`` EXACTLY for the degree-(n-1)
    interpolants ``f_h, g_h`` of the values.

    Clenshaw–Curtis weights integrate a degree-``2(n-1)`` *product* of two
    grid interpolants inexactly (exact only to degree ``n-1``), which costs
    Ritz/Galerkin energy discretizations their spectral rate (the classic
    under-integration consistency loss — Strang's lemma; spectral-element
    codes use Gauss–Lobatto–Legendre points for exactly this reason).  On
    the Chebyshev grid the cure is the exact Gram form
    ``Q = V^{-T} G V^{-1}`` with ``V[j,k] = T_k(t_j)`` the Chebyshev
    Vandermonde and ``G[i,k] = int_{-1}^{1} T_i T_k dt`` in closed form
    (``int T_m = 2/(1-m^2)`` even ``m``, 0 odd).  Symmetric positive
    definite; its row sums reproduce :func:`clenshaw_curtis_weights`.
    Used by the CTR torsion energy (models/ctr.py), whose convergence
    gate measurably drops from ~n^-4 to spectral with this form.
    """
    x = cgl_points(n)
    t = 2.0 * x - 1.0
    k = np.arange(n)
    v = np.cos(np.outer(np.arccos(np.clip(t, -1.0, 1.0)), k))
    idx = k[:, None] + k[None, :]
    dif = np.abs(k[:, None] - k[None, :])

    def moment(m):
        m = np.asarray(m, np.float64)
        even = m % 2 == 0
        den = np.where(even, 1.0 - m ** 2, 1.0)   # odd k: masked (moment 0)
        return np.where(even, 2.0 / den, 0.0)

    g = 0.5 * (moment(idx) + moment(dif))
    vinv = np.linalg.solve(v, np.eye(n))
    q = vinv.T @ g @ vinv
    q = 0.5 * (q + q.T) * (float(length) / 2.0)
    return _frozen(q)


@functools.lru_cache(maxsize=None)
def clenshaw_curtis_weights(n: int, length: float = 1.0) -> np.ndarray:
    """Clenshaw–Curtis quadrature weights on the descending CGL grid.

    ``sum_j w_j f(x_j) = int_0^L f`` exactly for polynomials of degree
    ``<= n-1``.  Not present in the reference (it never integrates), but
    required by the Cosserat-statics weak form ``K_ee = int Phi^T H Phi``
    (rod_modeling.pdf eq. 2.14).  Computed by solving the Chebyshev-basis
    Vandermonde moment system ``V^T w = m`` (V is a cosine matrix, well
    conditioned) in host f64.
    """
    x = cgl_points(n)  # on [0,1], descending
    t = 2.0 * x - 1.0  # to [-1,1]
    k = np.arange(n)
    # V[j, k] = T_k(t_j) = cos(k * arccos(t_j))
    v = np.cos(np.outer(np.arccos(np.clip(t, -1.0, 1.0)), k))
    # int_{-1}^{1} T_k dt = 2/(1-k^2) for even k, 0 for odd k.
    moments = np.zeros(n)
    even = k[k % 2 == 0]
    moments[even] = 2.0 / (1.0 - even.astype(np.float64) ** 2)
    w = np.linalg.solve(v.T, moments)
    return _frozen(w * (float(length) / 2.0))
