"""Spectral collocation IVP solver — the framework's core op (reference L3).

Re-design of the reference's collocation layer (`/root/reference/main.cpp:55-118`,
`materials/rod_modeling.pdf` eq. 3.24) for TPU execution.  The problem: a
linear matrix ODE on ``[0, L]``

    y'(X) = M(X) y(X) + g(X),      y(x_base) = y0,     y in R^d,

discretized on the N-point descending CGL grid with the initial condition at
the **last** grid point (``x[N-1] = 0``, `main.cpp:95`).  Collocating at the
N-1 unknown points yields the linear system (pdf eq. 3.24)

    (I_d ⊗ Dn_NN  -  M_hat) chi  =  g  -  (I_d ⊗ Dn_IN) y0,

with ``M_hat`` block-diagonal-by-point.  The reference materializes the
Kronecker products (`main.cpp:97-100`) and inverts the 60x60 matrix
explicitly (`main.cpp:113`).  Neither survives contact with a TPU:

* **No Kronecker products are ever materialized.**  The state lives as a
  ``(..., n-1, d)`` point-major array; ``I ⊗ Dn_NN`` is a single matmul over
  the point axis (MXU), ``M_hat`` is a per-point ``d x d`` matvec (VPU).
* **No dense inverse.**  Two solver paths:

  1. :func:`solve_ivp_dense` — assembles the (batched) dense system and uses
     LAPACK-style LU via ``jnp.linalg.solve``; the robust/general path and
     the Jacobian carrier for Newton BVPs.
  2. :func:`solve_ivp_picard` — the TPU fast path.  Preconditioning with the
     constant ``G = Dn_NN^{-1}`` (host f64 constant) turns the system into
     ``(I - G M_hat) chi = G r`` where ``G M_hat`` is the *discrete Volterra
     (Picard) operator* of the ODE: its Neumann series converges
     superlinearly (like ``(|M| L)^k / k!``), so a short fixed unrolled
     iteration of [matmul + 4x4 matvec] — both perfectly MXU/VPU shaped and
     shared across the whole rod batch — replaces a batched 60x60 LU.

* **f64 accuracy without f64 hardware** via :func:`solve_ivp_refined`:
  iterative refinement whose residual is evaluated in double-word f32
  (``ops/doubledouble.py``) against the exact f64 system constants split
  hi/lo at trace time.  Each refinement step multiplies the error by
  ``O(cond * eps_f32)`` (~2e-5 at cond≈186) until the double-word floor
  (~1e-13) — two steps reach the ≤1e-8 north-star gate with margin.

Layout note: the reference stacks states **component-major**
(``flat[c*(N-1) + i]``, `main.cpp:80-81`); we keep point-major ``(i, c)``
tensors internally and provide :func:`to_component_major` /
:func:`from_component_major` at the parity boundary.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp

from . import chebyshev
from . import doubledouble as dd

__all__ = [
    "SpectralGrid",
    "make_grid",
    "to_component_major",
    "from_component_major",
    "ivp_rhs",
    "collocation_matrix",
    "solve_ivp_dense",
    "solve_ivp_picard",
    "solve_ivp_picard_implicit",
    "solve_ivp_refined",
    "quadrature_refined",
    "residual_dd",
    "residual_quat_dd",
]


@dataclass(frozen=True)
class SpectralGrid:
    """Static (trace-time) spectral operators for one ``(n, length)`` config.

    All fields are host NumPy f64 (plus their double-word f32 splits); they
    enter jitted programs as constants — the TPU analogue of the reference's
    compile-time templates.
    """

    n: int
    length: float
    points: np.ndarray          # (n,) descending CGL points on [0, length]
    dn: np.ndarray              # (n, n) differentiation matrix
    dn_nn: np.ndarray           # (n-1, n-1) unknown block
    dn_in: np.ndarray           # (n-1,) known-endpoint column
    ginv: np.ndarray            # (n-1, n-1) inverse of dn_nn (integration op)
    dn_nn_dd: tuple = field(repr=False, default=None)
    dn_in_dd: tuple = field(repr=False, default=None)
    ginv_f32: np.ndarray = field(repr=False, default=None)

    @property
    def num_unknown(self) -> int:
        return self.n - 1


@functools.lru_cache(maxsize=None)
def make_grid(n: int, length: float = 1.0, known: str = "last") -> SpectralGrid:
    """Build the static spectral operators.

    ``known='last'`` (default): the boundary value sits at the LAST grid
    point ``x[n-1] = 0`` — the reference's IVP case (`main.cpp:94-95`);
    unknowns are points ``0..n-2`` (tip first).

    ``known='first'``: the boundary value sits at ``x[0] = L`` — a
    *terminal*-value problem integrated backward from the tip (the pdf's
    eq. 3.9-3.16 permutation-matrix general case, which the reference
    hard-codes away); unknowns are points ``1..n-1``.
    """
    points = chebyshev.cgl_points(n, length)
    dn = chebyshev.diff_matrix(n, length)
    dn_nn, dn_in = chebyshev.split_endpoint(dn, known=known)
    dn_in = dn_in[:, 0]
    ginv = chebyshev.integration_matrix(n, length, known=known)
    return SpectralGrid(
        n=n,
        length=float(length),
        points=points,  # full grid; unknowns are [:-1] ('last') or [1:] ('first')
        dn=dn,
        dn_nn=dn_nn,
        dn_in=dn_in,
        ginv=ginv,
        dn_nn_dd=dd.split_f64(dn_nn),
        dn_in_dd=dd.split_f64(dn_in),
        ginv_f32=ginv.astype(np.float32),
    )


def to_component_major(s):
    """``(..., np, d)`` point-major → ``(..., d*np)`` reference flat layout.

    ``flat[c*np + i] = s[i, c]`` — matches `main.cpp:80-81,130-133`.
    """
    s = jnp.asarray(s)
    npts, d = s.shape[-2], s.shape[-1]
    return jnp.swapaxes(s, -1, -2).reshape(s.shape[:-2] + (d * npts,))


def from_component_major(flat, npts: int, d: int):
    """Inverse of :func:`to_component_major`."""
    flat = jnp.asarray(flat)
    return jnp.swapaxes(flat.reshape(flat.shape[:-1] + (d, npts)), -1, -2)


def ivp_rhs(grid: SpectralGrid, y0, g=None, dtype=None):
    """Right-hand side ``g - (I ⊗ Dn_IN) y0`` in point-major layout.

    ``y0``: ``(..., d)`` initial state at the known endpoint;
    ``g``: optional ``(..., np, d)`` forcing at the unknown points.
    Returns ``(..., np, d)``: ``rhs[i, c] = g[i, c] - Dn_IN[i] * y0[c]`` —
    the reference's ``b - ivp`` (`main.cpp:109-113`) without flattening.
    """
    y0 = jnp.asarray(y0)
    dtype = dtype or y0.dtype
    dn_in = jnp.asarray(grid.dn_in, dtype=dtype)
    ivp = dn_in[:, None] * y0[..., None, :]
    return (-ivp) if g is None else jnp.asarray(g, dtype) - ivp


def collocation_matrix(grid: SpectralGrid, m_blocks, dtype=None):
    """Dense component-major system matrix ``I_d ⊗ Dn_NN - M_hat``.

    ``m_blocks``: ``(..., np, d, d)`` per-point ODE matrices ``M(x_i)``.
    Returns ``(..., d*np, d*np)`` — bit-layout-compatible with the
    reference's ``A_NN`` (`main.cpp:78-85`).  Used by the dense path,
    diagnostics (condition numbers) and Newton BVP Jacobians.
    """
    m_blocks = jnp.asarray(m_blocks)
    dtype = dtype or m_blocks.dtype
    npts = grid.num_unknown
    d = m_blocks.shape[-1]
    eye_d = jnp.eye(d, dtype=dtype)
    eye_p = jnp.eye(npts, dtype=dtype)
    dn_nn = jnp.asarray(grid.dn_nn, dtype=dtype)
    # a[c, i, e, j] = delta_ce * Dn_NN[i, j] - delta_ij * M[i, c, e]
    kron = jnp.einsum("ce,ij->ciej", eye_d, dn_nn)
    mhat = jnp.einsum("ij,...ice->...ciej", eye_p, jnp.asarray(m_blocks, dtype))
    a = kron - mhat
    return a.reshape(a.shape[:-4] + (d * npts, d * npts))


def solve_ivp_dense(grid: SpectralGrid, m_blocks, y0, g=None):
    """General/robust path: batched dense LU solve of the collocation system.

    Fixes the reference's explicit-inverse anti-pattern (`main.cpp:113`) with
    ``jnp.linalg.solve``.  Returns ``(..., np, d)`` point-major states.
    """
    m_blocks = jnp.asarray(m_blocks)
    d = m_blocks.shape[-1]
    a = collocation_matrix(grid, m_blocks)
    rhs = ivp_rhs(grid, jnp.asarray(y0, m_blocks.dtype), g)
    flat = jnp.linalg.solve(a, to_component_major(rhs)[..., None])[..., 0]
    return from_component_major(flat, grid.num_unknown, d)


def _apply_grid_matmul(mat, s):
    """``out[i, c] = sum_j mat[i, j] s[j, c]`` over the point axis (MXU).

    Precision pinned to HIGHEST: XLA:TPU otherwise decomposes f32 matmuls
    into bf16 passes, which would stall the iterative-refinement loop at
    ~1e-3 per-step contraction.  These matmuls are tiny (contraction dim
    ``n-1``), so full-f32 passes cost nothing against HBM traffic.
    """
    return jnp.einsum("ij,...jc->...ic", mat, s, precision="highest")


def _apply_point_blocks(m_blocks, s):
    """``out[i, c] = sum_e M[i, c, e] s[i, e]`` — per-point matvec (VPU)."""
    return jnp.einsum("...ice,...ie->...ic", m_blocks, s, precision="highest")


def solve_ivp_picard(grid: SpectralGrid, m_blocks, y0=None, g=None, rhs=None,
                     iters: int = 24):
    """TPU fast path: preconditioned Picard/Neumann fixed-point solve.

    Solves ``(I ⊗ Dn_NN - M_hat) chi = rhs`` via the iteration
    ``chi <- G rhs + G (M_hat chi)`` with the constant integration operator
    ``G = Dn_NN^{-1}``.  ``G M_hat`` discretizes the Volterra integral
    operator of the ODE, so the iteration converges superlinearly
    (factorially) in ``iters`` — ~20 iterations reach f32 roundoff for
    ``|M| L`` up to ~5.  Every step is one shared small matmul plus a
    per-point ``d x d`` matvec: ideal MXU/VPU shapes, batch-friendly.

    Pass either ``y0`` (+ optional forcing ``g``) or a precomputed ``rhs``.
    """
    m_blocks = jnp.asarray(m_blocks)
    dtype = m_blocks.dtype
    ginv = jnp.asarray(grid.ginv, dtype=dtype)
    if rhs is None:
        rhs = ivp_rhs(grid, jnp.asarray(y0, dtype), g)
    g_rhs = _apply_grid_matmul(ginv, rhs)
    chi = g_rhs
    for _ in range(iters):
        chi = g_rhs + _apply_grid_matmul(ginv, _apply_point_blocks(m_blocks, chi))
    return chi


@functools.partial(jax.custom_jvp, nondiff_argnums=(0, 3))
def solve_ivp_picard_implicit(grid: SpectralGrid, m_blocks, rhs,
                              iters: int = 24):
    """Picard solve with implicit-function-theorem differentiation.

    Same primal as :func:`solve_ivp_picard` (rhs form), but instead of
    differentiating through the unrolled iteration, the tangent rule uses
    the IFT on ``A(m) x = rhs``:

        A dx = drhs + dM_hat x     =>     dx = solve(m, drhs + dM_hat x)

    — ONE extra Picard solve per tangent instead of ``iters`` differentiated
    matmul chains (SURVEY.md §7 'differentiability for the Newton BVP loop').
    Used by the statics Newton Jacobian; forward-mode (jacfwd) ready.
    """
    return solve_ivp_picard(grid, m_blocks, rhs=rhs, iters=iters)


@solve_ivp_picard_implicit.defjvp
def _solve_ivp_picard_implicit_jvp(grid, iters, primals, tangents):
    m_blocks, rhs = primals
    dm, drhs = tangents
    x = solve_ivp_picard(grid, m_blocks, rhs=rhs, iters=iters)
    tangent_rhs = drhs + _apply_point_blocks(dm, x)
    dx = solve_ivp_picard(grid, m_blocks, rhs=tangent_rhs, iters=iters)
    return x, dx


def residual_dd(grid: SpectralGrid, m_dd, x_hi, x_lo, rhs_hi, rhs_lo):
    """Double-word residual ``rhs - (I ⊗ Dn_NN) x + M_hat x``.

    ``m_dd``: ``(m_hi, m_lo)`` per-point blocks ``(..., np, d, d)`` (may be
    ``None`` for pure quadrature).  ``x``, ``rhs``: dd pairs, point-major
    ``(..., np, d)``.  All products/sums use error-free transformations so
    the residual is exact to ~2^-49 relative — the IR accuracy floor.
    """
    dn_hi, dn_lo = grid.dn_nn_dd
    npts = grid.num_unknown
    dn_hi = jnp.asarray(dn_hi)[:, None, :]       # (np_i, 1, np_j)
    dn_lo = jnp.asarray(dn_lo)[:, None, :]
    xt_hi = jnp.swapaxes(x_hi, -1, -2)[..., None, :, :]   # (..., 1, d, np_j)
    xt_lo = jnp.swapaxes(x_lo, -1, -2)[..., None, :, :]
    a_hi, a_lo, b_hi, b_lo = _broadcast4(dn_hi, dn_lo, xt_hi, xt_lo)
    dx_hi, dx_lo = dd.dd_contract_axis(a_hi, a_lo, b_hi, b_lo, npts)
    r_hi, r_lo = dd.dd_add(rhs_hi, rhs_lo, -dx_hi, -dx_lo)
    if m_dd is not None:
        m_hi, m_lo = m_dd
        d = x_hi.shape[-1]
        a_hi, a_lo, b_hi, b_lo = _broadcast4(
            m_hi, m_lo, x_hi[..., None, :], x_lo[..., None, :]
        )
        mx_hi, mx_lo = dd.dd_contract_axis(a_hi, a_lo, b_hi, b_lo, d)
        r_hi, r_lo = dd.dd_add(r_hi, r_lo, mx_hi, mx_lo)
    return r_hi, r_lo


def residual_quat_dd(grid: SpectralGrid, k_dd, x_hi, x_lo, rhs_hi, rhs_lo):
    """Rod-specialized double-word residual, ~2x cheaper than
    :func:`residual_dd`.

    Exploits (a) the quaternion structure of ``M = 1/2 A(K)`` — 12 dd
    products on the 3 curvature components instead of 16 on dense 4x4
    blocks — and (b) the error budget: only the hi*hi terms need error-free
    transformations; the cross terms ``Dn_hi x_lo + Dn_lo x_hi`` are
    ~2^-24-scale, so plain f32 HIGHEST matmuls keep them well below the
    ~2^-48 target.  ``k_dd``: dd pair ``(..., np, 3)``.

    Rank-3 inputs (one batch axis) take a batch-minor ``(4, np, B)`` layout
    internally: the per-``j`` slices become major-axis row selections, so
    every elementwise dd op stays flat-packed on the VPU (~20% faster than
    the batch-major layout at B=131072 on v5e).
    """
    if x_hi.ndim == 3:
        return _residual_quat_dd_batchminor(
            grid, k_dd, x_hi, x_lo, rhs_hi, rhs_lo
        )
    dn_hi, dn_lo = grid.dn_nn_dd
    dn_hi = jnp.asarray(dn_hi)
    dn_lo = jnp.asarray(dn_lo)
    npts = grid.num_unknown

    # (I (x) Dn) x: hi*hi via EFT (unrolled compensated contraction);
    # cross terms via MXU.
    acc_hi = jnp.zeros_like(x_hi)
    acc_lo = jnp.zeros_like(x_hi)
    for j in range(npts):
        col = dn_hi[:, j][:, None]                       # (np_i, 1)
        p, e = dd.two_prod(col, x_hi[..., j, None, :])   # (..., np_i, 4)
        acc_hi, acc_lo = dd.dd_add(acc_hi, acc_lo, p, e)
    cross = (
        jnp.einsum("ij,...jc->...ic", dn_hi, x_lo, precision="highest")
        + jnp.einsum("ij,...jc->...ic", dn_lo, x_hi, precision="highest")
    )
    acc_hi, acc_lo = dd.dd_add_f32(acc_hi, acc_lo, cross)
    r_hi, r_lo = dd.dd_add(rhs_hi, rhs_lo, -acc_hi, -acc_lo)

    # + 1/2 A(K) x  (fold the 1/2 into K once).
    k_hi, k_lo = k_dd
    k_hi = 0.5 * k_hi
    k_lo = 0.5 * k_lo
    kc = [(k_hi[..., a], k_lo[..., a]) for a in range(3)]
    xc = [(x_hi[..., c], x_lo[..., c]) for c in range(4)]

    def p(a, c):  # dd product K_a * x_c
        return dd.dd_mul(kc[a][0], kc[a][1], xc[c][0], xc[c][1])

    def add3(sign0, t0, sign1, t1, sign2, t2):
        s_hi, s_lo = dd.dd_scale(*t0, sign0)
        s_hi, s_lo = dd.dd_add(s_hi, s_lo, *dd.dd_scale(*t1, sign1))
        return dd.dd_add(s_hi, s_lo, *dd.dd_scale(*t2, sign2))

    rows = [
        add3(-1.0, p(0, 1), -1.0, p(1, 2), -1.0, p(2, 3)),
        add3(+1.0, p(0, 0), +1.0, p(2, 2), -1.0, p(1, 3)),
        add3(+1.0, p(1, 0), -1.0, p(2, 1), +1.0, p(0, 3)),
        add3(+1.0, p(2, 0), +1.0, p(1, 1), -1.0, p(0, 2)),
    ]
    ax_hi = jnp.stack([r[0] for r in rows], axis=-1)
    ax_lo = jnp.stack([r[1] for r in rows], axis=-1)
    return dd.dd_add(r_hi, r_lo, ax_hi, ax_lo)


def _residual_quat_dd_batchminor(grid: SpectralGrid, k_dd, x_hi, x_lo,
                                 rhs_hi, rhs_lo):
    """Batch-minor implementation of :func:`residual_quat_dd` for ``(B, np,
    4)`` inputs — see its docstring for the layout rationale."""
    dn_hi, dn_lo = grid.dn_nn_dd
    dn_hi = jnp.asarray(dn_hi)
    dn_lo = jnp.asarray(dn_lo)
    npts = grid.num_unknown

    def t(a):  # (B, np, c) <-> (c, np, B); involution
        return jnp.transpose(a, (2, 1, 0))

    xt_hi, xt_lo = t(x_hi), t(x_lo)
    rt_hi, rt_lo = t(rhs_hi), t(rhs_lo)

    acc_hi = jnp.zeros_like(xt_hi)
    acc_lo = jnp.zeros_like(xt_lo)
    for j in range(npts):
        col = dn_hi[:, j][None, :, None]              # (1, np_i, 1)
        p, e = dd.two_prod(col, xt_hi[:, j:j + 1, :])  # -> (4, np_i, B)
        acc_hi, acc_lo = dd.dd_add(acc_hi, acc_lo, p, e)
    cross = (
        jnp.einsum("ij,cjb->cib", dn_hi, xt_lo, precision="highest")
        + jnp.einsum("ij,cjb->cib", dn_lo, xt_hi, precision="highest")
    )
    acc_hi, acc_lo = dd.dd_add_f32(acc_hi, acc_lo, cross)
    r_hi, r_lo = dd.dd_add(rt_hi, rt_lo, -acc_hi, -acc_lo)

    k_hi, k_lo = k_dd
    k_hi = 0.5 * jnp.transpose(k_hi, (2, 1, 0))        # (3, np, B)
    k_lo = 0.5 * jnp.transpose(k_lo, (2, 1, 0))
    kc = [(k_hi[a], k_lo[a]) for a in range(3)]
    xc = [(xt_hi[c], xt_lo[c]) for c in range(4)]

    def p(a, c):
        return dd.dd_mul(kc[a][0], kc[a][1], xc[c][0], xc[c][1])

    def add3(sign0, t0, sign1, t1, sign2, t2):
        s_hi, s_lo = dd.dd_scale(*t0, sign0)
        s_hi, s_lo = dd.dd_add(s_hi, s_lo, *dd.dd_scale(*t1, sign1))
        return dd.dd_add(s_hi, s_lo, *dd.dd_scale(*t2, sign2))

    rows = [
        add3(-1.0, p(0, 1), -1.0, p(1, 2), -1.0, p(2, 3)),
        add3(+1.0, p(0, 0), +1.0, p(2, 2), -1.0, p(1, 3)),
        add3(+1.0, p(1, 0), -1.0, p(2, 1), +1.0, p(0, 3)),
        add3(+1.0, p(2, 0), +1.0, p(1, 1), -1.0, p(0, 2)),
    ]
    ax_hi = jnp.stack([r[0] for r in rows], axis=0)
    ax_lo = jnp.stack([r[1] for r in rows], axis=0)
    out_hi, out_lo = dd.dd_add(r_hi, r_lo, ax_hi, ax_lo)
    return t(out_hi), t(out_lo)


def _broadcast4(a_hi, a_lo, b_hi, b_lo):
    shape = jnp.broadcast_shapes(jnp.shape(a_hi), jnp.shape(b_hi))
    return (
        jnp.broadcast_to(a_hi, shape),
        jnp.broadcast_to(a_lo, shape),
        jnp.broadcast_to(b_hi, shape),
        jnp.broadcast_to(b_lo, shape),
    )


def solve_ivp_refined(grid: SpectralGrid, m_dd, rhs_dd, iters: int = 24,
                      refine_steps: int = 2):
    """f32 Picard solve + double-word iterative refinement.

    ``m_dd = (m_hi, m_lo)`` per-point ODE blocks in double-word form (``m_lo``
    may be zeros when ``M`` is already f32-exact); ``rhs_dd`` likewise.
    Returns the solution as a dd pair ``(x_hi, x_lo)`` whose sum is accurate
    to ~``cond * 2^-49`` — far below the 1e-8 gate at cond≈186.
    """
    m_hi, m_lo = m_dd
    rhs_hi, rhs_lo = rhs_dd
    x_hi = solve_ivp_picard(grid, m_hi, rhs=rhs_hi, iters=iters)
    x_lo = jnp.zeros_like(x_hi)
    for _ in range(refine_steps):
        r_hi, r_lo = residual_dd(grid, (m_hi, m_lo), x_hi, x_lo, rhs_hi, rhs_lo)
        delta = solve_ivp_picard(grid, m_hi, rhs=r_hi + r_lo, iters=iters)
        x_hi, x_lo = dd.dd_add(x_hi, x_lo, delta, jnp.zeros_like(delta))
    return x_hi, x_lo


def quadrature_refined(grid: SpectralGrid, rhs_dd, refine_steps: int = 1):
    """Pure-quadrature solve ``Dn_NN x = rhs`` (position case, `main.cpp:172`)
    with double-word refinement.  ``rhs_dd``: dd pair ``(..., np, d)``.
    """
    rhs_hi, rhs_lo = rhs_dd
    ginv = jnp.asarray(grid.ginv_f32, dtype=rhs_hi.dtype)
    x_hi = _apply_grid_matmul(ginv, rhs_hi)
    x_lo = jnp.zeros_like(x_hi)
    for _ in range(refine_steps):
        r_hi, r_lo = residual_dd(grid, None, x_hi, x_lo, rhs_hi, rhs_lo)
        delta = _apply_grid_matmul(ginv, r_hi + r_lo)
        x_hi, x_lo = dd.dd_add(x_hi, x_lo, delta, jnp.zeros_like(delta))
    return x_hi, x_lo
