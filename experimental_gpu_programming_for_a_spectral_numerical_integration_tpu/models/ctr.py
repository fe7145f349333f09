"""Concentric-tube continuum robots — the torsionally-compliant multi-tube BVP.

New-capability layer: nothing in `/root/reference` covers tube-tube
interaction, but the machinery it rides is exactly the reference's —
the CGL grid and differentiation matrix
(`include/chebyshev_differentiation.h:19-108`) and the quaternion
spectral IVP (`main.cpp:91-118`) reused verbatim for the backbone shape.

Model: the standard torsionally-compliant / transversely-rigid CTR
equilibrium model (Rucker & Webster's energy formulation).  ``T``
precurved tubes are nested concentrically; all share one backbone
centerline and differ by twist angles ``theta_t(X)`` about the common
tangent.  In a zero-twist (Bishop) backbone frame each tube contributes
the bending-plane curvature vector

    v_t(X) = kappa_t (cos theta_t, sin theta_t),

the backbone curvature is the stiffness-weighted blend that minimizes
the pointwise bending energy,

    u_b(X) = sum_t k_t v_t / sum_t k_t,        k_t = (EI)_t,

and the twist profiles solve the Euler-Lagrange BVP of the elastic
energy functional

    E[theta] = int_0^L [ 1/2 sum_t g_t (theta_t')^2 + W(theta) ] dX,
    W = 1/2 sum_t k_t |v_t - u_b|^2,           g_t = (GJ)_t,
    theta_t(0) = alpha_t  (base actuation),    theta_t'(L) = 0  (free tip).

Discretization is spectral **Ritz-Galerkin**: ``theta`` lives pointwise
on the descending CGL grid, ``theta' = D theta`` exactly, and the energy
integral uses Clenshaw-Curtis quadrature — so torque continuity and the
moment-free tube ends are *natural* boundary conditions of the
variational form and only the base Dirichlet values are pinned.  The
solver is the shared batched damped Newton on ``grad E`` (exact
Hessian-vector products by forward-over-reverse AD), stability is the
sign of the discrete second variation (the smallest Hessian eigenvalue),
and the classic CTR **snapping** instability falls out exactly: for two
tubes the relative angle obeys ``phi'' = c sin phi`` with

    c = kappa_1 kappa_2 (k_1 k_2 / (k_1 + k_2)) (1/g_1 + 1/g_2),

and the aligned-antagonist state ``phi = pi`` loses stability at
``sqrt(c) L = pi/2`` (gated in tests/test_ctr.py at +-10%).

All lengths are TRACED: every solve runs on the unit reference grid with
the exact scalings ``theta' = D theta / ell``, ``dX = ell w``; the
quaternion/position chain integrates ``Q' = 1/2 A(ell K) Q`` on the unit
domain.  Translational actuation (telescoping overlap lengths) is
therefore batchable and differentiable without recompilation.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import chebyshev
from ..ops import collocation as coll
from ..ops import lie
from . import rod

__all__ = [
    "Tube",
    "CTRConfig",
    "CTRSolution",
    "torsion_energy",
    "torsion_residual",
    "torsion_hessian",
    "backbone_curvature",
    "solve_ctr",
    "solve_ctr_differentiable",
    "ctr_stability",
    "ctr_shape",
    "two_tube_snap_parameter",
    "solve_ctr_telescoping",
    "TelescopingShape",
]


@dataclass(frozen=True)
class Tube:
    """One precurved tube: constant precurvature magnitude ``kappa``
    (bending about the tube's body-y at ``theta = 0``), bending stiffness
    ``k = EI`` and torsional stiffness ``g = GJ`` (for a circular
    cross-section ``g = k/(1 + nu)``)."""

    curvature: float
    bending_stiffness: float = 1.0
    torsional_stiffness: float = 1.0


@dataclass(frozen=True)
class CTRConfig:
    """Static CTR problem: the tube set, the grid order ``n`` and the
    (default, overridable-per-call and traceable) shared length."""

    tubes: tuple
    n: int = 16
    length: float = 1.0

    @property
    def num_tubes(self) -> int:
        return len(self.tubes)

    @property
    def grid(self) -> coll.SpectralGrid:
        """UNIT reference grid — traced lengths enter as scalings."""
        return coll.make_grid(self.n, 1.0)

    @functools.cached_property
    def kappas(self) -> np.ndarray:
        return np.asarray([t.curvature for t in self.tubes], np.float64)

    @functools.cached_property
    def bending(self) -> np.ndarray:
        return np.asarray(
            [t.bending_stiffness for t in self.tubes], np.float64)

    @functools.cached_property
    def torsion(self) -> np.ndarray:
        return np.asarray(
            [t.torsional_stiffness for t in self.tubes], np.float64)

    @functools.cached_property
    def d1(self) -> np.ndarray:
        """Unit-length differentiation matrix (n, n), descending CGL."""
        return chebyshev.diff_matrix(self.n, 1.0)

    @functools.cached_property
    def q1(self) -> np.ndarray:
        """Unit-length exact Gram quadrature (n, n) — see
        :func:`chebyshev.gram_matrix`; plain CC weights under-integrate
        the Ritz products and cost the spectral rate."""
        return chebyshev.gram_matrix(self.n, 1.0)


class CTRSolution(NamedTuple):
    """``theta``: ``(..., T, n)`` twist angles on the full descending grid
    (tip first, base = actuation angles last); ``iterations``: Newton
    steps taken; ``residual``: the energy gradient at the solution
    (``(..., T*(n-1))``, flat unknown layout)."""

    theta: jnp.ndarray
    iterations: jnp.ndarray
    residual: jnp.ndarray


def _theta_full(theta_u, alphas):
    """Append the pinned base values: ``(..., T, n-1)`` + ``(..., T)`` →
    ``(..., T, n)`` (descending grid: the base is the LAST point,
    `chebyshev_differentiation.h:26`).  ``alphas`` broadcasts against any
    extra leading axes of ``theta_u`` (line-search candidate stacks)."""
    base = jnp.broadcast_to(alphas[..., None], theta_u.shape[:-1] + (1,))
    return jnp.concatenate([theta_u, base], axis=-1)


def _ell(cfg: CTRConfig, length, dtype):
    return jnp.asarray(cfg.length if length is None else length, dtype)


def tube_curvatures(theta, cfg: CTRConfig):
    """Per-tube bending-plane curvature vectors ``v_t = kappa_t
    (cos theta_t, sin theta_t)``: ``(..., T, n_pts, 2)``."""
    kap = jnp.asarray(cfg.kappas, theta.dtype)
    return kap[:, None, None] * jnp.stack(
        [jnp.cos(theta), jnp.sin(theta)], axis=-1)


def backbone_curvature(theta, cfg: CTRConfig):
    """Stiffness-weighted backbone curvature ``u_b = sum k_t v_t / sum
    k_t`` in the zero-twist frame: ``(..., n_pts, 2)``."""
    v = tube_curvatures(theta, cfg)
    kb = jnp.asarray(cfg.bending, theta.dtype)
    return jnp.einsum("t,...tnc->...nc", kb, v) / jnp.sum(kb)


def torsion_energy(theta_u, alphas, cfg: CTRConfig, length=None):
    """Discrete elastic energy ``(...,)`` of unknowns ``(..., T, n-1)``
    at base angles ``(..., T)``; ``length`` may be traced ``(...,)``."""
    theta_u = jnp.asarray(theta_u)
    dtype = theta_u.dtype
    alphas = jnp.asarray(alphas, dtype)
    ell = _ell(cfg, length, dtype)
    theta = _theta_full(theta_u, alphas)                    # (..., T, n)
    d1 = jnp.asarray(cfg.d1, dtype)
    # unit-domain derivative; the 1/ell scaling enters the energy below
    dtheta = jnp.einsum("ij,...tj->...ti", d1, theta, precision="highest")
    v = tube_curvatures(theta, cfg)                         # (..., T, n, 2)
    kb = jnp.asarray(cfg.bending, dtype)
    u = jnp.einsum("t,...tnc->...nc", kb, v) / jnp.sum(kb)
    dev = v - u[..., None, :, :]
    q1 = jnp.asarray(cfg.q1, dtype)
    # Exact Gram quadrature of the grid interpolants: both energy terms
    # are value-products, so Q integrates them exactly and the only
    # remaining discretization error is (geometric) interpolation
    # aliasing of the analytic cos/sin fields.
    e_bend = 0.5 * jnp.einsum("t,...tic,ij,...tjc->...", kb, dev, q1, dev,
                              precision="highest")
    gt = jnp.asarray(cfg.torsion, dtype)
    e_tors = 0.5 * jnp.einsum("t,...ti,ij,...tj->...", gt, dtheta, q1,
                              dtheta, precision="highest")
    return ell * e_bend + e_tors / ell


def torsion_residual(z, alphas, cfg: CTRConfig, length=None):
    """Per-sample energy gradient on the flat unknowns ``(..., T*(n-1))``
    — the Newton residual.  The per-sample separability of the summed
    energy makes ``grad(sum E)`` exactly the batch of gradients."""
    z = jnp.asarray(z)
    t, nu = cfg.num_tubes, cfg.n - 1

    def e_sum(zz):
        tu = zz.reshape(zz.shape[:-1] + (t, nu))
        return jnp.sum(torsion_energy(tu, alphas, cfg, length))

    return jax.grad(e_sum)(z)


def torsion_hessian(theta, alphas, cfg: CTRConfig, length=None):
    """Discrete second variation wrt the unknowns: ``(..., m, m)`` with
    ``m = T*(n-1)`` — forward-over-reverse columns (the shared
    linearize-over-unit-directions pattern of `dynamics.damped_newton`),
    symmetrized against AD roundoff."""
    theta = jnp.asarray(theta)
    t, nu = cfg.num_tubes, cfg.n - 1
    m = t * nu
    z = theta[..., :, :-1].reshape(theta.shape[:-2] + (m,))
    _, f_lin = jax.linearize(
        lambda zz: torsion_residual(zz, alphas, cfg, length), z)
    cols = jax.vmap(lambda e: f_lin(jnp.broadcast_to(e, z.shape)))(
        jnp.eye(m, dtype=z.dtype))
    h = jnp.moveaxis(cols, 0, -1)
    return 0.5 * (h + jnp.swapaxes(h, -1, -2))


def solve_ctr(alphas, cfg: CTRConfig, length=None, theta0=None,
              tol: float = 1e-8, max_iter: int = 40,
              line_search: bool = True) -> CTRSolution:
    """Batched damped Newton on the torsion BVP.

    ``alphas (..., T)`` base actuation angles; ``length`` optional traced
    override ``(...,)``; ``theta0`` optional initial full-grid or
    unknown-grid guess (defaults to the twist-rigid profile ``theta ==
    alpha`` — pass a perturbed guess to land on a chosen branch in the
    bistable post-snap regime)."""
    from . import dynamics  # deferred: dynamics is a heavy import

    alphas = jnp.asarray(alphas)
    t, nu = cfg.num_tubes, cfg.n - 1
    if alphas.shape[-1] != t:
        raise ValueError(
            f"alphas has {alphas.shape[-1]} entries, config has {t} tubes")
    if theta0 is None:
        theta_u0 = jnp.broadcast_to(
            alphas[..., None], alphas.shape + (nu,))
    else:
        theta0 = jnp.asarray(theta0, alphas.dtype)
        theta_u0 = theta0[..., :nu] if theta0.shape[-1] == cfg.n else theta0
        theta_u0 = jnp.broadcast_to(theta_u0, alphas.shape + (nu,))
    z0 = theta_u0.reshape(theta_u0.shape[:-2] + (t * nu,))
    z, k, res = dynamics.damped_newton(
        lambda zz: torsion_residual(zz, alphas, cfg, length),
        z0, tol=tol, max_iter=max_iter, line_search=line_search)
    theta_u = z.reshape(z.shape[:-1] + (t, nu))
    return CTRSolution(theta=_theta_full(theta_u, alphas),
                       iterations=k, residual=res)


def ctr_stability(theta, alphas, cfg: CTRConfig, length=None):
    """Smallest eigenvalue of the discrete second variation ``(...,)`` —
    positive at stable equilibria; its zero crossing along an actuation
    path is the CTR snapping bifurcation."""
    h = torsion_hessian(theta, alphas, cfg, length)
    return jnp.min(jnp.linalg.eigvalsh(h), axis=-1)


def two_tube_snap_parameter(cfg: CTRConfig, length=None) -> float:
    """Host-side ``sqrt(c) L`` for a two-tube pair: the antagonist state
    ``alpha_1 - alpha_2 = pi`` is bistable (snapping) iff this exceeds
    ``pi/2`` (linearized second variation about ``phi = pi``)."""
    if cfg.num_tubes != 2:
        raise ValueError("snap parameter is defined for exactly 2 tubes")
    k1, k2 = cfg.bending
    g1, g2 = cfg.torsion
    kap1, kap2 = cfg.kappas
    c = kap1 * kap2 * (k1 * k2 / (k1 + k2)) * (1.0 / g1 + 1.0 / g2)
    ell = float(cfg.length if length is None else length)
    return float(np.sqrt(c) * ell)


def _shape_from_curvature(k, ell, grid, method, iters, q_init, r_init):
    """Quaternion + position chain for a pointwise strain field ``k``
    ``(..., n-1, 3)`` on the UNIT grid scaled by ``ell`` — the
    `main.cpp:91-176` composition with traced length."""
    dtype = k.dtype
    batch = k.shape[:-2]
    q0 = jnp.broadcast_to(
        jnp.asarray(rod.DEFAULT_Q_INIT if q_init is None else q_init,
                    dtype), batch + (4,))
    r0 = jnp.broadcast_to(
        jnp.asarray(rod.DEFAULT_R_INIT if r_init is None else r_init,
                    dtype), batch + (3,))
    m = 0.5 * ell[..., None, None, None] * lie.quat_skew(k)
    if method == "dense":
        q = coll.solve_ivp_dense(grid, m, q0)
    elif method == "picard":
        q = coll.solve_ivp_picard_implicit(
            grid, m, coll.ivp_rhs(grid, q0), iters)
    else:
        raise ValueError(f"unknown method {method!r}")
    b = lie.quat_tangent(q) * ell[..., None, None]
    rhs = coll.ivp_rhs(grid, r0, g=b)
    if method == "dense":
        dn_nn = jnp.asarray(grid.dn_nn, dtype)
        r = jnp.linalg.solve(
            jnp.broadcast_to(dn_nn, rhs.shape[:-2] + dn_nn.shape), rhs)
    else:
        r = coll._apply_grid_matmul(jnp.asarray(grid.ginv, dtype), rhs)
    return rod.RodSolution(quaternions=q, positions=r)


def ctr_shape(theta, cfg: CTRConfig, length=None, method: str = "picard",
              iters: int = 24, q_init=None, r_init=None) -> rod.RodSolution:
    """Backbone shape from solved twist profiles ``theta (..., T, n)``.

    The zero-twist backbone frame carries strain ``K = (0, u_b)``
    (torsion-free by construction — the tubes spin about the shared
    tangent without moving the centerline), integrated by the same
    spectral quaternion/position chain as the single rod
    (`main.cpp:91-176`), on the unit grid with the traced length
    scaling.  Point 0 is the tip, matching :class:`rod.RodSolution`.
    """
    theta = jnp.asarray(theta)
    u = backbone_curvature(theta[..., :, :-1], cfg)         # unknown pts
    k = jnp.concatenate([jnp.zeros_like(u[..., :1]), u], axis=-1)
    ell = _ell(cfg, length, theta.dtype)
    return _shape_from_curvature(k, ell, cfg.grid, method, iters,
                                 q_init, r_init)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5))
def _solve_theta_ift(alphas, length, cfg, tol, max_iter, line_search):
    return solve_ctr(alphas, cfg, length=length, tol=tol,
                     max_iter=max_iter, line_search=line_search).theta


@_solve_theta_ift.defjvp
def _solve_theta_ift_jvp(cfg, tol, max_iter, line_search, primals,
                         tangents):
    """IFT tangents of the torsion equilibrium: at ``grad E(z*; a, l) =
    0``, ``dz = -H^{-1} (d grad E / d(a, l)) . (da, dl)`` — one Hessian
    solve per tangent instead of differentiating the Newton loop (the
    `solve_ivp_picard_implicit` pattern, collocation.py:243-268)."""
    alphas, length = primals
    da, dl = tangents
    theta = _solve_theta_ift(alphas, length, cfg, tol, max_iter,
                             line_search)
    t, nu = cfg.num_tubes, cfg.n - 1
    z = theta[..., :, :-1].reshape(theta.shape[:-2] + (t * nu,))
    _, rhs_t = jax.jvp(
        lambda aa, ll: torsion_residual(z, aa, cfg, ll),
        (alphas, length), (da, dl))
    h = torsion_hessian(theta, alphas, cfg, length)
    # jnp.linalg.solve (LU), not the Gauss-Jordan kernel: this rule must be
    # LINEAR in the tangents for jax to transpose it in reverse mode, and
    # the GJ pivot gathers don't transpose.
    dz = -jnp.linalg.solve(h, rhs_t[..., None])[..., 0]
    dtheta_u = dz.reshape(dz.shape[:-1] + (t, nu))
    dtheta = jnp.concatenate([dtheta_u, da[..., None]], axis=-1)
    return theta, dtheta


def solve_ctr_differentiable(alphas, cfg: CTRConfig, length=None,
                             tol: float = 1e-8, max_iter: int = 40,
                             line_search: bool = True):
    """:func:`solve_ctr` returning only ``theta``, differentiable wrt
    BOTH ``alphas`` (rotational actuation) and ``length`` (translational
    actuation) via implicit-function tangents — the entry point for CTR
    inverse kinematics and workspace Jacobians."""
    alphas = jnp.asarray(alphas)
    ell = _ell(cfg, length, alphas.dtype)
    return _solve_theta_ift(alphas, ell, cfg, tol, max_iter, line_search)


class TelescopingShape(NamedTuple):
    """Two-section telescoping shape: ``proximal`` covers the two-tube
    overlap ``[0, overlap]`` (tip of the section first), ``distal`` the
    inner-tube-only extension; ``tip`` is the robot tip position and
    ``theta`` the overlap twist profiles."""

    theta: jnp.ndarray
    proximal: rod.RodSolution
    distal: rod.RodSolution
    tip: jnp.ndarray


def solve_ctr_telescoping(alphas, overlap, extension, cfg: CTRConfig,
                          method: str = "picard", iters: int = 24,
                          tol: float = 1e-8, max_iter: int = 40,
                          differentiable: bool = False,
                          theta0=None) -> TelescopingShape:
    """Two-tube telescoping CTR: ``tubes = (inner, outer)`` with the
    inner tube protruding ``extension`` beyond the overlapped section of
    length ``overlap`` (both traceable/batchable ``(...,)``).

    Exact reduction: in the inner-only distal section the torsion ODE is
    ``g_1 theta_1'' = 0`` with the free-tip condition ``theta_1'(end) =
    0``, so ``theta_1' == 0`` there and — by torque continuity at the
    junction — the overlap section satisfies the standard full-overlap
    BVP with ``theta'(junction) = 0`` (the tube-end natural BC of the
    Ritz form).  The distal backbone is the inner tube's own constant
    precurvature rotated by the junction twist, chained through the
    junction quaternion/position state (the `models/segments.py`
    composition pattern).
    """
    if cfg.num_tubes != 2:
        raise ValueError("telescoping solver covers the two-tube robot")
    alphas = jnp.asarray(alphas)
    dtype = alphas.dtype
    ell_o = jnp.asarray(overlap, dtype)
    ell_d = jnp.asarray(extension, dtype)
    if differentiable:
        theta = solve_ctr_differentiable(alphas, cfg, length=ell_o,
                                         tol=tol, max_iter=max_iter)
    else:
        theta = solve_ctr(alphas, cfg, length=ell_o, tol=tol,
                          max_iter=max_iter, theta0=theta0).theta
    prox = ctr_shape(theta, cfg, length=ell_o, method=method, iters=iters)
    q_j = prox.quaternions[..., 0, :]
    r_j = prox.positions[..., 0, :]
    th1 = theta[..., 0, 0]                       # inner-tube junction twist
    kap1 = jnp.asarray(cfg.kappas[0], dtype)
    k_d = jnp.stack([jnp.zeros_like(th1), kap1 * jnp.cos(th1),
                     kap1 * jnp.sin(th1)], axis=-1)
    k_d = jnp.broadcast_to(k_d[..., None, :],
                           th1.shape + (cfg.n - 1, 3))
    distal = _shape_from_curvature(
        k_d, jnp.broadcast_to(ell_d, th1.shape), cfg.grid, method, iters,
        q_init=q_j, r_init=r_j)
    return TelescopingShape(theta=theta, proximal=prox, distal=distal,
                            tip=distal.positions[..., 0, :])
