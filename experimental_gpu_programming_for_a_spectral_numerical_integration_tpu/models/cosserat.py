"""Cosserat/Kirchhoff rod statics BVP: Newton on the collocation residual.

BASELINE.json config #3 ("Full Cosserat rod statics: position+quaternion
spectral BVP with tip loads, N=64, Newton on collocation residual") — a new
capability beyond the reference's forward kinematics, built on the theory
the reference ships in ``materials/rod_modeling.pdf``:

* strain parameterization ``kappa(X) = Phi(X) qe`` (pdf eq. 2.5, the live
  ``na=3`` curvature case of `utilities.h:49-67`),
* generalized stiffness ``K_ee = int Phi^T H Phi dX`` (pdf eq. 2.14),
* the spectral kinematics solves of `/root/reference/main.cpp` as the
  forward model.

Equilibrium (internal-moment balance of a Kirchhoff rod under a tip wrench
``(F, M)``): at every cross-section the constitutive moment must equal the
static moment transported to that section,

    H (kappa(X) - kappa0(X)) = R(X)^T [ (r(L) - r(X)) x F + M ],

projected onto the strain modes with Clenshaw–Curtis quadrature:

    res(qe) = int_0^L Phi^T { H (kappa - kappa0) - tau(X; qe) } dX  = 0.

``r`` and ``R`` come from the differentiable spectral solves, so the Newton
Jacobian is an exact ``jax.jacfwd`` through the collocation core — the
implicit-function route SURVEY.md §7 flags as the 'hard part': the Picard
solve carries an IFT custom JVP (``solve_ivp_picard_implicit``), so each
tangent costs one extra solve instead of differentiating the iteration
(measured 15x on the batched Newton path).

Everything is jittable; :func:`solve_statics` runs Newton inside
``lax.while_loop`` and is batchable over load sets via ``vmap``;
:func:`load_continuation` sweeps a load schedule re-using each converged
``qe`` as the next warm start (BASELINE config #5's continuation pattern).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import basis as basis_ops
from ..ops import chebyshev
from ..ops import lie
from ..ops import smallsolve
from . import rod

__all__ = [
    "StaticsConfig",
    "StaticsSolution",
    "stiffness_profile",
    "equilibrium_residual",
    "equilibrium_residual_dd",
    "residual_and_jacobian_fused",
    "solve_statics",
    "solve_statics_differentiable",
    "solve_statics_batched",
    "arc_length_continuation",
    "arc_length_continuation_batched",
    "ContinuationPath",
    "BatchedContinuationPath",
    "load_continuation",
]


@dataclass(frozen=True)
class StaticsConfig:
    """Rod geometry/discretization plus the constitutive law.

    ``stiffness``: diagonal ``H``.  Length 3 for a Kirchhoff rod
    (``GJ, EI_y, EI_z``; ``rod.na == 3``) or 6 for a shear-compliant
    Reissner rod (``GJ, EI_y, EI_z, EA, GA_y, GA_z``; ``rod.na == 6`` —
    the full ``H_a`` of rod_modeling.pdf eq. 2.14, the extension the
    reference's dead ``ad()`` signals).  ``kappa0``: intrinsic (rest)
    strain modes, same layout as ``qe``.
    ``distributed_force``: constant force density per unit length in the
    world frame (e.g. ``(0, 0, -rho g A)`` for gravity), applied along the
    whole rod via the spectral partial-integral operator.

    Non-uniform rods: ``stiffness`` also accepts an ``(n, na)`` nested
    tuple of per-grid-point diagonals — a smooth constitutive profile
    ``H(X)`` (tapered/graded sections; build with
    :func:`stiffness_profile`).  Smooth profiles keep spectral accuracy;
    for genuinely DISCONTINUOUS laws (stepped rods) use
    :mod:`.segment_statics`, whose per-segment constants capture the jump
    exactly.
    """

    rod: rod.RodConfig = field(default_factory=lambda: rod.RodConfig(n=64))
    stiffness: tuple = (1.0, 1.0, 1.0)
    kappa0: tuple | None = None
    distributed_force: tuple | None = None
    # follower=True: the tip force is given in the TIP BODY frame and
    # rotates with the deformation (F_world = R(tip) F_body) — the
    # non-conservative load case (e.g. a thruster at the rod tip).  The
    # tip moment stays a dead (world-frame) couple.
    follower: bool = False

    @functools.cached_property
    def full_basis_table(self) -> np.ndarray:
        """(n, ne) basis table at ALL grid points (statics integrates over
        the whole rod, base point included — unlike the kinematics solve)."""
        pts = tuple((self.rod.points / self.rod.length).tolist())
        return basis_ops.basis_table(pts, self.rod.ne, self.rod.basis)

    @functools.cached_property
    def quad_weights(self) -> np.ndarray:
        return chebyshev.clenshaw_curtis_weights(self.rod.n, self.rod.length)

    @functools.cached_property
    def full_basis_table_dd(self):
        from ..ops import doubledouble as dd

        return dd.split_f64(self.full_basis_table)

    @functools.cached_property
    def weighted_table_dd(self):
        """dd split of ``w_j P_e(x_j)`` — the weak-form quadrature kernel."""
        from ..ops import doubledouble as dd

        return dd.split_f64(self.quad_weights[:, None] * self.full_basis_table)

    @functools.cached_property
    def partial_integral_dd(self):
        """dd split of the spectral tail-integral operator ``T`` (the
        distributed-load transport, ``(T r)_i = int_{x_i}^L r ds``)."""
        from ..ops import doubledouble as dd

        return dd.split_f64(
            chebyshev.partial_integral_matrix(self.rod.n, self.rod.length))

    @functools.cached_property
    def tail_length_dd(self):
        """dd split of ``L - x_i`` on the full grid."""
        from ..ops import doubledouble as dd

        return dd.split_f64(self.rod.length - self.rod.points)


class StaticsSolution(NamedTuple):
    qe: jnp.ndarray            # (..., na*ne) converged strain modes
    iterations: jnp.ndarray    # (...,) Newton iterations used
    residual_norm: jnp.ndarray # (...,) final ||res||_2
    converged: jnp.ndarray     # (...,) bool
    qe_lo: jnp.ndarray = None  # dd low word (dd_residual solves: the
                               # f32 ulp of qe is ~1e-8, above tight tols)


def _full_grid_state(cfg: rod.RodConfig, qe, q_init, r_init, iters,
                     method: str = "picard"):
    """Kinematics on the FULL grid: solved unknowns + the known base point
    appended at the end (descending grid: index n-1 is the base).

    ``method='dense'`` for strong-curvature regimes (``rho = |K| L/2 > ~5``
    diverges the Picard iteration — the forward model, and with it Newton,
    silently degrades; see diagnostics.picard_error_bound)."""
    sol = rod.rod_shape(qe, q_init, r_init, cfg=cfg, method=method,
                        iters=iters, normalize_quaternions=False)
    q_base = jnp.broadcast_to(
        jnp.asarray(q_init, sol.quaternions.dtype), qe.shape[:-1] + (1, 4)
    )
    r_base = jnp.broadcast_to(
        jnp.asarray(r_init, sol.positions.dtype), qe.shape[:-1] + (1, 3)
    )
    q = jnp.concatenate([sol.quaternions, q_base], axis=-2)
    r = jnp.concatenate([sol.positions, r_base], axis=-2)
    return q, r


def stiffness_profile(fn, rc: rod.RodConfig) -> tuple:
    """Freeze a smooth constitutive profile ``H(X)`` into a
    :class:`StaticsConfig`-compatible ``(n, na)`` nested tuple.

    ``fn`` maps the normalized arclength array ``X (n,)`` (descending,
    tip→base — the CGL ordering of `chebyshev_differentiation.h:26`) to
    per-point diagonals ``(n, na)``.  The tuple form keeps the config
    hashable (valid jit static argument) and the table an exact host f64
    constant for the dd residual's split.
    """
    xs = np.asarray(rc.points, np.float64) / rc.length
    h = np.asarray(fn(xs), np.float64)
    if h.ndim != 2 or h.shape[0] != rc.n or h.shape[1] != rc.na:
        raise ValueError(
            f"profile fn returned {h.shape}, need ({rc.n}, {rc.na})")
    return tuple(map(tuple, h.tolist()))


def equilibrium_residual(qe, tip_force, tip_moment, cfg: StaticsConfig,
                         iters: int = 24, method: str = "picard",
                         auto_rho_limit: float = 5.0):
    """Modal moment-balance residual ``(..., na*ne)`` (zero at equilibrium).

    ``method='auto'`` guards the forward model's validity at runtime: the
    Picard kinematics silently degrade beyond ``rho = max|K| L/2 ~ 5``
    (the round-2 snap-through hunt hit exactly this in an outer
    continuation loop), so a traced ``lax.cond`` on the batch's strain
    bound routes to the dense solve when ANY sample exceeds
    ``auto_rho_limit``.  Both branches compile; only one executes per call.
    """
    rc = cfg.rod
    qe = jnp.asarray(qe)
    dtype = qe.dtype
    q_init = jnp.asarray(rod.DEFAULT_Q_INIT, dtype)
    r_init = jnp.zeros(3, dtype)
    if method == "auto":
        k = rod.curvature_at_points(rc, qe)[..., :3]
        rho = jnp.max(jnp.linalg.norm(k, axis=-1)) * rc.length / 2.0

        def branch(m):
            def f(q_in):
                return _full_grid_state(rc, q_in, q_init, r_init, iters, m)
            return f

        q, r = jax.lax.cond(rho <= auto_rho_limit, branch("picard"),
                            branch("dense"), qe)
    else:
        q, r = _full_grid_state(rc, qe, q_init, r_init, iters, method)
    return _residual_from_state(qe, q, r, tip_force, tip_moment, cfg)


def _residual_from_state(qe, q, r, tip_force, tip_moment, cfg: StaticsConfig):
    """The weak-form balance residual given the full-grid kinematic state —
    pure XLA, so tangents w.r.t. ``(qe, q, r)`` are plain ``jax.jvp``
    (the solver-dependent part of the Jacobian enters via the IFT tangents
    of the state, see :func:`_fused_state_and_tangents`)."""
    rc = cfg.rod
    dtype = qe.dtype
    table = jnp.asarray(cfg.full_basis_table, dtype)       # (n, ne)
    w = jnp.asarray(cfg.quad_weights, dtype)               # (n,)
    h = jnp.asarray(cfg.stiffness, dtype)                  # (na,) | (n, na)
    if h.shape[-1] != rc.na:
        raise ValueError(
            f"stiffness has {h.shape[-1]} entries but rod.na = {rc.na}; "
            "use 3 (Kirchhoff: GJ, EI_y, EI_z) or 6 (Reissner: + EA, GA_y, "
            "GA_z with rod.na = 6)"
        )
    if h.ndim == 2 and h.shape[0] != rc.n:
        raise ValueError(
            f"stiffness profile has {h.shape[0]} rows but the rod grid has "
            f"{rc.n} points; build it with cosserat.stiffness_profile")

    # Strain field on the full grid (curvature, + shear/extension if na=6).
    kappa = basis_ops.strain_at_points(qe, table)          # (..., n, na)
    if cfg.kappa0 is not None:
        kappa = kappa - basis_ops.strain_at_points(
            jnp.asarray(cfg.kappa0, dtype), table
        )

    # Static moment about each section, in the body frame (normalized
    # rotation: this is our physics model, not a reference-parity path).
    # Rotations stay in QUATERNION-VECTOR form (lie.quat_rotate_*): the 3x3
    # route costs ~4x in AD-tangent temporaries on the Jacobian path.
    r_tip = r[..., :1, :]                                  # tip is point 0
    arm = r_tip - r                                        # (..., n, 3)
    tip_force = jnp.asarray(tip_force, dtype)
    if cfg.follower:
        # follower force: rotate the body-frame tip load into the world
        # at the CURRENT tip orientation (non-conservative).
        tip_force = lie.quat_rotate_normalized(
            q[..., :1, :], jnp.broadcast_to(tip_force,
                                            arm[..., :1, :].shape))
    f = jnp.broadcast_to(tip_force, arm.shape)
    world_moment = jnp.cross(arm, f) + jnp.asarray(tip_moment, dtype)

    if cfg.distributed_force is not None:
        # Constant force density w: moment about section i is
        # int_{x_i}^{L} (r(s) - r_i) x w ds = [ (T r)_i - (L - x_i) r_i ] x w
        # with T the spectral tail-integral operator.
        w_dist = jnp.asarray(cfg.distributed_force, dtype)
        t_op = jnp.asarray(
            chebyshev.partial_integral_matrix(rc.n, rc.length), dtype
        )
        tail_len = jnp.asarray(rc.length - rc.points, dtype)   # (n,)
        tr = jnp.einsum("ij,...jc->...ic", t_op, r, precision="highest")
        dist_arm = tr - tail_len[:, None] * r
        world_moment = world_moment + jnp.cross(dist_arm, w_dist)
    tau = lie.quat_rotate_inv_normalized(q, world_moment)

    if rc.na == 6:
        # Force balance rows: the internal force at section X is the tip
        # force plus the distributed tail, rotated into the body frame;
        # constitutive law H_shear gamma = n (Reissner, pdf ch. 1-2).
        world_force = f
        if cfg.distributed_force is not None:
            tail_len = jnp.asarray(rc.length - rc.points, dtype)
            world_force = world_force + tail_len[:, None] * jnp.asarray(
                cfg.distributed_force, dtype
            )
        n_body = lie.quat_rotate_inv_normalized(q, world_force)
        tau = jnp.concatenate([tau, n_body], axis=-1)      # (..., n, 6)

    # Weak form: res[a, e] = sum_j w_j P_e(x_j) (H xi - tau)[j, a].
    mr = h * kappa - tau                                   # (..., n, na)
    res = jnp.einsum("j,je,...ja->...ae", w, table, mr, precision="highest")
    return res.reshape(res.shape[:-2] + (rc.na * rc.ne,))


def solve_statics(tip_force, tip_moment=(0.0, 0.0, 0.0),
                  cfg: StaticsConfig = StaticsConfig(), qe0=None,
                  tol: float = 1e-9, max_iter: int = 30,
                  damping: float = 1.0, iters: int = 24,
                  method: str = "picard",
                  line_search: bool = False) -> StaticsSolution:
    """Newton on :func:`equilibrium_residual` with exact AD Jacobians.

    jit/vmap-compatible (``lax.while_loop`` with static shapes).  For
    strong loads prefer :func:`load_continuation`, or set
    ``line_search=True``: a backtracking Armijo search over step fractions
    ``{1, 1/2, ..., 1/16}`` (five extra residual evaluations per iterate)
    that extends the cold-start convergence radius several-fold — e.g. a
    transverse tip load of 12 EI/L^2 converges from zero where the
    full-step iteration wanders (tests).
    """
    rc = cfg.rod
    nq = rc.na * rc.ne
    tip_force = jnp.asarray(tip_force)
    dtype = tip_force.dtype if tip_force.dtype in (jnp.float32, jnp.float64) \
        else jnp.float32
    if qe0 is None:
        qe0 = jnp.zeros(tip_force.shape[:-1] + (nq,), dtype)
    qe0 = jnp.asarray(qe0, dtype)
    tip_moment = jnp.asarray(tip_moment, dtype)

    def residual(qe):
        return equilibrium_residual(qe, tip_force, tip_moment, cfg, iters,
                                    method)

    def cond(state):
        _, k, res = state
        return jnp.logical_and(k < max_iter, jnp.linalg.norm(res, axis=-1) > tol)

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625], dtype)

    def body(state):
        qe, k, res = state
        # One forward pass for the Jacobian; the residual is carried in the
        # loop state (computed once per iterate, not thrice).
        jac = jax.jacfwd(residual)(qe)
        # TPU: tiny-n LAPACK batched LU is pathologically slow; the
        # unrolled Gauss-Jordan runs on the VPU (ops/smallsolve.py).
        step = smallsolve.gauss_jordan_solve(jac, res)
        if not line_search:
            qe = qe - damping * step
            return qe, k + 1, residual(qe)
        # The CURRENT iterate rides along as candidate 0 so the Armijo
        # comparison uses residuals from ONE routed evaluation — with
        # method='auto' a separate base call could route picard while the
        # aggressive candidates force the whole stack to dense, and the
        # descent test would then compare across models.
        cand = qe - damping * jnp.concatenate(
            [jnp.zeros((1,), dtype), alphas])[:, None] * step
        res_c = residual(cand)                          # (6, nq)
        norms = jnp.linalg.norm(res_c, axis=-1)
        base = norms[0]
        ok = norms[1:] < (1.0 - 1e-4 * alphas) * base
        idx = 1 + jnp.where(jnp.any(ok), jnp.argmax(ok),
                            jnp.argmin(norms[1:]))
        return cand[idx], k + 1, res_c[idx]

    r0 = residual(qe0)
    qe, k, res = jax.lax.while_loop(
        cond, body, (qe0, jnp.zeros((), jnp.int32), r0)
    )
    rnorm = jnp.linalg.norm(res, axis=-1)
    return StaticsSolution(qe=qe, iterations=k, residual_norm=rnorm,
                           converged=rnorm <= tol)


def equilibrium_residual_dd(qe, tip_force, tip_moment, cfg: StaticsConfig,
                            iters: int = 24, refine_steps: int = 2):
    """Double-word balance residual: ~2^-45-grade cancellation, so
    device-side Newton can hit 1e-9-class tolerances on f32 hardware
    (the f32 residual floors near 1e-5/1e-6 from the O(1) terms it
    differences).

    Kinematics run the refined dd path; every transport/cancellation uses
    error-free transformations.  The rotation is the **unnormalized**
    ``R(q)`` — the refined solve keeps ``||q| - 1| ~ 1e-12``, far below the
    target, so the dd and f32 residual definitions agree to that level.
    ``qe`` may be a dd pair.  Returns f32 ``(..., na*ne)`` (residual values
    near zero are fully representable; dd mattered for the cancellation).
    """
    from ..ops import doubledouble as dd

    rc = cfg.rod
    sol = rod.rod_shape(qe, cfg=rc, method="refined", iters=iters,
                        refine_steps=refine_steps)
    q_hi, q_lo = sol.quaternions_dd
    r_hi, r_lo = sol.positions_dd
    lead = q_hi.shape[:-2]
    # Append the known base point (identity quaternion / origin, exact).
    base_q = jnp.broadcast_to(
        jnp.asarray(rod.DEFAULT_Q_INIT, jnp.float32), lead + (1, 4))
    q_hi = jnp.concatenate([q_hi, base_q], axis=-2)
    q_lo = jnp.concatenate([q_lo, jnp.zeros_like(base_q)], axis=-2)
    zero3 = jnp.zeros(lead + (1, 3), jnp.float32)
    r_hi = jnp.concatenate([r_hi, zero3], axis=-2)
    r_lo = jnp.concatenate([r_lo, zero3], axis=-2)

    # Strain field on the full grid, dd.
    xi_hi, xi_lo = rod._curvature_dd(rc, qe, table_dd=cfg.full_basis_table_dd)
    if cfg.kappa0 is not None:
        k0_hi, k0_lo = rod._curvature_dd(
            rc, dd.split_f64(np.asarray(cfg.kappa0, np.float64)),
            table_dd=cfg.full_basis_table_dd,
        )
        xi_hi, xi_lo = dd.dd_add(xi_hi, xi_lo, -k0_hi, -k0_lo)

    # arm = r_tip - r; world moment = arm x F + M.  Loads may be dd pairs
    # ``(hi, lo)`` — the batched dd Riks corrector passes ``lam (x)
    # load_ref`` as an exact dd product so the load factor's low word
    # reaches the residual (an f32 product would floor the equilibrium
    # at ulp_f32(lam*F) ~ 6e-8).
    arm = [
        dd.dd_add(r_hi[..., :1, i], r_lo[..., :1, i],
                  -r_hi[..., i], -r_lo[..., i])
        for i in range(3)
    ]

    def load3(v):
        if isinstance(v, tuple):
            return (jnp.asarray(v[0], jnp.float32),
                    jnp.asarray(v[1], jnp.float32))
        v = jnp.asarray(v, jnp.float32)
        return v, jnp.zeros_like(v)

    tf_hi, tf_lo = load3(tip_force)
    tm_hi, tm_lo = load3(tip_moment)
    shape = arm[0][0].shape
    f_vec = [(tf_hi[..., i], tf_lo[..., i]) for i in range(3)]
    if cfg.follower:
        # F_world = R(q_tip) F_body at the dd tip rotation (tip = point 0;
        # the dd tier previously ignored `follower` silently).
        f_vec = rod._rotate_dd(q_hi[..., 0, :], q_lo[..., 0, :], f_vec)
    f = [(jnp.broadcast_to(f_vec[i][0][..., None], shape),
          jnp.broadcast_to(f_vec[i][1][..., None], shape))
         for i in range(3)]
    m_world = dd.dd_cross(arm, f)
    m_world = [
        dd.dd_add(*m_world[i],
                  jnp.broadcast_to(tm_hi[..., i][..., None], shape),
                  jnp.broadcast_to(tm_lo[..., i][..., None], shape))
        for i in range(3)
    ]

    w_dist = None
    if cfg.distributed_force is not None:
        # Distributed-load moment in dd: m_dist_i = [(T r)_i - (L-x_i) r_i]
        # x w, with the tail-integral operator T and tail lengths as exact
        # dd constants and the r transport contracted with compensated
        # accumulation (ROADMAP r3: the dd partial-integral transport).
        w_dist = jnp.asarray(cfg.distributed_force, jnp.float32)
        t_hi, t_lo = cfg.partial_integral_dd           # (n, n)
        t_hi, t_lo = jnp.asarray(t_hi), jnp.asarray(t_lo)
        tl_hi, tl_lo = cfg.tail_length_dd              # (n,)
        tl_hi, tl_lo = jnp.asarray(tl_hi), jnp.asarray(tl_lo)
        n_pts = rc.n
        dist_arm = []
        for c in range(3):
            tr = dd.dd_contract_axis(
                t_hi, t_lo,
                r_hi[..., c][..., None, :], r_lo[..., c][..., None, :],
                n_pts)                                  # (..., n)
            lr = dd.dd_mul(tl_hi, tl_lo, r_hi[..., c], r_lo[..., c])
            dist_arm.append(dd.dd_add(*tr, *dd.dd_neg(*lr)))
        wv = [(jnp.broadcast_to(w_dist[c], shape), jnp.zeros(shape, jnp.float32))
              for c in range(3)]
        m_dist = dd.dd_cross(dist_arm, wv)
        m_world = [dd.dd_add(*m_world[i], *m_dist[i]) for i in range(3)]

    # Body-frame transports tau = R^T m (and n = R^T F for na=6).
    r_cols = rod._rot_cols_dd(q_hi, q_lo)
    tau = rod._rt_apply_dd(r_cols, m_world)
    if rc.na == 6:
        f_tot = f
        if w_dist is not None:
            # internal force gains the distributed tail: F + (L - x_i) w.
            f_tot = [
                dd.dd_add(*f[c],
                          *dd.dd_mul_f32(tl_hi, tl_lo, w_dist[c]))
                for c in range(3)
            ]
        tau = tau + rod._rt_apply_dd(r_cols, f_tot)

    # mr = H xi - tau, dd; H is an exact-split f64 constant — either the
    # uniform (na,) law or an (n, na) grid profile (broadcasts over the
    # trailing point axis either way).
    h_hi, h_lo = dd.split_f64(np.asarray(cfg.stiffness, np.float64))
    mr = []
    for a in range(rc.na):
        hk = dd.dd_mul(jnp.asarray(h_hi[..., a]), jnp.asarray(h_lo[..., a]),
                       xi_hi[..., a], xi_lo[..., a])
        mr.append(dd.dd_add(*hk, *dd.dd_neg(*tau[a])))

    # Weak form: res[a, e] = sum_j (w P_e)(x_j) mr[j, a], dd contraction
    # unrolled over the n grid points.
    wp_hi, wp_lo = cfg.weighted_table_dd          # (n, ne)
    return dd.dd_weak_form(wp_hi, wp_lo, mr, rc.ne)


def _pick_tile(b: int, rc: rod.RodConfig):
    """Power-of-two tile covering the batch, capped at the VMEM default.

    Floor of ``128 * rods_per_column``: the packed state's lane dimension
    is ``tile / rpc`` and Mosaic requires lane blocks divisible by 128
    (smaller batches just pad up one tile).
    """
    from ..ops.pallas import rod_kernel as rk

    if rk._is_wide(rc.n - 1):
        return rk.DEFAULT_TILE      # wide layout ignores the tile knob
    _, rpc = rk._packing(rc.n - 1)
    return min(rk.DEFAULT_TILE,
               max(128 * rpc, 1 << (max(b, 1) - 1).bit_length()))


def _fused_full_state(qe, rc: rod.RodConfig, iters, tile, interpret):
    """Full-grid kinematics through the fused Pallas kernel (demo BCs:
    the statics BVP anchors the base at identity/origin)."""
    from ..ops.pallas import rod_kernel as rk

    q, r = rk.rod_shape_fused(qe, cfg=rc, iters=iters, tile=tile,
                              interpret=interpret)
    base_q = jnp.broadcast_to(
        jnp.asarray(rod.DEFAULT_Q_INIT, q.dtype), q.shape[:-2] + (1, 4))
    base_r = jnp.zeros(r.shape[:-2] + (1, 3), r.dtype)
    return (jnp.concatenate([q, base_q], axis=-2),
            jnp.concatenate([r, base_r], axis=-2))


def _fused_state_and_tangents(qe, cfg: StaticsConfig, iters, tile, interpret,
                              jac_iters: int | None = None,
                              jac_precision: str = "high"):
    """Primal full-grid state + its Jacobian-mode tangents d(q, r)/d(qe_j)
    for ALL nq = na*ne strain directions, with the implicit-function rule
    solved on the MXU: ONE fused primal solve plus ONE batched fused
    correction solve (directions stacked into the batch axis) replace the
    nq-chain of differentiated Picard iterations — the kernel-lifted IFT
    (≙ solve_ivp_picard_implicit's rule, ops/collocation.py:243-268).

    ``jac_iters``: Picard count for the direction corrections (default =
    ``iters``).  The stacked correction is ~nq x the base solve's work, and
    Newton tolerates a ~1e-3-grade Jacobian with no extra iterations — a
    reduced count here is the main throughput lever of the batched solver.
    """
    if jac_iters is None:
        jac_iters = iters
    from ..ops import lie
    from ..ops.pallas import rod_kernel as rk

    rc = cfg.rod
    grid = rc.grid
    b, nq = qe.shape
    ne, na = rc.ne, rc.na
    nk = 3 * ne                       # curvature directions (gamma: dM = 0)
    npts = grid.num_unknown

    q_full, r_full = _fused_full_state(qe, rc, iters, tile, interpret)
    q_unk = q_full[..., :npts, :]

    # Direction strain fields are CONSTANT tables: dk_j[p, b] = P_e(x_p)
    # on the (a, e) unit mode.  (nq, npts, na) one-hot-by-component — the
    # einsum output axes must be (a, e, p, b) so the reshape folds (a, e)
    # into the direction index and leaves (point, component) in place.
    table = jnp.asarray(rc.basis_table, jnp.float32)       # (npts, ne)
    eye_a = jnp.eye(na, dtype=jnp.float32)
    dk_dirs = jnp.einsum("ab,pe->aepb", eye_a, table).reshape(nq, npts, na)

    # Quaternion tangents (curvature directions only): A dq = 1/2 A(dK) q.
    dm = 0.5 * lie.quat_skew(dk_dirs[:nk, :, :3])          # (nk, npts, 4, 4)
    rhs = jnp.einsum("jice,bie->jbic", dm, q_unk)          # (nk, B, npts, 4)
    # ``jac_precision='default'`` runs the direction corrections at ONE
    # bf16 MXU pass instead of three: a ~0.4%-grade Jacobian, plenty for
    # Newton (whose error contraction is then ~1e-2/iter) at 2/3 fewer
    # passes on the step's dominant cost block.
    dq_k = rk.picard_correction_fused(
        jnp.tile(qe, (nk, 1)), rhs.reshape(nk * b, npts, 4),
        cfg=rc, iters=jac_iters, tile=tile, interpret=interpret,
        precision=jac_precision,
    ).reshape(nk, b, npts, 4)
    dq_dirs = (jnp.concatenate(
        [dq_k, jnp.zeros((nq - nk, b, npts, 4), dq_k.dtype)], axis=0)
        if nq > nk else dq_k)

    # Position tangents: dr = G db, db from the (pure XLA) tangent map.
    if na == 6:
        gamma = basis_ops.strain_at_points(qe, table)[..., 3:]
        e1 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

        def b_fn(qq, gg):
            return jnp.einsum("...ij,...j->...i", lie.quat_to_rot(qq),
                              e1 + gg)

        dgamma = jnp.broadcast_to(dk_dirs[:, None, :, 3:],
                                  (nq, b, npts, 3))
        db = jax.vmap(
            lambda dqj, dgj: jax.jvp(b_fn, (q_unk, gamma), (dqj, dgj))[1]
        )(dq_dirs, dgamma)
    else:
        db = jax.vmap(
            lambda dqj: jax.jvp(lie.quat_tangent, (q_unk,), (dqj,))[1]
        )(dq_dirs)
    ginv = jnp.asarray(grid.ginv_f32)
    dr_dirs = jnp.einsum("ip,jbpc->jbic", ginv, db, precision="highest")
    return q_full, r_full, dq_dirs, dr_dirs


def _jvp_jacobian(f, qe, q_full, r_full, dq_dirs, dr_dirs):
    """(res, jac) of a pure-XLA residual map from precomputed state
    tangents: ``jac[:, :, j] = jvp(f)`` along strain direction ``e_j`` with
    the matching kinematic tangents (``dq_dirs``/``dr_dirs`` lack the base
    point; it is appended as an exact zero — the base never moves)."""
    nq = qe.shape[-1]
    pad_base = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, 1), (0, 0)))
    dq_full = pad_base(dq_dirs)
    dr_full = pad_base(dr_dirs)
    eye = jnp.eye(nq, dtype=qe.dtype)

    # linearize, not nq jvps: ONE primal evaluation plus nq applications of
    # the (much cheaper) linear map — measured 4x on the res+jac glue.
    res, f_lin = jax.linearize(f, qe, q_full, r_full)

    def dir_tangent(ej, dqj, drj):
        return f_lin(jnp.broadcast_to(ej, qe.shape), dqj, drj)

    dres = jax.vmap(dir_tangent)(eye, dq_full, dr_full)    # (nq, B, nq)
    return res, jnp.moveaxis(dres, 0, -1)                  # (B, nq_out, nq_dir)


def residual_and_jacobian_fused(qe, tip_force, tip_moment,
                                cfg: StaticsConfig, iters: int = 16,
                                tile: int = None, interpret: bool = False,
                                jac_iters: int | None = None,
                                jac_precision: str = "high"):
    """Batched residual + exact per-sample Jacobian on the fused path.

    ``qe (B, nq)`` -> ``(res (B, nq), jac (B, nq, nq))``.  The state
    tangents come from :func:`_fused_state_and_tangents`; the residual map
    itself is pure XLA so its directional derivatives are plain ``jvp``s.
    """
    q_full, r_full, dq_dirs, dr_dirs = _fused_state_and_tangents(
        qe, cfg, iters, tile, interpret, jac_iters, jac_precision)

    def f(qe_, q_, r_):
        return _residual_from_state(qe_, q_, r_, tip_force, tip_moment, cfg)

    return _jvp_jacobian(f, qe, q_full, r_full, dq_dirs, dr_dirs)


def _riks_res_jac_slope_fused(qe, lam, load_refs, moment_refs,
                              cfg: StaticsConfig, iters, tile, interpret):
    """``(res, jac, res_lam)`` at per-sample load factors, from ONE fused
    state+tangent evaluation.

    ``qe (B, nq)``, ``lam (B,)``, ``load_refs``/``moment_refs (B, 1, 3)``.
    The state depends only on ``qe``, so the load slope is two extra
    residual maps on the SAME kinematic state (exact: the residual is
    affine in the load for dead and follower loads alike).
    """
    q_full, r_full, dq_dirs, dr_dirs = _fused_state_and_tangents(
        qe, cfg, iters, tile, interpret)
    tf = lam[:, None, None] * load_refs
    tm = lam[:, None, None] * moment_refs

    def f(qe_, q_, r_):
        return _residual_from_state(qe_, q_, r_, tf, tm, cfg)

    res, jac = _jvp_jacobian(f, qe, q_full, r_full, dq_dirs, dr_dirs)
    res1 = _residual_from_state(qe, q_full, r_full, load_refs, moment_refs,
                                cfg)
    res0 = _residual_from_state(qe, q_full, r_full,
                                jnp.zeros_like(load_refs),
                                jnp.zeros_like(moment_refs), cfg)
    return res, jac, res1 - res0


def solve_statics_batched(tip_force, tip_moment=None,
                          cfg: StaticsConfig = StaticsConfig(), qe0=None,
                          tol: float = 1e-5, max_iter: int = 12,
                          damping: float = 1.0, iters: int = 16,
                          tile: int = None, interpret: bool = False,
                          dd_residual: bool = False, dd_iters: int = 24,
                          refine_steps: int = 2,
                          jac_iters: int = 8,
                          jac_precision: str = "default") -> StaticsSolution:
    """Natively-batched Newton on the fused-kernel path.

    ``tip_force (B, 3)`` -> converged strains ``(B, nq)``.  Unlike
    ``vmap(solve_statics)`` (whose per-sample Picard solves stay XLA,
    ~44k BVP/s on v5e), every inner solve here is a VMEM-resident Pallas
    kernel over the whole batch: one fused solve + one direction-stacked
    fused correction per Newton step.  All samples iterate until the whole
    batch converges (converged samples stop moving via the active mask).

    ``dd_residual=True`` evaluates the convergence residual in double-word
    arithmetic (:func:`equilibrium_residual_dd`) while keeping the f32
    fused Jacobian: Newton's self-correction then drives the TRUE residual
    to ``tol`` as tight as ~1e-9 on f32 hardware (the f32 residual floors
    near 1e-6 from cancellation).

    ``jac_precision='default'`` (the default HERE, unlike the exact-parity
    ``residual_and_jacobian_fused``) runs the direction corrections at one
    bf16 MXU pass: a ~0.4%-grade Jacobian that leaves the iteration count
    unchanged (Newton's contraction is then ~4e-3/iter, far below any
    tol) and buys ~10% step throughput (measured: 1.17M vs 1.06M BVP/s at
    B=16384/n=16).  Pass ``'high'`` to restore bf16x3 Jacobians.
    """
    tip_force = jnp.asarray(tip_force, jnp.float32)
    b = tip_force.shape[0]
    rc = cfg.rod
    nq = rc.na * rc.ne
    if tip_moment is None:
        tip_moment = jnp.zeros(3, jnp.float32)
    tip_moment = jnp.asarray(tip_moment, jnp.float32)
    if qe0 is None:
        qe0 = jnp.zeros((b, nq), jnp.float32)
    qe0 = jnp.asarray(qe0, jnp.float32)
    if tile is None:
        tile = _pick_tile(b, rc)

    # tip loads broadcast to (B, n, 3) inside the residual
    tf = tip_force[:, None, :]
    tm = tip_moment if tip_moment.ndim == 1 else tip_moment[:, None, :]

    def res_jac(qe):
        return residual_and_jacobian_fused(qe, tf, tm, cfg, iters=iters,
                                           tile=tile, interpret=interpret,
                                           jac_iters=jac_iters,
                                           jac_precision=jac_precision)

    from ..ops import doubledouble as dd

    def res_only(qe_pair):
        if dd_residual:
            return equilibrium_residual_dd(qe_pair, tip_force, tip_moment,
                                           cfg, iters=dd_iters,
                                           refine_steps=refine_steps)
        q_full, r_full = _fused_full_state(qe_pair[0], rc, iters, tile,
                                           interpret)
        return _residual_from_state(qe_pair[0], q_full, r_full, tf, tm, cfg)

    def cond(state):
        _, _, k, res, _ = state
        return jnp.logical_and(
            k < max_iter,
            jnp.any(jnp.linalg.norm(res, axis=-1) > tol),
        )

    def body(state):
        # The strain iterate is a dd pair: Newton steps shrink below the
        # f32 ulp of qe (~1e-8 relative) long before tight tolerances.
        qe_hi, qe_lo, k, res, jac = state
        step = smallsolve.gauss_jordan_solve(jac, res)
        active = (jnp.linalg.norm(res, axis=-1) > tol)[..., None]
        step = jnp.where(active, damping * step, 0.0)
        qe_hi, qe_lo = dd.dd_add(qe_hi, qe_lo, -step, jnp.zeros_like(step))
        # ONE fused state+tangents evaluation serves both the next
        # Jacobian and the convergence residual (the dd tier re-evaluates
        # the residual on the dd path — that cancellation is its point).
        res_new, jac_new = res_jac(qe_hi)
        if dd_residual:
            res_new = res_only((qe_hi, qe_lo))
        return qe_hi, qe_lo, k + 1, res_new, jac_new

    qe0_lo = jnp.zeros_like(qe0)
    res0, jac0 = res_jac(qe0)
    if dd_residual:
        res0 = res_only((qe0, qe0_lo))
    qe, qe_lo_out, k, res, _ = jax.lax.while_loop(
        cond, body, (qe0, qe0_lo, jnp.zeros((), jnp.int32), res0, jac0))
    rnorm = jnp.linalg.norm(res, axis=-1)
    return StaticsSolution(qe=qe, iterations=k, residual_norm=rnorm,
                           converged=rnorm <= tol,
                           qe_lo=qe_lo_out if dd_residual else None)


@functools.partial(jax.custom_jvp, nondiff_argnums=(2, 3, 4, 5))
def solve_statics_differentiable(tip_force, tip_moment,
                                 cfg: StaticsConfig = StaticsConfig(),
                                 tol: float = 1e-9, max_iter: int = 30,
                                 iters: int = 24):
    """``(tip_force, tip_moment) -> qe*`` with exact load sensitivities.

    :func:`solve_statics` runs Newton inside ``lax.while_loop`` — not
    differentiable by JAX in either mode.  This wrapper attaches the
    implicit-function rule at the SOLUTION instead of differentiating the
    iteration:

        dqe* = -J^{-1} (d res/d loads) dloads,   J = d res/d qe |_(qe*),

    one linear solve per tangent (and transposable, so ``jax.grad`` through
    functionals of the equilibrium works too — compliance, design
    sensitivities, inverse statics).  Returns only ``qe*``; feed it to
    ``rod.rod_shape`` for differentiable downstream kinematics.
    """
    sol = solve_statics(tip_force, tip_moment, cfg, tol=tol,
                        max_iter=max_iter, iters=iters)
    return sol.qe


@solve_statics_differentiable.defjvp
def _solve_statics_jvp(cfg, tol, max_iter, iters, primals, tangents):
    tip_force, tip_moment = primals
    d_force, d_moment = tangents
    qe = solve_statics_differentiable(tip_force, tip_moment, cfg, tol,
                                      max_iter, iters)

    def res_qe(q):
        return equilibrium_residual(q, tip_force, tip_moment, cfg, iters)

    def res_loads(f, m):
        return equilibrium_residual(qe, f, m, cfg, iters)

    jac = jax.jacfwd(res_qe)(qe)
    _, dres = jax.jvp(res_loads, (tip_force, tip_moment),
                      (d_force, d_moment))
    # Apply J^{-1} as a PRIMAL matrix times the tangent (solve against the
    # identity first): the pivoted elimination itself is not transposable
    # when its rhs carries tangents, a plain matmul is — so jax.grad works
    # through this rule, not just jacfwd.
    nq = qe.shape[-1]
    jinv = smallsolve.gauss_jordan_solve(jac, jnp.eye(nq, dtype=qe.dtype))
    dqe = -jnp.einsum("...ij,...j->...i", jinv, dres)
    return qe, dqe


class ContinuationPath(NamedTuple):
    """Solution path from :func:`arc_length_continuation`.

    ``lambdas (steps,)``, ``qes (steps, nq)``, ``converged (steps,)``.
    A decreasing stretch of ``lambdas`` is the tell-tale of a passed limit
    point (fold) — the regime plain load-stepped Newton cannot traverse.
    """

    lambdas: jnp.ndarray
    qes: jnp.ndarray
    converged: jnp.ndarray


def _riks_machinery(res, nq, dtype, tol, max_corrector, psi):
    """Jitted (tangent, corrector) pair for pseudo-arclength walks.

    ``res(qe, lam) -> (nq,)`` must be affine in ``lam`` (dead and follower
    tip loads both are), so ``d res/d lam = res(qe, 1) - res(qe, 0)``
    exactly.  Shared by :func:`arc_length_continuation` and
    ``bifurcation.switch_branch``.
    """

    def res_lam(qe, lam):
        return res(qe, 1.0) - res(qe, 0.0)

    @jax.jit
    def tangent(qe, lam, t_prev):
        j = jax.jacfwd(res)(qe, lam)
        dqe = smallsolve.gauss_jordan_solve(j, -res_lam(qe, lam))
        t = jnp.concatenate([dqe, jnp.ones(1, dtype)])
        t = t / jnp.sqrt(jnp.sum(dqe * dqe) + psi ** 2)
        # orientation continuity: keep walking the same way along the path
        flip = jnp.sum(t * t_prev) < 0
        return jnp.where(flip, -t, t)

    @jax.jit
    def corrector(x_pred, t):
        def aug(x):
            r = res(x[:nq], x[nq])
            c = jnp.sum(t[:nq] * (x[:nq] - x_pred[:nq])) \
                + psi ** 2 * t[nq] * (x[nq] - x_pred[nq])
            return jnp.concatenate([r, c[None]])

        def cond(state):
            x, k, rn = state
            return jnp.logical_and(k < max_corrector, rn > tol)

        def body(state):
            x, k, _ = state
            j = jax.jacfwd(aug)(x)
            step = smallsolve.gauss_jordan_solve(j, aug(x))
            x = x - step
            return x, k + 1, jnp.linalg.norm(aug(x))

        x, k, rn = jax.lax.while_loop(
            cond, body, (x_pred, jnp.zeros((), jnp.int32),
                         jnp.linalg.norm(aug(x_pred))))
        return x, rn <= tol

    return tangent, corrector


def _riks_walk(tangent, corrector, x, t, ds, steps):
    """Host predictor-corrector loop with adaptive arc steps (halve on
    corrector failure, recover gently after success)."""
    nq = x.shape[0] - 1
    lambdas, qes, conv = [], [], []
    ds_k = ds
    for _ in range(steps):
        ok = False
        for _attempt in range(8):
            x_new, ok_dev = corrector(x + ds_k * t, t)
            ok = bool(ok_dev)
            if ok:
                break
            ds_k *= 0.5
        if ok:
            x = x_new
            t = tangent(x[:nq], x[nq], t)
            ds_k = min(ds, ds_k * 1.5)
        lambdas.append(x[nq])
        qes.append(x[:nq])
        conv.append(jnp.asarray(ok))
    return ContinuationPath(
        lambdas=jnp.stack(lambdas),
        qes=jnp.stack(qes),
        converged=jnp.stack(conv),
    )


def arc_length_continuation(load_ref, cfg: StaticsConfig = StaticsConfig(),
                            tip_moment_ref=(0.0, 0.0, 0.0), qe0=None,
                            ds: float = 0.2, steps: int = 40,
                            tol: float = 1e-8, max_corrector: int = 25,
                            psi: float = 1.0, iters: int = 24,
                            method: str = "picard",
                            lambda_start: float = 0.0,
                            direction: float = 1.0):
    """Riks/arc-length continuation of ``res(qe, lambda * load_ref) = 0``.

    Newton-on-the-augmented-system with the normal-plane (Riks) constraint
    ``t . (x - x_pred) = 0``: the iteration parameterizes the path by arc
    length instead of the load factor, so it walks THROUGH limit points
    where every load-controlled Newton (``solve_statics``,
    ``load_continuation``) necessarily jumps branches or diverges —
    BASELINE config #5's continuation pattern completed for snap-through.
    ``psi`` weights the load-factor component of the arc metric.
    ``direction=-1`` starts the walk with DECREASING load factor (e.g. to
    approach a fold from a high-load anchor on the far branch); after the
    first step, orientation continuity takes over either way.

    Works with dead or ``follower`` loads (``res`` is linear in ``lambda``
    either way, so ``d res/d lambda`` is one extra residual evaluation).
    Single-path (host loop over ``steps``; each corrector is one jitted
    ``lax.while_loop``).  Returns :class:`ContinuationPath`.
    """
    rc = cfg.rod
    nq = rc.na * rc.ne
    load_ref = jnp.asarray(load_ref)
    dtype = load_ref.dtype if load_ref.dtype in (jnp.float32, jnp.float64) \
        else jnp.float32
    load_ref = jnp.asarray(load_ref, dtype)
    tip_moment_ref = jnp.asarray(tip_moment_ref, dtype)
    if qe0 is None:
        qe0 = jnp.zeros(nq, dtype) if cfg.kappa0 is None else jnp.asarray(
            cfg.kappa0, dtype)
    qe0 = jnp.asarray(qe0, dtype)

    def res(qe, lam):
        return equilibrium_residual(qe, lam * load_ref,
                                    lam * tip_moment_ref, cfg, iters, method)

    tangent, corrector = _riks_machinery(res, nq, dtype, tol, max_corrector,
                                         psi)

    # Anchor the path at lambda_start (default 0: the rest state solves
    # res = 0 exactly when qe0 matches kappa0; a mid-branch anchor lets the
    # caller zoom into a fold region with small arc steps).
    sol0 = solve_statics(lambda_start * load_ref, lambda_start * tip_moment_ref,
                         cfg, qe0=qe0, tol=tol, max_iter=max_corrector,
                         iters=iters, method=method)
    x = jnp.concatenate([sol0.qe, jnp.full((1,), lambda_start, dtype)])
    t = tangent(x[:nq], x[nq],
                jnp.zeros(nq + 1, dtype).at[nq].set(float(direction)))
    return _riks_walk(tangent, corrector, x, t, ds, steps)


class BatchedContinuationPath(NamedTuple):
    """Per-sample solution paths from :func:`arc_length_continuation_batched`.

    ``lambdas (steps, B)``, ``qes (steps, B, nq)``, ``converged (steps, B)``.
    A ``False`` in ``converged`` means that sample spent the step halving
    its arc length instead of advancing (its row repeats the previous
    state) — the batched analogue of the host loop's retry.

    With ``monitor_stability=True``, ``det_sign``/``log_abs_det``
    ``(steps, B)`` carry the equilibrium Jacobian's determinant monitors at
    each path point (device-side, from the elimination pivots): a sign
    change between consecutive converged rows brackets a fold or an
    odd-multiplicity branch point — hand those brackets to
    ``bifurcation.detect_critical_points`` for refinement/classification.
    """

    lambdas: jnp.ndarray
    qes: jnp.ndarray
    converged: jnp.ndarray
    det_sign: jnp.ndarray = None
    log_abs_det: jnp.ndarray = None
    qes_lo: jnp.ndarray = None     # dd low words (dd_residual walks)
    lambdas_lo: jnp.ndarray = None


def _batched_riks_engine(load_refs, tip_moment_refs, cfg: StaticsConfig,
                         x, x_lo, t0, keller_init, ds, steps, tol,
                         max_corrector, psi, iters, tile, interpret,
                         monitor_stability, dd_residual, dd_iters,
                         refine_steps) -> BatchedContinuationPath:
    """Shared device-side Riks predictor-corrector scan.

    Drives both :func:`arc_length_continuation_batched` (Keller-bordered
    initial tangent from the anchor, ``keller_init=True``) and
    ``bifurcation.switch_branch_batched`` (the null-vector seed ``t0`` is
    used AS the first tangent — the bordered system is singular exactly at
    a branch-point anchor, so no tangent solve happens there; subsequent
    tangents come from the corrector's bordered matrix at points off the
    singularity, as in the host ``_riks_walk``).
    """
    from ..ops import doubledouble as dd

    b = load_refs.shape[0]
    rc = cfg.rod
    nq = rc.na * rc.ne
    lref = load_refs[:, None, :]
    mref = tip_moment_refs[:, None, :]

    def res_jac_slope(qe, lam):
        return _riks_res_jac_slope_fused(qe, lam, lref, mref, cfg, iters,
                                         tile, interpret)

    def res_dd(x_hi, x_lo_):
        # lam (x) load_ref as an EXACT dd product: collapsing lam to its
        # hi word (or an f32 multiply) would floor the equilibrium's load
        # at ulp_f32(lam*F) ~ 6e-8, defeating 1e-9-class tolerances.
        tf = dd.dd_mul_f32(x_hi[:, nq:], x_lo_[:, nq:], load_refs)
        tm = dd.dd_mul_f32(x_hi[:, nq:], x_lo_[:, nq:], tip_moment_refs)
        return equilibrium_residual_dd(
            (x_hi[:, :nq], x_lo_[:, :nq]), tf, tm,
            cfg, iters=dd_iters, refine_steps=refine_steps)

    def tangent(x_, t_prev):
        # Keller bordering: [J, res_lam; t_prev-row] t = e_last.  Unlike
        # the plain solve J dqe = -res_lam (which the host f64 walker
        # uses), the bordered system stays well-conditioned THROUGH folds
        # — essential in f32, where the near-singular J solve turns the
        # tangent to noise just where the path needs it most — and
        # t_prev . t = 1 > 0 preserves orientation with no flip logic.
        _, jac, res_lam = res_jac_slope(x_[:, :nq], x_[:, nq])
        top = jnp.concatenate([jac, res_lam[:, :, None]], axis=2)
        border = jnp.concatenate(
            [t_prev[:, None, :nq],
             (psi ** 2 * t_prev[:, nq])[:, None, None]], axis=2)
        a = jnp.concatenate([top, border], axis=1)   # (B, nq+1, nq+1)
        rhs = jnp.zeros((b, nq + 1), jnp.float32).at[:, nq].set(1.0)
        t = smallsolve.gauss_jordan_solve(a, rhs)
        norm = jnp.sqrt(jnp.sum(t[:, :nq] ** 2, axis=1)
                        + psi ** 2 * t[:, nq] ** 2)
        return t / norm[:, None], jac

    def aug_and_jac(x_pair, x_pred_pair, t):
        x_hi, x_lo_ = x_pair
        qe = x_hi[:, :nq]
        lam = x_hi[:, nq] + x_lo_[:, nq]
        res, jac, res_lam = res_jac_slope(qe, lam)
        if dd_residual:
            # The fused-path f32 residual comes free with the Jacobian but
            # floors near 1e-5; the dd evaluation replaces it so the
            # corrector's convergence test sees the TRUE residual.
            res = res_dd(x_hi, x_lo_)
        # Arc constraint on dd-centered differences: the hi-word difference
        # of close iterates is near-exact (Sterbenz), the lo words carry
        # the sub-ulp remainder.
        dx = (x_hi - x_pred_pair[0]) + (x_lo_ - x_pred_pair[1])
        c = (jnp.sum(t[:, :nq] * dx[:, :nq], axis=1)
             + psi ** 2 * t[:, nq] * dx[:, nq])
        aug = jnp.concatenate([res, c[:, None]], axis=1)      # (B, nq+1)
        top = jnp.concatenate([jac, res_lam[:, :, None]], axis=2)
        bottom = jnp.concatenate(
            [t[:, None, :nq], (psi ** 2 * t[:, nq])[:, None, None]], axis=2)
        return aug, jnp.concatenate([top, bottom], axis=1)    # (B, nq+1, nq+1)

    def corrector(x_pred_pair, t):
        aug0, jac0 = aug_and_jac(x_pred_pair, x_pred_pair, t)

        def cond(state):
            _, _, k, aug, _ = state
            return jnp.logical_and(
                k < max_corrector,
                jnp.any(jnp.linalg.norm(aug, axis=1) > tol))

        def body(state):
            x_hi, x_lo_, k, aug, jac_aug = state
            step = smallsolve.gauss_jordan_solve(jac_aug, aug)
            active = (jnp.linalg.norm(aug, axis=1) > tol)[:, None]
            step = jnp.where(active, step, 0.0)
            # dd update: Newton steps shrink below the f32 ulp of x long
            # before dd-grade tolerances bind.
            x_hi, x_lo_ = dd.dd_add(x_hi, x_lo_, -step,
                                    jnp.zeros_like(step))
            aug, jac_aug = aug_and_jac((x_hi, x_lo_), x_pred_pair, t)
            return x_hi, x_lo_, k + 1, aug, jac_aug

        x_hi, x_lo_, _, aug, jac_aug = jax.lax.while_loop(
            cond, body, (x_pred_pair[0], x_pred_pair[1],
                         jnp.zeros((), jnp.int32), aug0, jac0))
        return (x_hi, x_lo_), jnp.linalg.norm(aug, axis=1) <= tol, jac_aug

    t = tangent(x, t0)[0] if keller_init else t0

    def monitors(jac):
        if not monitor_stability:
            return (jnp.zeros((b,), jnp.float32),) * 2
        return smallsolve.det_sign_logabs(jac)

    def walk(state, _):
        x_hi, x_lo_, t, ds_k = state
        p_hi, p_lo = dd.dd_add(x_hi, x_lo_, ds_k[:, None] * t,
                               jnp.zeros_like(t))
        (n_hi, n_lo), ok, jac_aug = corrector((p_hi, p_lo), t)
        x_hi = jnp.where(ok[:, None], n_hi, x_hi)
        x_lo_ = jnp.where(ok[:, None], n_lo, x_lo_)
        # Keller tangent straight from the corrector's final bordered
        # matrix (its border row IS the previous tangent, and it was
        # assembled at the returned x) — this reuse saves the standalone
        # fused state+tangent evaluation per step, ~1/3 of the walk cost.
        rhs = jnp.zeros((b, nq + 1), jnp.float32).at[:, nq].set(1.0)
        t_cand = smallsolve.gauss_jordan_solve(jac_aug, rhs)
        norm = jnp.sqrt(jnp.sum(t_cand[:, :nq] ** 2, axis=1)
                        + psi ** 2 * t_cand[:, nq] ** 2)
        t = jnp.where(ok[:, None], t_cand / norm[:, None], t)
        ds_k = jnp.where(ok, jnp.minimum(ds, ds_k * 1.5), ds_k * 0.5)
        sign, logabs = monitors(jac_aug[:, :nq, :nq])
        return (x_hi, x_lo_, t, ds_k), (x_hi[:, nq], x_hi[:, :nq], ok, sign,
                                        logabs, x_lo_[:, nq], x_lo_[:, :nq])

    _, (lambdas, qes, conv, signs, logdets, lam_lo, qes_lo) = jax.lax.scan(
        walk, (x, x_lo, t, jnp.full((b,), ds, jnp.float32)), None,
        length=steps)
    out = {}
    if monitor_stability:
        out.update(det_sign=signs, log_abs_det=logdets)
    if dd_residual:
        out.update(qes_lo=qes_lo, lambdas_lo=lam_lo)
    return BatchedContinuationPath(lambdas=lambdas, qes=qes, converged=conv,
                                   **out)


def arc_length_continuation_batched(load_refs,
                                    cfg: StaticsConfig = StaticsConfig(),
                                    tip_moment_refs=None, qe0=None,
                                    lambda_start=0.0, ds: float = 0.2,
                                    steps: int = 40, tol: float = 2e-5,
                                    max_corrector: int = 10,
                                    psi: float = 1.0, iters: int = 16,
                                    tile: int = None,
                                    interpret: bool = False,
                                    direction: float = 1.0,
                                    monitor_stability: bool = False,
                                    dd_residual: bool = False,
                                    dd_iters: int = 24,
                                    refine_steps: int = 2,
                                    ) -> BatchedContinuationPath:
    """Device-batched Riks continuation over a FAMILY of load rays.

    ``load_refs (B, 3)`` -> per-sample arc-length paths, entirely on
    device: every corrector iterate is ONE fused-kernel state solve + one
    direction-stacked correction over the whole batch
    (:func:`_riks_res_jac_slope_fused`), the augmented ``(nq+1)``-systems
    solve on the VPU (``ops/smallsolve``), and the outer walk is a
    ``lax.scan`` — the batched analogue of :func:`arc_length_continuation`
    (which loops on the host, one path at a time, in f64).

    Plain f32 corrector: use ``tol`` ~1e-4..2e-5 (the f32 residual floors
    near 1e-5 from O(1) cancellation).  ``dd_residual=True`` carries the
    iterate as a double-word pair through the scan and evaluates the
    corrector residual with :func:`equilibrium_residual_dd` (the f32 fused
    Jacobian stays — Newton's self-correction does the rest): ``tol`` down
    to ~1e-9 becomes meaningful, putting batched fold localization at the
    same grade as the host f64 walker (one dd residual evaluation per
    corrector iterate on top of the fused state+tangents, ~2x).  The dd
    path points come back in ``qes_lo`` / ``lambdas_lo``.

    ``lambda_start`` may be a scalar or ``(B,)``; the anchor states are
    converged with load-controlled batched Newton before the walk.  Each
    scan step is one predictor+corrector attempt per sample: failures
    halve that sample's arc length and repeat its state in the output row
    (``converged[k, b] = False``), successes advance and relax the step
    back toward ``ds``.
    """
    load_refs = jnp.asarray(load_refs, jnp.float32)
    b = load_refs.shape[0]
    rc = cfg.rod
    nq = rc.na * rc.ne
    if tip_moment_refs is None:
        tip_moment_refs = jnp.zeros_like(load_refs)
    tip_moment_refs = jnp.broadcast_to(
        jnp.asarray(tip_moment_refs, jnp.float32), (b, 3))
    lam0 = jnp.broadcast_to(jnp.asarray(lambda_start, jnp.float32), (b,))
    if tile is None:
        tile = _pick_tile(b, rc)

    # Anchor: load-controlled batched Newton at lambda_start.
    anchor = solve_statics_batched(
        lam0[:, None] * load_refs, lam0[:, None] * tip_moment_refs, cfg=cfg,
        qe0=qe0, tol=tol, max_iter=max_corrector, iters=iters, tile=tile,
        interpret=interpret, dd_residual=dd_residual, dd_iters=dd_iters,
        refine_steps=refine_steps)
    x = jnp.concatenate([anchor.qe, lam0[:, None]], axis=1)   # (B, nq+1)
    x_lo = jnp.zeros_like(x)
    if dd_residual and anchor.qe_lo is not None:
        x_lo = x_lo.at[:, :nq].set(anchor.qe_lo)

    t0 = jnp.zeros((b, nq + 1), jnp.float32).at[:, nq].set(
        jnp.float32(direction))
    return _batched_riks_engine(
        load_refs, tip_moment_refs, cfg, x, x_lo, t0, True, ds, steps, tol,
        max_corrector, psi, iters, tile, interpret, monitor_stability,
        dd_residual, dd_iters, refine_steps)


def load_continuation(tip_forces, tip_moments=None,
                      cfg: StaticsConfig = StaticsConfig(), qe0=None,
                      **newton_kwargs):
    """Sweep a schedule of loads, warm-starting each Newton solve from the
    previous converged strain (BASELINE config #5 continuation pattern).

    ``tip_forces``: ``(num_steps, 3)``; returns a list of
    :class:`StaticsSolution`.  The Newton solve is jitted ONCE with the load
    and warm start as arguments and reused across the whole schedule.
    """
    tip_forces = jnp.asarray(tip_forces)
    if tip_moments is None:
        tip_moments = jnp.zeros_like(tip_forces)
    nq = cfg.rod.na * cfg.rod.ne
    if qe0 is None:
        qe0 = jnp.zeros(tip_forces.shape[1:-1] + (nq,), tip_forces.dtype)

    step = jax.jit(
        lambda f, m, q0: solve_statics(f, m, cfg, qe0=q0, **newton_kwargs)
    )
    sols = []
    qe = jnp.asarray(qe0, tip_forces.dtype)
    for i in range(tip_forces.shape[0]):
        sol = step(tip_forces[i], tip_moments[i], qe)
        sols.append(sol)
        qe = sol.qe
    return sols
