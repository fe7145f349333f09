"""Constrained-tip BVPs and platform-coupled parallel continuum robots.

The reference integrates a single cantilever initial-value problem
(`/root/reference/main.cpp:91-176`): base clamped, tip free.  The
strain-parameterized Cosserat machinery this package builds around it
(rod_modeling.pdf ch. 1-2) is the standard model for PARALLEL continuum
robots — several flexible legs joined to a rigid platform — where the tip
of every leg carries an unknown reaction wrench and a pose constraint
instead of a prescribed load.  This module adds that class of problems
TPU-natively on top of the Lagrangian balance of :mod:`.dynamics`:

* :func:`solve_tip_constrained` — one rod, tip position and/or
  orientation prescribed; unknowns ``[qe, reaction wrench]``, solved by
  the same batched damped Newton as the contact statics
  (:func:`.dynamics.damped_newton`).
* :class:`PlatformRobot` / :func:`solve_platform` — R legs with posed
  bases, a rigid platform gripping every tip; unknowns
  ``[qe_1..qe_R, wrench_1..wrench_R, platform pose]``, equations = per-leg
  balances + 6R grip constraints + the platform's rigid-body equilibrium.

**Variational structure.**  A pose constraint ``c(qe) = 0`` at the tip
joins the balance through its multiplier: the stationarity of
``V(qe) + w . c(qe)`` is ``Q(qe) + (dc/dqe)^T w = 0``.  For the position
constraint ``(dc/dqe)^T w`` is *exactly* the generalized force of a tip
point force ``w`` — the same ``J_tip^T f`` term `_mass_and_rhs` already
assembles — and for the orientation constraint it is the tip-couple
pullback, so the constrained residual is just the EXISTING balance
evaluated at ``tip_force/tip_moment = applied + reaction`` stacked with
``c(qe)``.  No new force assembly; the multipliers ARE the physical
reactions at the converged point (gated on the propped-cantilever
``3qL/8`` and fixed-fixed ``qL^2/12`` closed forms).

Frames: each leg is solved in its own base frame (base clamped at the
local origin, the convention of the whole statics stack).  Reaction
forces are carried in the LEG frame (the ``tip_force`` convention);
reaction couples in the TIP BODY frame (the ``tip_moment`` pairing —
``_omega_from_dq`` is the body angular-velocity map).  The platform
equations transport both to the world frame.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie, smallsolve
from . import dynamics as dyn

__all__ = [
    "TipConstrainedSolution",
    "solve_tip_constrained",
    "PlatformRobot",
    "PlatformSolution",
    "solve_platform",
    "PlatformStability",
    "platform_stability",
    "platform_critical_load",
    "PlatformIKSolution",
    "platform_ik",
]


def _quat_exp(phi):
    """Unit quaternion of a rotation vector ``phi (..., 3)`` —
    ``(cos|phi|/2, sinc(|phi|/2) phi/2)``.

    AD-smooth at ``phi = 0`` (the Newton INITIAL point of every platform
    solve): the norm's ``sqrt`` has no tangent there, so both branches of
    the classic double-``where`` get a safe input and the small-angle
    side uses the Taylor forms (O(a^4) error, below f64 at the 1e-12
    switch) — a bare ``jnp.linalg.norm`` here NaNs the whole KKT
    Jacobian on the first iteration.
    """
    half = 0.5 * jnp.asarray(phi)
    a2 = jnp.sum(half * half, axis=-1)
    small = a2 < 1e-12
    a = jnp.sqrt(jnp.where(small, 1.0, a2))
    w = jnp.where(small, 1.0 - a2 / 2.0, jnp.cos(a))
    s = jnp.where(small, 1.0 - a2 / 6.0, jnp.sin(a) / a)
    return jnp.concatenate([w[..., None], s[..., None] * half], axis=-1)


class TipConstrainedSolution(NamedTuple):
    qe: jnp.ndarray               # (..., nq)
    reaction_force: jnp.ndarray   # (..., 3) leg-frame force on the tip
    reaction_moment: jnp.ndarray  # (..., 3) tip-body-frame couple (or 0)
    residual_norm: jnp.ndarray    # (...,) full KKT residual norm
    iterations: jnp.ndarray       # scalar
    converged: jnp.ndarray        # (...,)


def _rot_error(q_tip, q_target):
    """3-vector orientation-error chart ``2 vec(q_target^* x q_tip)`` —
    zero iff the tip frame matches the target (up to quaternion sign;
    near the target it is the body-frame rotation vector)."""
    return 2.0 * lie.quat_multiply(
        lie.quat_conjugate(q_target), lie.quat_normalize(q_tip))[..., 1:]


def solve_tip_constrained(cfg: dyn.DynamicsConfig, tip_position=None,
                          tip_quaternion=None, tip_axes: tuple | None = None,
                          qe0=None, w0=None,
                          tip_force=None, tip_moment=None, tension=None,
                          tol: float = 1e-9, max_iter: int = 40,
                          iters: int = 16,
                          line_search: bool = True
                          ) -> TipConstrainedSolution:
    """Static equilibrium with the TIP POSE (partially) prescribed.

    ``tip_position (..., 3)`` pins the tip point (a prop / pivot /
    spherical joint — 3 constraints, a reaction FORCE unknown);
    ``tip_quaternion (..., 4)`` pins the tip frame (a clamp — 3 more
    constraints, a reaction COUPLE unknown); give both for a welded tip.
    ``tip_axes`` restricts the position constraint to a subset of leg-frame
    axes (a roller / guide: ``(1, 2)`` props the tip transversally and
    leaves it free to slide axially).  NOTE the inextensible Kirchhoff rod
    (na = 3) makes the AXIAL pin of a straight rod singular — the axial
    reaction of a rigid chain is statically indeterminate (dc_x/dqe = 0
    at the straight state), exactly as in classical frame analysis.  Pin
    all 3 axes only on extensible legs (na = 6) or pre-bent states; use
    ``tip_axes`` otherwise.
    ``tip_force``/``tip_moment``/``tension``/gravity/contacts are the
    usual APPLIED loads and ride along unchanged — the reaction adds to
    them.  Batched over leading axes of the targets / ``qe0``; the
    returned reactions follow the load conventions (leg-frame force,
    tip-body-frame couple).

    Newton on the KKT system ``[Q(qe) + J^T w, c(qe)] = 0`` with the
    exact coupled Jacobian (linearize over the ``nq + nc`` unit
    directions) — quadratic convergence through the bordered block, no
    alternating projection.
    """
    if tip_position is None and tip_quaternion is None:
        raise ValueError("prescribe tip_position, tip_quaternion, or both")
    nq = cfg.nq
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    has_pos = tip_position is not None
    has_rot = tip_quaternion is not None
    if tip_axes is None:
        tip_axes = (0, 1, 2)
    axes = tuple(int(a) for a in tip_axes)
    np_ax = len(axes) if has_pos else 0
    # (3, np_ax) selection: w_pos -> leg-frame reaction force.
    sel = np.zeros((3, max(np_ax, 1)))
    for i, a in enumerate(axes[:np_ax] if has_pos else ()):
        sel[a, i] = 1.0
    sel_j = jnp.asarray(sel, dtype)
    nc = np_ax + 3 * has_rot
    p_t = None if not has_pos else jnp.asarray(tip_position, dtype)
    q_t = None if not has_rot else jnp.asarray(tip_quaternion, dtype)
    batch = jnp.broadcast_shapes(
        () if qe0 is None else jnp.asarray(qe0).shape[:-1],
        () if not has_pos else p_t.shape[:-1],
        () if not has_rot else q_t.shape[:-1])
    if qe0 is None:
        qe0 = jnp.broadcast_to(
            jnp.asarray(cfg.kappa0_modes, dtype), batch + (nq,))
    qe0 = jnp.asarray(qe0, dtype)
    if w0 is None:
        w0 = jnp.zeros(batch + (nc,), dtype)
    z0 = jnp.concatenate(
        [jnp.broadcast_to(qe0, batch + (nq,)),
         jnp.asarray(w0, dtype)], axis=-1)

    def residual(z):
        qe, w = z[..., :nq], z[..., nq:]
        f = jnp.einsum("ck,...k->...c", sel_j,
                       w[..., :np_ax]) if has_pos else None
        m = w[..., np_ax:] if has_rot else None
        if tip_force is not None:
            add = jnp.asarray(tip_force, z.dtype)
            f = add if f is None else f + add
        if tip_moment is not None:
            add = jnp.asarray(tip_moment, z.dtype)
            m = add if m is None else m + add
        _, rhs = dyn._mass_and_rhs(qe, jnp.zeros_like(qe), cfg, f, iters,
                                   m, tension=tension, static_only=True)
        r, q = cfg.state_full(qe, iters)   # CSEd with _mass_and_rhs's solve
        cons = []
        if has_pos:
            cons.append(jnp.einsum(
                "ck,...c->...k", sel_j, r[..., 0, :] - p_t))
        if has_rot:
            cons.append(_rot_error(q[..., 0, :], q_t))
        return jnp.concatenate([rhs] + cons, axis=-1)

    z, k, res = dyn.damped_newton(residual, z0, tol=tol, max_iter=max_iter,
                                  line_search=line_search)
    rn = jnp.linalg.norm(res, axis=-1)
    w = z[..., nq:]
    zero3 = jnp.zeros(batch + (3,), dtype)
    return TipConstrainedSolution(
        qe=z[..., :nq],
        reaction_force=(jnp.einsum("ck,...k->...c", sel_j, w[..., :np_ax])
                        if has_pos else zero3),
        reaction_moment=w[..., np_ax:] if has_rot else zero3,
        residual_norm=rn, iterations=k, converged=rn <= tol)


@dataclass(frozen=True)
class PlatformRobot:
    """R flexible legs gripping one rigid platform (a parallel continuum
    robot in the Stewart-platform topology).

    All legs share ``cfg`` (one rod geometry/constitutive law — the usual
    PCR build; na = 6 extensible legs recommended: an INEXTENSIBLE leg
    welded at both ends has statically indeterminate axial force, see
    :func:`solve_tip_constrained`).  ``base_positions``/
    ``base_quaternions`` pose each leg's clamped base in the world frame
    (local -> world); each leg is solved in its own base frame, the
    platform equations in the world frame.  ``attach_points`` are the
    PLATFORM-frame grip offsets; ``attach_quaternions`` the platform ->
    tip-frame grip rotations, defaulting to the base quaternions so the
    straight-leg assembly at identity platform pose is an exact
    zero-load equilibrium.  ``gravity`` (world) loads the legs (the
    shared ``cfg.gravity`` must then be None — it would be base-frame
    ambiguous) and, with ``platform_mass``, the platform itself.

    Frozen/hashable: a valid jit static argument.
    """

    cfg: dyn.DynamicsConfig
    base_positions: tuple
    base_quaternions: tuple
    attach_points: tuple
    attach_quaternions: tuple | None = None
    gravity: tuple | None = None
    platform_mass: float = 0.0

    @functools.cached_property
    def num_legs(self) -> int:
        return len(self.base_positions)

    def _tables(self):
        """Host f64 constants: base poses, grips, per-leg local gravity."""
        r = self.num_legs
        pb = np.asarray(self.base_positions, np.float64)
        qb = np.asarray(self.base_quaternions, np.float64)
        qb = qb / np.linalg.norm(qb, axis=-1, keepdims=True)
        att = np.asarray(self.attach_points, np.float64)
        if self.attach_quaternions is None:
            grip = qb.copy()
        else:
            grip = np.asarray(self.attach_quaternions, np.float64)
            grip = grip / np.linalg.norm(grip, axis=-1, keepdims=True)
        for name, arr, shape in (("base_positions", pb, (r, 3)),
                                 ("base_quaternions", qb, (r, 4)),
                                 ("attach_points", att, (r, 3)),
                                 ("attach_quaternions", grip, (r, 4))):
            if arr.shape != shape:
                raise ValueError(f"{name} has shape {arr.shape}, "
                                 f"need {shape}")
        if self.gravity is not None and self.cfg.gravity is not None:
            raise ValueError("set gravity on the PlatformRobot (world "
                             "frame), not on the shared leg cfg")
        g_loc = None
        if self.gravity is not None:
            # World gravity in each leg's base frame — host numpy (this
            # runs inside shard_map traces): inverse rotation = rotation
            # by the conjugate quaternion.
            g_w = np.asarray(self.gravity, np.float64)
            u, qw = -qb[:, 1:], qb[:, :1]                # (R, 3), (R, 1)
            g_loc = (g_w + 2.0 * qw * np.cross(u, g_w)
                     + 2.0 * np.cross(u, np.cross(u, g_w)))  # (R, 3)
        return pb, qb, att, grip, g_loc


class PlatformSolution(NamedTuple):
    qe: jnp.ndarray                 # (..., R, nq) per-leg strain modes
    platform_position: jnp.ndarray  # (..., 3) world
    platform_quaternion: jnp.ndarray  # (..., 4) world
    reaction_force: jnp.ndarray     # (..., R, 3) WORLD force platform->tip
    reaction_moment: jnp.ndarray    # (..., R, 3) WORLD couple platform->tip
    residual_norm: jnp.ndarray      # (...,)
    iterations: jnp.ndarray
    converged: jnp.ndarray          # (...,)


def solve_platform(robot: PlatformRobot, platform_force=None,
                   platform_moment=None, tension=None, pose0=None,
                   qe0=None, tol: float = 1e-9, max_iter: int = 60,
                   iters: int = 16, line_search: bool = True
                   ) -> PlatformSolution:
    """Coupled equilibrium of a parallel continuum robot.

    Unknowns ``z = [qe (R nq), wrench (6R), platform pose (6)]`` — the
    pose as world position + world rotation vector about ``pose0``
    (default: the straight-leg assembly pose implied by leg 0's tip).
    Equations: per-leg Lagrangian balances WITH the grip reactions
    (:func:`.dynamics._mass_and_rhs`, all legs in one batched call — the
    R axis is just a batch axis of the shared cfg), 6R grip pose
    constraints, and the platform's rigid-body force/moment balance under
    ``platform_force``/``platform_moment`` (world frame, applied at the
    platform origin), platform weight, and the grip reactions.

    Batched over leading axes of the applied wrench / ``pose0`` /
    ``qe0`` — a whole workspace map solves in one device call.  Wrench
    multipliers live in the leg frames (force) / tip body frames
    (couple) — the `_mass_and_rhs` conventions — and are transported to
    world both inside the platform equations and in the returned
    reactions.
    """
    residual, unpack, z0, _ = _platform_system(
        robot, platform_force, platform_moment, tension, pose0, qe0, iters)
    z, k, res = dyn.damped_newton(residual, z0, tol=tol, max_iter=max_iter,
                                  line_search=line_search)
    return _platform_solution(robot, z, k, res, unpack, tol, iters)


def _platform_solution(robot, z, k, res, unpack, tol, iters):
    cfg = robot.cfg
    dtype = z.dtype
    qb_j = jnp.asarray(np.asarray(robot.base_quaternions, np.float64)
                       / np.linalg.norm(robot.base_quaternions, axis=-1,
                                        keepdims=True), dtype)
    rn = jnp.linalg.norm(res, axis=-1)
    qe, w, p, q_plat = unpack(z)
    _, q_full = cfg.state_full(qe, iters)
    qtip_w = lie.quat_multiply(qb_j, q_full[..., 0, :])
    return PlatformSolution(
        qe=qe, platform_position=p, platform_quaternion=q_plat,
        reaction_force=lie.quat_rotate_normalized(qb_j, w[..., :3]),
        reaction_moment=lie.quat_rotate_normalized(qtip_w, w[..., 3:]),
        residual_norm=rn, iterations=k, converged=rn <= tol)


def _platform_system(robot: PlatformRobot, platform_force, platform_moment,
                     tension, pose0, qe0, iters):
    """Shared system builder: ``(residual, unpack, z0, batch)`` for the
    coupled PCR unknowns ``z = [qe (R nq), wrench (6R), pose (6)]`` —
    used by :func:`solve_platform` and the stability tools."""
    cfg = robot.cfg
    r_legs, nq = robot.num_legs, cfg.nq
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    pb, qb, att, grip, g_loc = robot._tables()
    pb_j, qb_j = jnp.asarray(pb, dtype), jnp.asarray(qb, dtype)
    att_j, grip_j = jnp.asarray(att, dtype), jnp.asarray(grip, dtype)

    f_ext = (jnp.zeros(3, dtype) if platform_force is None
             else jnp.asarray(platform_force, dtype))
    m_ext = (jnp.zeros(3, dtype) if platform_moment is None
             else jnp.asarray(platform_moment, dtype))
    if robot.gravity is not None and robot.platform_mass:
        f_ext = f_ext + robot.platform_mass * jnp.asarray(
            robot.gravity, dtype)

    if pose0 is None:
        # Straight-leg assembly: platform origin such that attachment 0
        # lands on leg 0's undeformed tip, identity orientation.  Pure
        # host numpy — this runs inside shard_map traces, where a device
        # round-trip would be a TracerArrayConversionError.
        v = np.asarray([cfg.rod.length, 0.0, 0.0])
        u, qw = qb[0, 1:], qb[0, 0]
        tip0 = pb[0] + v + 2.0 * qw * np.cross(u, v) + 2.0 * np.cross(
            u, np.cross(u, v))
        p0 = jnp.asarray(tip0 - att[0], dtype)
        q0 = jnp.asarray([1.0, 0.0, 0.0, 0.0], dtype)
    else:
        p0 = jnp.asarray(pose0[0], dtype)
        q0 = lie.quat_normalize(jnp.asarray(pose0[1], dtype))

    batch = jnp.broadcast_shapes(
        f_ext.shape[:-1], m_ext.shape[:-1], p0.shape[:-1],
        () if qe0 is None else jnp.asarray(qe0).shape[:-2])
    if qe0 is None:
        qe0 = jnp.broadcast_to(jnp.asarray(cfg.kappa0_modes, dtype),
                               batch + (r_legs, nq))
    qe0 = jnp.broadcast_to(jnp.asarray(qe0, dtype), batch + (r_legs, nq))
    z0 = jnp.concatenate([
        qe0.reshape(batch + (r_legs * nq,)),
        jnp.zeros(batch + (6 * r_legs + 6,), dtype)], axis=-1)

    extra = None if g_loc is None else jnp.asarray(g_loc, dtype)

    def unpack(z):
        b = z.shape[:-1]
        qe = z[..., :r_legs * nq].reshape(b + (r_legs, nq))
        w = z[..., r_legs * nq:r_legs * (nq + 6)].reshape(b + (r_legs, 6))
        p = p0 + z[..., -6:-3]
        q_plat = lie.quat_multiply(_quat_exp(z[..., -3:]), q0)
        return qe, w, p, q_plat

    def residual(z):
        qe, w, p, q_plat = unpack(z)
        f_leg, m_body = w[..., :3], w[..., 3:]
        # Per-leg balances: the R axis rides as a batch axis.
        _, rhs = dyn._mass_and_rhs(qe, jnp.zeros_like(qe), cfg, f_leg,
                                   iters, m_body, extra_accel=extra,
                                   tension=tension, static_only=True)
        r_full, q_full = cfg.state_full(qe, iters)       # CSEd with above
        tip_loc, qtip_loc = r_full[..., 0, :], q_full[..., 0, :]
        # World tip poses and targets.
        tip_w = pb_j + lie.quat_rotate_normalized(qb_j, tip_loc)
        qtip_w = lie.quat_multiply(qb_j, qtip_loc)
        tgt_p = p[..., None, :] + lie.quat_rotate_normalized(
            q_plat[..., None, :], att_j)
        tgt_q = lie.quat_multiply(q_plat[..., None, :], grip_j)
        c_pos = tip_w - tgt_p                            # (..., R, 3)
        c_rot = _rot_error(qtip_w, tgt_q)                # (..., R, 3)
        # Platform rigid-body balance (world, moments about p).
        f_w = lie.quat_rotate_normalized(qb_j, f_leg)
        m_w = lie.quat_rotate_normalized(qtip_w, m_body)
        f_bal = f_ext - jnp.sum(f_w, axis=-2)
        arm = tip_w - p[..., None, :]
        m_bal = m_ext - jnp.sum(m_w + jnp.cross(arm, f_w), axis=-2)
        b = z.shape[:-1]
        return jnp.concatenate([
            rhs.reshape(b + (r_legs * nq,)),
            jnp.concatenate([c_pos, c_rot], axis=-1
                            ).reshape(b + (6 * r_legs,)),
            f_bal, m_bal], axis=-1)

    return residual, unpack, z0, batch


class PlatformStability(NamedTuple):
    eig_max: jnp.ndarray      # (...,) largest reduced force-Jacobian eig
    stable: jnp.ndarray       # (...,) eig_max < 0
    solution: "PlatformSolution"


def platform_stability(robot: PlatformRobot, platform_force=None,
                       platform_moment=None, tension=None, pose0=None,
                       qe0=None, tol: float = 1e-9, max_iter: int = 60,
                       iters: int = 16, line_search: bool = True
                       ) -> PlatformStability:
    """Equilibrium + stability of a parallel continuum robot.

    Stability of a CONSTRAINED conservative system: the equilibrium is
    stable iff the energy Hessian is positive definite ON THE CONSTRAINT
    TANGENT SPACE — equivalently the force Jacobian ``A = d(primal
    rows)/d(primal vars)`` (primal = ``[qe..., pose]``, multipliers held
    at their equilibrium values; the ``w . d2c`` geometric term included
    by AD) is negative definite on ``null(dc/dx)``.  Both blocks are
    read off ONE linearization of the same residual the Newton solve
    uses; the null basis comes from a full SVD of the constraint block
    and ``eig_max`` is the largest eigenvalue of the symmetrized reduced
    Jacobian — the equilibrium buckles when it crosses zero.  Batched
    over leading axes like :func:`solve_platform` (batched SVD/eigh).
    """
    residual, unpack, z0, batch = _platform_system(
        robot, platform_force, platform_moment, tension, pose0, qe0, iters)
    z, k, res = dyn.damped_newton(residual, z0, tol=tol, max_iter=max_iter,
                                  line_search=line_search)
    r_legs, nq = robot.num_legs, robot.cfg.nq
    m = r_legs * nq + 6 * r_legs + 6
    _, f_lin = jax.linearize(residual, z)
    cols = jax.vmap(lambda e: f_lin(jnp.broadcast_to(e, z.shape)))(
        jnp.eye(m, dtype=z.dtype))
    jac = jnp.moveaxis(cols, 0, -1)                    # (..., m, m)
    prim = np.concatenate([np.arange(r_legs * nq),
                           np.arange(m - 6, m)])       # qe rows/cols + pose
    cons = np.arange(r_legs * nq, r_legs * nq + 6 * r_legs)
    a_blk = jac[..., prim[:, None], prim[None, :]]     # (..., P, P)
    c_blk = jac[..., cons[:, None], prim[None, :]]     # (..., 6R, P)
    _, _, vh = jnp.linalg.svd(c_blk, full_matrices=True)
    z_basis = vh[..., 6 * r_legs:, :]                  # (..., P-6R, P)
    red = jnp.einsum("...ip,...pq,...jq->...ij", z_basis, a_blk, z_basis)
    red = 0.5 * (red + jnp.swapaxes(red, -1, -2))
    eig_max = jnp.linalg.eigvalsh(red)[..., -1]
    sol = _platform_solution(robot, z, k, res, unpack, tol, iters)
    return PlatformStability(eig_max=eig_max, stable=eig_max < 0.0,
                             solution=sol)


def platform_critical_load(robot: PlatformRobot, unit_force=None,
                           unit_moment=None, lam_lo: float = 0.0,
                           lam_hi: float = 1.0, bisect_steps: int = 30,
                           **kwargs) -> float:
    """Buckling load of a PCR under the wrench ray ``lambda * unit`` —
    host bisection on the sign of :func:`platform_stability`'s
    ``eig_max``, warm-starting each equilibrium from the last stable
    one.  ``lam_lo`` must be stable and ``lam_hi`` unstable (checked).
    Gated on the classical sway portal (2 pi^2 EI/L^2 total) and the
    single-leg cantilever column (pi^2 EI/4L^2) in the tests."""
    uf = (np.zeros(3) if unit_force is None
          else np.asarray(unit_force, np.float64))
    um = (np.zeros(3) if unit_moment is None
          else np.asarray(unit_moment, np.float64))

    # ONE jitted probe with lambda and the warm start traced — the eager
    # path would re-trace the Newton + eigensystem per bisection step
    # (~minutes of compiles for ~seconds of math).
    @jax.jit
    def probe(lam, qe0, pose_p, pose_q):
        st = platform_stability(
            robot, platform_force=lam * jnp.asarray(uf),
            platform_moment=lam * jnp.asarray(um), qe0=qe0,
            pose0=(pose_p, pose_q), **kwargs)
        sol = st.solution
        return (jnp.logical_and(st.stable, sol.converged), st.eig_max,
                sol.qe, sol.platform_position, sol.platform_quaternion)

    # Cold start for the first (stable-anchor) solve.
    st0 = platform_stability(robot, platform_force=jnp.asarray(lam_lo * uf),
                             platform_moment=jnp.asarray(lam_lo * um),
                             **kwargs)
    if not bool(jnp.logical_and(st0.stable, st0.solution.converged)):
        raise ValueError(f"lam_lo={lam_lo} is not a stable equilibrium")
    warm = (st0.solution.qe, st0.solution.platform_position,
            st0.solution.platform_quaternion)
    ok_hi, _, *_ = probe(jnp.asarray(float(lam_hi)), *warm)
    if bool(ok_hi):
        raise ValueError(f"lam_hi={lam_hi} is still stable — raise it")
    lo, hi = float(lam_lo), float(lam_hi)
    for _ in range(bisect_steps):
        mid = 0.5 * (lo + hi)
        ok, _, qe, pp, pq = probe(jnp.asarray(mid), *warm)
        if bool(ok):
            lo, warm = mid, (qe, pp, pq)
        else:
            hi = mid
    return 0.5 * (lo + hi)


class PlatformIKSolution(NamedTuple):
    tension: jnp.ndarray      # (..., R, K) recovered tensions
    qe: jnp.ndarray           # (..., R, nq)
    platform_position: jnp.ndarray    # (..., 3)
    platform_quaternion: jnp.ndarray  # (..., 4)
    pose_error: jnp.ndarray   # (...,) ||pose residual chart||_2


def platform_ik(robot: PlatformRobot, target_position,
                target_quaternion=None, tension0=None, gn_steps: int = 10,
                lm_damping: float = 1e-8, min_tension: float = 0.0,
                platform_force=None, platform_moment=None,
                tol: float = 1e-9, max_iter: int = 40, iters: int = 16
                ) -> PlatformIKSolution:
    """Inverse actuation of a tendon-driven PCR: per-leg cable tensions
    that place the PLATFORM at a target pose.

    Gauss-Newton on the pose map with IFT sensitivities through the
    whole coupled KKT system: at an actuated equilibrium
    ``R(z*, T) = 0``, so ``dz*/dT = -J_z^{-1} dR/dT`` (one linearize in
    each argument, one bordered solve with a matrix RHS) and the pose
    rows of ``dz*/dT`` drive a Levenberg–Marquardt-damped step with the
    same reduced-subspace active set as :func:`.tendon.tendon_ik` on the
    ``T >= min_tension`` bound (cables only pull).  ``target_quaternion``
    adds the 3-vector orientation chart to the cost (6-dim target —
    needs >= 6 effective cables for exact tracking; fewer = least
    squares).  The whole IK is ONE ``lax.scan`` — batched over leading
    axes of the targets, jit-friendly, warm-started equilibria.
    ``robot.cfg.tendons`` must be non-empty; tensions are per (leg,
    cable), flattened internally to ``R*K`` actuation coordinates.
    """
    k_t = len(robot.cfg.tendons)
    if k_t == 0:
        raise ValueError("platform_ik needs robot.cfg.tendons")
    r_legs, nq = robot.num_legs, robot.cfg.nq
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    target_p = jnp.asarray(target_position, dtype)
    has_rot = target_quaternion is not None
    target_q = (None if not has_rot
                else jnp.asarray(target_quaternion, dtype))
    batch = jnp.broadcast_shapes(
        target_p.shape[:-1], () if not has_rot else target_q.shape[:-1])
    n_act = r_legs * k_t
    if tension0 is None:
        tension0 = jnp.zeros(batch + (n_act,), dtype)
    tension = jnp.broadcast_to(
        jnp.asarray(tension0, dtype).reshape(batch + (n_act,)),
        batch + (n_act,))

    def system(t_flat):
        return _platform_system(
            robot, platform_force, platform_moment,
            t_flat.reshape(t_flat.shape[:-1] + (r_legs, k_t)),
            None, None, iters)

    _, unpack, z0_cold, _ = system(tension)
    m = r_legs * nq + 6 * r_legs + 6
    # _platform_system derives its batch from the wrench/qe0 arguments
    # only — broadcast the cold start over the TARGET batch explicitly.
    z0_cold = jnp.broadcast_to(z0_cold, batch + (m,))
    eye_m = jnp.eye(m, dtype=dtype)
    eye_t = jnp.eye(n_act, dtype=dtype)

    def pose_error(z):
        _, _, p, q_plat = unpack(z)
        err = [p - target_p]
        if has_rot:
            err.append(_rot_error(q_plat, target_q))
        return jnp.concatenate(err, axis=-1)          # (..., 3 or 6)

    def gn_step(z, tension):
        res_fn = lambda zz, tt: system(tt)[0](zz)
        z, _, _ = dyn.damped_newton(lambda zz: res_fn(zz, tension), z,
                                    tol=tol, max_iter=max_iter)
        _, lin_z = jax.linearize(lambda zz: res_fn(zz, tension), z)
        j_z = jnp.moveaxis(jax.vmap(
            lambda e: lin_z(jnp.broadcast_to(e, z.shape)))(eye_m), 0, -1)
        _, lin_t = jax.linearize(lambda tt: res_fn(z, tt), tension)
        j_t = jnp.moveaxis(jax.vmap(
            lambda e: lin_t(jnp.broadcast_to(e, tension.shape)))(eye_t),
            0, -1)
        dz_dt = -smallsolve.gauss_jordan_solve(j_z, j_t)  # (..., m, RK)
        err, lin_e = jax.linearize(pose_error, z)
        j_pose = jnp.moveaxis(jax.vmap(lin_e)(
            jnp.moveaxis(dz_dt, -1, 0)), 0, -1)       # (..., nc, RK)
        g = jnp.einsum("...ck,...c->...k", j_pose, err)
        at_bound = tension <= min_tension + 1e-12
        frozen = jnp.logical_and(at_bound, g > 0.0)
        free = 1.0 - frozen.astype(dtype)
        jtj = jnp.einsum("...ck,...cl->...kl", j_pose, j_pose)
        jtj = (free[..., :, None] * free[..., None, :] * jtj
               + (lm_damping * free
                  + frozen.astype(dtype))[..., None, :] * eye_t)
        step = smallsolve.gauss_jordan_solve(jtj, free * g)
        return z, jnp.maximum(tension - free * step, min_tension)

    def scan_body(carry, _):
        return gn_step(*carry), None

    (z, tension), _ = jax.lax.scan(scan_body, (z0_cold, tension), None,
                                   length=gn_steps)
    z, _, _ = dyn.damped_newton(
        lambda zz: system(tension)[0](zz), z, tol=tol, max_iter=max_iter)
    qe, _, p, q_plat = unpack(z)
    return PlatformIKSolution(
        tension=tension.reshape(batch + (r_legs, k_t)), qe=qe,
        platform_position=p, platform_quaternion=q_plat,
        pose_error=jnp.linalg.norm(pose_error(z), axis=-1))
