"""Multi-segment Cosserat statics: per-segment stiffness, chained BVP.

ROADMAP round-3 capability, completing the BASELINE config #5 family: the
single-segment statics BVP (models/cosserat.py) generalized to rods built
from segments with DIFFERENT stiffness, intrinsic curvature, grid order and
length — the piecewise strain fields the reference's ``Phi(X, begin, end)``
signature anticipates (`/root/reference/include/utilities.h:50`), now with
force balance, not just kinematics.

Formulation: the unknowns are the stacked per-segment strain modes
``qe (..., S, na*ne)``.  Kinematic continuity is exact by construction (the
chained IVP solves of models/segments.py).  Equilibrium is the weak-form
internal-moment balance of each segment against the tip wrench transported
to its sections,

    res[s, a, e] = int_{seg s} P_e(x) { H_s (kappa_s - kappa0_s)
                                        - R_s(x)^T [ (r_tip - r_s(x)) x F
                                                     + M ] }_a dx,

with ``r_tip`` the GLOBAL tip (last segment, point 0 on the descending
grid) — so every segment's residual couples to every downstream segment
through the kinematic chain, and the Newton Jacobian (exact ``jax.jacfwd``
through the chained Picard solves, each carrying its IFT custom JVP) is a
dense ``(S nq) x (S nq)`` block system solved by the TPU-native
Gauss-Jordan.

Exactness gates (tests/test_segment_statics.py): a pure tip couple gives
piecewise-constant curvature ``kappa_s = M / EI_s`` exactly; a uniform
chain reproduces the single-rod solution; a stepped-stiffness cantilever
matches the unit-load-method tip deflection in the linear regime.
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
from . import rod, segments

__all__ = [
    "SegmentedStaticsConfig",
    "SegmentedStaticsSolution",
    "segmented_equilibrium_residual",
    "solve_segmented_statics",
]


@dataclass(frozen=True)
class SegmentedStaticsConfig:
    """Chained-rod geometry plus per-segment constitutive laws.

    ``stiffness``: tuple of per-segment diagonal ``H`` tuples (length
    ``na`` each, Kirchhoff 3 or Reissner 6 — see
    :class:`~.cosserat.StaticsConfig`); a single flat tuple of floats is
    broadcast to all segments.  ``kappa0``: per-segment modal rest strains
    ``(S, na*ne)`` or ``None``.  ``follower``: tip force given in the tip
    body frame.
    """

    rods: segments.SegmentedRodConfig = field(
        default_factory=lambda: segments.uniform_segments(2))
    stiffness: tuple = (1.0, 1.0, 1.0)
    kappa0: tuple | None = None
    follower: bool = False

    @functools.cached_property
    def stiffness_per_segment(self) -> np.ndarray:
        """(S, na) f64 constant."""
        h = np.asarray(self.stiffness, np.float64)
        s = self.rods.num_segments
        na = self.rods.segments[0].na
        if h.ndim == 1:
            h = np.broadcast_to(h, (s, h.shape[0]))
        if h.shape != (s, na):
            raise ValueError(
                f"stiffness shape {h.shape} incompatible with {s} segments "
                f"of na={na}")
        return h

    @functools.cached_property
    def full_tables(self):
        """Per-segment (n_s, ne) basis tables at ALL grid points."""
        out = []
        for seg in self.rods.segments:
            pts = tuple((seg.points / seg.length).tolist())
            out.append(basis_ops.basis_table(pts, seg.ne, seg.basis))
        return tuple(out)

    @functools.cached_property
    def quad_weights(self):
        return tuple(chebyshev.clenshaw_curtis_weights(seg.n, seg.length)
                     for seg in self.rods.segments)


class SegmentedStaticsSolution(NamedTuple):
    qe: jnp.ndarray            # (..., S, na*ne) converged strain modes
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray
    converged: jnp.ndarray


def _chained_full_states(qe_segs, cfg: SegmentedStaticsConfig, iters, method):
    """Per-segment FULL-grid states (each segment's base appended from the
    junction trace) plus the global tip position."""
    sol = segments.segmented_rod_shape(qe_segs, cfg.rods, method=method,
                                       iters=iters)
    lead = qe_segs.shape[:-2]
    dtype = qe_segs.dtype
    qs, rs = [], []
    for s in range(cfg.rods.num_segments):
        if s == 0:
            q_base = jnp.broadcast_to(
                jnp.asarray(rod.DEFAULT_Q_INIT, dtype), lead + (1, 4))
            r_base = jnp.broadcast_to(
                jnp.asarray(rod.DEFAULT_R_INIT, dtype), lead + (1, 3))
        else:
            q_base = sol.junction_quaternions[..., s - 1:s, :]
            r_base = sol.junction_positions[..., s - 1:s, :]
        qs.append(jnp.concatenate([sol.quaternions[s], q_base], axis=-2))
        rs.append(jnp.concatenate([sol.positions[s], r_base], axis=-2))
    return qs, rs, sol.tip_position


def segmented_equilibrium_residual(qe_segs, tip_force, tip_moment,
                                   cfg: SegmentedStaticsConfig,
                                   iters: int = 24,
                                   method: str = "picard"):
    """Stacked weak-form balance residual ``(..., S, na*ne)``."""
    qe_segs = jnp.asarray(qe_segs)
    dtype = qe_segs.dtype
    tip_force = jnp.asarray(tip_force, dtype)
    tip_moment = jnp.asarray(tip_moment, dtype)
    qs, rs, r_tip = _chained_full_states(qe_segs, cfg, iters, method)
    h_all = cfg.stiffness_per_segment

    if cfg.follower:
        # Rotate the body-frame tip force at the CURRENT global tip
        # orientation (tip = point 0 of the last segment's full grid).
        tip_force = lie.quat_rotate_normalized(
            qs[-1][..., 0, :],
            jnp.broadcast_to(tip_force, qs[-1][..., 0, :3].shape))

    res = []
    for s, seg in enumerate(cfg.rods.segments):
        table = jnp.asarray(cfg.full_tables[s], dtype)     # (n_s, ne)
        w = jnp.asarray(cfg.quad_weights[s], dtype)        # (n_s,)
        h = jnp.asarray(h_all[s], dtype)                   # (na,)

        kappa = basis_ops.strain_at_points(qe_segs[..., s, :], table)
        if cfg.kappa0 is not None:
            k0 = jnp.asarray(cfg.kappa0, dtype)[s]
            kappa = kappa - basis_ops.strain_at_points(k0, table)

        arm = r_tip[..., None, :] - rs[s]                  # (..., n_s, 3)
        f = jnp.broadcast_to(tip_force[..., None, :], arm.shape)
        world_moment = jnp.cross(arm, f) + tip_moment[..., None, :]
        # quaternion-vector body transport (see cosserat._residual_from_state)
        tau = lie.quat_rotate_inv_normalized(qs[s], world_moment)
        if seg.na == 6:
            n_body = lie.quat_rotate_inv_normalized(qs[s], f)
            tau = jnp.concatenate([tau, n_body], axis=-1)

        mr = h * kappa - tau                               # (..., n_s, na)
        r_s = jnp.einsum("j,je,...ja->...ae", w, table, mr,
                         precision="highest")
        res.append(r_s.reshape(r_s.shape[:-2] + (seg.na * seg.ne,)))
    return jnp.stack(res, axis=-2)


def solve_segmented_statics(tip_force, tip_moment=(0.0, 0.0, 0.0),
                            cfg: SegmentedStaticsConfig = SegmentedStaticsConfig(),
                            qe0=None, tol: float = 1e-9, max_iter: int = 30,
                            damping: float = 1.0, iters: int = 24,
                            method: str = "picard",
                            ) -> SegmentedStaticsSolution:
    """Newton on :func:`segmented_equilibrium_residual` (exact AD Jacobian
    through the chained solves), jit/vmap-compatible."""
    rods = cfg.rods
    s_count = rods.num_segments
    nq = rods.segments[0].na * rods.segments[0].ne
    tip_force = jnp.asarray(tip_force)
    dtype = tip_force.dtype if tip_force.dtype in (jnp.float32, jnp.float64) \
        else jnp.float32
    if qe0 is None:
        if cfg.kappa0 is not None:
            qe0 = jnp.asarray(cfg.kappa0, dtype)
        else:
            qe0 = jnp.zeros(tip_force.shape[:-1] + (s_count, nq), dtype)
    qe0 = jnp.broadcast_to(jnp.asarray(qe0, dtype),
                           tip_force.shape[:-1] + (s_count, nq))
    tip_moment = jnp.asarray(tip_moment, dtype)
    flat = s_count * nq

    def residual_flat(qe_flat):
        qe = qe_flat.reshape(qe_flat.shape[:-1] + (s_count, nq))
        r = segmented_equilibrium_residual(qe, tip_force, tip_moment, cfg,
                                           iters, method)
        return r.reshape(r.shape[:-2] + (flat,))

    def cond(state):
        _, k, res = state
        return jnp.logical_and(k < max_iter,
                               jnp.linalg.norm(res, axis=-1) > tol)

    def body(state):
        qe_flat, k, res = state
        jac = jax.jacfwd(residual_flat)(qe_flat)
        step = smallsolve.gauss_jordan_solve(jac, res)
        qe_flat = qe_flat - damping * step
        return qe_flat, k + 1, residual_flat(qe_flat)

    qe_flat0 = qe0.reshape(qe0.shape[:-2] + (flat,))
    r0 = residual_flat(qe_flat0)
    qe_flat, k, res = jax.lax.while_loop(
        cond, body, (qe_flat0, jnp.zeros((), jnp.int32), r0))
    rnorm = jnp.linalg.norm(res, axis=-1)
    return SegmentedStaticsSolution(
        qe=qe_flat.reshape(qe_flat.shape[:-1] + (s_count, nq)),
        iterations=k, residual_norm=rnorm, converged=rnorm <= tol)
