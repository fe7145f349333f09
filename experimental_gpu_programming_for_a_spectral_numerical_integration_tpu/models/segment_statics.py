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
    "segmented_equilibrium_residual_dd",
    "segmented_tendon_lengths",
    "segmented_residual_and_jacobian_fused",
    "solve_segmented_statics",
    "solve_segmented_statics_batched",
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

    ``tendons``: routed cables (:class:`~.tendon.Tendon`) — THIS is the
    spectrally-correct home for MID-ROD TENDON TERMINATIONS: a cable
    anchored at segment ``tendon_end[k]``'s tip covers segments
    ``0..tendon_end[k]`` only, so the kinked equilibrium it induces is
    piecewise smooth per segment and every per-segment integral stays
    spectral (the single-rod tier documents exactly this limitation —
    models/tendon.py).  ``tendon_end`` defaults to full coverage (global
    tip anchors).  Each tendon's routing field is evaluated per covered
    segment on that segment's own normalized grid; keep the offsets
    continuous across junctions for a physical cable (constant offsets
    trivially are).
    """

    rods: segments.SegmentedRodConfig = field(
        default_factory=lambda: segments.uniform_segments(2))
    stiffness: tuple = (1.0, 1.0, 1.0)
    kappa0: tuple | None = None
    follower: bool = False
    tendons: tuple = ()
    tendon_end: tuple | None = None

    @property
    def tendon_last_segment(self) -> tuple:
        """Per-tendon index of the last covered segment (anchor site)."""
        if not self.tendons:
            return ()
        if self.tendon_end is None:
            return (self.rods.num_segments - 1,) * len(self.tendons)
        if len(self.tendon_end) != len(self.tendons):
            raise ValueError(
                f"tendon_end has {len(self.tendon_end)} entries for "
                f"{len(self.tendons)} tendons")
        for e in self.tendon_end:
            if not 0 <= int(e) < self.rods.num_segments:
                raise ValueError(f"tendon_end entry {e} outside "
                                 f"0..{self.rods.num_segments - 1}")
        return tuple(int(e) for e in self.tendon_end)

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

    @functools.cached_property
    def full_tables_dd(self):
        from ..ops import doubledouble as dd

        return tuple(dd.split_f64(t) for t in self.full_tables)

    @functools.cached_property
    def weighted_tables_dd(self):
        """Per-segment dd splits of ``w_j P_e(x_j)`` (weak-form kernels)."""
        from ..ops import doubledouble as dd

        return tuple(
            dd.split_f64(w[:, None] * t)
            for w, t in zip(self.quad_weights, self.full_tables)
        )


class SegmentedStaticsSolution(NamedTuple):
    qe: jnp.ndarray            # (..., S, na*ne) converged strain modes
    iterations: jnp.ndarray
    residual_norm: jnp.ndarray
    converged: jnp.ndarray
    qe_lo: jnp.ndarray = None  # dd low word (dd_residual solves)


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


def _segment_residual_from_state(qe_s, q_full, r_full, r_tip, q_tip,
                                 tip_force, tip_moment, seg, s,
                                 cfg: SegmentedStaticsConfig):
    """Segment ``s``'s weak-form balance residual from explicit kinematic
    state — pure XLA, so direction tangents are plain ``jvp``s through it
    (the solver-dependent part enters via the IFT tangents of the state;
    cf. cosserat._residual_from_state)."""
    dtype = qe_s.dtype
    table = jnp.asarray(cfg.full_tables[s], dtype)         # (n_s, ne)
    w = jnp.asarray(cfg.quad_weights[s], dtype)            # (n_s,)
    h = jnp.asarray(cfg.stiffness_per_segment[s], dtype)   # (na,)

    kappa = basis_ops.strain_at_points(qe_s, table)
    if cfg.kappa0 is not None:
        k0 = jnp.asarray(cfg.kappa0, dtype)[s]
        kappa = kappa - basis_ops.strain_at_points(k0, table)

    tf = jnp.asarray(tip_force, dtype)
    if cfg.follower:
        # Rotate the body-frame tip force at the CURRENT global tip
        # orientation (couples every segment to the last one's state).
        tf = lie.quat_rotate_normalized(
            q_tip, jnp.broadcast_to(tf, q_tip.shape[:-1] + (3,)))

    arm = r_tip[..., None, :] - r_full                     # (..., n_s, 3)
    f = jnp.broadcast_to(tf[..., None, :], arm.shape)
    world_moment = jnp.cross(arm, f) + jnp.asarray(tip_moment,
                                                   dtype)[..., None, :]
    # quaternion-vector body transport (see cosserat._residual_from_state)
    tau = lie.quat_rotate_inv_normalized(q_full, world_moment)
    if seg.na == 6:
        n_body = lie.quat_rotate_inv_normalized(q_full, f)
        tau = jnp.concatenate([tau, n_body], axis=-1)

    mr = h * kappa - tau                                   # (..., n_s, na)
    r_s = jnp.einsum("j,je,...ja->...ae", w, table, mr,
                     precision="highest")
    return r_s.reshape(r_s.shape[:-2] + (seg.na * seg.ne,))


def segmented_tendon_lengths(qe_segs, cfg: SegmentedStaticsConfig,
                             iters: int = 24, method: str = "picard"):
    """Routed lengths ``(..., K)`` of ``cfg.tendons`` over their covered
    segments — each segment's contribution is the spectral length integral
    of :func:`~.tendon.lengths_from_state` on that segment's own grid, so
    a mid-rod termination (anchor at a junction) loses no accuracy."""
    from . import tendon as tendon_mod

    qe_segs = jnp.asarray(qe_segs)
    qs, rs, _ = _chained_full_states(qe_segs, cfg, iters, method)
    last = cfg.tendon_last_segment
    lens = []
    for k, t in enumerate(cfg.tendons):
        total = 0.0
        theta = None                       # capstan turning, accumulated
        for s in range(last[k] + 1):       # base segment -> anchor
            seg = cfg.rods.segments[s]
            contrib, theta = tendon_mod.lengths_from_state(
                rs[s], qs[s], (t,), seg, cfg.quad_weights[s],
                theta0=theta, return_theta=True)
            total = total + contrib[..., 0]
        lens.append(total)
    return jnp.stack(lens, axis=-1)


def segmented_equilibrium_residual(qe_segs, tip_force, tip_moment,
                                   cfg: SegmentedStaticsConfig,
                                   iters: int = 24,
                                   method: str = "picard",
                                   tension=None):
    """Stacked weak-form balance residual ``(..., S, na*ne)``.

    ``tension (..., K)`` with ``cfg.tendons`` set adds the actuation term
    ``+ sum_k T_k dl_k/dqe`` (the gradient of the cable potential
    ``V = T l`` — the weak-form rows ARE the energy gradient of the
    elastic term, so the variational tendon force composes exactly;
    cross-gated on the piecewise closed form kappa = -T delta / EI on
    covered segments, 0 beyond the anchor)."""
    qe_segs = jnp.asarray(qe_segs)
    dtype = qe_segs.dtype
    tip_force = jnp.asarray(tip_force, dtype)
    tip_moment = jnp.asarray(tip_moment, dtype)
    qs, rs, r_tip = _chained_full_states(qe_segs, cfg, iters, method)
    q_tip = qs[-1][..., 0, :]

    res = []
    for s, seg in enumerate(cfg.rods.segments):
        res.append(_segment_residual_from_state(
            qe_segs[..., s, :], qs[s], rs[s], r_tip, q_tip,
            tip_force, tip_moment, seg, s, cfg))
    out = jnp.stack(res, axis=-2)
    if tension is not None and cfg.tendons:
        t_vec = jnp.asarray(tension, dtype)

        def cable_potential(qe_):
            lens = segmented_tendon_lengths(qe_, cfg, iters, method)
            return jnp.sum(t_vec * lens)

        out = out + jax.grad(cable_potential)(qe_segs)
    return out


def segmented_equilibrium_residual_dd(qe_segs, tip_force, tip_moment,
                                      cfg: SegmentedStaticsConfig,
                                      iters: int = 20,
                                      interpret: bool = False):
    """Double-word chained balance residual ``(..., S, na*ne)``.

    The multi-segment analogue of ``cosserat.equilibrium_residual_dd``: the
    kinematic chain runs through the refined-fused Pallas BC kernels (dd
    junction states end to end), and every transport/cancellation — the
    global-tip moment arms especially, which cross segment boundaries and
    carry the worst O(1) cancellation — uses error-free transformations.
    ``qe_segs`` may be a dd pair ``(hi, lo)`` of ``(..., S, nq)`` words;
    ``tip_force``/``tip_moment`` may be dd pairs too (exact scaled loads).
    f32 output (values near zero are fully representable).
    """
    from ..ops import doubledouble as dd

    if isinstance(qe_segs, tuple):
        qe_hi = jnp.asarray(qe_segs[0], jnp.float32)
        qe_lo = jnp.asarray(qe_segs[1], jnp.float32)
    else:
        qe_hi = jnp.asarray(qe_segs, jnp.float32)
        qe_lo = jnp.zeros_like(qe_hi)
    lead = qe_hi.shape[:-2]

    sol = segments.segmented_rod_shape((qe_hi, qe_lo), cfg.rods,
                                       method="refined_fused", iters=iters,
                                       interpret=interpret)
    (jq_hi, jq_lo), (jr_hi, jr_lo) = sol.junction_dd
    rt = [(jr_hi[..., -1, i], jr_lo[..., -1, i]) for i in range(3)]

    def load3(v):
        if isinstance(v, tuple):
            return (jnp.asarray(v[0], jnp.float32),
                    jnp.asarray(v[1], jnp.float32))
        v = jnp.asarray(v, jnp.float32)
        return v, jnp.zeros_like(v)

    tf_hi, tf_lo = load3(tip_force)
    tm_hi, tm_lo = load3(tip_moment)
    f_glob = [(tf_hi[..., i], tf_lo[..., i]) for i in range(3)]
    if cfg.follower:
        # F_world = R(q_tip) F_body at the dd global tip rotation.
        f_glob = rod._rotate_dd(jq_hi[..., -1, :], jq_lo[..., -1, :],
                                f_glob)

    h_all = cfg.stiffness_per_segment
    res_out = []
    for s, seg in enumerate(cfg.rods.segments):
        sq_hi, sq_lo = sol.quaternions_dd[s]
        sr_hi, sr_lo = sol.positions_dd[s]
        if s == 0:
            bq = jnp.broadcast_to(
                jnp.asarray(rod.DEFAULT_Q_INIT, jnp.float32),
                lead + (1, 4))
            bq_lo = jnp.zeros_like(bq)
            br = jnp.zeros(lead + (1, 3), jnp.float32)
            br_lo = br
        else:
            bq = jq_hi[..., s - 1:s, :]
            bq_lo = jq_lo[..., s - 1:s, :]
            br = jr_hi[..., s - 1:s, :]
            br_lo = jr_lo[..., s - 1:s, :]
        q_hi = jnp.concatenate([sq_hi, bq], axis=-2)      # (..., n_s, 4)
        q_lo = jnp.concatenate([sq_lo, bq_lo], axis=-2)
        r_hi = jnp.concatenate([sr_hi, br], axis=-2)
        r_lo = jnp.concatenate([sr_lo, br_lo], axis=-2)

        # dd strain field from the exact per-segment f64 table.
        xi_hi, xi_lo = rod._curvature_dd(
            seg, (qe_hi[..., s, :], qe_lo[..., s, :]),
            table_dd=cfg.full_tables_dd[s])
        if cfg.kappa0 is not None:
            k0_hi, k0_lo = rod._curvature_dd(
                seg, rod.split_strain(np.asarray(cfg.kappa0,
                                                 np.float64)[s]),
                table_dd=cfg.full_tables_dd[s])
            xi_hi, xi_lo = dd.dd_add(xi_hi, xi_lo, -k0_hi, -k0_lo)

        # arm = r_tip - r; world moment = arm x F + M (per point, dd).
        arm = [
            dd.dd_add(rt[i][0][..., None], rt[i][1][..., None],
                      -r_hi[..., i], -r_lo[..., i])
            for i in range(3)
        ]
        shape = arm[0][0].shape
        f = [(jnp.broadcast_to(f_glob[i][0][..., None], shape),
              jnp.broadcast_to(f_glob[i][1][..., None], shape))
             for i in range(3)]
        m_world = dd.dd_cross(arm, f)
        m_world = [
            dd.dd_add(*m_world[i],
                      jnp.broadcast_to(tm_hi[..., i][..., None], shape),
                      jnp.broadcast_to(tm_lo[..., i][..., None], shape))
            for i in range(3)
        ]

        # Body transports tau = R^T m (and R^T F for na=6), dd.
        r_cols = rod._rot_cols_dd(q_hi, q_lo)
        tau = rod._rt_apply_dd(r_cols, m_world)
        if seg.na == 6:
            tau = tau + rod._rt_apply_dd(r_cols, f)

        h_hi, h_lo = dd.split_f64(h_all[s])
        mr = []
        for a in range(seg.na):
            hk = dd.dd_mul(jnp.asarray(h_hi[a]), jnp.asarray(h_lo[a]),
                           xi_hi[..., a], xi_lo[..., a])
            mr.append(dd.dd_add(*hk, *dd.dd_neg(*tau[a])))

        wp_hi, wp_lo = cfg.weighted_tables_dd[s]          # (n_s, ne)
        res_out.append(dd.dd_weak_form(wp_hi, wp_lo, mr, seg.ne))
    return jnp.stack(res_out, axis=-2)


def _segmented_fused_state_and_tangents(qe, cfg: SegmentedStaticsConfig,
                                        iters, jac_iters, interpret):
    """Chained primal state + IFT direction tangents on the fused path.

    ``qe (B, S, nq)`` -> per-segment full-grid states and direction-tangent
    tables for ALL ``S*nq`` strain directions, with every solve a fused
    Pallas kernel (the multi-segment analogue of
    cosserat._fused_state_and_tangents).  The chain structure makes the
    linearization triangular — perturbing segment ``s'`` moves segments
    ``s >= s'`` only:

    * own-strain directions solve the segment's linearized ODE with
      homogeneous BC (``picard_correction_fused`` of ``1/2 A(dK) q``);
    * upstream directions enter ONLY through the junction: the quaternion
      ODE is linear in its initial value, so the downstream tangent is the
      same correction kernel applied to the BC rhs ``-(dn_in (x) dq_jct)``
      (and the position quadrature picks up ``-(dn_in (x) dr_jct)``).

    Segment ``s`` therefore carries ``(s+1)*nq`` active direction tables;
    directions from further-tip segments are identically zero and never
    computed.
    """
    from ..ops.pallas import rod_kernel as rk
    from . import cosserat as _cs

    rods = cfg.rods
    b = qe.shape[0]
    na = rods.segments[0].na
    ne = rods.segments[0].ne
    nq = na * ne
    nk = 3 * ne                      # curvature directions (gamma: dM = 0)

    q0 = jnp.broadcast_to(jnp.asarray(rod.DEFAULT_Q_INIT, jnp.float32),
                          (b, 4))
    r0 = jnp.zeros((b, 3), jnp.float32)
    dq_j = dr_j = None               # junction tangents ((s*nq), B, 4/3)
    q_fulls, r_fulls, dq_fulls, dr_fulls = [], [], [], []
    for s, seg in enumerate(rods.segments):
        npts = seg.grid.num_unknown
        qe_s = qe[:, s, :]
        tile_p = _cs._pick_tile(b, seg)
        q_unk, r_unk = rk.rod_shape_fused_bc(qe_s, q0, r0, cfg=seg,
                                             iters=iters, tile=tile_p,
                                             interpret=interpret)
        q_full = jnp.concatenate([q_unk, q0[:, None, :]], axis=1)
        r_full = jnp.concatenate([r_unk, r0[:, None, :]], axis=1)

        ndir = (s + 1) * nq
        table = jnp.asarray(seg.basis_table, jnp.float32)    # (npts, ne)
        eye_a = jnp.eye(na, dtype=jnp.float32)
        # axes must stay (a, e, p, b) before the (a, e)-fold — the
        # scrambled variant cost a 31% Jacobian error in round 2.
        dk_dirs = jnp.einsum("ab,pe->aepb", eye_a,
                             table).reshape(nq, npts, na)
        dn_in = jnp.asarray(seg.grid.dn_in, jnp.float32)     # (npts,)

        # Quaternion-tangent rhs, stacked [upstream dirs ; own dirs].
        rhs_list = []
        if s > 0:
            rhs_list.append(-dn_in[None, None, :, None]
                            * dq_j[:, :, None, :])     # (s*nq, B, npts, 4)
        dm = 0.5 * lie.quat_skew(dk_dirs[:nk, :, :3])  # (nk, npts, 4, 4)
        rhs_own = jnp.einsum("jice,bie->jbic", dm, q_unk)
        if nq > nk:
            rhs_own = jnp.concatenate(
                [rhs_own, jnp.zeros((nq - nk, b, npts, 4), jnp.float32)],
                axis=0)
        rhs_list.append(rhs_own)
        rhs = jnp.concatenate(rhs_list, axis=0)        # (ndir, B, npts, 4)
        tile_c = _cs._pick_tile(ndir * b, seg)
        dq_dirs = rk.picard_correction_fused(
            jnp.tile(qe_s, (ndir, 1)), rhs.reshape(ndir * b, npts, 4),
            cfg=seg, iters=jac_iters, tile=tile_c, interpret=interpret,
        ).reshape(ndir, b, npts, 4)

        # Position tangents: dr = G (db - dn_in (x) dr_jct).
        if na == 6:
            gamma = basis_ops.strain_at_points(qe_s, table)[..., 3:]
            e1 = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)

            def b_fn(qq, gg):
                return jnp.einsum("...ij,...j->...i", lie.quat_to_rot(qq),
                                  e1 + gg)

            dg_own = jnp.broadcast_to(dk_dirs[:, None, :, 3:],
                                      (nq, b, npts, 3))
            dgamma = (jnp.concatenate(
                [jnp.zeros((ndir - nq, b, npts, 3), jnp.float32), dg_own],
                axis=0) if s > 0 else dg_own)
            db = jax.vmap(
                lambda dqj, dgj: jax.jvp(b_fn, (q_unk, gamma),
                                         (dqj, dgj))[1]
            )(dq_dirs, dgamma)
        else:
            db = jax.vmap(
                lambda dqj: jax.jvp(lie.quat_tangent, (q_unk,), (dqj,))[1]
            )(dq_dirs)
        if s > 0:
            dr_bc = jnp.concatenate(
                [dr_j, jnp.zeros((nq, b, 3), jnp.float32)], axis=0)
            db = db - dn_in[None, None, :, None] * dr_bc[:, :, None, :]
        ginv = jnp.asarray(seg.grid.ginv_f32)
        dr_dirs = jnp.einsum("ip,jbpc->jbic", ginv, db,
                             precision="highest")

        # Full-grid tangents: the segment's base point carries the
        # junction tangent (zero for its own directions).
        if s > 0:
            dq_base = jnp.concatenate(
                [dq_j, jnp.zeros((nq, b, 4), jnp.float32)], axis=0)
            dr_base = jnp.concatenate(
                [dr_j, jnp.zeros((nq, b, 3), jnp.float32)], axis=0)
        else:
            dq_base = jnp.zeros((ndir, b, 4), jnp.float32)
            dr_base = jnp.zeros((ndir, b, 3), jnp.float32)
        dq_fulls.append(jnp.concatenate([dq_dirs, dq_base[:, :, None, :]],
                                        axis=2))
        dr_fulls.append(jnp.concatenate([dr_dirs, dr_base[:, :, None, :]],
                                        axis=2))
        q_fulls.append(q_full)
        r_fulls.append(r_full)

        # Next junction state/tangents: the segment tip (point 0).
        q0, r0 = q_unk[:, 0, :], r_unk[:, 0, :]
        dq_j = dq_dirs[:, :, 0, :]
        dr_j = dr_dirs[:, :, 0, :]
    return q_fulls, r_fulls, dq_fulls, dr_fulls


def segmented_residual_and_jacobian_fused(qe, tip_force, tip_moment,
                                          cfg: SegmentedStaticsConfig,
                                          iters: int = 16,
                                          jac_iters: int | None = None,
                                          interpret: bool = False):
    """Batched residual + exact Jacobian of the CHAINED statics system on
    the fused path: ``qe (B, S, nq)`` -> ``(res (B, S*nq),
    jac (B, S*nq, S*nq))`` — the kernel-lifted IFT that replaces
    ``jacfwd`` through the chained Picard solves (VERDICT r2 next #3)."""
    if jac_iters is None:
        jac_iters = iters
    rods = cfg.rods
    s_count = rods.num_segments
    b = qe.shape[0]
    nq = rods.segments[0].na * rods.segments[0].ne
    flat = s_count * nq
    q_fulls, r_fulls, dq_fulls, dr_fulls = _segmented_fused_state_and_tangents(
        qe, cfg, iters, jac_iters, interpret)
    r_tip = r_fulls[-1][:, 0, :]
    q_tip = q_fulls[-1][:, 0, :]
    # Tip tangents cover ALL directions (the last segment sees every one).
    dr_tip = dr_fulls[-1][:, :, 0, :]                     # (S*nq, B, 3)
    dq_tip = dq_fulls[-1][:, :, 0, :]

    res_rows, jac_rows = [], []
    for s, seg in enumerate(rods.segments):
        def f(qe_s_, q_, r_, rtip_, qtip_, _s=s, _seg=seg):
            return _segment_residual_from_state(
                qe_s_, q_, r_, rtip_, qtip_, tip_force, tip_moment,
                _seg, _s, cfg)

        res_s, f_lin = jax.linearize(f, qe[:, s, :], q_fulls[s], r_fulls[s],
                                     r_tip, q_tip)
        ndir = dq_fulls[s].shape[0]
        pad = flat - ndir
        npts1 = q_fulls[s].shape[1]
        dq_d = jnp.concatenate(
            [dq_fulls[s], jnp.zeros((pad, b, npts1, 4), jnp.float32)],
            axis=0)
        dr_d = jnp.concatenate(
            [dr_fulls[s], jnp.zeros((pad, b, npts1, 3), jnp.float32)],
            axis=0)
        # dqe_s one-hots: direction (s', j) touches qe_s iff s' == s.
        eye = jnp.eye(flat, dtype=jnp.float32)[:, s * nq:(s + 1) * nq]
        dqe_d = jnp.broadcast_to(eye[:, None, :], (flat, b, nq))

        dres = jax.vmap(f_lin)(dqe_d, dq_d, dr_d, dr_tip, dq_tip)
        res_rows.append(res_s)                            # (B, nq)
        jac_rows.append(jnp.moveaxis(dres, 0, -1))        # (B, nq, flat)
    return (jnp.concatenate(res_rows, axis=1),
            jnp.concatenate(jac_rows, axis=1))


def solve_segmented_statics_batched(tip_force, tip_moment=None,
                                    cfg: SegmentedStaticsConfig = SegmentedStaticsConfig(),
                                    qe0=None, tol: float = 1e-5,
                                    max_iter: int = 12,
                                    damping: float = 1.0, iters: int = 16,
                                    jac_iters: int = 8,
                                    interpret: bool = False,
                                    dd_residual: bool = False,
                                    dd_iters: int = 20,
                                    ) -> SegmentedStaticsSolution:
    """Natively-batched Newton for multi-segment statics on the fused tier.

    ``tip_force (B, 3)`` -> converged strains ``(B, S, nq)``.  Every inner
    solve is a VMEM-resident Pallas kernel over the whole batch (one fused
    BC chain + one direction-stacked fused correction chain per Newton
    step) — the multi-segment analogue of
    ``cosserat.solve_statics_batched``, an order of magnitude past the
    ``jacfwd``-through-the-chain host tier.  f32-grade (tol ~1e-5) by
    default; ``dd_residual=True`` evaluates the convergence residual with
    :func:`segmented_equilibrium_residual_dd` (refined-fused dd chain) and
    carries the strain iterate as a double-word pair, making tolerances
    down to ~1e-9 meaningful (the dd words come back in ``qe_lo``).
    """
    from ..ops import doubledouble as dd
    from ..ops import smallsolve as _ss

    tip_force = jnp.asarray(tip_force, jnp.float32)
    b = tip_force.shape[0]
    rods = cfg.rods
    s_count = rods.num_segments
    nq = rods.segments[0].na * rods.segments[0].ne
    flat = s_count * nq
    if tip_moment is None:
        tip_moment = jnp.zeros(3, jnp.float32)
    tip_moment = jnp.asarray(tip_moment, jnp.float32)
    tm = tip_moment if tip_moment.ndim > 1 else tip_moment[None, :]
    if qe0 is None:
        if cfg.kappa0 is not None:
            qe0 = jnp.broadcast_to(jnp.asarray(cfg.kappa0, jnp.float32),
                                   (b, s_count, nq))
        else:
            qe0 = jnp.zeros((b, s_count, nq), jnp.float32)
    qe0 = jnp.asarray(qe0, jnp.float32)

    def res_jac(qe_flat):
        qe = qe_flat.reshape(b, s_count, nq)
        return segmented_residual_and_jacobian_fused(
            qe, tip_force, tm, cfg, iters=iters,
            jac_iters=jac_iters, interpret=interpret)

    def res_dd(qe_flat_hi, qe_flat_lo):
        pair = (qe_flat_hi.reshape(b, s_count, nq),
                qe_flat_lo.reshape(b, s_count, nq))
        r = segmented_equilibrium_residual_dd(pair, tip_force, tm, cfg,
                                              iters=dd_iters,
                                              interpret=interpret)
        return r.reshape(b, flat)

    def cond(state):
        _, _, k, res, _ = state
        return jnp.logical_and(
            k < max_iter,
            jnp.any(jnp.linalg.norm(res, axis=-1) > tol))

    def body(state):
        qe_flat, qe_lo, k, res, jac = state
        step = _ss.gauss_jordan_solve(jac, res)
        active = (jnp.linalg.norm(res, axis=-1) > tol)[:, None]
        step = jnp.where(active, damping * step, 0.0)
        qe_flat, qe_lo = dd.dd_add(qe_flat, qe_lo, -step,
                                   jnp.zeros_like(step))
        res, jac = res_jac(qe_flat)
        if dd_residual:
            res = res_dd(qe_flat, qe_lo)
        return qe_flat, qe_lo, k + 1, res, jac

    qe_flat0 = qe0.reshape(b, flat)
    qe_lo0 = jnp.zeros_like(qe_flat0)
    res0, jac0 = res_jac(qe_flat0)
    if dd_residual:
        res0 = res_dd(qe_flat0, qe_lo0)
    qe_flat, qe_lo_out, k, res, _ = jax.lax.while_loop(
        cond, body, (qe_flat0, qe_lo0, jnp.zeros((), jnp.int32), res0,
                     jac0))
    rnorm = jnp.linalg.norm(res, axis=-1)
    return SegmentedStaticsSolution(
        qe=qe_flat.reshape(b, s_count, nq),
        iterations=k, residual_norm=rnorm, converged=rnorm <= tol,
        qe_lo=(qe_lo_out.reshape(b, s_count, nq) if dd_residual else None))


def solve_segmented_statics(tip_force, tip_moment=(0.0, 0.0, 0.0),
                            cfg: SegmentedStaticsConfig = SegmentedStaticsConfig(),
                            qe0=None, tol: float = 1e-9, max_iter: int = 30,
                            damping: float = 1.0, iters: int = 24,
                            method: str = "picard", tension=None,
                            ) -> SegmentedStaticsSolution:
    """Newton on :func:`segmented_equilibrium_residual` (exact AD Jacobian
    through the chained solves), jit/vmap-compatible.  ``tension (..., K)``
    actuates ``cfg.tendons`` (mid-rod terminations included — see
    :class:`SegmentedStaticsConfig`)."""
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
                                           iters, method, tension=tension)
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
