"""Multi-segment rods: chained spectral solves with junction continuity.

BASELINE.json config #5 ("High-order N=256 multi-segment rods with
inter-segment continuity constraints and load-continuation sweep").  The
reference hard-codes a single segment, but its ``Phi(X, begin, end)``
signature (`/root/reference/include/utilities.h:50`) is the hook for
piecewise strain fields — realized here.

Design: a segmented rod is a sequence of :class:`rod.RodConfig` segments,
each with its own grid order and length.  Continuity is enforced by
**construction**, not by assembling a block-bordered system: segment ``s``'s
initial condition is segment ``s-1``'s tip state (both solves are IVPs, so
the junction constraint ``q_s(0) = q_{s-1}(L)``, ``r_s(0) = r_{s-1}(L)`` is
exact by chaining).  The per-segment solves reuse the whole collocation
stack, so every method (picard / dense / fused) and ``vmap`` batching work
unchanged; the segment loop is a static Python loop under ``jit``.

For single very-high-order problems (N=256: a 1020-unknown quaternion
system) the generic ``rod_shape`` paths already scale — this module's
:func:`high_order_shape` is a thin alias that exists so the config has a
named entry point; SURVEY.md §5 notes one chip handles this size without
sequence-style sharding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from ..ops import basis as basis_ops
from . import rod

__all__ = [
    "SegmentedRodConfig",
    "SegmentedSolution",
    "uniform_segments",
    "project_global_strain",
    "segmented_rod_shape",
    "high_order_shape",
]


@dataclass(frozen=True)
class SegmentedRodConfig:
    """An ordered tuple of segments, base to tip.

    ``boundaries[s] = (begin, end)`` of segment ``s`` in the global
    normalized arc length — the reference ``Phi`` begin/end arguments.
    """

    segments: tuple

    @property
    def num_segments(self) -> int:
        return len(self.segments)

    @property
    def total_length(self) -> float:
        return float(sum(s.length for s in self.segments))

    @property
    def boundaries(self):
        out, start = [], 0.0
        for s in self.segments:
            out.append((start, start + s.length))
            start += s.length
        return tuple(out)


def uniform_segments(num_segments: int, n: int = 16, na: int = 3, ne: int = 3,
                     total_length: float = 1.0, basis: str = "legendre"):
    seg = tuple(
        rod.RodConfig(n=n, na=na, ne=ne, length=total_length / num_segments,
                      basis=basis)
        for _ in range(num_segments)
    )
    return SegmentedRodConfig(segments=seg)


def project_global_strain(qe_global, cfg: SegmentedRodConfig,
                          global_ne: int | None = None,
                          basis: str = "legendre"):
    """Re-express a global modal strain field as per-segment modal coords.

    The global field ``K_a(X) = sum_e qe[a*ne+e] P_e(2X-1)`` on ``[0, 1]``
    is sampled on each segment's CGL nodes and least-squares-fitted in the
    segment's own basis (exact whenever segment ``ne`` >= global ``ne``).
    Returns ``(..., S, na*ne_s)`` stacked per-segment coordinates.
    host-side (NumPy): strain fields are setup data, not traced.
    """
    qe_global = np.asarray(qe_global)
    total = cfg.total_length
    out = []
    for seg, (b, e) in zip(cfg.segments, cfg.boundaries):
        ne_s = seg.ne
        na = seg.na
        gne = global_ne or qe_global.shape[-1] // na
        x_local = seg.points / seg.length            # [0, 1] in segment
        x_global = (b + x_local * seg.length) / total
        # Global basis values at the segment nodes.
        tg = basis_ops.to_reference_domain(x_global)
        pg = basis_ops._BASES[basis](tg, gne)        # (n, gne)
        k = np.einsum("pe,...ae->...pa",
                      pg, qe_global.reshape(qe_global.shape[:-1] + (na, gne)))
        # Fit in the segment basis (pseudo-inverse least squares).
        tl = basis_ops.to_reference_domain(x_local)
        ps = basis_ops._BASES[basis](tl, ne_s)       # (n, ne_s)
        pinv = np.linalg.pinv(ps)                    # (ne_s, n)
        coef = np.einsum("ep,...pa->...ae", pinv, k)  # (..., na, ne_s)
        out.append(coef.reshape(*k.shape[:-2], na * ne_s))
    return np.stack(out, axis=-2)


@dataclass
class SegmentedSolution:
    """Per-segment point-major states (tip-first within each segment) plus
    the junction/tip trace.

    ``method='refined_fused'`` also populates the double-word lists
    ``quaternions_dd`` / ``positions_dd`` (junction dd trace in
    ``junction_dd``): the chained ≤1e-8-grade state IS the pair — a single
    f32 array floors at ~3e-8 relative.
    """

    quaternions: list   # S x (..., n_s - 1, 4)
    positions: list     # S x (..., n_s - 1, 3)
    junction_quaternions: jnp.ndarray  # (..., S, 4) state at each segment tip
    junction_positions: jnp.ndarray    # (..., S, 3)
    quaternions_dd: list = None        # S x ((..., n_s-1, 4) hi, lo)
    positions_dd: list = None
    junction_dd: tuple = None          # ((q_hi, q_lo), (r_hi, r_lo))

    @property
    def tip_quaternion(self):
        return self.junction_quaternions[..., -1, :]

    @property
    def tip_position(self):
        return self.junction_positions[..., -1, :]

    def tip_position_f64(self):
        (_, _), (r_hi, r_lo) = self.junction_dd
        return (np.asarray(r_hi[..., -1, :], np.float64)
                + np.asarray(r_lo[..., -1, :], np.float64))

    def tip_quaternion_f64(self):
        (q_hi, q_lo), _ = self.junction_dd
        return (np.asarray(q_hi[..., -1, :], np.float64)
                + np.asarray(q_lo[..., -1, :], np.float64))


def segmented_rod_shape(qe_segments, cfg: SegmentedRodConfig, q_init=None,
                        r_init=None, method: str = "picard",
                        iters: int = 24, **method_kwargs) -> SegmentedSolution:
    """Chained spectral solve over all segments.

    ``qe_segments``: ``(..., S, na*ne)`` per-segment strain modes (see
    :func:`project_global_strain`).  Continuity at junctions is exact by
    construction.  ``method='fused'`` chains segments through the Pallas
    kernel's general-BC entry point (``rod_shape_fused_bc``) — each
    segment's junction state rides the lanes, batch stays VMEM-resident.
    ``method='refined_fused'`` does the same through the single refined
    kernel's BC variant, carrying DOUBLE-WORD junction states so the whole
    chain stays on the ≤1e-8 accuracy path; ``qe_segments`` may then be a
    dd pair ``(hi, lo)`` from ``rod.split_strain`` for f64-grade input.
    """
    if method == "refined_fused":
        return _segmented_refined_fused(qe_segments, cfg, q_init, r_init,
                                        iters=iters, **method_kwargs)
    qe_segments = jnp.asarray(qe_segments)
    lead = qe_segments.shape[:-2]
    q = jnp.broadcast_to(
        jnp.asarray(rod.DEFAULT_Q_INIT if q_init is None else q_init,
                    qe_segments.dtype),
        lead + (4,),
    )
    r = jnp.broadcast_to(
        jnp.asarray(rod.DEFAULT_R_INIT if r_init is None else r_init,
                    qe_segments.dtype),
        lead + (3,),
    )
    qs, rs, jq, jr = [], [], [], []
    for s, seg in enumerate(cfg.segments):
        if method == "fused":
            from ..ops.pallas import rod_kernel as rk

            # the kernel wants exactly one batch axis: flatten/restore leads
            qe_s = qe_segments[..., s, :].reshape(-1, qe_segments.shape[-1])
            seg_q, seg_r = rk.rod_shape_fused_bc(
                qe_s, q.reshape(-1, 4), r.reshape(-1, 3), cfg=seg,
                iters=iters, **method_kwargs,
            )
            sol = rod.RodSolution(
                quaternions=seg_q.reshape(lead + seg_q.shape[1:]),
                positions=seg_r.reshape(lead + seg_r.shape[1:]),
            )
        else:
            sol = rod.rod_shape(qe_segments[..., s, :], q_init=q, r_init=r,
                                cfg=seg, method=method, iters=iters,
                                **method_kwargs)
        qs.append(sol.quaternions)
        rs.append(sol.positions)
        q = sol.tip_quaternion
        r = sol.tip_position
        jq.append(q)
        jr.append(r)
    return SegmentedSolution(
        quaternions=qs,
        positions=rs,
        junction_quaternions=jnp.stack(jq, axis=-2),
        junction_positions=jnp.stack(jr, axis=-2),
    )


def _segmented_refined_fused(qe_segments, cfg: SegmentedRodConfig, q_init,
                             r_init, iters: int = 20,
                             **kernel_kwargs) -> SegmentedSolution:
    """Chained refined-fused solve: dd junction states through the BC
    variant of the single refined Pallas kernel."""
    from ..ops.pallas import refined_kernel as rfk

    if isinstance(qe_segments, tuple):
        qe_hi = jnp.asarray(qe_segments[0], jnp.float32)
        qe_lo = jnp.asarray(qe_segments[1], jnp.float32)
    else:
        qe_hi = jnp.asarray(qe_segments, jnp.float32)
        qe_lo = jnp.zeros_like(qe_hi)
    lead = qe_hi.shape[:-2]

    def dd_state(v, default, rows):
        hi = jnp.broadcast_to(
            jnp.asarray(default if v is None else v, jnp.float32),
            lead + (rows,),
        )
        return hi, jnp.zeros_like(hi)

    q_hi, q_lo = dd_state(q_init, rod.DEFAULT_Q_INIT, 4)
    r_hi, r_lo = dd_state(r_init, rod.DEFAULT_R_INIT, 3)

    qs, rs, qs_dd, rs_dd, jq, jr, jq_dd, jr_dd = ([] for _ in range(8))
    flat = lambda a, c: a.reshape(-1, c)
    for s, seg in enumerate(cfg.segments):
        sq_hi, sq_lo, sr_hi, sr_lo = rfk.rod_shape_refined_kernel_bc(
            flat(qe_hi[..., s, :], qe_hi.shape[-1]),
            flat(q_hi, 4), flat(r_hi, 3),
            qes_lo=flat(qe_lo[..., s, :], qe_lo.shape[-1]),
            q_init_lo=flat(q_lo, 4), r_init_lo=flat(r_lo, 3),
            cfg=seg, iters=iters, **kernel_kwargs,
        )
        reshape = lambda a: a.reshape(lead + a.shape[1:])
        sq_hi, sq_lo = reshape(sq_hi), reshape(sq_lo)
        sr_hi, sr_lo = reshape(sr_hi), reshape(sr_lo)
        qs.append(sq_hi + sq_lo)
        rs.append(sr_hi + sr_lo)
        qs_dd.append((sq_hi, sq_lo))
        rs_dd.append((sr_hi, sr_lo))
        # Junction = the segment's tip (point 0 on the descending grid).
        q_hi, q_lo = sq_hi[..., 0, :], sq_lo[..., 0, :]
        r_hi, r_lo = sr_hi[..., 0, :], sr_lo[..., 0, :]
        jq.append(q_hi + q_lo)
        jr.append(r_hi + r_lo)
        jq_dd.append((q_hi, q_lo))
        jr_dd.append((r_hi, r_lo))
    stack_dd = lambda pairs: (
        jnp.stack([p[0] for p in pairs], axis=-2),
        jnp.stack([p[1] for p in pairs], axis=-2),
    )
    return SegmentedSolution(
        quaternions=qs,
        positions=rs,
        junction_quaternions=jnp.stack(jq, axis=-2),
        junction_positions=jnp.stack(jr, axis=-2),
        quaternions_dd=qs_dd,
        positions_dd=rs_dd,
        junction_dd=(stack_dd(jq_dd), stack_dd(jr_dd)),
    )


def high_order_shape(qe, n: int = 256, method: str = "picard", iters: int = 48,
                     **kwargs):
    """Named entry point for the N=256 high-order config: one segment, one
    chip — a 4*(n-1)-unknown collocation solve through the standard stack."""
    return rod.rod_shape(qe, cfg=rod.RodConfig(n=n), method=method,
                         iters=iters, **kwargs)
