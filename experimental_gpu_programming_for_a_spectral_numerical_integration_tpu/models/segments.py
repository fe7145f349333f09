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
    the junction/tip trace."""

    quaternions: list   # S x (..., n_s - 1, 4)
    positions: list     # S x (..., n_s - 1, 3)
    junction_quaternions: jnp.ndarray  # (..., S, 4) state at each segment tip
    junction_positions: jnp.ndarray    # (..., S, 3)

    @property
    def tip_quaternion(self):
        return self.junction_quaternions[..., -1, :]

    @property
    def tip_position(self):
        return self.junction_positions[..., -1, :]


def segmented_rod_shape(qe_segments, cfg: SegmentedRodConfig, q_init=None,
                        r_init=None, method: str = "picard",
                        iters: int = 24, **method_kwargs) -> SegmentedSolution:
    """Chained spectral solve over all segments.

    ``qe_segments``: ``(..., S, na*ne)`` per-segment strain modes (see
    :func:`project_global_strain`).  Continuity at junctions is exact by
    construction.  ``method='fused'`` chains segments through the Pallas
    kernel's general-BC entry point (``rod_shape_fused_bc``) — each
    segment's junction state rides the lanes, batch stays VMEM-resident.
    """
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


def high_order_shape(qe, n: int = 256, method: str = "picard", iters: int = 48,
                     **kwargs):
    """Named entry point for the N=256 high-order config: one segment, one
    chip — a 4*(n-1)-unknown collocation solve through the standard stack."""
    return rod.rod_shape(qe, cfg=rod.RodConfig(n=n), method=method,
                         iters=iters, **kwargs)
