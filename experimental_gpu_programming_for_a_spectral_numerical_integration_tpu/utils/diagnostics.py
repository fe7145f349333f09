"""Numerical diagnostics: conditioning, convergence, invariants.

The reference's only observability is matrix dumps to stdout
(`/root/reference/main.cpp:198,202`); SURVEY.md §5 calls for structured
diagnostics instead.  Everything here returns plain floats/dicts suitable
for logging."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import collocation as coll
from ..models import rod as rod_model

__all__ = [
    "condition_number",
    "quaternion_norm_drift",
    "solution_residual_norm",
    "convergence_report",
    "picard_error_bound",
    "picard_iterations_needed",
    "f64_support_report",
]


def f64_support_report() -> dict:
    """Characterize float64 on the current default backend (ROADMAP r1).

    TPUs have no native f64; depending on the stack, a float64 request is
    either DEMOTED to f32 (silent accuracy loss) or software-emulated
    (slow but correct).  The probe adds ``2^-40`` to 1 — resolvable only
    with a >40-bit mantissa — and reports what survived.  This is why the
    framework's accuracy story is double-word f32 + int8-plane exact
    contractions, never device f64 (docs/DESIGN.md).
    """
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    with jax.enable_x64(True):
        # jit with a device-fed operand so XLA cannot constant-fold the
        # addition on the host (which would report host f64, not device).
        eps = jnp.asarray(2.0 ** -40, jnp.float64)
        x = jax.jit(lambda e: jnp.asarray(1.0, jnp.float64) + e)(eps)
        dtype_preserved = str(x.dtype) == "float64"
        resolved = bool(float(x) - 1.0 > 0.0)
    if dtype_preserved and resolved:
        verdict = "f64 available (native or emulated)"
    elif resolved:
        verdict = "f64 computed but dtype demoted"
    else:
        verdict = "f64 DEMOTED to f32 (silent): use the dd/refined paths"
    return {
        "backend": backend,
        "dtype_preserved": dtype_preserved,
        "eps40_resolved": resolved,
        "verdict": verdict,
    }


def picard_error_bound(rho: float, iters: int) -> float:
    """Volterra-series truncation bound for the Picard solve.

    ``rho = ||M|| * L`` (for the rod, ``|K|_max * L / 2``).  The error after
    ``k`` iterations is bounded by the series tail
    ``sum_{j>k} rho^j / j!`` — factorial decay, but with intermediate terms
    as large as ``rho^rho/rho!`` that amplify f32 roundoff: for
    ``rho >~ 8`` prefer more iterations + the refined path, or split the rod
    into segments (models/segments.py) so each segment's ``rho`` shrinks.
    """
    import math

    term = rho ** (iters + 1) / math.factorial(iters + 1)
    # geometric tail bound: term * 1/(1 - rho/(iters+2)) when rho < iters+2
    if rho < iters + 2:
        return term / (1.0 - rho / (iters + 2))
    return float("inf")


def picard_iterations_needed(rho: float, tol: float = 1e-7,
                             max_iters: int = 200) -> int:
    """Smallest iteration count with :func:`picard_error_bound` <= tol."""
    for k in range(1, max_iters + 1):
        if picard_error_bound(rho, k) <= tol:
            return k
    raise ValueError(
        f"rho={rho} needs >{max_iters} Picard iterations for tol={tol}; "
        "split the rod into segments instead"
    )


def condition_number(qe, cfg: rod_model.RodConfig = rod_model.RodConfig()):
    """cond_2 of the reduced collocation matrix ``A_NN`` for a strain field
    (the SURVEY §6 '~186 at N=16' health metric)."""
    m = rod_model._ode_blocks(rod_model.curvature_at_points(cfg, jnp.asarray(qe)))
    a = np.asarray(coll.collocation_matrix(cfg.grid, m), np.float64)
    return float(np.linalg.cond(a))


def quaternion_norm_drift(solution: rod_model.RodSolution) -> float:
    """max | |q| - 1 | along the rod — unit-norm invariant
    (rod_modeling.pdf eq. A.14; ~1.8e-12 for the f64 demo)."""
    if solution.quaternions_dd is not None:
        q = solution.quaternions_f64()
    else:
        q = np.asarray(solution.quaternions, np.float64)
    return float(np.max(np.abs(np.linalg.norm(q, axis=-1) - 1.0)))


def solution_residual_norm(qe, solution: rod_model.RodSolution,
                           cfg: rod_model.RodConfig = rod_model.RodConfig(),
                           q_init=(1.0, 0.0, 0.0, 0.0)) -> float:
    """||A_NN chi - (b - ivp)||_inf of the quaternion solve, in f64.

    ``q_init`` must match the initial condition the solution was computed
    with (default: the reference demo's identity quaternion).
    """
    qe = np.asarray(qe, np.float64)
    m = rod_model._ode_blocks(
        rod_model.curvature_at_points(cfg, jnp.asarray(qe))
    )
    a = np.asarray(coll.collocation_matrix(cfg.grid, m), np.float64)
    if solution.quaternions_dd is not None:
        x = solution.quaternions_f64()
    else:
        x = np.asarray(solution.quaternions, np.float64)
    flat = np.swapaxes(x, -1, -2).reshape(-1)
    rhs = -np.kron(np.eye(4), cfg.grid.dn_in[:, None]) @ np.asarray(
        q_init, np.float64
    )
    return float(np.max(np.abs(a @ flat - rhs)))


def convergence_report(qe, ns=(8, 12, 16, 24, 32), n_ref: int = 64,
                       method: str = "dense") -> dict:
    """Tip-position error vs an ``n_ref`` self-reference for a strain field —
    the spectral-accuracy acceptance curve (SURVEY §4d)."""
    qe = jnp.asarray(qe)
    ref = rod_model.rod_shape(qe, cfg=rod_model.RodConfig(n=n_ref),
                              method=method).tip_position
    out = {}
    for n in ns:
        tip = rod_model.rod_shape(qe, cfg=rod_model.RodConfig(n=n),
                                  method=method).tip_position
        out[n] = float(jnp.max(jnp.abs(tip - ref)))
    return out
