"""Tendon actuation — the continuum-robot loading layer.

The reference solves the *forward* kinematics of a strain-parameterized
Cosserat rod (`/root/reference/main.cpp:91-176`); the theory doc's strain
parameterization (rod_modeling.pdf ch. 2) is the standard model for
tendon-driven continuum robots, where cables routed along the backbone at
body-frame offsets actuate the shape.  This module adds that actuation
layer TPU-natively, on top of the Lagrangian assembly of
:mod:`.dynamics`.

**Variational model.**  A tendon routed at body-frame offset ``d(X)`` from
the centerline follows the world path

    p(X) = r(X) + R(q(X)) d(X),

and with frictionless routing and tension ``T`` (constant along the cable)
its potential energy is ``V = T * l(qe)`` where ``l = int_0^L |p'(X)| dX``
is the routed length.  The generalized actuation force on the strain modes
is the *exact* gradient ``-T dl/dqe`` — no hand-derived distributed-load
formulas (the classic Rucker/Webster tendon loads are exactly this
gradient, here obtained by AD): ``l`` is evaluated spectrally (``p`` on
the CGL grid, ``p'`` via the same Chebyshev differentiation matrix the
kinematics solve uses, Clenshaw–Curtis quadrature of ``|p'|``), and its
cotangent w.r.t. the full-grid ``(r, q)`` state rides the single vjp
pullback of :func:`.dynamics._mass_and_rhs` together with every other
load.  Everything is jittable and batched over leading axes of
``tension``/``qe``.

Closed-form anchor (gated in ``tests/test_tendon.py``): for a Kirchhoff
rod with one tendon at constant offset ``delta`` along body-z, the exact
routed speed is ``|p'| = |1 + kappa_y delta|``, so the potential is
quadratic-plus-linear in the strain modes and the equilibrium is the
*constant* curvature ``kappa_y = -T delta / EI_y`` — for all tensions,
not just small ones.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Callable, NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import chebyshev
from ..ops import lie
from ..ops import smallsolve
from . import rod as rod_mod

__all__ = [
    "Tendon",
    "routing_offsets",
    "routing_profiles",
    "routing_capstan_mu",
    "lengths_from_state",
    "tendon_lengths",
    "tendon_generalized_force",
    "tip_sensitivity",
    "tendon_ik",
    "TendonIKSolution",
]


@dataclass(frozen=True)
class Tendon:
    """One routed cable: a body-frame offset field ``d(X)`` along the rod.

    Exactly one routing spec applies, checked in this order:

    * ``fn`` — custom routing: a (module-level, hashable) callable mapping
      the normalized arclength array ``X (n,)`` (descending, tip→base like
      the CGL grid) to offsets ``(n, 3)`` in the body frame;
    * ``helix = (radius, turns, phase)`` — helical routing
      ``d(X) = radius (0, cos(2 pi turns X + phase), sin(...))``;
    * ``offset`` — constant body-frame offset (the straight routing of a
      conventional tendon-driven section).

    The body frame has ``e1`` along the rod tangent (the reference's
    material tangent, `main.cpp:136`), so physical routings keep the
    offset in the ``(e2, e3)`` cross-section plane; a nonzero first
    component is allowed (it models an off-section termination arm) but
    has no effect for constant routing on a Kirchhoff rod.

    ``profile``: optional (module-level, hashable) callable mapping the
    normalized arclength array ``X (n,)`` to a TENSION SCALE along the
    cable — the prescribed-tension-profile model of routing friction
    (known capstan decay ``exp(-mu theta(X))``, sheath losses, ...).  The
    cable potential becomes ``V = T int profile(X) |p'| dX``, so the
    runtime ``tension`` is the tension at the ``profile = 1`` station and
    the actuation loads taper along the routing; all ``tendon_lengths``
    -based quantities then report this profile-weighted length (the
    potential per unit tension), not the geometric length.  ``None`` =
    frictionless constant-tension routing (exact geometric length, the
    default).

    ``capstan``: Coulomb friction coefficient ``mu`` of the GEOMETRIC
    capstan law — the tension scale is ``exp(-mu Theta(X))`` with
    ``Theta(X)`` the cumulative TURNING ANGLE of the *current* cable path
    between the actuated base (global ``X = 0``) and ``X``:
    ``Theta(X) = int_0^X |t_hat'| dX'``, ``t_hat = p'/|p'|`` (Euler's
    capstan equation applied along the routing, pull stroke — the cable
    slides toward the base, so friction eats tension tip-ward; a negative
    ``mu`` models the release stroke).  Unlike ``profile`` the decay is
    computed ON DEVICE from the deformed state, so it tracks the
    configuration; it multiplies ``profile`` when both are set.  The
    turning field is weight-FROZEN (``stop_gradient``) in the length
    integral: the virtual work of a tension field ``T(s)`` on the
    structure is ``delta W = -int T t_hat . delta p' dX`` (integrate
    ``d/ds(T t_hat) . delta p`` by parts), i.e. exactly the gradient of
    the *frozen-profile* weighted length — differentiating through
    ``Theta(qe)`` would add a spurious (non-physical) conservative term.

    Frozen/hashable so configs that carry tendons stay valid jit static
    arguments.
    """

    offset: tuple = (0.0, 0.0, 0.0)
    helix: tuple | None = None
    fn: Callable | None = None
    profile: Callable | None = None
    capstan: float = 0.0

    def profile_at(self, rc: rod_mod.RodConfig) -> np.ndarray:
        """Host-side ``(n,)`` f64 tension scales at the full grid points."""
        if self.profile is None:
            return np.ones(rc.n)
        xs = np.asarray(rc.points, np.float64) / rc.length
        p = np.asarray(self.profile(xs), np.float64)
        if p.shape != (rc.n,):
            raise ValueError(
                f"tension profile returned {p.shape}, need ({rc.n},)")
        return p

    def offsets_at(self, rc: rod_mod.RodConfig) -> np.ndarray:
        """Host-side ``(n, 3)`` f64 offsets at the full CGL grid points."""
        xs = np.asarray(rc.points, np.float64) / rc.length
        if self.fn is not None:
            d = np.asarray(self.fn(xs), np.float64)
            if d.shape != (rc.n, 3):
                raise ValueError(
                    f"custom routing returned {d.shape}, need ({rc.n}, 3)")
            return d
        if self.helix is not None:
            radius, turns, phase = (float(v) for v in self.helix)
            ang = 2.0 * np.pi * turns * xs + phase
            return np.stack([np.zeros_like(xs),
                             radius * np.cos(ang),
                             radius * np.sin(ang)], axis=-1)
        return np.broadcast_to(
            np.asarray(self.offset, np.float64), (rc.n, 3)).copy()


@functools.lru_cache(maxsize=None)
def routing_offsets(tendons: tuple, rc: rod_mod.RodConfig) -> np.ndarray:
    """Stacked host routing table ``(K, n, 3)`` for a tendon set (cached —
    both keys are frozen dataclasses/tuples, so the table is built once
    per (tendon set, rod) pair per process)."""
    out = np.stack([t.offsets_at(rc) for t in tendons], axis=0)
    out.setflags(write=False)
    return out


@functools.lru_cache(maxsize=None)
def routing_profiles(tendons: tuple, rc: rod_mod.RodConfig) -> np.ndarray:
    """Stacked host tension-scale table ``(K, n)`` (ones when no tendon
    carries a profile — the constant-tension default)."""
    out = np.stack([t.profile_at(rc) for t in tendons], axis=0)
    out.setflags(write=False)
    return out


@functools.lru_cache(maxsize=None)
def routing_capstan_mu(tendons: tuple) -> np.ndarray:
    """Capstan friction coefficients ``(K,)`` of a tendon set."""
    out = np.asarray([float(t.capstan) for t in tendons], np.float64)
    out.setflags(write=False)
    return out


def lengths_from_state(r, q, tendons: tuple, rc: rod_mod.RodConfig,
                       weights=None, theta0=None, return_theta=False):
    """Routed tendon lengths ``(..., K)`` from the full-grid state.

    ``r (..., n, 3)`` / ``q (..., n, 4)`` are the full-grid positions and
    quaternions (base appended, descending grid).  The spectral derivative
    of the tendon path uses the same full-grid differentiation matrix as
    the kinematics (`chebyshev_differentiation.h:59-108` semantics), so
    the length — and with it the actuation force — converges spectrally.

    Tendons with ``capstan != 0`` get the geometric capstan weight
    ``exp(-mu Theta)`` (class docstring): the turning rate ``|t_hat'|``
    is differentiated and accumulated spectrally (differentiation +
    antiderivative matrices of the same grid), then FROZEN
    (``stop_gradient``) so the vjp of the returned length is the physical
    distributed cable load.  ``theta0 (..., K)`` offsets the turning angle
    (segmented chains accumulate across junctions); ``return_theta=True``
    additionally returns the turning angle at the segment TIP (grid point
    0) for that chaining.  Both are inert for capstan-free tendon sets.
    """
    dtype = r.dtype
    offs = jnp.asarray(routing_offsets(tuple(tendons), rc), dtype)  # (K,n,3)
    d_full = jnp.asarray(chebyshev.diff_matrix(rc.n, rc.length), dtype)
    if weights is None:
        weights = chebyshev.clenshaw_curtis_weights(rc.n, rc.length)
    w = jnp.asarray(weights, dtype)
    # Per-tendon quadrature kernel: CC weights x tension profile (ones for
    # frictionless routing — then this IS the geometric length).
    wk = w * jnp.asarray(routing_profiles(tuple(tendons), rc), dtype)
    # p = r + R(q) d, broadcast over the tendon axis.
    p = r[..., None, :, :] + lie.quat_rotate_normalized(
        q[..., None, :, :], offs)                       # (..., K, n, 3)
    dp = jnp.einsum("ij,...jc->...ic", d_full, p, precision="highest")
    speed = jnp.sqrt(jnp.sum(dp * dp, axis=-1))          # (..., K, n)
    mu = routing_capstan_mu(tuple(tendons))
    theta_tip = None
    if np.any(mu != 0.0):
        # Cumulative turning angle from the base: Theta = G |D t_hat|
        # (G = spectral antiderivative with F(base) = 0, the same matrix
        # the distributed-load statics uses).  The 1e-30 only guards the
        # 0/0 of a perfectly straight path; the whole weight is frozen so
        # no tangent ever crosses the sqrt.
        t_hat = dp / speed[..., None]
        dt = jnp.einsum("ij,...jc->...ic", d_full, t_hat,
                        precision="highest")
        turn = jnp.sqrt(jnp.sum(dt * dt, axis=-1) + 1e-30)  # (..., K, n)
        # Full-grid forward antiderivative: int_0^{x_i} = int_{x_i}^{L}
        # subtracted from the full integral (base row of the tail-integral
        # operator) — (n, n), zero base column, Theta(base) = 0.
        t_mat = np.asarray(chebyshev.partial_integral_matrix(rc.n, rc.length))
        g_mat = jnp.asarray(t_mat[-1][None, :] - t_mat, dtype)
        theta = jnp.einsum("ij,...j->...i", g_mat, turn)     # (..., K, n)
        if theta0 is not None:
            theta = theta + jnp.asarray(theta0, dtype)[..., None]
        theta = jax.lax.stop_gradient(theta)
        wk = wk * jnp.exp(-jnp.asarray(mu, dtype)[:, None] * theta)
        theta_tip = theta[..., 0]
    elif theta0 is not None or return_theta:
        theta_tip = (jnp.zeros(p.shape[:-2], dtype) if theta0 is None
                     else jnp.asarray(theta0, dtype))
    # einsum ellipsis broadcasting handles both the (K, n) host kernel and
    # the (..., K, n) capstan-weighted one.
    lens = jnp.einsum("...kj,...kj->...k", wk, speed)    # (..., K)
    if return_theta:
        return lens, theta_tip
    return lens


def tendon_lengths(qe, cfg, iters: int = 16):
    """Routed lengths ``(..., K)`` at strain modes ``qe`` (differentiable
    through the spectral solve via the Picard IFT tangents).  Generic over
    the dynamics-config kinematic hooks — segmented configs (mid-rod
    terminations) included."""
    qe = jnp.asarray(qe)
    r, q = cfg.state_full(qe, iters)
    return cfg.tendon_lengths_from_state(r, q)


def tendon_generalized_force(qe, tension, cfg, iters: int = 16):
    """Exact actuation force on the strain modes: ``-sum_k T_k dl_k/dqe``.

    This is what :func:`.dynamics._mass_and_rhs` assembles internally (as
    a state cotangent through the shared load pullback); exposed for
    diagnostics and cross-gating against finite differences of
    :func:`tendon_lengths`.
    """
    qe = jnp.asarray(qe)
    tension = jnp.asarray(tension, qe.dtype)

    def pot(q_):
        return jnp.sum(tension * tendon_lengths(q_, cfg, iters))

    return -jax.grad(pot)(qe)


def _tip_of(qe, cfg, iters):
    r, _ = cfg.state_full(qe, iters)
    return r[..., 0, :]                          # global tip = point 0


def tip_sensitivity(qe, tension, cfg, tip_force=None, tip_moment=None,
                    iters: int = 16):
    """``(tip, dtip/dtension)`` at an actuated equilibrium, via the IFT.

    At equilibrium ``Q(qe*, T) = 0``; differentiating,
    ``dqe*/dT = -(dQ/dqe)^{-1} dQ/dT`` and the tip map chains on top:
    ``dtip/dT = (dtip/dqe) dqe*/dT`` — ``(..., 3, K)``.  Batched over
    leading axes (per-sample Jacobians via linearize-over-directions, the
    same shape-preserving trick as the implicit integrator).
    """
    from . import dynamics as dyn

    qe = jnp.asarray(qe)
    tension = jnp.asarray(tension, qe.dtype)
    nq = qe.shape[-1]
    k_t = tension.shape[-1]

    def balance(q_, t_):
        _, rhs = dyn._mass_and_rhs(q_, jnp.zeros_like(q_), cfg, tip_force,
                                   iters, tip_moment, tension=t_,
                                   static_only=True)
        return rhs

    _, lin_q = jax.linearize(lambda q_: balance(q_, tension), qe)
    cols_q = jax.vmap(lambda e: lin_q(jnp.broadcast_to(e, qe.shape)))(
        jnp.eye(nq, dtype=qe.dtype))
    j_q = jnp.moveaxis(cols_q, 0, -1)                    # (..., nq, nq)

    _, lin_t = jax.linearize(lambda t_: balance(qe, t_), tension)
    cols_t = jax.vmap(lambda e: lin_t(jnp.broadcast_to(e, tension.shape)))(
        jnp.eye(k_t, dtype=qe.dtype))
    j_t = jnp.moveaxis(cols_t, 0, -1)                    # (..., nq, K)

    dqe_dt = -smallsolve.gauss_jordan_solve(j_q, j_t)    # (..., nq, K)

    tip, lin_tip = jax.linearize(lambda q_: _tip_of(q_, cfg, iters), qe)
    j_tip = jnp.moveaxis(
        jax.vmap(lin_tip)(jnp.moveaxis(dqe_dt, -1, 0)), 0, -1)  # (..., 3, K)
    return tip, j_tip


class TendonIKSolution(NamedTuple):
    tension: jnp.ndarray    # (..., K) recovered tensions (>= min_tension)
    qe: jnp.ndarray         # (..., nq) equilibrium strain modes
    tip: jnp.ndarray        # (..., 3) achieved tip position
    tip_error: jnp.ndarray  # (...,) ||tip - target||_2


def tendon_ik(target_tip, cfg, tension0=None, gn_steps: int = 12,
              lm_damping: float = 1e-8, iters: int = 16,
              statics_tol: float = 1e-9, statics_max_iter: int = 40,
              min_tension: float = 0.0, tip_force=None,
              tip_moment=None) -> TendonIKSolution:
    """Inverse actuation: tensions that place the equilibrium tip at
    ``target_tip`` — Gauss–Newton on the tip map with IFT sensitivities.

    Each outer iterate (one ``lax.scan`` — the whole IK is a single
    jittable program) solves the actuated equilibrium
    (:func:`.dynamics.solve_contact_statics`, warm started), evaluates
    :func:`tip_sensitivity`, takes a Levenberg–Marquardt-damped
    Gauss–Newton step on ``min_T ||tip(T) - target||^2`` with an active
    set on the ``T >= min_tension`` bound (cables only pull).  Batched over leading axes of ``target_tip`` /
    ``tension0``: a whole workspace of targets inverts in one call.

    With fewer tendons than 3 the system is least-squares (closest
    reachable tip); with more it is redundant and LM damping picks the
    minimum-norm tension update.
    """
    from . import dynamics as dyn

    target = jnp.asarray(target_tip)
    dtype = target.dtype
    k_t = len(cfg.tendons)
    if k_t == 0:
        raise ValueError("tendon_ik needs cfg.tendons to be non-empty")
    if tension0 is None:
        tension0 = jnp.zeros(target.shape[:-1] + (k_t,), dtype)
    tension = jnp.asarray(tension0, dtype)
    nq = cfg.nq
    qe = jnp.zeros(tension.shape[:-1] + (nq,), dtype)

    eye = jnp.eye(k_t, dtype=dtype)

    def gn_step(qe, tension):
        sol = dyn.solve_contact_statics(
            cfg, qe0=qe, tip_force=tip_force, tip_moment=tip_moment,
            tol=statics_tol, max_iter=statics_max_iter, iters=iters,
            tension=tension)
        qe = sol.qe
        tip, j_tip = tip_sensitivity(qe, tension, cfg, tip_force,
                                     tip_moment, iters)
        err = tip - target                                # (..., 3)
        g = jnp.einsum("...ck,...c->...k", j_tip, err)
        # Active set for the T >= min_tension bound: coordinates AT the
        # bound whose gradient pushes outward are frozen THIS step, so the
        # free coordinates get the correct reduced Gauss-Newton direction
        # (clamping a joint step instead biases the free coordinates and
        # stalls at the boundary — measured on the redundant-routing IK).
        # Re-deriving the set each iterate unfreezes a coordinate as soon
        # as its gradient turns inward, so interior optima stay reachable.
        at_bound = tension <= min_tension + 1e-12
        frozen = jnp.logical_and(at_bound, g > 0.0)
        free = 1.0 - frozen.astype(dtype)                 # (..., K)
        jtj = jnp.einsum("...ck,...cl->...kl", j_tip, j_tip)
        jtj = (free[..., :, None] * free[..., None, :] * jtj
               + (lm_damping * free
                  + frozen.astype(dtype))[..., None, :] * eye)
        step = smallsolve.gauss_jordan_solve(jtj, free * g)
        return qe, jnp.maximum(tension - free * step, min_tension)

    # ONE compiled program, scanned gn_steps times: re-tracing the
    # equilibrium solve + sensitivity per outer iterate (a host loop of
    # eager lax.while_loops) both wastes compile time and piles up live
    # XLA:CPU executables (the conftest reliability note).
    def scan_body(carry, _):
        return gn_step(*carry), None

    (qe, tension), _ = jax.lax.scan(scan_body, (qe, tension), None,
                                    length=gn_steps)

    sol = dyn.solve_contact_statics(
        cfg, qe0=qe, tip_force=tip_force, tip_moment=tip_moment,
        tol=statics_tol, max_iter=statics_max_iter, iters=iters,
        tension=tension)
    qe = sol.qe
    tip = _tip_of(qe, cfg, iters)
    return TendonIKSolution(
        tension=tension, qe=qe, tip=tip,
        tip_error=jnp.linalg.norm(tip - target, axis=-1))
