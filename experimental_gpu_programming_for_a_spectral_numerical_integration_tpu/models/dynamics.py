"""Rod dynamics: Lagrangian time integration in the strain-mode space.

Beyond the reference's static scope (docs/ROADMAP.md), but a direct
continuation of the theory it ships: the strain parameterization
``kappa(X) = Phi(X) qe`` (rod_modeling.pdf eq. 2.5) makes ``qe`` a set of
generalized coordinates, with

* potential energy ``V = 1/2 (qe - kappa0)^T K_ee (qe - kappa0)`` where
  ``K_ee = int_0^L Phi^T H_a Phi dX`` — **pdf eq. 2.14 implemented
  literally** (:func:`stiffness_matrix`; block-diagonal, Gram matrix of the
  modal basis under Clenshaw-Curtis quadrature),
* kinetic energy ``T = 1/2 qd^T M(qe) qd`` with the configuration-dependent
  mass ``M = int rhoA J^T J dX``, ``J = dr/dqe`` the position Jacobian of
  the spectral solve (slender-rod translational inertia; rotary inertia
  O((d/L)^2) smaller),
* Euler-Lagrange equations assembled by AD: the Coriolis/centrifugal term
  is ``(dM/dt) qd - 1/2 grad_qe(qd^T M qd)``, evaluated as one ``jvp`` of
  the mass matrix along ``qd`` plus one gradient — no hand-derived
  Christoffel symbols.

Everything is jit/vmap-friendly: the position Jacobian uses the
implicit-function JVP of the Picard solve (one extra solve per direction),
mass-matrix solves use the TPU-native Gauss-Jordan (ops/smallsolve.py), and
time stepping is RK4 inside ``lax.scan``.

Validation gates (tests/test_dynamics.py): linearized natural frequencies
against the Euler-Bernoulli cantilever series (beta_1 L = 1.8751...),
energy conservation of the free oscillator, and damped relaxation onto the
statics equilibrium.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import lie, smallsolve
from . import cosserat, rod
from . import tendon as tendon_mod
from . import magnetics as magnetics_mod

__all__ = [
    "ContactPlane",
    "ContactSphere",
    "ContactCylinder",
    "RodRodContact",
    "scene_energy",
    "scene_accelerations",
    "simulate_scene",
    "DynamicsConfig",
    "SegmentedDynamicsConfig",
    "Trajectory",
    "stiffness_matrix",
    "mass_matrix",
    "potential_energy",
    "kinetic_energy",
    "total_energy",
    "accelerations",
    "simulate",
    "simulate_implicit",
    "ContactStaticsSolution",
    "damped_newton",
    "solve_contact_statics",
    "parametric_stability_map",
    "natural_frequencies",
    "linearized_spectrum",
    "damped_spectrum",
    "frequency_response",
    "critical_load",
]


class _Obstacle:
    """Shared smooth-penalty machinery for unilateral obstacle contact.

    A concrete obstacle is a frozen dataclass with the penalty fields
    (``stiffness``, ``damping``, ``smoothing``, ``friction``,
    ``friction_vel``) plus its geometry, and defines ONE method:
    ``gap(r)`` — a signed-distance-like penetration field at positions
    ``r (..., n, 3)``, **positive inside the obstacle**, pointwise in the
    grid index, with ``|∇g| = 1`` (all three shapes below satisfy this;
    the force assembly relies on it to read the contact normal and the
    normal-force magnitude off one gap vjp).

    Smooth penalty formulation (jit/AD-friendly — no complementarity
    switching inside ``lax`` control flow): the penetration maps through
    the C-infinity softplus ramp ``s(g) = smoothing * softplus(g /
    smoothing)`` (→ ``max(g, 0)`` as ``smoothing → 0``), giving the
    penalty potential ``V = 1/2 stiffness ∫ s(g)^2 dX`` whose gradient
    ``-k s s' ∇g`` is the distributed normal force — conservative, so the
    undamped bounce gates conserve total energy.  ``damping`` adds a
    non-conservative normal dashpot ``-damping s'(g) (dg/dt) ∇g``, active
    only in contact (s' = the smooth Heaviside) and dissipative by
    construction (power ``-damping s' (dg/dt)^2 <= 0``).  ``friction``
    is the Coulomb coefficient mu of a regularized tangential law
    ``f_t = -mu N v_t / sqrt(|v_t|^2 + friction_vel^2)`` (N = the
    nonnegative normal-force density): |f_t| → mu N when sliding, a stiff
    viscous creep |f_t| ≈ mu N |v_t|/friction_vel near stick — pick
    ``friction_vel`` well below the sliding speeds of interest.
    Penetration depth at rest scales like ``(line load)/stiffness`` —
    pick ``stiffness`` for the tolerable compliance, ``smoothing`` well
    below it.
    """

    def gap_ramp(self, r):
        """``s(g)`` at positions ``r (..., n, 3)`` (positive in contact)."""
        return self.smoothing * jax.nn.softplus(self.gap(r) / self.smoothing)


@dataclass(frozen=True)
class ContactPlane(_Obstacle):
    """Half-space obstacle: the rod must stay on the
    ``normal . r >= offset`` side; ``gap = offset - normal . r``."""

    normal: tuple = (0.0, 0.0, 1.0)
    offset: float = 0.0
    stiffness: float = 1e4
    damping: float = 0.0
    smoothing: float = 1e-3
    friction: float = 0.0
    friction_vel: float = 1e-3

    def gap(self, r):
        n_hat = jnp.asarray(self.normal, r.dtype)
        return self.offset - jnp.einsum("...c,c->...", r, n_hat)


@dataclass(frozen=True)
class ContactSphere(_Obstacle):
    """Spherical obstacle of ``radius`` at ``center``.  ``interior=False``
    (default) excludes the rod from the ball (``gap = radius - |r - c|``);
    ``interior=True`` confines it INSIDE the sphere (contact with the
    inner wall, ``gap = |r - c| - radius``)."""

    center: tuple = (0.0, 0.0, 0.0)
    radius: float = 0.5
    interior: bool = False
    stiffness: float = 1e4
    damping: float = 0.0
    smoothing: float = 1e-3
    friction: float = 0.0
    friction_vel: float = 1e-3

    def gap(self, r):
        c = jnp.asarray(self.center, r.dtype)
        # smooth at the center is irrelevant (deep inside the obstacle);
        # the epsilon only guards the gradient's 0/0 there
        d = jnp.sqrt(jnp.sum((r - c) ** 2, axis=-1) + 1e-30)
        g = self.radius - d
        return -g if self.interior else g


@dataclass(frozen=True)
class ContactCylinder(_Obstacle):
    """Infinite circular cylinder obstacle: axis through ``point`` along
    (unit) ``axis``, ``gap = radius - dist_to_axis`` (rod excluded)."""

    point: tuple = (0.0, 0.0, 0.0)
    axis: tuple = (0.0, 1.0, 0.0)
    radius: float = 0.5
    stiffness: float = 1e4
    damping: float = 0.0
    smoothing: float = 1e-3
    friction: float = 0.0
    friction_vel: float = 1e-3

    def gap(self, r):
        p = jnp.asarray(self.point, r.dtype)
        u = jnp.asarray(self.axis, r.dtype)
        u = u / jnp.linalg.norm(u)
        d = r - p
        d_perp = d - jnp.einsum("...c,c->...", d, u)[..., None] * u
        return self.radius - jnp.sqrt(
            jnp.sum(d_perp ** 2, axis=-1) + 1e-30)


@dataclass(frozen=True)
class RodRodContact:
    """Rod–rod (and self-to-neighbor) contact for multi-rod scenes.

    Smooth-penalty pairwise law between the grid points of DISTINCT rods:
    centerline distance below ``2 * radius`` (two touching circular
    cross-sections) penetrates, mapped through the same softplus ramp as
    the obstacle contacts, giving the conservative scene potential

        ``V = 1/2 stiffness * sum_{i<k} ∫∫ s(2 radius - |r_i(X) -
        r_k(Y)|)^2 dX dY``

    whose exact gradient (one ``jax.grad`` through the spectral solves)
    is the interaction force — undamped scenes conserve energy to
    integrator order.  O(R^2 n^2) pairwise terms: all-pairs on the MXU
    by default — exact and fine at O(10) rods; for O(100)+ set
    ``budget`` (static-shape candidate gather, see the field comment and
    :meth:`broadphase_overflow`).

    ``self_window`` (arclength) turns on SELF-contact: point pairs of the
    SAME rod with ``|s_j - s_l| >= self_window`` enter the same penalty —
    the window excludes the near-diagonal band where the centerline
    distance is legitimately below ``2 radius`` because the pair is
    neighbors ALONG the rod, not a self-intersection.  Pick it a few
    times ``2 radius`` (curvature-limited: a rod bent to radius rho has
    chord ``|Δs| ≈ 2 rho sin(Δs / 2 rho) < Δs``, so the window only
    needs to clear the tightest admissible bend).

    ``friction`` adds the same regularized Coulomb law the obstacles
    carry (see :class:`_Obstacle`) to every interacting point PAIR: the
    tangential force on rod ``i`` point ``j`` from its partner is ``-mu
    N_pair v_t / sqrt(|v_t|^2 + friction_vel^2)`` with ``v_t`` the
    RELATIVE velocity of the pair projected off the pair direction and
    ``N_pair`` the pair's nonnegative normal-force density.  The law is
    antisymmetric under partner exchange (``v_t`` and the projector
    flip together), so friction transmits momentum between the rods but
    injects none, and its power ``-mu N |v_t|^2 / sqrt(...) <= 0`` is
    dissipative pairwise by construction.  Self-contact pairs (under
    ``self_window``) get the identical law.
    """

    radius: float = 0.05
    stiffness: float = 1e4
    smoothing: float = 1e-3
    self_window: float | None = None
    friction: float = 0.0
    friction_vel: float = 1e-3
    # Broad-phase: with ``budget = K`` each rod interacts only with its K
    # most-promising partners (smallest bounding-sphere surface distance,
    # a static-shape top-k gather), turning the all-pairs O(R^2 n^2)
    # fields into O(R K n^2) — the O(100)-rod regime.  SIZING CONTRACT:
    # K must cover every genuinely-near partner (check with
    # :meth:`broadphase_overflow`); a pair present in only one rod's
    # candidate list contributes at half stiffness, but the force stays
    # the exact gradient of a translation-invariant potential, so energy
    # and momentum conservation are unconditional.  ``budget >= R - 1``
    # (or ``None``) routes to the exact all-pairs path.
    budget: int | None = None

    def _pair_fields(self, r_all, s_grid):
        """Pairwise geometry shared by the potential and the friction law:
        separation vectors ``d (..., R, R, n, n, 3)`` (pointing from the
        partner ``(k, l)`` to the point ``(i, j)``), distances, gap ramp
        ``s`` / slope ``s'``, and the ORDERED interaction mask (1 for
        every interacting ordered pair: ``i != k`` all points, ``i == k``
        off-band points when ``self_window`` is set)."""
        d = (r_all[..., :, None, :, None, :]
             - r_all[..., None, :, None, :, :])        # (..., R, R, n, n, 3)
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-30)
        g = 2.0 * self.radius - dist
        s = self.smoothing * jax.nn.softplus(g / self.smoothing)
        sprime = jax.nn.sigmoid(g / self.smoothing)
        nr, n = r_all.shape[-3], r_all.shape[-2]
        off = ((1.0 - jnp.eye(nr, dtype=r_all.dtype))[:, :, None, None]
               * jnp.ones((n, n), r_all.dtype))
        if self.self_window is not None:
            if s_grid is None:
                raise ValueError("self_window needs the grid arclengths")
            s_grid = jnp.asarray(s_grid, r_all.dtype)
            band = (jnp.abs(s_grid[:, None] - s_grid[None, :])
                    >= self.self_window).astype(r_all.dtype)
            off = off + (jnp.eye(nr, dtype=r_all.dtype)[:, :, None, None]
                         * ((1.0 - jnp.eye(n, dtype=r_all.dtype)) * band))
        return d, dist, s, sprime, off

    def _use_broadphase(self, r_all) -> bool:
        nr = r_all.shape[-3]
        return self.budget is not None and self.budget < nr - 1

    def _partner_index(self, r_all):
        """``(..., R, K)`` candidate partner rods: the ``budget`` smallest
        bounding-sphere SURFACE distances (centroid separation minus both
        bounding radii — tighter than raw centroid distance for rods of
        unequal extent).  Indices are data-dependent but static-shape, so
        the gather jits; AD flows through the gathered values (top-k
        membership is piecewise constant, and with an adequate budget the
        marginal pairs carry ~zero penalty, so the force stays smooth)."""
        cent = jnp.mean(r_all, axis=-2)                  # (..., R, 3)
        rad = jnp.max(jnp.linalg.norm(r_all - cent[..., None, :], axis=-1),
                      axis=-1)                           # (..., R)
        diff = cent[..., :, None, :] - cent[..., None, :, :]
        dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-30)
        surf = dist - rad[..., :, None] - rad[..., None, :]
        nr = r_all.shape[-3]
        surf = jnp.where(jnp.eye(nr, dtype=bool), jnp.inf, surf)
        _, idx = jax.lax.top_k(-surf, self.budget)       # (..., R, K)
        return idx

    def _gather_partner(self, field, idx):
        """``field (..., R, n, c)`` gathered at partner rods: ``(..., R,
        K, n, c)``."""
        nr, n, c = field.shape[-3], field.shape[-2], field.shape[-1]
        lead = field.shape[:-3]
        f_exp = jnp.broadcast_to(field[..., None, :, :, :],
                                 lead + (nr, nr, n, c))
        i_exp = jnp.broadcast_to(idx[..., :, :, None, None],
                                 lead + (nr, self.budget, n, c))
        return jnp.take_along_axis(f_exp, i_exp, axis=-3)

    def _gathered_fields(self, r_all, idx):
        """Gathered analogue of :meth:`_pair_fields`: separation vectors
        ``d (..., R, K, n, n, 3)`` (partner point ``l`` to own point
        ``j``), distances, penalty ramp and slope."""
        r_part = self._gather_partner(r_all, idx)        # (..., R, K, n, 3)
        d = (r_all[..., :, None, :, None, :]
             - r_part[..., :, :, None, :, :])            # (..., R, K, n, n, 3)
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-30)
        g = 2.0 * self.radius - dist
        s = self.smoothing * jax.nn.softplus(g / self.smoothing)
        sprime = jax.nn.sigmoid(g / self.smoothing)
        return d, dist, s, sprime

    def _self_band_fields(self, r_all, s_grid):
        """Same-rod off-band point pairs (the ``self_window`` law) as
        ``(..., R, n, n)`` fields — shared by the broad-phase potential
        and friction, where the rod-level gather never yields self."""
        if s_grid is None:
            raise ValueError("self_window needs the grid arclengths")
        d = r_all[..., :, :, None, :] - r_all[..., :, None, :, :]
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-30)
        g = 2.0 * self.radius - dist
        s = self.smoothing * jax.nn.softplus(g / self.smoothing)
        sprime = jax.nn.sigmoid(g / self.smoothing)
        s_grid = jnp.asarray(s_grid, r_all.dtype)
        n = r_all.shape[-2]
        band = (jnp.abs(s_grid[:, None] - s_grid[None, :])
                >= self.self_window).astype(r_all.dtype)
        mask = band * (1.0 - jnp.eye(n, dtype=r_all.dtype))
        return d, dist, s, sprime, mask

    def broadphase_overflow(self, r_all, margin: float | None = None):
        """Sizing-contract check for ``budget``: True (per leading batch
        element) when some ACTUALLY-near partner — minimum point-pair
        distance below ``2 radius + margin`` — is missing from the
        candidate set the gather would select, i.e. the broad-phase
        fields would drop a real interaction.  Exact but all-pairs
        (O(R^2 n^2), one dense potential's cost): a sizing-time
        diagnostic to run on representative configurations when choosing
        ``K``, not a hot-loop guard."""
        if self.budget is None or not self._use_broadphase(r_all):
            return jnp.zeros(r_all.shape[:-3], bool)
        if margin is None:
            margin = 6.0 * self.smoothing
        d = (r_all[..., :, None, :, None, :]
             - r_all[..., None, :, None, :, :])        # (..., R, R, n, n, 3)
        dist = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-30)
        mind = jnp.min(dist, axis=(-1, -2))            # (..., R, R)
        nr = r_all.shape[-3]
        near = jnp.where(jnp.eye(nr, dtype=bool), False,
                         mind < 2.0 * self.radius + margin)
        idx = self._partner_index(r_all)               # (..., R, K)
        member = jnp.any(jax.nn.one_hot(idx, nr, dtype=bool), axis=-2)
        return jnp.any(jnp.logical_and(near, ~member), axis=(-1, -2))

    def pair_potential(self, r_all, w_q, s_grid=None):
        """Scene penalty energy at positions ``r_all (..., R, n, 3)``
        (full grids, world frame), quadrature weights ``w_q (n,)``.
        ``s_grid (n,)``: grid arclength coordinates, required when
        ``self_window`` is set.  With ``budget`` set, rod–rod terms run
        on the gathered candidate set (self-contact keeps its exact
        per-rod band)."""
        ww = w_q[:, None] * w_q[None, :]
        if not self._use_broadphase(r_all):
            _, _, s, _, mask = self._pair_fields(r_all, s_grid)
            # mask counts every interacting ORDERED pair, i.e. each
            # unordered pair twice — hence 1/4, not the usual 1/2.
            return 0.25 * self.stiffness * jnp.einsum(
                "jl,ikjl,...ikjl->...", ww, mask, s * s)
        idx = self._partner_index(r_all)
        _, _, s, _ = self._gathered_fields(r_all, idx)
        v = 0.25 * self.stiffness * jnp.einsum(
            "jl,...ikjl->...", ww, s * s)
        if self.self_window is not None:
            _, _, s_s, _, mask = self._self_band_fields(r_all, s_grid)
            v = v + 0.25 * self.stiffness * jnp.einsum(
                "jl,...ijl->...", ww, mask * s_s * s_s)
        return v

    @staticmethod
    def _coulomb_field(d, dist, s, sprime, v_rel, ww, stiffness, mu,
                       friction_vel):
        """Shared regularized pairwise Coulomb law: tangential force per
        (own point, partner point) pair, contracted over partner axes.
        ``d/dist/s/sprime`` pairwise fields with partner axes ``(-3, -2)``
        of the scalars; returns the per-own-point force field."""
        n_hat = d / dist[..., None]
        v_t = v_rel - jnp.einsum("...c,...c->...", v_rel,
                                 n_hat)[..., None] * n_hat
        speed = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1) + friction_vel ** 2)
        n_mag = stiffness * s * sprime * ww            # >= 0 by construction
        coef = mu * n_mag / speed
        return coef, v_t

    def friction_force(self, r_all, v_all, w_q, s_grid=None):
        """Per-point friction force field ``(..., R, n, 3)`` (a cotangent
        on the scene positions) from grid velocities ``v_all`` — the
        regularized pairwise Coulomb law of the class docstring.  With
        ``budget`` set, rod–rod pairs run on the gathered candidate set
        (self-contact keeps its exact per-rod band)."""
        ww = w_q[:, None] * w_q[None, :]               # (j, l) weights
        if not self._use_broadphase(r_all):
            d, dist, s, sprime, mask = self._pair_fields(r_all, s_grid)
            v_rel = (v_all[..., :, None, :, None, :]
                     - v_all[..., None, :, None, :, :])  # (...,R,R,n,n,3)
            coef, v_t = self._coulomb_field(
                d, dist, s, sprime, v_rel, ww, self.stiffness,
                self.friction, self.friction_vel)
            return -jnp.einsum("...ikjl,...ikjlc->...ijc", mask * coef, v_t)
        idx = self._partner_index(r_all)
        d, dist, s, sprime = self._gathered_fields(r_all, idx)
        v_part = self._gather_partner(v_all, idx)
        v_rel = (v_all[..., :, None, :, None, :]
                 - v_part[..., :, :, None, :, :])      # (..., R, K, n, n, 3)
        coef, v_t = self._coulomb_field(
            d, dist, s, sprime, v_rel, ww, self.stiffness, self.friction,
            self.friction_vel)
        f = -jnp.einsum("...ikjl,...ikjlc->...ijc", coef, v_t)
        if self.self_window is not None:
            d_s, dist_s, s_s, sp_s, mask = self._self_band_fields(
                r_all, s_grid)
            v_rel_s = (v_all[..., :, :, None, :]
                       - v_all[..., :, None, :, :])    # (..., R, n, n, 3)
            coef_s, v_t_s = self._coulomb_field(
                d_s, dist_s, s_s, sp_s, v_rel_s, ww, self.stiffness,
                self.friction, self.friction_vel)
            f = f - jnp.einsum("...ijl,...ijlc->...ijc", mask * coef_s,
                               v_t_s)
        return f


@dataclass(frozen=True)
class DynamicsConfig:
    """Statics configuration + inertia/damping.

    ``rho_a``: mass per unit length (translational inertia).
    ``damping``: stiffness-proportional viscous damping coefficient
    (generalized force ``-damping * K_ee qd``).
    ``gravity``: constant acceleration vector applied along the rod.
    """

    statics: cosserat.StaticsConfig = field(
        default_factory=lambda: cosserat.StaticsConfig(
            rod=rod.RodConfig(n=16)))
    rho_a: float = 1.0
    # Rotary inertia per unit length (rhoA * r_gyration^2).  Physically
    # O((r/L)^2) small for slender rods, but REQUIRED > 0: torsion modes
    # carry no translational inertia, so rho_i = 0 makes M singular (an
    # index-3 DAE, not an ODE).
    rho_i: float = 1e-3
    # Mass-proportional viscous damping: qdd += -damping * qd.  (Mass- not
    # stiffness-proportional: the latter makes the high-frequency torsion
    # modes' decay rates stiff, destroying explicit-RK4 stability.)
    damping: float = 0.0
    # Kelvin-Voigt INTERNAL (material) damping: the constitutive law
    # H (kappa + kv_damping * kappa_dot), whose modal projection is the
    # generalized force -kv_damping * K_ee qd — per-mode damping ratio
    # zeta_k = kv_damping * omega_k / 2 (high modes decay FASTER, the
    # physical soft-material signature; the mass-proportional `damping`
    # above decays all modes equally).  Stiffness-proportional rates are
    # stiff: pair with `simulate_implicit` (explicit RK4 needs dt below
    # the torsion branch's damped scale).
    kv_damping: float = 0.0
    gravity: tuple | None = None
    # One obstacle or a tuple of them (plane / sphere / cylinder mix);
    # penalty forces sum.
    contact: _Obstacle | tuple | None = None
    # Routed cables (models/tendon.py): actuation forces are the exact
    # gradients of the routed lengths, scaled by the runtime ``tension``
    # argument of accelerations/simulate*/solve_contact_statics.
    tendons: tuple = ()
    # Magnetization distributions (models/magnetics.py): loads are the
    # exact gradient of the magnetic potential -int (R m).B(r) dX, driven
    # by the runtime ``b_field`` spec (uniform vector, (B0, G) gradient
    # pair, or a callable of time in the integrators) — threaded through
    # the same entry points as ``tension``.
    magnets: tuple = ()
    # Resistive-force-theory fluid drag ``(c_t, c_n)``: anisotropic
    # low-Reynolds drag per unit length, ``f = -c_t (v.t) t - c_n v_perp``
    # with ``t`` the unit material tangent (slender-body theory gives
    # c_n ~ 2 c_t; catheters-in-fluid / swimming-filament loading).
    # Dissipative by construction: power = -int c_t (v.t)^2 + c_n |v_perp|^2.
    # Linear in velocity, so the exact generalized force is
    # ``-fluid_damping_matrix(qe) qd`` (cross-gated), and the spectrum
    # tools fold it into C.
    fluid_drag: tuple | None = None

    @property
    def contacts(self) -> tuple:
        if self.contact is None:
            return ()
        if isinstance(self.contact, tuple):
            return self.contact
        return (self.contact,)

    @property
    def rod(self) -> rod.RodConfig:
        return self.statics.rod

    @functools.cached_property
    def k_ee(self) -> np.ndarray:
        return stiffness_matrix(self.statics)

    @functools.cached_property
    def kappa0_modes(self) -> np.ndarray:
        nq = self.rod.na * self.rod.ne
        if self.statics.kappa0 is None:
            return np.zeros(nq)
        return np.asarray(self.statics.kappa0, np.float64)

    # -- kinematic-map hooks (overridden by SegmentedDynamicsConfig so the
    #    whole Lagrangian assembly, the integrators, the contact statics
    #    and the spectrum tools run unchanged on chained rods) --

    @property
    def nq(self) -> int:
        """Flat generalized-coordinate count."""
        return self.rod.na * self.rod.ne

    @functools.cached_property
    def quad_weights_full(self) -> np.ndarray:
        """Clenshaw-Curtis weights aligned with ``state_full``'s grid."""
        return np.asarray(self.statics.quad_weights, np.float64)

    @functools.cached_property
    def points_full(self) -> np.ndarray:
        """Global arclengths of ``state_full``'s grid (tip first — the
        descending CGL convention)."""
        return np.asarray(self.statics.rod.points, np.float64)

    @functools.cached_property
    def magnet_table(self) -> np.ndarray:
        """Summed (n, 3) body-frame dipole-density table of
        ``self.magnets`` on the full grid (magnetization superposes, so
        one table serves the whole energy — models/magnetics.py)."""
        xs = self.points_full
        total = float(xs[0]) if xs[0] > 0 else 1.0
        return magnetics_mod.magnetization_table(self.magnets, xs / total)

    def state_full(self, qe, iters: int):
        """Full-grid world state ``(r (..., n, 3), q (..., n, 4))`` with
        the GLOBAL TIP at point 0 (descending grid, base appended) — the
        kinematic map whose IFT tangents carry the inertia."""
        return _state_full(qe, self, iters)

    def tendon_lengths_from_state(self, r, q):
        """Routed lengths ``(..., K)`` of ``self.tendons`` from the
        ``state_full`` grid state."""
        return tendon_mod.lengths_from_state(
            r, q, self.tendons, self.rod, self.statics.quad_weights)


def stiffness_matrix(scfg: cosserat.StaticsConfig) -> np.ndarray:
    """Generalized stiffness ``K_ee = int Phi^T H Phi dX`` (pdf eq. 2.14).

    Host f64 constant: for the block lift ``Phi = I_na (x) P(x)^T`` and
    diagonal ``H`` this is ``K[(a,e),(b,f)] = delta_ab H_a int P_e P_f dX``
    — ``na`` copies of the basis Gram matrix, integrated with the
    Clenshaw-Curtis weights of the rod grid (exact for polynomial bases up
    to the quadrature degree).
    """
    table = scfg.full_basis_table                  # (n, ne)
    w = scfg.quad_weights                          # (n,)
    h = np.asarray(scfg.stiffness, np.float64)
    rc = scfg.rod
    if h.shape[-1] != rc.na:
        raise ValueError(f"stiffness has {h.shape[-1]} entries, na={rc.na}")
    if h.ndim == 1:
        gram = table.T @ (w[:, None] * table)      # (ne, ne)
        return np.kron(np.diag(h), gram)           # (na*ne, na*ne)
    # (n, na) grid profile: per-component weighted Grams on the block
    # diagonal — same (a, e) index layout as the kron path.
    ne = table.shape[1]
    out = np.zeros((rc.na * ne, rc.na * ne))
    for a in range(rc.na):
        ga = table.T @ ((w * h[:, a])[:, None] * table)
        out[a * ne:(a + 1) * ne, a * ne:(a + 1) * ne] = ga
    return out


@dataclass(frozen=True)
class SegmentedDynamicsConfig(DynamicsConfig):
    """Dynamics of a CHAINED multi-segment rod — ``statics`` holds a
    :class:`~.segment_statics.SegmentedStaticsConfig`.

    The whole single-rod dynamics stack is generic over the kinematic-map
    hooks (``state_full`` / ``nq`` / ``quad_weights_full`` / ``k_ee`` /
    ``tendon_lengths_from_state``), so overriding them with the chained
    spectral solves of models/segments.py gives multi-segment rods the
    full surface for free: Lagrangian RK4 + implicit Newmark integration,
    driven protocols, gravity, obstacle contact, tendon actuation
    (mid-rod terminations via ``statics.tendon_end`` included),
    variational contact statics, and the spectrum/stability tools.
    Flat coordinates ``qe (..., S*na*ne)`` with BASE-first segment blocks
    (the ``segment_statics`` layout, flattened); the concatenated
    ``state_full`` grid runs TIP-first (global tip = point 0, matching
    the single-rod descending convention the load assembly indexes).

    Unsupported here: multi-rod scenes (``rr``/``simulate_scene`` are
    single-rod-config paths) and per-grid-point stiffness profiles
    (per-SEGMENT stiffness covers the piecewise case).
    """

    def __post_init__(self):
        # Tendons live on the segmented statics config (they carry the
        # termination map); mirror them into the dynamics field the load
        # assembly reads.
        if getattr(self.statics, "tendons", ()) and not self.tendons:
            object.__setattr__(self, "tendons",
                               tuple(self.statics.tendons))

    @property
    def rod(self) -> rod.RodConfig:
        raise AttributeError(
            "SegmentedDynamicsConfig has no single rod grid — use "
            "cfg.statics.rods.segments (scenes/rr paths are single-rod)")

    @property
    def nq(self) -> int:
        rods = self.statics.rods
        seg = rods.segments[0]
        return rods.num_segments * seg.na * seg.ne

    @functools.cached_property
    def k_ee(self) -> np.ndarray:
        """Block-diagonal generalized stiffness: per-segment
        ``kron(diag(H_s), Gram_s)`` in base-first block order (pdf eq.
        2.14 per segment)."""
        h_all = self.statics.stiffness_per_segment          # (S, na)
        blocks = []
        for s, seg in enumerate(self.statics.rods.segments):
            table = np.asarray(self.statics.full_tables[s], np.float64)
            w = np.asarray(self.statics.quad_weights[s], np.float64)
            gram = table.T @ (w[:, None] * table)
            blocks.append(np.kron(np.diag(h_all[s]), gram))
        out = np.zeros((self.nq, self.nq))
        i = 0
        for b in blocks:
            out[i:i + b.shape[0], i:i + b.shape[0]] = b
            i += b.shape[0]
        return out

    @functools.cached_property
    def kappa0_modes(self) -> np.ndarray:
        if self.statics.kappa0 is None:
            return np.zeros(self.nq)
        return np.asarray(self.statics.kappa0, np.float64).reshape(-1)

    @functools.cached_property
    def quad_weights_full(self) -> np.ndarray:
        """Per-segment CC weights, TIP-first to align with the
        concatenated ``state_full`` grid (junction points appear in both
        neighbours' grids, each inside its OWN segment's integral — no
        double counting)."""
        return np.concatenate(
            [np.asarray(w, np.float64)
             for w in reversed(self.statics.quad_weights)])

    @functools.cached_property
    def points_full(self) -> np.ndarray:
        """Global arclengths of the concatenated tip-first grid: each
        segment's local descending points shifted by the total length of
        the base-side segments before it."""
        segs = self.statics.rods.segments
        offsets = np.cumsum([0.0] + [s.length for s in segs])
        return np.concatenate(
            [offsets[i] + np.asarray(segs[i].points, np.float64)
             for i in reversed(range(len(segs)))])

    def state_full(self, qe, iters: int):
        from . import segment_statics as ss

        rods = self.statics.rods
        s_count = rods.num_segments
        nq_seg = rods.segments[0].na * rods.segments[0].ne
        qe_segs = qe.reshape(qe.shape[:-1] + (s_count, nq_seg))
        qs, rs, _ = ss._chained_full_states(qe_segs, self.statics, iters,
                                            "picard")
        return (jnp.concatenate(rs[::-1], axis=-2),
                jnp.concatenate(qs[::-1], axis=-2))

    def tendon_lengths_from_state(self, r, q):
        segs = self.statics.rods.segments
        offs = np.cumsum([0] + [s.n for s in reversed(segs)])
        last = self.statics.tendon_last_segment
        n_seg = len(segs)
        lens = []
        for k, t in enumerate(self.statics.tendons):
            total = 0.0
            theta = None                     # capstan turning, accumulated
            for s in range(last[k] + 1):     # base segment -> anchor
                blk = n_seg - 1 - s          # tip-first concat position
                i0, i1 = int(offs[blk]), int(offs[blk + 1])
                contrib, theta = tendon_mod.lengths_from_state(
                    r[..., i0:i1, :], q[..., i0:i1, :], (t,), segs[s],
                    self.statics.quad_weights[s], theta0=theta,
                    return_theta=True)
                total = total + contrib[..., 0]
            lens.append(total)
        return jnp.stack(lens, axis=-1)


def _state_full(qe, cfg: DynamicsConfig, iters: int):
    """Full-grid positions AND quaternions (base appended) through the
    differentiable Picard path — the kinematic map whose Jacobian carries
    the inertia."""
    rc = cfg.rod
    sol = rod.rod_shape(qe, cfg=rc, method="picard", iters=iters)
    base_r = jnp.zeros(qe.shape[:-1] + (1, 3), sol.positions.dtype)
    base_q = jnp.broadcast_to(
        jnp.asarray(rod.DEFAULT_Q_INIT, sol.quaternions.dtype),
        qe.shape[:-1] + (1, 4))
    r = jnp.concatenate([sol.positions, base_r], axis=-2)    # (..., n, 3)
    q = jnp.concatenate([sol.quaternions, base_q], axis=-2)  # (..., n, 4)
    return r, q


def _positions_full(qe, cfg: DynamicsConfig, iters: int):
    return cfg.state_full(qe, iters)[0]


def _omega_from_dq(q, dq):
    """Body angular velocity from a quaternion rate: ``2 (q* x dq)_vec``.

    Valid for the (near-)unit quaternions of the spectral solve; batched
    over leading axes of ``(..., 4)`` inputs.
    """
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    dw, dx, dy, dz = dq[..., 0], dq[..., 1], dq[..., 2], dq[..., 3]
    return 2.0 * jnp.stack([
        -x * dw + w * dx + z * dy - y * dz,
        -y * dw - z * dx + w * dy + x * dz,
        -z * dw + y * dx - x * dy + w * dz,
    ], axis=-1)


def mass_matrix(qe, cfg: DynamicsConfig, iters: int = 16):
    """``M(qe) = int [rhoA J_r^T J_r + rhoI B^T B] dX`` — ``(..., nq, nq)``.

    ``J_r = dr/dqe`` (translational) and ``B = domega/dqd`` (rotary, from
    the quaternion tangents via :func:`_omega_from_dq`), both from ``nq``
    implicit-function tangents of the spectral solve (vmapped jvp over unit
    strain directions).
    """
    nq = qe.shape[-1]
    eye = jnp.eye(nq, dtype=qe.dtype)
    r, q = cfg.state_full(qe, iters)

    def jvp_dir(v):
        (_, _), (dr, dqq) = jax.jvp(
            lambda qq: cfg.state_full(qq, iters), (qe,),
            (jnp.broadcast_to(v, qe.shape),), )
        return dr, _omega_from_dq(q, dqq)

    dr_cols, om_cols = jax.vmap(jvp_dir)(eye)       # (nq, ..., n, 3) each
    dr_cols = jnp.moveaxis(dr_cols, 0, -1)          # (..., n, 3, nq)
    om_cols = jnp.moveaxis(om_cols, 0, -1)
    w = jnp.asarray(cfg.quad_weights_full, qe.dtype)
    return (cfg.rho_a * jnp.einsum("j,...jci,...jck->...ik", w, dr_cols,
                                   dr_cols, precision="highest")
            + cfg.rho_i * jnp.einsum("j,...jci,...jck->...ik", w, om_cols,
                                     om_cols, precision="highest"))


def mass_matrix_fused(qe, cfg: DynamicsConfig, iters: int = 16,
                      tile: int | None = None,
                      interpret: bool | None = None,
                      jac_iters: int | None = None,
                      jac_precision: str = "high"):
    """``M(qe)`` assembled from the FUSED-kernel IFT tangents — the same
    quadrature as :func:`mass_matrix` but with the ``nq`` state tangents
    computed by ``cosserat._fused_state_and_tangents`` (one fused primal
    solve + ONE direction-stacked fused correction on the MXU) instead of
    ``nq`` differentiated XLA Picard chains.  f32-kernel grade (~1e-5
    relative — far below the mass quadrature's own discretization error);
    bit-compatible lane for the RK4 throughput path via
    ``simulate(mass_tier='fused')``.

    Single-rod :class:`DynamicsConfig` only (the segmented subclass routes
    state through chained hooks the kernels don't see), and NOT
    differentiable (pallas_call carries no AD rule) — the default XLA tier
    remains the path under ``jax.grad``/``linearize`` (control rollouts,
    implicit Newton, spectra).
    """
    if type(cfg) is not DynamicsConfig:
        raise ValueError(
            "mass_matrix_fused supports the single-rod DynamicsConfig "
            f"only, got {type(cfg).__name__}; use mass_matrix")
    if interpret is None:
        # pallas needs interpret mode on CPU backends (tests / dryrun)
        interpret = jax.default_backend() == "cpu"
    qe = jnp.asarray(qe)
    lead, nq = qe.shape[:-1], qe.shape[-1]
    qe2 = qe.reshape((-1, nq)).astype(jnp.float32)
    if tile is None:
        tile = cosserat._pick_tile(qe2.shape[0], cfg.rod)
    q_full, _, dq_dirs, dr_dirs = cosserat._fused_state_and_tangents(
        qe2, cfg.statics, iters, tile, interpret,
        jac_iters=jac_iters, jac_precision=jac_precision)
    npts = cfg.rod.grid.num_unknown
    om_dirs = _omega_from_dq(q_full[None, :, :npts, :], dq_dirs)
    # clamped base: zero tangents at the appended last grid point
    pad = lambda t: jnp.pad(t, ((0, 0), (0, 0), (0, 1), (0, 0)))
    om, dr = pad(om_dirs), pad(dr_dirs)
    w = jnp.asarray(cfg.quad_weights_full, jnp.float32)
    m = (cfg.rho_a * jnp.einsum("j,ibjc,kbjc->bik", w, dr, dr,
                                precision="highest")
         + cfg.rho_i * jnp.einsum("j,ibjc,kbjc->bik", w, om, om,
                                  precision="highest"))
    return m.reshape(lead + (nq, nq)).astype(qe.dtype)


def fluid_damping_matrix(qe, cfg: DynamicsConfig, iters: int = 16):
    """``C_f(qe) = int J_r^T [c_n I + (c_t - c_n) t t^T] J_r dX`` —
    ``(..., nq, nq)``, the EXACT generalized damping of the
    resistive-force fluid drag (the drag force is linear in velocity, so
    ``Q_drag(qe, qd) = -C_f(qe) qd`` identically — cross-gated in
    tests/test_dynamics.py).  Symmetric positive semidefinite (it is a
    weighted Gram matrix of the translational mode shapes), so the drag
    is unconditionally dissipative.  Used by :func:`damped_spectrum` /
    :func:`frequency_response` when ``cfg.fluid_drag`` is set."""
    if cfg.fluid_drag is None:
        raise ValueError("config has no fluid_drag coefficients")
    c_tan, c_nrm = cfg.fluid_drag
    nq = qe.shape[-1]
    eye = jnp.eye(nq, dtype=qe.dtype)
    r, q = cfg.state_full(qe, iters)

    def jvp_dir(v):
        _, (dr, _) = jax.jvp(
            lambda qq: cfg.state_full(qq, iters), (qe,),
            (jnp.broadcast_to(v, qe.shape),))
        return dr

    dr_cols = jnp.moveaxis(jax.vmap(jvp_dir)(eye), 0, -1)  # (..., n, 3, nq)
    e1 = jnp.asarray([1.0, 0.0, 0.0], qe.dtype)
    t_hat = lie.quat_rotate_normalized(q, jnp.broadcast_to(e1, r.shape))
    proj = (c_nrm * jnp.eye(3, dtype=qe.dtype)
            + (c_tan - c_nrm) * t_hat[..., :, None] * t_hat[..., None, :])
    w = jnp.asarray(cfg.quad_weights_full, qe.dtype)
    return jnp.einsum("j,...jci,...jcd,...jdk->...ik", w, dr_cols, proj,
                      dr_cols, precision="highest")


def potential_energy(qe, cfg: DynamicsConfig, tension=None, b_field=None):
    """Elastic energy ``1/2 dqe^T K_ee dqe`` (+ gravity, contact-penalty,
    — for constant ``tension`` — tendon potentials ``T_k l_k``, and — for
    a constant ``b_field`` — the magnetic potential ``-int (R m).B dX``)."""
    dq = qe - jnp.asarray(cfg.kappa0_modes, qe.dtype)
    k = jnp.asarray(cfg.k_ee, qe.dtype)
    v = 0.5 * jnp.einsum("...i,ij,...j->...", dq, k, dq,
                         precision="highest")
    actuated = tension is not None and cfg.tendons
    magnetized = b_field is not None and cfg.magnets
    have_state = actuated or magnetized
    if have_state:
        r, q = cfg.state_full(qe, 16)
    if actuated:
        lens = cfg.tendon_lengths_from_state(r, q)
        v = v + jnp.sum(jnp.asarray(tension, qe.dtype) * lens, axis=-1)
    if magnetized:
        b0, g = magnetics_mod.parse_field(b_field, qe.dtype)
        v = v + magnetics_mod.energy_from_state(
            r, q, jnp.asarray(cfg.quad_weights_full, qe.dtype),
            jnp.asarray(cfg.magnet_table, qe.dtype), b0, g)
    if cfg.gravity is not None or cfg.contacts:
        r = r if have_state else _positions_full(qe, cfg, 16)
        w_q = jnp.asarray(cfg.quad_weights_full, qe.dtype)
        if cfg.gravity is not None:
            g = jnp.asarray(cfg.gravity, qe.dtype)
            v = v - cfg.rho_a * jnp.einsum("j,...jc,c->...", w_q, r, g,
                                           precision="highest")
        for ct in cfg.contacts:
            s = ct.gap_ramp(r)
            v = v + 0.5 * ct.stiffness * jnp.einsum(
                "j,...j->...", w_q, s * s)
    return v


def kinetic_energy(qe, qd, cfg: DynamicsConfig, iters: int = 16):
    """``T = 1/2 int [rho_a |rdot|^2 + rho_i |omega|^2] dX`` — evaluated
    DIRECTLY from one state jvp along ``qd`` (the grid velocity field),
    not by assembling ``M``: one tangent pass replaces the ``nq``
    directions of :func:`mass_matrix`, and equals ``1/2 qd^T M qd``
    identically (same quadrature, bilinearity).  This scalar is also the
    generating functional of the inertial forces — see the Coriolis terms
    in :func:`_mass_and_rhs`."""
    (r, q), (rdot, qdot) = jax.jvp(
        lambda q_: cfg.state_full(q_, iters), (qe,),
        (jnp.asarray(qd, qe.dtype),))
    om = _omega_from_dq(q, qdot)
    w = jnp.asarray(cfg.quad_weights_full, qe.dtype)
    return 0.5 * (
        cfg.rho_a * jnp.einsum("j,...jc,...jc->...", w, rdot, rdot,
                               precision="highest")
        + cfg.rho_i * jnp.einsum("j,...jc,...jc->...", w, om, om,
                                 precision="highest"))


def total_energy(qe, qd, cfg: DynamicsConfig, iters: int = 16,
                 tension=None, b_field=None):
    return kinetic_energy(qe, qd, cfg, iters) + potential_energy(
        qe, cfg, tension, b_field)


def _mass_and_rhs(qe, qd, cfg: DynamicsConfig, tip_force=None,
                  iters: int = 16, tip_moment=None, extra_accel=None,
                  tension=None, b_field=None, static_only: bool = False,
                  mass_tier: str = "xla"):
    """``(M(qe), rhs)`` of the Euler-Lagrange balance ``M qdd = rhs``
    (damping excluded — see :func:`accelerations`).

    ``static_only=True`` (the ``qd = 0`` balance of
    :func:`_balance_residual_fn` and the constrained/tendon statics):
    skips the mass assembly and the inertial terms — which are exactly
    zero at ``qd = 0`` but would otherwise still be traced, taxing every
    statics Newton residual AND its Jacobian with ``nq`` dead tangent
    passes — and returns ``(None, rhs)``.

    ``tip_moment``: dead tip couple; its generalized force pulls the moment
    back through the linear quaternion-rate→angular-velocity map and the
    tip-quaternion IFT tangents (virtual work ``M . delta_theta_tip``).
    ``extra_accel``: additional uniform acceleration field (the d'Alembert
    term of prescribed base motion rides in through here — see
    :func:`simulate`).
    ``tension``: ``(..., K)`` cable tensions for ``cfg.tendons`` — the
    actuation force is the exact gradient ``-sum_k T_k dl_k/dqe`` of the
    routed lengths, entering as one more ``(r, q)`` cotangent on the
    shared load pullback (models/tendon.py).
    """
    k = jnp.asarray(cfg.k_ee, qe.dtype)
    dqe = qe - jnp.asarray(cfg.kappa0_modes, qe.dtype)
    rhs = -jnp.einsum("ij,...j->...i", k, dqe, precision="highest")
    if cfg.kv_damping:
        # Kelvin-Voigt: -kv K_ee qd = int Phi^T H (kv kappa_dot) dX,
        # dissipative by SPD-ness of K_ee (power = -kv qd^T K qd <= 0).
        rhs = rhs - cfg.kv_damping * jnp.einsum("ij,...j->...i", k, qd,
                                                precision="highest")

    if static_only:
        m = None
    else:
        # Inertial forces from the SCALAR kinetic energy, not from dM/dq:
        # with T(q, qd) = 1/2 qd^T M(q) qd (kinetic_energy evaluates it via
        # ONE state jvp), the Euler-Lagrange inertia expands to
        #   M qdd = ... - (d/dt M) qd + dT/dq
        # where (d/dt M) qd = jvp_q[ grad_qd T ](qd)  (grad_qd T = M qd).
        # Each term is a couple of tangent/cotangent passes over the ONE-
        # direction velocity functional instead of second-order AD over the
        # nq-direction mass assembly — measured ~2x on the RK4 step (nq = 9;
        # the gap widens with nq on segmented chains).
        # ``mass_tier='fused'`` assembles M itself on the MXU (the RK4
        # throughput lane; forward-only — see mass_matrix_fused).
        m = (mass_matrix_fused(qe, cfg, iters) if mass_tier == "fused"
             else mass_matrix(qe, cfg, iters))

        def t_scalar(q_, qd_):
            return jnp.sum(kinetic_energy(q_, qd_, cfg, iters))

        mdot_qd = jax.jvp(lambda q_: jax.grad(t_scalar, argnums=1)(q_, qd),
                          (qe,), (qd,))[1]
        rhs = rhs - mdot_qd + jax.grad(t_scalar, argnums=0)(qe, qd)

    g_eff = None
    if cfg.gravity is not None:
        g_eff = jnp.asarray(cfg.gravity, qe.dtype)
    if extra_accel is not None:
        ea = jnp.asarray(extra_accel, qe.dtype)
        g_eff = ea if g_eff is None else g_eff + ea

    # --- external generalized forces: ONE state solve + ONE pullback ---
    # Every load term below is a cotangent on the full-grid (r, q) state;
    # assembling them first and pulling back once avoids re-running the
    # spectral solve per term (tip force, tip couple, gravity/base motion,
    # contact penalty + dashpot each used to pay their own).
    actuated = tension is not None and cfg.tendons
    magnetized = b_field is not None and cfg.magnets
    dragged = cfg.fluid_drag is not None
    if (tip_force is not None or tip_moment is not None
            or cfg.contacts or g_eff is not None or actuated
            or magnetized or dragged):
        (r_full, q_full), pull = jax.vjp(
            lambda q: cfg.state_full(q, iters), qe)
        w_q = jnp.asarray(cfg.quad_weights_full, qe.dtype)
        r_cot = jnp.zeros_like(r_full)
        q_cot = jnp.zeros_like(q_full)
        rdot = None
        if dragged or any(ct.damping or ct.friction for ct in cfg.contacts):
            # One linearized solve for the grid velocities, shared by the
            # fluid drag and the contact dashpots/friction; XLA CSEs its
            # primal with the vjp's.
            _, rdot = jax.jvp(
                lambda q: cfg.state_full(q, iters)[0], (qe,), (qd,))
        if dragged:
            # Resistive-force drag: -c_t (v.t) t - c_n (v - (v.t) t) per
            # unit length, t = R(q) e1 (normalized — physics model).
            c_tan, c_nrm = cfg.fluid_drag
            e1 = jnp.asarray([1.0, 0.0, 0.0], qe.dtype)
            t_hat = lie.quat_rotate_normalized(
                q_full, jnp.broadcast_to(e1, r_full.shape))
            v_t = jnp.einsum("...c,...c->...", rdot, t_hat)[..., None] * t_hat
            f_drag = -(c_tan * v_t + c_nrm * (rdot - v_t))
            r_cot = r_cot + w_q[:, None] * f_drag
        if tip_force is not None:
            # Q_tip = J_tip^T F (tip = point 0 of the full grid)
            f = jnp.broadcast_to(jnp.asarray(tip_force, qe.dtype),
                                 qe.shape[:-1] + (3,))
            if cfg.statics.follower:
                # FOLLOWER load (cosserat.py:261-266 convention): the
                # force is given in the TIP BODY frame and rides the
                # current tip orientation.  Non-conservative: the
                # q_full(qe) dependence of the rotation is exactly the
                # circulatory stiffness that `linearized_spectrum
                # (symmetric=False)` / `damped_spectrum` need for
                # flutter (Beck-column) analysis — jacfwd of this
                # residual differentiates through it.
                f = lie.quat_rotate_normalized(q_full[..., 0, :], f)
            r_cot = r_cot.at[..., 0, :].add(f)
        if tip_moment is not None:
            # Q_M = (dq_tip/dqe)^T (domega/ddq)^T M: virtual work of a
            # dead couple through the tip virtual rotation delta_theta =
            # 2 (q_tip^* (x) delta q_tip)_vec (the same linear map as the
            # angular velocity, so _omega_from_dq IS the pullback).
            q_tip = q_full[..., 0, :]
            m_vec = jnp.broadcast_to(jnp.asarray(tip_moment, qe.dtype),
                                     qe.shape[:-1] + (3,))
            _, pull_m = jax.vjp(lambda dq: _omega_from_dq(q_tip, dq),
                                jnp.zeros_like(q_tip))
            q_cot = q_cot.at[..., 0, :].add(pull_m(m_vec)[0])
        if g_eff is not None:
            # gravity / d'Alembert body force: rho_a w_j g per point
            r_cot = r_cot + cfg.rho_a * w_q[:, None] * jnp.broadcast_to(
                g_eff[..., None, :], r_full.shape)
        if actuated:
            # Tendon actuation: -T_k grad l_k as a cotangent on the full
            # state (the routed-length map depends on BOTH r and q).
            t_vec = jnp.asarray(tension, qe.dtype)
            lens, pull_l = jax.vjp(cfg.tendon_lengths_from_state,
                                   r_full, q_full)
            dr_l, dq_l = pull_l(jnp.broadcast_to(-t_vec, lens.shape))
            r_cot = r_cot + dr_l
            q_cot = q_cot + dq_l
        if magnetized:
            # Magnetic actuation: -grad U of the dipole-field potential
            # (distributed torque m x B AND the gradient pulling force in
            # one vjp cotangent on the full state — models/magnetics.py).
            b0, g_field = magnetics_mod.parse_field(b_field, qe.dtype)
            m_table = jnp.asarray(cfg.magnet_table, qe.dtype)
            u, pull_u = jax.vjp(
                lambda rr_, qq_: magnetics_mod.energy_from_state(
                    rr_, qq_, w_q, m_table, b0, g_field),
                r_full, q_full)
            dr_u, dq_u = pull_u(-jnp.ones_like(u))
            r_cot = r_cot + dr_u
            q_cot = q_cot + dq_u
        for ct in cfg.contacts:
            # Everything below reads off ONE vjp of the gap field: the
            # conservative penalty is -k s s' ∇g, the dashpot rides the
            # same ∇g direction, and (gap pointwise, |∇g| = 1 per the
            # _Obstacle contract) the unit cotangent recovers the contact
            # normal for the friction projector.
            g, pull_g = jax.vjp(ct.gap, r_full)
            s = ct.smoothing * jax.nn.softplus(g / ct.smoothing)
            sprime = jax.nn.sigmoid(g / ct.smoothing)
            coef = ct.stiffness * s * sprime
            gdot = None
            if ct.damping or ct.friction:
                _, gdot = jax.jvp(ct.gap, (r_full,), (rdot,))
            if ct.damping:
                # Normal dashpot -damping s'(g) gdot ∇g — active only in
                # contact, dissipative (power = -damping s' gdot^2 <= 0).
                coef = coef + ct.damping * sprime * gdot
            r_cot = r_cot + pull_g(-(w_q * coef))[0]
            if ct.friction:
                grad_g = pull_g(jnp.ones_like(g))[0]      # per-point ∇g
                n_out = -grad_g                           # outward normal
                v_t = rdot - jnp.einsum("...c,...c->...", rdot,
                                        n_out)[..., None] * n_out
                n_mag = jnp.maximum(coef, 0.0)            # normal density
                speed = jnp.sqrt(jnp.sum(v_t * v_t, axis=-1)
                                 + ct.friction_vel ** 2)
                f_f = -(ct.friction * n_mag / speed)[..., None] * v_t
                r_cot = r_cot + w_q[:, None] * f_f
        dr_rhs, = pull((r_cot, q_cot))
        rhs = rhs + dr_rhs
    return m, rhs


def accelerations(qe, qd, cfg: DynamicsConfig, tip_force=None,
                  iters: int = 16, tip_moment=None, extra_accel=None,
                  tension=None, b_field=None, mass_tier: str = "xla"):
    """``qdd`` from the Euler-Lagrange equations, batched over leading axes.

    ``M qdd = Q_ext - K_ee dqe - (dM/dt) qd + 1/2 grad(qd^T M qd)``,
    then mass-proportional damping ``qdd -= damping qd``.
    ``mass_tier='fused'`` assembles M on the MXU (forward-only lane —
    see :func:`mass_matrix_fused`).
    """
    m, rhs = _mass_and_rhs(qe, qd, cfg, tip_force, iters, tip_moment,
                           extra_accel, tension, b_field,
                           mass_tier=mass_tier)
    qdd = smallsolve.gauss_jordan_solve(m, rhs)
    if cfg.damping:
        qdd = qdd - cfg.damping * qd
    return qdd


def _scene_positions(qe, cfg: DynamicsConfig, base_positions, iters: int):
    """World-frame full grids of an ``(..., R, nq)`` scene: per-rod
    spectral solves (batched) plus the static base offsets ``(R, 3)``."""
    r = _positions_full(qe, cfg, iters)
    return r + jnp.asarray(base_positions, r.dtype)[..., :, None, :]


def scene_energy(qe, qd, cfg: DynamicsConfig, rr: RodRodContact,
                 base_positions, iters: int = 16):
    """Total scene energy: per-rod Lagrangian energies (batched over the
    rod axis) plus the rod–rod interaction potential."""
    e = jnp.sum(total_energy(qe, qd, cfg, iters), axis=-1)
    w_q = jnp.asarray(cfg.statics.quad_weights, qe.dtype)
    return e + rr.pair_potential(
        _scene_positions(qe, cfg, base_positions, iters), w_q,
        s_grid=cfg.rod.points)


def scene_accelerations(qe, qd, cfg: DynamicsConfig, rr: RodRodContact,
                        base_positions, tip_force=None, iters: int = 16,
                        tip_moment=None, extra_accel=None):
    """``qdd`` for a multi-rod scene ``qe (..., R, nq)``.

    Per-rod Euler–Lagrange assembly (the scene's mass matrix is block
    diagonal — rods couple only through contact forces, so the solve
    stays ``R`` independent ``(nq, nq)`` Gauss–Jordans) plus the exact
    gradient of the rod–rod interaction potential and — when
    ``rr.friction`` — the pairwise Coulomb field, both assembled as
    cotangents on the scene positions and pulled back through ONE vjp
    of the spectral solves.  ``base_positions (R, 3)`` plants each
    rod's clamped base in the world frame.
    """
    m, rhs = _mass_and_rhs(qe, qd, cfg, tip_force, iters, tip_moment,
                           extra_accel)
    w_q = jnp.asarray(cfg.statics.quad_weights, qe.dtype)
    r_all, pull = jax.vjp(
        lambda q: _scene_positions(q, cfg, base_positions, iters), qe)
    cot = -jax.grad(lambda r: jnp.sum(rr.pair_potential(
        r, w_q, s_grid=cfg.rod.points)))(r_all)
    if rr.friction:
        # One linearized solve for the grid velocities (same pattern as
        # the obstacle friction in _mass_and_rhs).
        _, v_all = jax.jvp(
            lambda q: _scene_positions(q, cfg, base_positions, iters),
            (qe,), (qd,))
        cot = cot + rr.friction_force(r_all, v_all, w_q,
                                      s_grid=cfg.rod.points)
    rhs = rhs + pull(cot)[0]
    qdd = smallsolve.gauss_jordan_solve(m, rhs)
    if cfg.damping:
        qdd = qdd - cfg.damping * qd
    return qdd


def simulate_scene(qe0, qd0, cfg: DynamicsConfig, rr: RodRodContact,
                   base_positions, dt: float, steps: int, tip_force=None,
                   iters: int = 16, record_energy: bool = True,
                   t0: float = 0.0) -> Trajectory:
    """RK4 integration of a multi-rod contact scene ``qe0 (..., R, nq)``
    under ``lax.scan`` — the scene analogue of :func:`simulate` (shared
    per-rod ``cfg``; obstacles in ``cfg.contact``, gravity and driven
    ``tip_force`` protocols all apply per rod).  ``Trajectory.energies``
    records :func:`scene_energy` (interaction potential included, so the
    undamped-collision conservation gate applies verbatim)."""
    qe0 = jnp.asarray(qe0)
    qd0 = jnp.asarray(qd0, qe0.dtype)
    dtype = qe0.dtype

    def deriv(state, t):
        qe, qd = state
        return qd, scene_accelerations(
            qe, qd, cfg, rr, base_positions,
            _load_at(tip_force, t, dtype), iters)

    def rk4(state, _):
        qe, qd, t = state
        k1 = deriv((qe, qd), t)
        k2 = deriv((qe + 0.5 * dt * k1[0], qd + 0.5 * dt * k1[1]),
                   t + 0.5 * dt)
        k3 = deriv((qe + 0.5 * dt * k2[0], qd + 0.5 * dt * k2[1]),
                   t + 0.5 * dt)
        k4 = deriv((qe + dt * k3[0], qd + dt * k3[1]), t + dt)
        qe1 = qe + dt / 6.0 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        qd1 = qd + dt / 6.0 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        e = (scene_energy(qe1, qd1, cfg, rr, base_positions, iters)
             if record_energy else jnp.zeros(qe1.shape[:-2], qe1.dtype))
        return (qe1, qd1, t + dt), (qe1, qd1, e)

    _, (qes, qds, energies) = jax.lax.scan(
        rk4, (qe0, qd0, jnp.asarray(t0, dtype)), None, length=steps)
    times = t0 + dt * jnp.arange(1, steps + 1, dtype=qe0.dtype)
    return Trajectory(times=times, qes=qes, qds=qds, energies=energies)


def _load_at(load, t, dtype):
    """Evaluate a loading protocol at time ``t``: ``None`` passes through,
    a callable is traced (``t`` is a scan-carried scalar), anything else is
    a constant vector."""
    if load is None:
        return None
    if callable(load):
        return jnp.asarray(load(t), dtype)
    return jnp.asarray(load, dtype)


class Trajectory(NamedTuple):
    times: jnp.ndarray     # (steps,)
    qes: jnp.ndarray       # (steps, ..., nq)
    qds: jnp.ndarray       # (steps, ..., nq)
    energies: jnp.ndarray  # (steps, ...)


def simulate(qe0, qd0, cfg: DynamicsConfig, dt: float, steps: int,
             tip_force=None, iters: int = 16,
             record_energy: bool = True, tip_moment=None,
             base_accel=None, t0: float = 0.0,
             tension=None, b_field=None,
             mass_tier: str = "xla") -> Trajectory:
    """RK4 time integration under ``lax.scan`` — jittable, batched.

    **Driven protocols** (VERDICT r2 next #7): ``tip_force``,
    ``tip_moment`` and ``base_accel`` each accept a constant vector OR a
    callable ``t -> (3,)`` evaluated at every RK4 stage time (traced — any
    jnp expression of ``t`` works; harmonic drives, ramps, pulses).
    ``base_accel`` prescribes the base's acceleration ``a_b(t)``: the
    solve runs in the (non-inertial) base frame with the d'Alembert body
    force ``-rho_a a_b`` applied along the rod — the support-excitation /
    base-shaking protocol.  The returned motion is RELATIVE to the moving
    base.

    ``mass_tier='fused'``: assemble the mass matrix on the MXU via the
    fused-kernel IFT tangents (:func:`mass_matrix_fused`) — the
    throughput lane for plain forward rollouts; keep the default
    ``'xla'`` tier when the trajectory is differentiated
    (``control.optimize_protocol``) or on segmented configs.
    """
    qe0 = jnp.asarray(qe0)
    qd0 = jnp.asarray(qd0, qe0.dtype)
    dtype = qe0.dtype

    def deriv(state, t):
        qe, qd = state
        ea = _load_at(base_accel, t, dtype)
        return qd, accelerations(
            qe, qd, cfg, _load_at(tip_force, t, dtype), iters,
            tip_moment=_load_at(tip_moment, t, dtype),
            extra_accel=None if ea is None else -ea,
            tension=_load_at(tension, t, dtype),
            b_field=magnetics_mod.field_at(b_field, t),
            mass_tier=mass_tier)

    def rk4(state, _):
        qe, qd, t = state
        k1 = deriv((qe, qd), t)
        k2 = deriv((qe + 0.5 * dt * k1[0], qd + 0.5 * dt * k1[1]),
                   t + 0.5 * dt)
        k3 = deriv((qe + 0.5 * dt * k2[0], qd + 0.5 * dt * k2[1]),
                   t + 0.5 * dt)
        k4 = deriv((qe + dt * k3[0], qd + dt * k3[1]), t + dt)
        qe = qe + dt / 6.0 * (k1[0] + 2 * k2[0] + 2 * k3[0] + k4[0])
        qd = qd + dt / 6.0 * (k1[1] + 2 * k2[1] + 2 * k3[1] + k4[1])
        e = (total_energy(qe, qd, cfg, iters,
                          tension=_load_at(tension, t + dt, dtype),
                          b_field=magnetics_mod.field_at(b_field, t + dt))
             if record_energy
             else jnp.zeros(qe.shape[:-1], qe.dtype))
        return (qe, qd, t + dt), (qe, qd, e)

    _, (qes, qds, energies) = jax.lax.scan(
        rk4, (qe0, qd0, jnp.asarray(t0, dtype)), None, length=steps)
    times = t0 + dt * jnp.arange(1, steps + 1, dtype=qe0.dtype)
    return Trajectory(times=times, qes=qes, qds=qds, energies=energies)


def simulate_implicit(qe0, qd0, cfg: DynamicsConfig, dt: float, steps: int,
                      tip_force=None, iters: int = 16,
                      beta: float = 0.25, gamma: float = 0.5,
                      tol: float = 1e-9, max_newton: int = 20,
                      record_energy: bool = True, tip_moment=None,
                      base_accel=None, t0: float = 0.0,
                      tension=None, b_field=None) -> Trajectory:
    """Newmark-beta time integration (implicit; default = trapezoidal /
    average-acceleration, unconditionally stable for the linearized
    system).

    The explicit RK4 of :func:`simulate` is stability-throttled by the rod's
    STIFFEST modes — the near-rigid torsion branch, whose frequencies scale
    like ``sqrt(GJ / rho_i)`` and play no role in bending-dominated motion —
    while the implicit step follows the SLOW dynamics at time steps set by
    accuracy alone (50x+ larger in the gated tests).

    Each step solves the nonlinear Newmark residual

        r(q1) = M(q1) (a1(q1) + damping v1(q1)) - rhs(q1, v1(q1)) = 0,
        a1 = (q1 - q0 - dt v0)/(beta dt^2) - (1/(2 beta) - 1) a0,
        v1 = v0 + dt ((1 - gamma) a0 + gamma a1),

    by Newton with exact ``jax.jacfwd`` Jacobians through the Lagrangian
    assembly (implicit-function JVPs of the spectral solves inside) and the
    TPU-native Gauss-Jordan.  jit/vmap-friendly (``lax.scan`` outer,
    ``lax.while_loop`` inner).
    """
    qe0 = jnp.asarray(qe0)
    qd0 = jnp.asarray(qd0, qe0.dtype)
    dtype = qe0.dtype

    def loads_at(t):
        ea = _load_at(base_accel, t, dtype)
        return (_load_at(tip_force, t, dtype),
                _load_at(tip_moment, t, dtype),
                None if ea is None else -ea,
                _load_at(tension, t, dtype),
                magnetics_mod.field_at(b_field, t))

    tf0, tm0, ea0, tn0, bf0 = loads_at(jnp.asarray(t0, dtype))
    a0 = accelerations(qe0, qd0, cfg, tf0, iters, tip_moment=tm0,
                       extra_accel=ea0, tension=tn0, b_field=bf0)
    inv_bdt2 = 1.0 / (beta * dt * dt)

    def newmark_va(q1, q0, v0, acc0):
        a1 = (q1 - q0 - dt * v0) * inv_bdt2 - (0.5 / beta - 1.0) * acc0
        v1 = v0 + dt * ((1.0 - gamma) * acc0 + gamma * a1)
        return v1, a1

    def step_residual(q1, q0, v0, acc0, t1):
        v1, a1 = newmark_va(q1, q0, v0, acc0)
        tf, tm, ea, tn, bf = loads_at(t1)
        m, rhs = _mass_and_rhs(q1, v1, cfg, tf, iters, tm, ea, tn, bf)
        lhs = a1 + (cfg.damping * v1 if cfg.damping else 0.0)
        return jnp.einsum("...ij,...j->...i", m, lhs) - rhs

    def newmark_step(carry, _):
        q0, v0, acc0, t = carry
        t1 = t + dt

        def residual(q1):
            return step_residual(q1, q0, v0, acc0, t1)

        # predictor: velocity extrapolation ONLY.  Adding the 1/2 dt^2 a0
        # term helps at small dt but is catastrophic in the stiff regime
        # this integrator exists for (omega dt >> 1: |a0| ~ omega^2 A
        # throws the predictor beyond the Picard validity domain and
        # Newton diverges); from q0 + dt v0 the solve is nearly linear in
        # the stiff directions and converges quadratically.
        q_pred = q0 + dt * v0

        def cond(state):
            q1, k, res = state
            return jnp.logical_and(k < max_newton,
                                   jnp.linalg.norm(res) > tol)

        def body(state):
            q1, k, res = state
            # Per-sample Jacobian via linearize over unit strain
            # directions: the residual is elementwise over leading batch
            # axes, so a plain jacfwd would build the (B, nq, B, nq)
            # cross-batch matrix (dense in zeros) and break the (nq, nq)
            # Gauss-Jordan — this shape-preserving form batches for free.
            nq = q1.shape[-1]
            _, f_lin = jax.linearize(residual, q1)
            cols = jax.vmap(
                lambda e: f_lin(jnp.broadcast_to(e, q1.shape))
            )(jnp.eye(nq, dtype=q1.dtype))
            jac = jnp.moveaxis(cols, 0, -1)          # (..., nq, nq)
            q1 = q1 - smallsolve.gauss_jordan_solve(jac, res)
            return q1, k + 1, residual(q1)

        q1, _, _ = jax.lax.while_loop(
            cond, body, (q_pred, jnp.zeros((), jnp.int32),
                         residual(q_pred)))
        v1, a1 = newmark_va(q1, q0, v0, acc0)
        e = (total_energy(q1, v1, cfg, iters,
                          tension=_load_at(tension, t1, dtype),
                          b_field=magnetics_mod.field_at(b_field, t1))
             if record_energy
             else jnp.zeros(q1.shape[:-1], q1.dtype))
        return (q1, v1, a1, t1), (q1, v1, e)

    _, (qes, qds, energies) = jax.lax.scan(
        newmark_step, (qe0, qd0, a0, jnp.asarray(t0, dtype)), None,
        length=steps)
    times = t0 + dt * jnp.arange(1, steps + 1, dtype=qe0.dtype)
    return Trajectory(times=times, qes=qes, qds=qds, energies=energies)


def _balance_residual_fn(cfg: DynamicsConfig, tip_force, tip_moment,
                         iters: int, rr=None, base_positions=None,
                         scene_shape=None, tension=None, b_field=None):
    """The static generalized-force balance ``Q(qe)`` of
    :func:`_mass_and_rhs` at ``qd = 0`` — elastic restoring, gravity, tip
    wrench, obstacle penalties, and (``rr`` given) the rod–rod scene
    potential — as a function of the FLATTENED coordinates (scenes pass
    ``scene_shape = (R, nq)``; the flat layout makes the coupled Newton
    and the spectrum Jacobian one dense ``(R nq, R nq)`` block)."""

    def residual(qe):
        if scene_shape is not None:
            q = qe.reshape(qe.shape[:-1] + scene_shape)
            _, rhs = _mass_and_rhs(q, jnp.zeros_like(q), cfg, tip_force,
                                   iters, tip_moment, tension=tension,
                                   b_field=b_field, static_only=True)
            rhs = rhs - jax.grad(
                lambda q2: jnp.sum(rr.pair_potential(
                    _scene_positions(q2, cfg, base_positions, iters),
                    jnp.asarray(cfg.statics.quad_weights, q2.dtype),
                    s_grid=cfg.rod.points)))(q)
            return rhs.reshape(qe.shape)
        _, rhs = _mass_and_rhs(qe, jnp.zeros_like(qe), cfg, tip_force,
                               iters, tip_moment, tension=tension,
                               b_field=b_field, static_only=True)
        return rhs

    return residual


class ContactStaticsSolution(NamedTuple):
    qe: jnp.ndarray             # (..., nq)
    residual_norm: jnp.ndarray  # (...,)
    iterations: jnp.ndarray     # scalar
    converged: jnp.ndarray      # (...,)


def damped_newton(residual, z0, tol: float = 1e-8, max_iter: int = 40,
                  line_search: bool = True, jac_chunk: int | None = None):
    """Batched damped Newton on ``residual(z) = 0`` — the solver core of
    :func:`solve_contact_statics`, exposed for every statics-like system
    (tip-constrained BVPs, platform-coupled parallel robots, ...).

    ``z (..., m)``; per-sample Jacobians come from ``jax.linearize`` over
    the ``m`` unit directions (shape-preserving — no extra batch axis
    reshuffling), steps from the TPU-native Gauss-Jordan.  ``line_search``
    is the per-sample backtracking Armijo of the contact-statics
    docstring (candidate 0 = the current iterate, so one batched residual
    evaluation prices all candidates).  Returns ``(z, iterations,
    residual)``.

    ``jac_chunk`` bounds the LIVE MEMORY of the Jacobian build: the
    default vmaps all ``m`` tangent passes at once, which multiplies
    every residual intermediate by ``m`` — at large batch this is the
    dominant HBM cost (a B=4096 tendon-actuated balance OOMed a 16 GB
    v5e through exactly this path).  With ``jac_chunk = c`` the unit
    directions stream through ``lax.map(batch_size=c)``, capping the
    tangent-intermediate footprint at ``c/m`` of the vmapped build for
    the same results (columns are independent).
    """
    z0 = jnp.asarray(z0)
    m = z0.shape[-1]

    def cond(state):
        z, k, res = state
        rn = jnp.max(
            jnp.linalg.norm(res, axis=-1)) if res.ndim > 1 \
            else jnp.linalg.norm(res)
        return jnp.logical_and(k < max_iter, rn > tol)

    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625], z0.dtype)

    def body(state):
        z, k, res = state
        _, f_lin = jax.linearize(residual, z)
        one_col = lambda e: f_lin(jnp.broadcast_to(e, z.shape))
        eyes = jnp.eye(m, dtype=z.dtype)
        if jac_chunk is not None and jac_chunk < m:
            cols = jax.lax.map(one_col, eyes, batch_size=jac_chunk)
        else:
            cols = jax.vmap(one_col)(eyes)
        jac = jnp.moveaxis(cols, 0, -1)              # (..., m, m)
        step = smallsolve.gauss_jordan_solve(jac, res)
        if not line_search:
            z = z - step
            return z, k + 1, residual(z)
        a = jnp.concatenate([jnp.zeros((1,), z.dtype), alphas]
                            ).reshape((6,) + (1,) * z.ndim)
        cand = z[None] - a * step[None]              # (6, ..., m)
        res_c = residual(cand)
        norms = jnp.linalg.norm(res_c, axis=-1)      # (6, ...)
        base = norms[0]
        ok = norms[1:] < (1.0 - 1e-4 * alphas.reshape(
            (5,) + (1,) * (z.ndim - 1))) * base
        idx = 1 + jnp.where(jnp.any(ok, axis=0), jnp.argmax(ok, axis=0),
                            jnp.argmin(norms[1:], axis=0))   # (...)
        sel = idx.reshape((1,) + idx.shape + (1,))
        z = jnp.take_along_axis(cand, sel, axis=0)[0]
        res = jnp.take_along_axis(res_c, sel, axis=0)[0]
        return z, k + 1, res

    return jax.lax.while_loop(
        cond, body, (z0, jnp.zeros((), jnp.int32), residual(z0)))


def solve_contact_statics(cfg: DynamicsConfig, qe0=None, tip_force=None,
                          tip_moment=None, tol: float = 1e-8,
                          max_iter: int = 40, iters: int = 16,
                          line_search: bool = True,
                          rr: RodRodContact | None = None,
                          base_positions=None,
                          tension=None, b_field=None,
                          jac_chunk: int | None = None) -> ContactStaticsSolution:
    """Static equilibrium WITH the environment: Newton on the generalized
    force balance ``Q(qe) = 0`` of :func:`_mass_and_rhs` at ``qd = 0`` —
    elastic restoring, gravity, tip wrench, and every contact penalty
    (obstacles incl. friction-free normal forces) in one residual.

    This is the variational route to draped/rested equilibria that
    otherwise need damped time integration: the same answer as
    ``simulate_implicit`` run to stagnation, in tens of Newton steps
    instead of hundreds of time steps.  (The cosserat weak-form statics
    — `cosserat.solve_statics` — is the strong-form moment balance of
    the SAME energy; without contact the two discretizations agree to
    quadrature accuracy, cross-gated in the tests.)

    Batched over leading axes of ``qe0`` (per-sample Jacobians via the
    shape-preserving ``linearize``-over-unit-directions trick of
    :func:`simulate_implicit`).  ``line_search`` (default on) is a
    PER-SAMPLE batched backtracking Armijo search over step fractions
    ``{1, 1/2, ..., 1/16}`` — a stiff penalty makes the full cold-start
    Newton step overshoot into deep penetration where the residual
    explodes (measured: the floor drape diverges without it, converges
    in ~20 damped steps with it).  Friction deliberately does NOT enter
    (the regularized law vanishes at rest — see ``_Obstacle``).

    TENDONS: with ``cfg.tendons`` set, ``tension (..., K)`` adds the
    actuation forces (exact routed-length gradients, models/tendon.py) to
    the balance — actuated equilibria of a tendon-driven section, solvable
    jointly with gravity/contact.

    ``jac_chunk`` streams the Newton Jacobian's tangent passes in chunks
    of that many unit directions (see :func:`damped_newton`) — set it
    (e.g. 3) for large batches where the default all-directions vmap
    would multiply the residual's intermediates by ``nq`` in HBM.

    SCENES: pass ``rr`` (+ ``base_positions``) and a ``qe0`` with a rod
    axis ``(..., R, nq)`` to solve multi-rod equilibria with the rod–rod
    (and self-) penalty in the balance — e.g. one rod DRAPED over
    another.  Contact couples the rods, so the Newton system is the
    coupled ``(R nq, R nq)`` one (internally flattened; still batched
    over the leading axes, still per-sample line-searched).
    """
    nq = cfg.nq
    if qe0 is None:
        if rr is not None:
            raise ValueError("scene statics needs an explicit qe0 "
                             "(..., R, nq) to fix the rod count")
        qe0 = jnp.asarray(cfg.kappa0_modes,
                          jnp.float64 if jax.config.jax_enable_x64
                          else jnp.float32)
    qe0 = jnp.asarray(qe0)
    scene_shape = None
    if rr is not None:
        scene_shape = qe0.shape[-2:]                  # (R, nq)
        nq = scene_shape[0] * scene_shape[1]
        qe0 = qe0.reshape(qe0.shape[:-2] + (nq,))

    residual = _balance_residual_fn(cfg, tip_force, tip_moment, iters, rr,
                                    base_positions, scene_shape, tension,
                                    b_field)
    qe, k, res = damped_newton(residual, qe0, tol=tol, max_iter=max_iter,
                               line_search=line_search, jac_chunk=jac_chunk)
    rn = jnp.linalg.norm(res, axis=-1)
    if scene_shape is not None:
        qe = qe.reshape(qe.shape[:-1] + scene_shape)
    return ContactStaticsSolution(qe=qe, residual_norm=rn, iterations=k,
                                  converged=rn <= tol)


def parametric_stability_map(cfg: DynamicsConfig, omegas, amplitudes,
                             load_dir=(-1.0, 0.0, 0.0), seed: float = 1e-4,
                             seed_index: int = 3, t_end: float = 25.0,
                             dt: float = 0.045, iters: int = 12,
                             tol: float = 2e-6):
    """Growth-factor map of parametric excitation over an (Omega, P1) grid.

    Drives the tip load ``P1 * cos(Omega t) * load_dir`` for every grid
    point in ONE batched implicit run (the whole map is a single
    ``lax.scan``), seeding the monitored strain coordinate ``seed_index``
    with ``seed``, and returns ``growth (len(omegas), len(amplitudes))`` =
    (late-window max of that coordinate) / seed.  Instability tongues
    (Mathieu 2:1 at ``Omega ~ 2 omega_1`` foremost) show up as rows of
    large growth; damping in ``cfg`` sets the tongue threshold.  The
    sweep tooling over the driven protocols (ROADMAP 'parametric
    excitation studies').

    ``tol`` defaults to an f32-feasible 2e-6: on the f32 device path the
    Newmark residual's cancellation floor at O(1) tongue amplitudes sits
    near 1e-6 — a tighter default would spin every inner Newton to
    ``max_newton`` once a sample grows.  Tighten only under x64.
    """
    omegas = jnp.asarray(omegas, jnp.float32)
    amplitudes = jnp.asarray(amplitudes, jnp.float32)
    n_o, n_a = omegas.shape[0], amplitudes.shape[0]
    b = n_o * n_a
    og, ag = [x.reshape(-1) for x in jnp.meshgrid(omegas, amplitudes,
                                                  indexing="ij")]
    d = jnp.asarray(load_dir, jnp.float32)

    def drive(t):
        return (ag * jnp.cos(og * t))[:, None] * d          # (B, 3)

    nq = cfg.nq
    qe0 = jnp.zeros((b, nq)).at[:, seed_index].set(seed)
    steps = int(round(t_end / dt))
    traj = simulate_implicit(qe0, jnp.zeros_like(qe0), cfg, dt=dt,
                             steps=steps, iters=iters, tip_force=drive,
                             tol=tol, record_energy=False)
    window = max(1, steps // 8)
    amp = jnp.max(jnp.abs(traj.qes[-window:, :, seed_index]), axis=0)
    return (amp / seed).reshape(n_o, n_a)


def floquet_multipliers(cfg: DynamicsConfig, period: float, steps: int,
                        qe0=None, qd0=None, iters: int = 16,
                        tip_force=None, tip_moment=None, base_accel=None,
                        tension=None, b_field=None):
    """Floquet multipliers of the time-``period`` map about a periodic
    state: eigenvalues of the monodromy matrix ``M = dz(T)/dz(0)`` of the
    flow ``z = (qe, qd)`` linearized at ``z0 = (qe0, qd0)``.

    The RIGOROUS instability criterion the growth-factor heuristic of
    :func:`parametric_stability_map` approximates: ``max |mu| > 1`` iff the
    periodic state is linearly unstable, with the growth exponent per
    period read off directly (Mathieu tongue BOUNDARIES sit exactly at
    ``|mu| = 1``).  Drives are the usual protocols (callables of ``t``,
    phase-locked to ``t = 0``); for the classic parametric study the state
    is the straight rod under an axial modulation — an exact periodic
    solution, since an axial tip load exerts no transverse moment at
    ``qe = 0``.

    TPU-natively the monodromy is NOT integrated column-by-column: one
    ``jacfwd`` pushes all ``2 nq`` tangent directions through the RK4
    ``lax.scan`` in a single vmapped forward pass (exact AD of the
    integrator, no variational-equation re-derivation), then the dense
    ``2nq x 2nq`` eigenproblem is trivial.  For the undriven damped rod the
    multipliers equal ``exp(lambda_k T)`` with ``lambda_k`` the
    :func:`damped_spectrum` poles — the cross-gate in the tests.
    """
    nq = cfg.nq
    if qe0 is None:
        qe0 = jnp.zeros(nq)
    qe0 = jnp.asarray(qe0)
    if qd0 is None:
        qd0 = jnp.zeros_like(qe0)
    z0 = jnp.concatenate([qe0, jnp.asarray(qd0, qe0.dtype)])

    def flow(z):
        traj = simulate(z[:nq], z[nq:], cfg, dt=period / steps, steps=steps,
                        iters=iters, tip_force=tip_force,
                        tip_moment=tip_moment, base_accel=base_accel,
                        tension=tension, b_field=b_field,
                        record_energy=False)
        return jnp.concatenate([traj.qes[-1], traj.qds[-1]])

    monodromy = jax.jacfwd(flow)(z0)
    # Host eigendecomposition, like every sibling spectrum routine
    # (damped_spectrum, linearized_spectrum): the nonsymmetric eig has no
    # TPU lowering, and the 2nq x 2nq problem is trivial on host.
    return np.linalg.eigvals(np.asarray(monodromy, np.float64))


def natural_frequencies(cfg: DynamicsConfig, qe0=None, iters: int = 24):
    """Linearized small-oscillation frequencies about a configuration.

    Solves the generalized eigenproblem ``K_ee v = omega^2 M(qe0) v`` on the
    host (Cholesky whitening).  About the straight rest state this is the
    strain-space Galerkin approximation of the Euler-Bernoulli cantilever
    spectrum ``omega_k = (beta_k L)^2 sqrt(EI / (rhoA L^4))``,
    ``beta_1 L = 1.875104``.
    """
    nq = cfg.nq
    if qe0 is None:
        qe0 = jnp.asarray(cfg.kappa0_modes, jnp.float64
                          if jax.config.jax_enable_x64 else jnp.float32)
    m = np.asarray(mass_matrix(jnp.asarray(qe0), cfg, iters), np.float64)
    k = np.asarray(cfg.k_ee, np.float64)
    c = np.linalg.cholesky(m)
    cinv = np.linalg.inv(c)
    a = cinv @ k @ cinv.T
    evals = np.linalg.eigvalsh(0.5 * (a + a.T))
    return np.sqrt(np.clip(evals, 0.0, None))


def linearized_spectrum(cfg: DynamicsConfig, qe=None, tip_force=None,
                        tip_moment=None, rr: RodRodContact | None = None,
                        base_positions=None, iters: int = 24,
                        modes: bool = False, symmetric: bool = True,
                        tension=None, b_field=None):
    """Small-oscillation spectrum about an ARBITRARY equilibrium — loaded,
    gravity-sagged, contacting, or a multi-rod scene.

    Generalized eigenproblem ``K_eff v = omega^2 M(qe) v`` with ``K_eff =
    -dQ/dqe`` the FULL Jacobian of the generalized-force balance (the
    same residual :func:`solve_contact_statics` drives to zero), so it
    carries everything :func:`natural_frequencies`'s bare ``K_ee``
    misses: geometric stiffness of tip loads and gravity, obstacle
    penalty stiffness at the active contact set, and the rod–rod
    coupling blocks of a scene (``rr`` + rod-axis ``qe``; the scene mass
    matrix is block diagonal, the stiffness is not).  Host f64, one
    ``jacfwd`` of the balance.

    Returns ``omega2`` sorted ascending — NEGATIVE entries flag an
    unstable equilibrium (the classical omega^2-crosses-zero buckling
    criterion: for the axially compressed cantilever the crossing load
    matches :func:`bifurcation.linearized_buckling_loads`, gated).  With
    ``modes=True`` also the mass-orthonormal mode-shape columns.

    ``symmetric`` (default): conservative loads make ``K_eff`` symmetric
    up to roundoff and the whitened problem Hermitian.  Pass ``False``
    for NON-conservative loading (dead tip couples, or FOLLOWER tip
    forces via ``cfg.statics.follower`` — ``tip_force`` then given in
    the tip body frame) to eigendecompose the full nonsymmetric whitened
    operator — complex ``omega2`` pairs then flag flutter-type
    (circulatory) instabilities that symmetric analysis cannot see.
    Gated on Beck's column: flutter at the classical 20.05 EI/L^2 with
    no static divergence (tests/test_dynamics.py).
    """
    nq = cfg.nq
    scene_shape = None
    if qe is None:
        if rr is not None:
            raise ValueError("scene spectra need an explicit qe (R, nq)")
        qe = jnp.asarray(cfg.kappa0_modes, jnp.float64
                         if jax.config.jax_enable_x64 else jnp.float32)
    qe = jnp.asarray(qe)
    if rr is not None:
        scene_shape = qe.shape[-2:]
        qe_flat = qe.reshape((scene_shape[0] * scene_shape[1],))
        m_rods = np.asarray(mass_matrix(qe, cfg, iters), np.float64)
        m = np.zeros((qe_flat.shape[0],) * 2)
        for i in range(scene_shape[0]):               # block-diagonal mass
            m[i * nq:(i + 1) * nq, i * nq:(i + 1) * nq] = m_rods[i]
    else:
        qe_flat = qe
        m = np.asarray(mass_matrix(qe, cfg, iters), np.float64)
    residual = _balance_residual_fn(cfg, tip_force, tip_moment, iters, rr,
                                    base_positions, scene_shape, tension,
                                    b_field)
    k_eff = -np.asarray(jax.jacfwd(residual)(qe_flat), np.float64)
    c = np.linalg.cholesky(m)
    cinv = np.linalg.inv(c)
    a = cinv @ k_eff @ cinv.T
    if symmetric:
        omega2, w = np.linalg.eigh(0.5 * (a + a.T))
    else:
        omega2, w = np.linalg.eig(a)
        order = np.argsort(omega2.real)
        omega2, w = omega2[order], w[:, order]
    if not modes:
        return omega2
    return omega2, cinv.T @ w


def damped_spectrum(cfg: DynamicsConfig, qe=None, tip_force=None,
                    tip_moment=None, rr: RodRodContact | None = None,
                    base_positions=None, iters: int = 24, tension=None,
                    b_field=None):
    """Complex small-oscillation POLES about an equilibrium, damping in.

    First-order (companion) eigenproblem of the linearized balance

        M qdd + C qd + K_eff dq = 0,   C = damping * M + kv_damping * K_ee,

    with ``K_eff = -dQ/dqe`` the same full Jacobian
    :func:`linearized_spectrum` uses (geometric/contact/tendon stiffness
    included) and ``C`` collecting BOTH viscous models (mass-proportional
    rigid drag + Kelvin-Voigt material dissipation).  Returns the ``2 nq``
    eigenvalues of ``[[0, I], [-M^{-1} K_eff, -M^{-1} C]]`` sorted by
    ``|Im|``: underdamped modes come in conjugate pairs
    ``lambda = -zeta omega +- i omega sqrt(1 - zeta^2)`` with
    ``zeta_k = (damping / omega_k + kv_damping * omega_k) / 2``; at zero
    damping it reduces to ``+-i sqrt(omega2)`` of
    :func:`linearized_spectrum` (gated).  A pole with positive real part
    flags a flutter/divergence instability INCLUDING damping effects —
    the classical case where damping destabilizes a circulatory
    (follower-load) system that the undamped analysis calls marginally
    stable (the Ziegler paradox, gated on Beck's column).  Scenes as in
    :func:`linearized_spectrum` (``rr`` + rod-axis ``qe``; block-diagonal
    ``M`` and ``K_ee``, coupled ``K_eff``).  Host f64, one ``jacfwd`` of
    the balance.
    """
    nq = cfg.nq
    scene_shape = None
    if qe is None:
        if rr is not None:
            raise ValueError("scene spectra need an explicit qe (R, nq)")
        qe = jnp.asarray(cfg.kappa0_modes, jnp.float64
                         if jax.config.jax_enable_x64 else jnp.float32)
    qe = jnp.asarray(qe)
    k_ee = np.asarray(cfg.k_ee, np.float64)
    if rr is not None:
        scene_shape = qe.shape[-2:]
        qe_flat = qe.reshape((scene_shape[0] * scene_shape[1],))
        m_rods = np.asarray(mass_matrix(qe, cfg, iters), np.float64)
        m = np.zeros((qe_flat.shape[0],) * 2)
        for i in range(scene_shape[0]):               # block-diagonal mass
            m[i * nq:(i + 1) * nq, i * nq:(i + 1) * nq] = m_rods[i]
        k_ee = np.kron(np.eye(scene_shape[0]), k_ee)
    else:
        qe_flat = qe
        m = np.asarray(mass_matrix(qe, cfg, iters), np.float64)
    residual = _balance_residual_fn(cfg, tip_force, tip_moment, iters, rr,
                                    base_positions, scene_shape, tension,
                                    b_field)
    k_eff = -np.asarray(jax.jacfwd(residual)(qe_flat), np.float64)
    c = cfg.damping * m + cfg.kv_damping * k_ee
    if cfg.fluid_drag is not None:
        cf = np.asarray(fluid_damping_matrix(qe, cfg, iters), np.float64)
        if scene_shape is not None:                   # block-diagonal drag
            cf_full = np.zeros_like(m)
            for i in range(scene_shape[0]):
                cf_full[i * nq:(i + 1) * nq, i * nq:(i + 1) * nq] = cf[i]
            cf = cf_full
        c = c + cf
    minv = np.linalg.inv(m)
    n_flat = m.shape[0]
    comp = np.block([
        [np.zeros((n_flat, n_flat)), np.eye(n_flat)],
        [-minv @ k_eff, -minv @ c],
    ])
    poles = np.linalg.eigvals(comp)
    return poles[np.argsort(np.abs(poles.imag))]


def frequency_response(cfg: DynamicsConfig, omegas, drive_force=None,
                       drive_moment=None, qe=None, tip_force=None,
                       tip_moment=None, iters: int = 24, tension=None,
                       b_field=None, observe: str = "tip"):
    """Linearized harmonic transfer function about an equilibrium.

    Steady-state complex amplitude of ``M ddq + C dq + K_eff dq =
    Re[f e^{i omega t}]``:

        A(omega) = (K_eff + i omega C - omega^2 M)^{-1} f,

    with ``M``/``C``/``K_eff`` exactly as :func:`damped_spectrum` (full
    balance Jacobian about the ``tip_force``/``tip_moment``/``tension``
    equilibrium — geometric, contact and tendon stiffness included) and
    ``f`` the GENERALIZED force pattern of the unit harmonic drive: a
    tip force ``drive_force`` and/or tip couple ``drive_moment``,
    assembled through the same load pullback as the balance (loads are
    affine, so the pattern is an exact residual difference at the
    frozen equilibrium).  ``observe='modes'`` returns ``(W, nq)``
    complex strain-mode amplitudes; ``'tip'`` chains the tip Jacobian
    for ``(W, 3)`` complex tip-displacement amplitudes (magnitude =
    response amplitude, argument = phase lag).  Host f64; gated on the
    per-mode closed form at rest and on steady-state amplitudes of the
    driven implicit integrator.
    """
    if drive_force is None and drive_moment is None:
        raise ValueError("give drive_force and/or drive_moment")
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if qe is None:
        qe = jnp.asarray(cfg.kappa0_modes, dtype)
    qe = jnp.asarray(qe)
    m = np.asarray(mass_matrix(qe, cfg, iters), np.float64)
    residual = _balance_residual_fn(cfg, tip_force, tip_moment, iters,
                                    tension=tension, b_field=b_field)
    k_eff = -np.asarray(jax.jacfwd(residual)(qe), np.float64)
    c = cfg.damping * m + cfg.kv_damping * np.asarray(cfg.k_ee, np.float64)
    if cfg.fluid_drag is not None:
        c = c + np.asarray(fluid_damping_matrix(qe, cfg, iters), np.float64)

    # Drive pattern: the affine load structure makes the difference of two
    # balance evaluations at the SAME state the exact generalized force.
    base_f = (jnp.zeros(3, dtype) if tip_force is None
              else jnp.asarray(tip_force, dtype))
    base_m = (jnp.zeros(3, dtype) if tip_moment is None
              else jnp.asarray(tip_moment, dtype))
    df = base_f + (0.0 if drive_force is None
                   else jnp.asarray(drive_force, dtype))
    dm = base_m + (0.0 if drive_moment is None
                   else jnp.asarray(drive_moment, dtype))
    res_drive = _balance_residual_fn(cfg, df, dm, iters, tension=tension,
                                     b_field=b_field)
    f = np.asarray(res_drive(qe) - residual(qe), np.float64)

    omegas = np.asarray(omegas, np.float64)
    amps = np.stack([
        np.linalg.solve(k_eff + 1j * w * c - w * w * m, f)
        for w in np.atleast_1d(omegas)
    ])                                                   # (W, nq) complex
    if observe == "modes":
        return amps
    if observe != "tip":
        raise ValueError(f"observe must be 'tip' or 'modes', got {observe}")
    j_tip = np.asarray(jax.jacfwd(
        lambda q_: cfg.state_full(q_, iters)[0][..., 0, :])(qe), np.float64)
    return amps @ j_tip.T                                # (W, 3) complex


def critical_load(cfg: DynamicsConfig, direction=(-1.0, 0.0, 0.0),
                  load_hi: float = 30.0, load_lo: float = 0.0,
                  bisect_tol: float = 1e-2, iters: int = 24,
                  solve_equilibrium: bool = False, tip_moment=None,
                  tension=None, b_field=None, re_tol: float = 1e-8,
                  statics_tol=1e-9, return_qe: bool = False):
    """Smallest load factor where the equilibrium path loses stability —
    bisection on ``max Re`` of :func:`damped_spectrum` poles.

    The pole criterion is UNIFORM over instability mechanisms: static
    divergence (a real pole through zero — Euler buckling, gated at
    pi^2/4 for the dead compressive cantilever), undamped flutter (a
    complex ``omega^2`` pair splits the poles off the imaginary axis —
    Beck's 20.05 for the follower load, gated), and damped flutter
    (Ziegler destabilization — the kv-damped Beck column at ~10.94,
    gated).  ``tip_force = lambda * direction`` (body frame when
    ``cfg.statics.follower``); ``stability`` at each trial ``lambda`` is
    ``max Re(poles) <= re_tol * pole_scale``.  The default ``re_tol``
    1e-8 sits between the eigensolver noise floor of the marginally
    stable undamped poles (~1e-13 relative; sqrt(eps)-grade only inside
    the vanishing near-coalescence window) and the slow Re growth of
    WEAKLY damped flutter onsets (a 1e-6 threshold biased the kv=1e-3
    Ziegler onset from ~10.9 to 12.6 — measured).

    ``solve_equilibrium=False`` (default) linearizes about the UNLOADED
    rest shape ``cfg.kappa0_modes`` — exact whenever that shape stays an
    equilibrium along the load path (axial dead/follower loads on a
    straight rod: the classical column problems).  Set ``True`` to track
    the nonlinear equilibrium with :func:`solve_contact_statics` (warm
    started up the path) for loads that deform before destabilizing.
    Host bisection (analysis tool, ~log2((hi-lo)/tol) spectrum evals);
    raises if the bracket does not straddle the boundary.
    """
    d = jnp.asarray(direction, jnp.float64
                    if jax.config.jax_enable_x64 else jnp.float32)
    qe_warm = jnp.asarray(cfg.kappa0_modes, d.dtype)

    def unstable(lam, qe_start):
        qe_eq = qe_start
        if solve_equilibrium:
            sol = solve_contact_statics(cfg, qe0=qe_start,
                                        tip_force=lam * d,
                                        tip_moment=tip_moment,
                                        tol=statics_tol, iters=iters,
                                        tension=tension, b_field=b_field)
            qe_eq = sol.qe
        poles = damped_spectrum(cfg, qe=qe_eq, tip_force=lam * d,
                                tip_moment=tip_moment, iters=iters,
                                tension=tension, b_field=b_field)
        scale = max(float(np.max(np.abs(poles))), 1.0)
        return bool(np.max(poles.real) > re_tol * scale), qe_eq

    u_lo, qe_lo = unstable(load_lo, qe_warm)
    if u_lo:
        raise ValueError(f"load_lo={load_lo} is already unstable")
    u_hi, _ = unstable(load_hi, qe_lo)
    if not u_hi:
        raise ValueError(f"load_hi={load_hi} is still stable — widen the "
                         "bracket")
    lo, hi, qe_warm = float(load_lo), float(load_hi), qe_lo
    while hi - lo > bisect_tol:
        mid = 0.5 * (lo + hi)
        u_mid, qe_mid = unstable(mid, qe_warm)
        if u_mid:
            hi = mid
        else:
            lo, qe_warm = mid, qe_mid
    lam_c = 0.5 * (lo + hi)
    return (lam_c, qe_warm) if return_qe else lam_c
