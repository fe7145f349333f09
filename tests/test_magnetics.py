"""Magnetic actuation: closed-form load profiles, energy consistency,
field alignment, magnetoelastic buckling, gradient pulling.

The magnetics layer (models/magnetics.py) is a new capability beyond the
reference's forward kinematics (`/root/reference/main.cpp`), built on the
strain parameterization of rod_modeling.pdf ch. 2 exactly like the tendon
layer: loads are the exact AD gradient of the spectrally-evaluated
potential ``U = -int (R m).B(r) dX`` through the shared load pullback.

Closed-form anchors:
* axially magnetized rod in a small transverse uniform field B e3:
  distributed couple density ``c = -m B e2``, so the internal moment is
  ``M_y(X) = -m B (L - X)`` and ``kappa_y(X) = -m B (L - X)/EI_y`` — a
  LINEAR profile, exactly representable for ne >= 2;
* anti-aligned axial field: magnetoelastic buckling of the straight state
  at ``B* = pi^2 EI / (4 m L^2)`` (the Euler-column Rayleigh quotient with
  ``m B`` as the load parameter).
"""

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    magnetics,
    rod,
    segment_statics,
    segments,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import lie


def _cfg(m_axial=0.4, ei=2.0, n=16, **kw):
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n),
                                  stiffness=(1.0, ei, ei))
    return dynamics.DynamicsConfig(
        statics=scfg,
        magnets=(magnetics.Magnet(moment=(m_axial, 0.0, 0.0)),), **kw)


def test_uniform_transverse_field_linear_curvature_profile():
    """kappa_y(X) = -m B (L - X) / EI_y pointwise — the small-field
    closed form (linear profile, exactly representable at ne = 3)."""
    m_mag, b_mag, ei = 0.4, 0.005, 2.0
    cfg = _cfg(m_axial=m_mag, ei=ei)
    sol = dynamics.solve_contact_statics(cfg, b_field=(0.0, 0.0, b_mag),
                                         tol=1e-12)
    assert bool(sol.converged)
    kappa = np.asarray(rod.curvature_at_points(cfg.rod, sol.qe))
    x = np.asarray(cfg.rod.points)[: kappa.shape[0]]
    pred = -m_mag * b_mag * (cfg.rod.length - x) / ei
    # the residual error is the second-order deflection correction to the
    # small-field closed form (scales as B^3 — measured 6.7e-8 at B=0.05)
    assert np.max(np.abs(kappa[:, 1] - pred)) < 1e-9
    # other strain components stay zero (planar bend about body-y)
    assert np.max(np.abs(kappa[:, 0])) < 1e-10
    assert np.max(np.abs(kappa[:, 2])) < 1e-10


def test_profiled_magnetization_closed_form():
    """Magnet.fn profile m(X) = m0 X/L: kappa_y(X) =
    -B m0 (L^2 - X^2) / (2 L EI) — the tail integral of the couple
    density, gated pointwise at small field."""
    m0, b_mag, ei = 0.6, 0.01, 2.0

    def profile(xs):
        return np.stack([m0 * xs, np.zeros_like(xs), np.zeros_like(xs)],
                        axis=-1)

    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16),
                                  stiffness=(1.0, ei, ei))
    cfg = dynamics.DynamicsConfig(
        statics=scfg, magnets=(magnetics.Magnet(fn=profile),))
    sol = dynamics.solve_contact_statics(cfg, b_field=(0.0, 0.0, b_mag),
                                         tol=1e-12)
    assert bool(sol.converged)
    kappa = np.asarray(rod.curvature_at_points(cfg.rod, sol.qe))
    length = cfg.rod.length
    x = np.asarray(cfg.rod.points)[: kappa.shape[0]]
    pred = -b_mag * m0 * (length ** 2 - x ** 2) / (2.0 * length * ei)
    assert np.max(np.abs(kappa[:, 1] - pred)) < 1e-8


def test_energy_conservation_in_uniform_field():
    """Free oscillation of a magnetized rod in a constant uniform field:
    the recorded total energy (elastic + kinetic + magnetic potential)
    is conserved by RK4."""
    cfg = _cfg(m_axial=0.5, ei=1.0)
    qe0 = jnp.zeros(9).at[3].set(0.6)          # bent initial shape

    def drift(dt, steps):
        traj = dynamics.simulate(qe0, jnp.zeros(9), cfg, dt=dt,
                                 steps=steps, b_field=(0.0, 0.0, 0.3))
        e = np.asarray(traj.energies)
        return np.max(np.abs(e - e[0])) / max(abs(e[0]), 1e-3), traj

    d1, traj = drift(2e-3, 150)
    d2, _ = drift(1e-3, 300)
    assert d1 < 1e-4                 # small absolute drift (RK4 numeric)
    assert d2 < d1 / 10.0            # and 4th-order in dt (~1/16)
    # the field does work on the rod internally: magnetic potential at the
    # start differs from the running elastic+kinetic split (sanity that the
    # magnetic term is actually in the ledger, not a constant)
    traj0 = dynamics.simulate(qe0, jnp.zeros(9), cfg, dt=2e-3, steps=2)
    assert abs(float(traj.energies[0]) - float(traj0.energies[0])) > 1e-4


def test_strong_field_aligns_tip_tangent():
    """An axially magnetized rod in a strong transverse field rotates its
    tip tangent toward B, monotonically in |B| (warm-started ramp)."""
    m_mag, ei = 0.4, 1.0
    cfg = _cfg(m_axial=m_mag, ei=ei)
    lambdas = [2.0, 6.0, 15.0, 30.0]           # m B L^2 / EI
    qe = jnp.zeros(9)
    angles = []
    for lam in lambdas:
        b_mag = lam * ei / (m_mag * cfg.rod.length ** 2)
        sol = dynamics.solve_contact_statics(
            cfg, qe0=qe, b_field=(0.0, 0.0, b_mag), tol=1e-10,
            max_iter=60)
        assert bool(sol.converged), lam
        qe = sol.qe
        _, q_full = cfg.state_full(qe, 24)
        tangent = lie.quat_rotate_normalized(
            q_full[..., 0, :], jnp.asarray([1.0, 0.0, 0.0]))
        cosang = float(tangent[2])             # B is along e3
        angles.append(float(np.arccos(np.clip(cosang, -1.0, 1.0))))
    assert all(a2 < a1 for a1, a2 in zip(angles, angles[1:]))
    assert angles[-1] < 0.3


def test_magnetoelastic_buckling_critical_field():
    """Anti-aligned axial field: the straight state stays an equilibrium
    (m x B = 0) but loses stability at B* = pi^2 EI / (4 m L^2) — the
    omega^2-crosses-zero criterion of linearized_spectrum, bisected to
    1% of the classical value."""
    m_mag, ei = 0.4, 2.0
    cfg = _cfg(m_axial=m_mag, ei=ei)
    b_star = np.pi ** 2 * ei / (4.0 * m_mag * cfg.rod.length ** 2)

    def min_omega2(b_mag):
        om2 = dynamics.linearized_spectrum(cfg,
                                           b_field=(-b_mag, 0.0, 0.0))
        return float(om2[0])

    lo, hi = 0.5 * b_star, 1.5 * b_star
    assert min_omega2(lo) > 0 and min_omega2(hi) < 0
    for _ in range(14):
        mid = 0.5 * (lo + hi)
        if min_omega2(mid) > 0:
            lo = mid
        else:
            hi = mid
    assert abs(0.5 * (lo + hi) - b_star) / b_star < 0.01


def test_gradient_field_closed_form_curvature():
    """Gradient-only field (B0 = 0, G with only dB_z/dx != 0) on an axial
    magnet: the energy-gradient FORCE density is G^T m_world = 0 for this
    non-symmetric G, so the loading is purely torque-mediated — the
    couple density m_world x B(r) = -m g3 X e2 at linear order gives the
    tail-integral internal moment and

        kappa_y(X) = -m g3 (L^2 - X^2) / (2 EI)

    (small-field linear theory; gated pointwise).  The tip deflection of
    this couple loading is 5 w L^4 / 24 EI vs the body-force w L^4 / 8 EI
    — a 5/3 ratio against the gravity-path solve, cross-gated below."""
    m_mag, g3, ei = 0.5, 4e-3, 1.0
    grad = np.zeros((3, 3))
    grad[2, 0] = g3                            # dB_z/dx
    cfg = _cfg(m_axial=m_mag, ei=ei)
    sol_m = dynamics.solve_contact_statics(
        cfg, b_field=(np.zeros(3), grad), tol=1e-12)
    assert bool(sol_m.converged)
    kappa = np.asarray(rod.curvature_at_points(cfg.rod, sol_m.qe))
    x = np.asarray(cfg.rod.points)[: kappa.shape[0]]
    length = cfg.rod.length
    pred = -m_mag * g3 * (length ** 2 - x ** 2) / (2.0 * ei)
    # residual is the second-order deflection correction (measured 3.9e-10)
    assert np.max(np.abs(kappa[:, 1] - pred)) < 1e-9
    assert np.max(np.abs(kappa[:, 0])) < 1e-10
    assert np.max(np.abs(kappa[:, 2])) < 1e-10
    # cross-gate: tip deflection is 5/3 the equivalent-magnitude body force
    cfg_g = dynamics.DynamicsConfig(statics=cfg.statics, rho_a=1.0,
                                    gravity=(0.0, 0.0, m_mag * g3))
    sol_g = dynamics.solve_contact_statics(cfg_g, tol=1e-12)
    assert bool(sol_g.converged)
    z_m = float(cfg.state_full(sol_m.qe, 24)[0][0, 2])
    z_g = float(cfg_g.state_full(sol_g.qe, 24)[0][0, 2])
    assert abs(z_g) > 2e-4                     # the load actually acts
    assert abs(z_m / z_g - 5.0 / 3.0) < 1e-3


def test_rotating_field_protocol_drives_motion():
    """Time-dependent field callable in simulate: a rotating transverse
    field sweeps the rod out of its initial plane (smoke + physics)."""
    cfg = _cfg(m_axial=0.5, ei=1.0, damping=0.5)
    omega = 2.0

    def b_of_t(t):
        return 0.8 * jnp.stack([0.0 * t, jnp.sin(omega * t),
                                jnp.cos(omega * t)])

    traj = dynamics.simulate(jnp.zeros(9), jnp.zeros(9), cfg, dt=5e-3,
                             steps=200, b_field=b_of_t,
                             record_energy=False)
    qes = np.asarray(traj.qes)
    # both bending families respond (out-of-plane motion), and the motion
    # is bounded (damped follower of the rotating field)
    assert np.max(np.abs(qes[:, 3])) > 1e-2    # kappa_y modes
    assert np.max(np.abs(qes[:, 6])) > 1e-2    # kappa_z modes
    assert np.max(np.abs(qes)) < 5.0


def test_segmented_magnet_matches_single_rod():
    """A uniform 2-segment chain with the same axial magnetization
    reproduces the single-rod equilibrium (points_full hook: global
    tip-first arclengths feed Magnet.fn the right normalized X)."""
    m_mag, b_mag, ei = 0.4, 0.05, 2.0
    single = _cfg(m_axial=m_mag, ei=ei, n=16)
    seg_rods = segments.SegmentedRodConfig(
        segments=(rod.RodConfig(n=12, length=0.5),
                  rod.RodConfig(n=12, length=0.5)))
    seg_statics = segment_statics.SegmentedStaticsConfig(
        rods=seg_rods, stiffness=(1.0, ei, ei))
    seg_cfg = dynamics.SegmentedDynamicsConfig(
        statics=seg_statics,
        magnets=(magnetics.Magnet(moment=(m_mag, 0.0, 0.0)),))
    # hook sanity: tip-first global arclengths, endpoints L..0
    pts = seg_cfg.points_full
    assert pts[0] == 1.0 and pts[-1] == 0.0
    assert np.all(np.diff(pts) <= 1e-12)
    sol_1 = dynamics.solve_contact_statics(single,
                                           b_field=(0.0, 0.0, b_mag),
                                           tol=1e-12)
    sol_2 = dynamics.solve_contact_statics(seg_cfg,
                                           b_field=(0.0, 0.0, b_mag),
                                           tol=1e-12)
    assert bool(sol_1.converged) and bool(sol_2.converged)
    tip_1 = single.state_full(sol_1.qe, 24)[0][0]
    tip_2 = seg_cfg.state_full(sol_2.qe, 24)[0][0]
    assert float(jnp.max(jnp.abs(tip_1 - tip_2))) < 1e-8


def test_field_spec_validation():
    import pytest

    with pytest.raises(ValueError):
        magnetics.parse_field((np.zeros(3), np.zeros((2, 2))), jnp.float64)

    def bad_fn(xs):
        return np.zeros((3, len(xs)))

    with pytest.raises(ValueError):
        magnetics.Magnet(fn=bad_fn).table(np.linspace(1, 0, 8))
