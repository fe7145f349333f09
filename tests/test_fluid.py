"""Resistive-force-theory fluid drag (dynamics.fluid_drag).

Gates: the drag's generalized force IS the linear damping form
``-fluid_damping_matrix(qe) qd`` (exact, any curvature, anisotropic);
tangential drag is transparent to transverse motion at the straight
state; isotropic drag gives mass-proportional poles ``Re = -c/(2 rhoA)``;
energy decays monotonically; the FRF resonance is damped.
"""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
)


def _cfgs(fluid, n=12, ne=3, rho_i=1e-2):
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n, ne=ne))
    mk = lambda fd: dynamics.DynamicsConfig(
        statics=scfg, rho_a=1.0, rho_i=rho_i, fluid_drag=fd)
    return mk(fluid), mk(None)


def test_drag_force_equals_linear_damping_form():
    """Q_drag(qe, qd) == -C_f(qe) qd exactly — the drag is linear in
    velocity, so the matrix route and the force route must agree at a
    strongly bent state with distinct (c_t, c_n)."""
    cfg, cfg0 = _cfgs((0.7, 2.3))
    rng = np.random.default_rng(3)
    qe = jnp.asarray(0.6 * rng.standard_normal(9))
    qd = jnp.asarray(rng.standard_normal(9))
    m = dynamics.mass_matrix(qe, cfg, iters=16)
    qdd1 = dynamics.accelerations(qe, qd, cfg, iters=16)
    qdd0 = dynamics.accelerations(qe, qd, cfg0, iters=16)
    q_drag = np.asarray(
        jnp.einsum("ij,j->i", m, qdd1 - qdd0))
    c_f = np.asarray(dynamics.fluid_damping_matrix(qe, cfg, iters=16))
    np.testing.assert_allclose(q_drag, -c_f @ np.asarray(qd),
                               rtol=1e-9, atol=1e-11)
    # dissipativity: C_f is symmetric PSD
    np.testing.assert_allclose(c_f, c_f.T, atol=1e-13)
    assert np.min(np.linalg.eigvalsh(c_f)) > -1e-13


def test_tangential_drag_transparent_to_transverse_motion():
    """At the straight state every strain mode's translational shape is
    perpendicular to the tangent, so c_t drops out of C_f entirely."""
    cfg_t, _ = _cfgs((5.0, 2.0))
    cfg_0, _ = _cfgs((0.0, 2.0))
    qe = jnp.zeros(9, jnp.float64)
    c_t = np.asarray(dynamics.fluid_damping_matrix(qe, cfg_t))
    c_0 = np.asarray(dynamics.fluid_damping_matrix(qe, cfg_0))
    np.testing.assert_allclose(c_t, c_0, atol=1e-12)


def test_isotropic_drag_poles_mass_proportional():
    """c_t == c_n == c makes C_f == (c/rhoA) M_translational; with small
    rotary inertia the underdamped bending poles sit at
    Re = -c/(2 rhoA)."""
    c = 0.8
    cfg, _ = _cfgs((c, c), n=16, ne=4, rho_i=1e-7)
    poles = dynamics.damped_spectrum(cfg)
    w1 = 1.875104 ** 2
    sel = poles[(np.abs(poles.imag) > 0.5 * w1)
                & (np.abs(poles.imag) < 1.5 * w1)]
    assert sel.size >= 2
    np.testing.assert_allclose(sel.real, -c / 2.0, rtol=1e-3)


def test_drag_dissipates_energy_monotonically():
    cfg, _ = _cfgs((1.0, 2.0))
    qe0 = jnp.zeros(9, jnp.float64).at[3].set(0.5)
    qd0 = jnp.zeros(9, jnp.float64)
    # released bent rod; normal drag damps the transverse ringing at
    # Re ~ -c_n/(2 rhoA) = -1 → energy ~ exp(-2t) = 0.15 at t = 0.96
    traj = dynamics.simulate(qe0, qd0, cfg, dt=0.004, steps=240, iters=12)
    e = np.asarray(traj.energies)
    assert e[-1] < 0.25 * e[0]
    assert np.all(np.diff(e) < 1e-10 * e[0])


def test_frequency_response_resonance_damped_by_drag():
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=12, ne=3))
    mk = lambda fd: dynamics.DynamicsConfig(
        statics=scfg, rho_a=1.0, rho_i=1e-3, fluid_drag=fd)
    w1 = 1.875104 ** 2
    amp = lambda cfg: np.max(np.abs(dynamics.frequency_response(
        cfg, [w1], drive_force=(0.0, 0.0, 1e-3))))
    a_dry = amp(mk((0.0, 1e-6)))
    a_wet = amp(mk((1.0, 2.0)))
    assert a_wet < a_dry / 10.0
