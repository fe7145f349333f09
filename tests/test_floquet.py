"""Floquet analysis: monodromy via AD through the integrator, gated on the
damped-pole exponential map and the Mathieu 2:1 tongue."""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
)


def test_floquet_multipliers_equal_exp_of_damped_poles():
    """Undriven rod: the period map is the matrix exponential of the
    linearized dynamics, so the Floquet multipliers must equal
    exp(lambda_k T) for the damped_spectrum poles lambda_k — two
    INDEPENDENT routes (AD monodromy of the nonlinear RK4 flow at the
    origin vs the companion-matrix eigenproblem) through the same
    physics."""
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=8, ne=2))
    cfg = dynamics.DynamicsConfig(statics=scfg, rho_a=1.0, rho_i=1e-2,
                                  damping=0.5, kv_damping=2e-3)
    poles = np.asarray(dynamics.damped_spectrum(cfg))
    w_max = float(np.abs(poles).max())
    period = 0.25
    steps = int(np.ceil(period * w_max / 0.15))     # dt |lambda|_max <= 0.15
    mus = np.asarray(dynamics.floquet_multipliers(cfg, period, steps))
    expected = np.exp(poles * period)
    np.testing.assert_allclose(np.sort_complex(mus),
                               np.sort_complex(expected), rtol=2e-4,
                               atol=1e-8)
    # damped system: strictly inside the unit circle
    assert np.abs(mus).max() < 1.0


def test_floquet_locates_mathieu_tongue_boundary_sharply():
    """Principal parametric resonance, the rigorous criterion: axial tip
    modulation P1 cos(Omega t) about the STRAIGHT rod (an exact periodic
    state — no transverse moment at qe = 0).  At Omega = 2 omega_1 the
    2:1 tongue gives max|mu| > 1 (growth exp((P1/4P_cr) omega_1 T - cT/2)
    per period); detuned to 1.37 omega_1 the same drive leaves every
    multiplier inside the unit circle.  Cross-checks the growth-factor
    heuristic of parametric_stability_map with an exact linear-stability
    boundary."""
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=12, ne=3),
                                  stiffness=(1.0, 1.0, 1.3))
    c = 0.2
    cfg = dynamics.DynamicsConfig(statics=scfg, rho_a=1.0, rho_i=1e-2,
                                  damping=c)
    freqs = np.sort(dynamics.natural_frequencies(cfg))
    w1, w_max = float(freqs[0]), float(freqs[-1])
    p1 = 0.5 * (np.pi ** 2 / 4.0)

    mus_abs = {}
    for name, om in (("tongue", 2.0 * w1), ("detuned", 1.37 * w1)):
        period = 2.0 * np.pi / om
        steps = int(np.ceil(period * w_max / 0.4))

        def drive(t, _p1=p1, _om=om):
            return jnp.asarray([-_p1, 0.0, 0.0]) * jnp.cos(_om * t)

        mus = np.asarray(dynamics.floquet_multipliers(
            cfg, period, steps, tip_force=drive))
        mus_abs[name] = np.abs(mus).max()

    # expected tongue growth/period: exp((p1/(4 p_cr)) w1 T - c T / 2)
    t_tongue = 2.0 * np.pi / (2.0 * w1)
    expected = np.exp((0.5 / 4.0) * w1 * t_tongue - 0.5 * c * t_tongue)
    assert mus_abs["tongue"] > 1.05, mus_abs
    np.testing.assert_allclose(mus_abs["tongue"], expected, rtol=0.15)
    assert mus_abs["detuned"] < 0.995, mus_abs
