"""Multi-segment rod dynamics: the single-rod Lagrangian stack running on
the chained kinematic map (dynamics.SegmentedDynamicsConfig)."""

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    dynamics,
    segment_statics,
    segments,
    tendon,
)


def _uniform_cfg(rho_i=1e-3, **kw):
    sscfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=12, ne=3))
    return dynamics.SegmentedDynamicsConfig(statics=sscfg, rho_a=1.0,
                                            rho_i=rho_i, **kw)


def test_segmented_spectrum_matches_cantilever_series():
    """A uniform 2-segment chain is just a cantilever: the chained-map
    modal analysis must reproduce the Euler-Bernoulli series
    omega_k = (beta_k L)^2 sqrt(EI/(rhoA L^4)) (doubled bending planes),
    exactly like the single-rod gate."""
    cfg = _uniform_cfg(rho_i=1e-4)
    freqs = np.sort(dynamics.natural_frequencies(cfg))
    np.testing.assert_allclose(freqs[0], 1.875104 ** 2, rtol=2e-3)
    np.testing.assert_allclose(freqs[1], 1.875104 ** 2, rtol=2e-3)
    np.testing.assert_allclose(freqs[2], 4.694091 ** 2, rtol=5e-3)


def test_segmented_energy_conserved_free_oscillation():
    """Released bent 2-segment rod under RK4: the chained Lagrangian
    assembly conserves total energy to truncation level."""
    cfg = _uniform_cfg()
    qe0 = jnp.zeros(cfg.nq, jnp.float64).at[3].set(0.3).at[12].set(0.2)
    traj = jax.jit(lambda a, b: dynamics.simulate(
        a, b, cfg, dt=5e-4, steps=300))(qe0, jnp.zeros_like(qe0))
    e = np.asarray(traj.energies)
    assert np.isfinite(e).all()
    assert abs(e[-1] - e[0]) / abs(e[0]) < 1e-4


def test_segmented_newmark_stable_at_large_steps():
    """Implicit Newmark on the chained map: stable and near-conservative
    at 40x the explicit step of the energy gate."""
    cfg = _uniform_cfg()
    qe0 = jnp.zeros(cfg.nq, jnp.float64).at[3].set(0.3).at[12].set(0.2)
    traj = jax.jit(lambda a, b: dynamics.simulate_implicit(
        a, b, cfg, dt=0.02, steps=60, iters=12, tol=1e-10))(
            qe0, jnp.zeros_like(qe0))
    e = np.asarray(traj.energies)
    assert np.isfinite(e).all()
    assert abs(e[-1] - e[0]) / abs(e[0]) < 1e-2


def test_segmented_contact_statics_matches_segmented_newton():
    """The variational contact-statics Newton on the chained map lands on
    the weak-form multi-segment equilibrium (cross-discretization gate,
    the segmented analogue of the single-rod consistency check)."""
    cfg = _uniform_cfg()
    tip = jnp.asarray([0.0, 0.0, 0.4], jnp.float64)
    ref = segment_statics.solve_segmented_statics(tip, cfg=cfg.statics)
    sol = dynamics.solve_contact_statics(cfg, qe0=jnp.zeros(cfg.nq,
                                                            jnp.float64),
                                         tip_force=tip)
    assert bool(sol.converged)
    err = np.abs(np.asarray(sol.qe).reshape(2, -1)
                 - np.asarray(ref.qe)).max()
    assert err < 1e-10, err


def test_segmented_actuated_terminated_tendon_dynamics_statics():
    """Tendon actuation THROUGH the dynamics assembly on a segmented rod:
    a cable anchored at the first junction drives the covered segment to
    the exact kappa_y = -T delta / EI and leaves the free segment
    straight — the mid-rod-termination closed form, now from the
    Lagrangian (contact-statics) route."""
    delta, tension = 0.05, 2.0
    sscfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=12, ne=3),
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta)),),
        tendon_end=(0,))
    cfg = dynamics.SegmentedDynamicsConfig(statics=sscfg, rho_a=1.0,
                                           rho_i=1e-3)
    assert cfg.tendons == sscfg.tendons          # mirrored by post-init
    sol = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros(cfg.nq, jnp.float64),
        tension=jnp.asarray([tension], jnp.float64))
    assert bool(sol.converged)
    qe = np.asarray(sol.qe).reshape(2, -1)
    expected = np.zeros_like(qe)
    expected[0, 3] = -tension * delta
    np.testing.assert_allclose(qe, expected, atol=1e-9)
