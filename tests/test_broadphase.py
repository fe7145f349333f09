"""Broad-phase rod-rod contact: candidate-gather fields vs exact all-pairs.

The static-budget top-k gather (RodRodContact.budget) must (a) reproduce
the all-pairs potential and friction EXACTLY whenever the budget covers
every near partner, (b) stay a conservative, translation-invariant
potential regardless (energy/momentum safety is unconditional), and (c)
flag undersized budgets via broadphase_overflow.
"""

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
    chebyshev,
)


def _scene(nr=6, n=10, spread=0.18, seed=0):
    """Random mild-curvature rods planted on a line, close enough that
    neighbors interact."""
    rng = np.random.default_rng(seed)
    rc = rod.RodConfig(n=n, ne=2)
    qe = jnp.asarray(0.4 * rng.standard_normal((nr, 6)))
    base = np.zeros((nr, 3))
    base[:, 1] = spread * np.arange(nr)
    sol = rod.rod_shape(qe, cfg=rc, method="dense")
    r = jnp.concatenate([sol.positions,
                         jnp.zeros((nr, 1, 3), sol.positions.dtype)],
                        axis=-2)
    r_all = r + jnp.asarray(base)[:, None, :]
    w_q = jnp.asarray(chebyshev.clenshaw_curtis_weights(n, 1.0))
    return r_all, w_q, rc


def test_full_budget_matches_all_pairs_exactly():
    r_all, w_q, rc = _scene()
    dense = dynamics.RodRodContact(radius=0.09, stiffness=50.0,
                                   smoothing=5e-3)
    # budget = R - 1 routes to the dense path; budget R - 2 with every
    # partner gathered must agree to roundoff (same pairs, same law).
    bp = dynamics.RodRodContact(radius=0.09, stiffness=50.0,
                                smoothing=5e-3, budget=5)
    v_d = float(dense.pair_potential(r_all, w_q))
    v_b = float(bp.pair_potential(r_all, w_q))
    assert v_d > 0.0
    np.testing.assert_allclose(v_b, v_d, rtol=1e-12)


def test_adequate_budget_matches_all_pairs():
    """Line of rods at spacing where only immediate neighbors touch:
    budget 2 covers every interaction and must equal all-pairs, in both
    the potential and its force (the vjp), and in friction."""
    r_all, w_q, rc = _scene(nr=6, spread=0.15)
    kw = dict(radius=0.09, stiffness=50.0, smoothing=5e-3, friction=0.4)
    dense = dynamics.RodRodContact(**kw)
    bp = dynamics.RodRodContact(**kw, budget=2)
    assert not bool(bp.broadphase_overflow(r_all, margin=0.0))
    v_d = float(dense.pair_potential(r_all, w_q))
    v_b = float(bp.pair_potential(r_all, w_q))
    assert v_d > 0.0
    np.testing.assert_allclose(v_b, v_d, rtol=1e-10)
    g_d = jax.grad(lambda r: dense.pair_potential(r, w_q))(r_all)
    g_b = jax.grad(lambda r: bp.pair_potential(r, w_q))(r_all)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_d),
                               rtol=1e-8, atol=1e-12)
    rng = np.random.default_rng(1)
    v_all = jnp.asarray(0.3 * rng.standard_normal(r_all.shape))
    f_d = dense.friction_force(r_all, v_all, w_q)
    f_b = bp.friction_force(r_all, v_all, w_q)
    np.testing.assert_allclose(np.asarray(f_b), np.asarray(f_d),
                               rtol=1e-8, atol=1e-12)


def test_broadphase_is_translation_invariant_and_momentum_free():
    """Even with an UNDERSIZED budget the potential is a function of
    position differences only: uniform shifts leave it unchanged and the
    total interaction force is exactly zero (momentum conservation holds
    unconditionally, only pair stiffness degrades)."""
    r_all, w_q, rc = _scene(nr=8, spread=0.05, seed=3)   # crowded
    bp = dynamics.RodRodContact(radius=0.09, stiffness=50.0,
                                smoothing=5e-3, budget=2)
    assert bool(bp.broadphase_overflow(r_all, margin=0.0))   # undersized
    shift = jnp.asarray([0.3, -1.2, 0.7])
    v0 = float(bp.pair_potential(r_all, w_q))
    v1 = float(bp.pair_potential(r_all + shift, w_q))
    assert v0 > 0.0
    np.testing.assert_allclose(v1, v0, rtol=1e-12)
    g = jax.grad(lambda r: bp.pair_potential(r, w_q))(r_all)
    total = np.asarray(jnp.sum(g, axis=(0, 1)))
    np.testing.assert_allclose(total, 0.0, atol=1e-10 * float(
        jnp.max(jnp.abs(g))))


def test_overflow_flag_sizes_the_budget():
    r_sparse, w_q, _ = _scene(nr=6, spread=0.5, seed=2)  # far apart
    r_tight, _, _ = _scene(nr=6, spread=0.04, seed=2)    # everyone near
    bp = dynamics.RodRodContact(radius=0.09, budget=2)
    assert not bool(bp.broadphase_overflow(r_sparse))
    assert bool(bp.broadphase_overflow(r_tight))


def test_self_window_rides_broadphase_unchanged():
    """Self-contact band terms are computed per rod (never gathered):
    a coiling rod's self-penalty must be identical with and without the
    rod-rod broad-phase active."""
    rc = rod.RodConfig(n=12, ne=2)
    rng = np.random.default_rng(4)
    qe = jnp.asarray(np.concatenate([
        6.0 * np.ones((3, 1)), np.zeros((3, 5))], axis=1)
        + 0.1 * rng.standard_normal((3, 6)))
    sol = rod.rod_shape(qe, cfg=rc, method="dense")
    r = jnp.concatenate([sol.positions, jnp.zeros((3, 1, 3))], axis=-2)
    r_all = r + jnp.asarray([[0.0, 0.0, 0.0], [0.0, 2.0, 0.0],
                             [0.0, 4.0, 0.0]])[:, None, :]  # no rod-rod
    w_q = jnp.asarray(chebyshev.clenshaw_curtis_weights(12, 1.0))
    s_grid = rc.points
    kw = dict(radius=0.06, stiffness=30.0, smoothing=5e-3,
              self_window=0.3)
    dense = dynamics.RodRodContact(**kw)
    bp = dynamics.RodRodContact(**kw, budget=1)
    v_d = float(dense.pair_potential(r_all, w_q, s_grid=s_grid))
    v_b = float(bp.pair_potential(r_all, w_q, s_grid=s_grid))
    assert v_d > 0.0                       # the coil actually self-touches
    np.testing.assert_allclose(v_b, v_d, rtol=1e-10)


def test_large_scene_dynamics_step_runs_with_budget():
    """A 24-rod scene integrates under the broad-phase (the shape the
    all-pairs path is too big for is exercised small here: the gathered
    fields are (R, K, n, n) not (R, R, n, n))."""
    nr, n = 24, 8
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n, ne=2))
    cfg = dynamics.DynamicsConfig(statics=scfg, rho_i=1e-2)
    rr = dynamics.RodRodContact(radius=0.08, stiffness=100.0,
                                smoothing=5e-3, budget=3)
    rng = np.random.default_rng(5)
    qe0 = jnp.asarray(0.2 * rng.standard_normal((nr, 6)))
    base = np.zeros((nr, 3))
    base[:, 1] = 0.12 * np.arange(nr)
    traj = dynamics.simulate_scene(
        qe0, jnp.zeros_like(qe0), cfg, rr, jnp.asarray(base),
        dt=0.004, steps=6)
    assert np.all(np.isfinite(np.asarray(traj.qes[-1])))
    e = np.asarray(traj.energies)
    assert abs(e[-1] - e[0]) < 5e-4 * max(abs(e[0]), 1.0)
