"""Tendon actuation: closed-form equilibria, exact forces, IK, dynamics.

The tendon layer (models/tendon.py) is a new capability beyond the
reference's forward kinematics (`/root/reference/main.cpp`), anchored on
closed forms of the strain parameterization (rod_modeling.pdf ch. 2):
for a Kirchhoff rod with a tendon at constant body-frame offset
``delta e_z``, the routed speed is exactly ``|p'| = |1 + kappa_y delta|``,
so the actuated equilibrium is the constant curvature
``kappa_y = -T delta / EI_y`` for ALL tensions.
"""

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
    tendon,
)


def _cfg(delta=0.05, stiffness=(1.0, 2.0, 1.0), n=16, ne=3, **kw):
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n, ne=ne),
                                  stiffness=stiffness)
    return dynamics.DynamicsConfig(
        statics=scfg,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta)),), **kw)


def test_constant_offset_tendon_gives_exact_constant_curvature():
    """kappa_y = -T delta / EI_y, uniform along the rod — the closed-form
    anchor (exact at any tension, not a small-load linearization)."""
    delta, t_mag, ei_y = 0.05, 2.0, 2.0
    cfg = _cfg(delta=delta, stiffness=(1.0, ei_y, 1.0))
    sol = dynamics.solve_contact_statics(cfg, tension=jnp.asarray([t_mag]),
                                         tol=1e-11)
    assert bool(sol.converged)
    kappa = rod.curvature_at_points(cfg.rod, sol.qe)
    expected = -t_mag * delta / ei_y
    np.testing.assert_allclose(np.asarray(kappa[..., 1]), expected,
                               rtol=1e-8)
    # the other strain components stay zero
    assert float(jnp.max(jnp.abs(kappa[..., 0]))) < 1e-9
    assert float(jnp.max(jnp.abs(kappa[..., 2]))) < 1e-9


def test_routed_length_closed_form_and_tip_arc():
    """At the constant-curvature equilibrium the routed length is exactly
    L (1 + kappa delta) and the tip sits on the circular arc."""
    delta, t_mag = 0.1, 1.5
    cfg = _cfg(delta=delta, stiffness=(1.0, 1.0, 1.0))
    sol = dynamics.solve_contact_statics(cfg, tension=jnp.asarray([t_mag]),
                                         tol=1e-11)
    kappa = -t_mag * delta
    lens = tendon.tendon_lengths(sol.qe, cfg)
    np.testing.assert_allclose(float(lens[0]), 1.0 + kappa * delta,
                               rtol=1e-9)
    shape = rod.rod_shape(sol.qe, cfg=cfg.rod, method="dense",
                          normalize_quaternions=True)
    tip = np.asarray(shape.tip_position)
    np.testing.assert_allclose(
        tip, [np.sin(kappa) / kappa, 0.0, (np.cos(kappa) - 1.0) / kappa],
        atol=1e-9)


def test_antagonistic_pair_keeps_rod_straight():
    """Equal tensions on mirrored tendons cancel exactly: the straight
    state is the equilibrium and its balance residual is zero."""
    delta = 0.04
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=12, ne=3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta)),
                 tendon.Tendon(offset=(0.0, 0.0, -delta))))
    f = tendon.tendon_generalized_force(jnp.zeros(9, jnp.float64),
                                        jnp.asarray([3.0, 3.0]), cfg)
    assert float(jnp.max(jnp.abs(f))) < 1e-10
    sol = dynamics.solve_contact_statics(cfg, tension=jnp.asarray([3.0, 3.0]),
                                         tol=1e-11)
    assert float(jnp.max(jnp.abs(sol.qe))) < 1e-9


def test_centered_tendon_is_force_free_on_kirchhoff_rod():
    """Inextensibility invariant: a tendon along the centerline has
    l = int |r'| = L identically (unit tangent), so its gradient vanishes
    at EVERY configuration — not just the straight one."""
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=12, ne=3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg, tendons=(tendon.Tendon(offset=(0.0, 0.0, 0.0)),))
    rng = np.random.default_rng(3)
    qe = jnp.asarray(0.4 * rng.normal(size=9))
    lens = tendon.tendon_lengths(qe, cfg)
    np.testing.assert_allclose(float(lens[0]), 1.0, rtol=1e-8)
    f = tendon.tendon_generalized_force(qe, jnp.asarray([2.0]), cfg)
    assert float(jnp.max(jnp.abs(f))) < 1e-8


def test_generalized_force_matches_finite_differences():
    cfg = _cfg(delta=0.07, n=12)
    rng = np.random.default_rng(0)
    qe = jnp.asarray(0.2 * rng.normal(size=9))
    t_vec = jnp.asarray([1.7])
    f = np.asarray(tendon.tendon_generalized_force(qe, t_vec, cfg))
    eps = 1e-6
    for i in range(9):
        lp = float(tendon.tendon_lengths(qe.at[i].add(eps), cfg)[0])
        lm = float(tendon.tendon_lengths(qe.at[i].add(-eps), cfg)[0])
        fd = -1.7 * (lp - lm) / (2 * eps)
        np.testing.assert_allclose(f[i], fd, rtol=2e-5, atol=1e-9)


def test_helical_tendon_equilibrium_is_stationary_point():
    """Out-of-plane routing: the converged equilibrium must make the TOTAL
    potential (elastic + T l) stationary, and actually excite torsion /
    both bending planes."""
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16, ne=3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg, tendons=(tendon.Tendon(helix=(0.05, 1.0, 0.0)),))
    t_vec = jnp.asarray([2.5])
    sol = dynamics.solve_contact_statics(cfg, tension=t_vec, tol=1e-11)
    assert bool(sol.converged)
    g = jax.grad(lambda q: dynamics.potential_energy(q, cfg, t_vec))(sol.qe)
    assert float(jnp.max(jnp.abs(g))) < 1e-9
    kappa = rod.curvature_at_points(cfg.rod, sol.qe)
    # helical routing couples into both bending planes
    assert float(jnp.max(jnp.abs(kappa[..., 1]))) > 1e-3
    assert float(jnp.max(jnp.abs(kappa[..., 2]))) > 1e-3


def test_actuated_energy_conserved_at_rk4_order():
    """Constant tension is conservative with potential T l: total energy
    including the tendon term drifts at the RK4 rate."""
    delta = 0.1
    cfg = _cfg(delta=delta, stiffness=(1.0, 1.0, 1.0), n=12, rho_i=1e-2)
    t_vec = jnp.asarray([1.0])
    qe0 = jnp.zeros(9, jnp.float64)
    qd0 = jnp.zeros(9, jnp.float64)
    # motion-energy scale: released from straight, the transient carries
    # V(0) - V(equilibrium) (the conserved total itself is offset by the
    # arbitrary constant T l, so it cannot normalize its own drift).
    qe_eq = qe0.at[3].set(-float(t_vec[0]) * delta)
    scale = float(dynamics.potential_energy(qe0, cfg, t_vec)
                  - dynamics.potential_energy(qe_eq, cfg, t_vec))
    assert scale > 0.0
    drifts = []
    for dt, steps in [(0.008, 50), (0.004, 100)]:
        traj = dynamics.simulate(qe0, qd0, cfg, dt=dt, steps=steps,
                                 iters=12, tension=t_vec)
        e = np.asarray(traj.energies)
        drifts.append(abs(e[-1] - e[0]) / scale)
    assert drifts[0] < 2e-2
    assert drifts[1] < drifts[0] / 10.0


def test_damped_actuated_dynamics_settles_onto_actuated_statics():
    cfg = _cfg(delta=0.08, stiffness=(1.0, 1.0, 1.0), n=12, rho_i=1e-2,
               damping=6.0)
    t_vec = jnp.asarray([1.5])
    sol = dynamics.solve_contact_statics(cfg, tension=t_vec, tol=1e-11)
    # gamma > 1/2: numerically dissipative Newmark — the trapezoidal
    # default preserves high-frequency ringing (omega dt >> 1) that
    # physical mass-proportional damping kills only slowly.
    traj = dynamics.simulate_implicit(
        jnp.zeros(9, jnp.float64), jnp.zeros(9, jnp.float64), cfg,
        dt=0.25, steps=240, iters=12, tension=t_vec, record_energy=False,
        gamma=0.75, beta=0.390625)
    np.testing.assert_allclose(np.asarray(traj.qes[-1]),
                               np.asarray(sol.qe), atol=1e-5)


def test_tendon_ik_recovers_forward_target():
    """3 tendons at 120 deg: invert the tip map for a target generated by
    a known tension set; the recovered equilibrium tip must match."""
    delta = 0.05
    offs = [(0.0, delta * np.cos(a), delta * np.sin(a))
            for a in (0.0, 2 * np.pi / 3, 4 * np.pi / 3)]
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=12, ne=3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg, tendons=tuple(tendon.Tendon(offset=o) for o in offs))
    t_true = jnp.asarray([3.0, 0.5, 1.0])
    sol = dynamics.solve_contact_statics(cfg, tension=t_true, tol=1e-11)
    target = rod.rod_shape(sol.qe, cfg=cfg.rod, method="picard",
                           iters=16).tip_position
    ik = tendon.tendon_ik(target, cfg, gn_steps=20)
    assert float(ik.tip_error) < 1e-6


def test_tip_sensitivity_matches_finite_differences():
    cfg = _cfg(delta=0.06, n=12)
    t_vec = jnp.asarray([1.2])
    sol = dynamics.solve_contact_statics(cfg, tension=t_vec, tol=1e-12)
    tip, j_tip = tendon.tip_sensitivity(sol.qe, t_vec, cfg)
    eps = 1e-5
    tips = []
    for s in (eps, -eps):
        sp = dynamics.solve_contact_statics(cfg, qe0=sol.qe,
                                            tension=t_vec + s, tol=1e-12)
        tips.append(np.asarray(
            rod.rod_shape(sp.qe, cfg=cfg.rod, method="picard",
                          iters=16).tip_position))
    fd = (tips[0] - tips[1]) / (2 * eps)
    np.testing.assert_allclose(np.asarray(j_tip[..., 0]), fd,
                               rtol=5e-4, atol=1e-8)


def test_actuated_spectrum_reduces_to_natural_at_zero_tension():
    cfg = _cfg(delta=0.05, n=12, rho_i=1e-3)
    sol = dynamics.solve_contact_statics(cfg, tension=jnp.asarray([0.0]),
                                         tol=1e-11)
    omega2 = dynamics.linearized_spectrum(cfg, qe=sol.qe,
                                          tension=jnp.asarray([0.0]))
    base = np.sort(dynamics.natural_frequencies(cfg)) ** 2
    np.testing.assert_allclose(np.sort(omega2), base, rtol=1e-8)
    # and at a real tension the actuated spectrum is still a stable one
    t_vec = jnp.asarray([1.0])
    sol_t = dynamics.solve_contact_statics(cfg, tension=t_vec, tol=1e-11)
    omega2_t = dynamics.linearized_spectrum(cfg, qe=sol_t.qe, tension=t_vec)
    assert float(np.min(omega2_t)) > 0.0


def test_tendon_ik_batched_targets():
    """A workspace of targets inverts in ONE call (leading batch axes all
    the way through the equilibrium solves, sensitivities and the
    active-set Gauss-Newton update)."""
    delta = 0.05
    offs = [(0.0, delta * np.cos(a), delta * np.sin(a))
            for a in (0.0, 2 * np.pi / 3, 4 * np.pi / 3)]
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=12, ne=3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg, tendons=tuple(tendon.Tendon(offset=o) for o in offs))
    t_true = jnp.asarray([[2.0, 0.0, 0.5], [0.0, 1.5, 0.2]])
    sol = dynamics.solve_contact_statics(cfg, qe0=jnp.zeros((2, 9)),
                                         tension=t_true, tol=1e-11)
    targets = rod.rod_shape(sol.qe, cfg=cfg.rod, method="picard",
                            iters=16).tip_position
    ik = tendon.tendon_ik(targets, cfg, gn_steps=14)
    assert ik.tension.shape == (2, 3)
    assert float(jnp.max(ik.tip_error)) < 1e-6


def _linear_taper(xs):
    return 1.0 - 0.5 * xs


def _capstan_decay(xs):
    return np.exp(-0.3 * xs)


def test_tension_profile_linear_taper_exact():
    """Prescribed tension profiles (routing friction): with T(X) =
    T0 (1 - X/2) along a constant-offset cable the pointwise balance is
    EI kappa_y(X) + T(X) delta = 0 — linear in X, inside the ne >= 2
    basis span, so the Galerkin equilibrium is pointwise exact."""
    delta, t0 = 0.05, 2.0
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=12, ne=3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta),
                               profile=_linear_taper),))
    sol = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros(9, jnp.float64),
        tension=jnp.asarray([t0], jnp.float64))
    assert bool(sol.converged)
    table = np.asarray(scfg.full_basis_table)          # (n, ne)
    kappa = table @ np.asarray(sol.qe).reshape(3, -1).T   # (n, 3)
    xs = np.asarray(scfg.rod.points) / scfg.rod.length
    np.testing.assert_allclose(kappa[:, 1], -t0 * _linear_taper(xs) * delta,
                               atol=1e-10)
    np.testing.assert_allclose(kappa[:, [0, 2]], 0.0, atol=1e-10)


def test_tension_profile_capstan_decay_pointwise():
    """Capstan-style exponential decay T(X) = T0 exp(-mu X) (actuated at
    the base X = 0, decaying toward the anchor): the equilibrium curvature
    tracks the local tension pointwise to the basis projection error."""
    delta, t0 = 0.05, 2.0
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=14, ne=6))
    cfg = dynamics.DynamicsConfig(
        statics=scfg,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta),
                               profile=_capstan_decay),))
    sol = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros(18, jnp.float64),
        tension=jnp.asarray([t0], jnp.float64))
    assert bool(sol.converged)
    table = np.asarray(scfg.full_basis_table)
    kappa = table @ np.asarray(sol.qe).reshape(3, -1).T
    xs = np.asarray(scfg.rod.points) / scfg.rod.length
    expect = -t0 * _capstan_decay(xs) * delta
    np.testing.assert_allclose(kappa[:, 1], expect,
                               atol=2e-5 * np.abs(expect).max())


def test_capstan_straight_helix_matches_closed_form():
    """Geometric capstan decay on a manufactured straight state: a helical
    routing around a straight rod has constant turning rate c = a w^2 /
    sqrt(1 + a^2 w^2) per unit X, so Theta(X) = c X and the weighted
    length has the closed form |p'| (1 - exp(-mu c L)) / (mu c)."""
    n, length, a, turns, mu = 24, 1.0, 0.03, 2.0, 0.8
    rc = rod.RodConfig(n=n, length=length)
    pts = np.asarray(rc.points)                      # descending, tip->base
    r = jnp.asarray(np.stack([pts, np.zeros(n), np.zeros(n)], -1))
    q = jnp.asarray(np.tile([1.0, 0.0, 0.0, 0.0], (n, 1)))
    t = tendon.Tendon(helix=(a, turns, 0.0), capstan=mu)
    lens = tendon.lengths_from_state(r, q, (t,), rc)
    w = 2.0 * np.pi * turns / length
    speed = np.sqrt(1.0 + (a * w) ** 2)
    c = a * w ** 2 / speed
    expect = speed * (1.0 - np.exp(-mu * c * length)) / (mu * c)
    np.testing.assert_allclose(float(lens[0]), expect, rtol=1e-9)
    # Cross-gate vs the PRESCRIBED-profile route with the closed-form
    # turning (xs is normalized arclength, Theta = c L xs).
    t_prof = tendon.Tendon(helix=(a, turns, 0.0),
                           profile=_capstan_closed_form_profile)
    lens_p = tendon.lengths_from_state(r, q, (t_prof,), rc)
    np.testing.assert_allclose(float(lens[0]), float(lens_p[0]), rtol=1e-9)


def _capstan_closed_form_profile(xs):
    a, turns, mu, length = 0.03, 2.0, 0.8, 1.0
    w = 2.0 * np.pi * turns / length
    c = a * w ** 2 / np.sqrt(1.0 + (a * w) ** 2)
    return np.exp(-mu * c * length * xs)


def test_capstan_equilibrium_self_consistent():
    """Equilibrium under geometric capstan friction: the converged state
    satisfies EI Gram qe_y = -T0 delta P^T (w_cc * w(X)) with the capstan
    weight w(X) = exp(-mu Theta(X)) RECOMPUTED from the solution by the
    same spectral operators — the self-consistent fixed point the Newton
    solve lands on (|p'| = 1 + kappa_y delta exactly for this routing)."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import chebyshev, lie

    delta, t0, mu, n, ne = 0.05, 4.0, 1.0, 16, 5
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n, ne=ne))
    cfg = dynamics.DynamicsConfig(
        statics=scfg,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta), capstan=mu),))
    sol = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros(3 * ne, jnp.float64),
        tension=jnp.asarray([t0], jnp.float64), tol=1e-10)
    assert bool(sol.converged)
    # Recompute the capstan weight from the converged state (host f64).
    r, q = cfg.state_full(sol.qe, 16)
    offs = np.asarray([0.0, 0.0, delta])
    p = np.asarray(r) + np.asarray(
        lie.quat_rotate_normalized(q, jnp.asarray(offs)))
    d_full = np.asarray(chebyshev.diff_matrix(n, 1.0))
    dp = d_full @ p
    speed = np.sqrt((dp * dp).sum(-1))
    t_hat = dp / speed[:, None]
    turn = np.sqrt(((d_full @ t_hat) ** 2).sum(-1) + 1e-30)
    t_mat = np.asarray(chebyshev.partial_integral_matrix(n, 1.0))
    theta = (t_mat[-1][None, :] - t_mat) @ turn
    w_cap = np.exp(-mu * theta)
    assert w_cap.min() < 0.9          # the decay actually bites
    table = np.asarray(scfg.full_basis_table)          # (n, ne)
    wcc = np.asarray(scfg.quad_weights)
    gram = table.T @ (wcc[:, None] * table)
    qe_y_expect = np.linalg.solve(gram, -t0 * delta * table.T @ (wcc * w_cap))
    qe = np.asarray(sol.qe).reshape(3, ne)
    np.testing.assert_allclose(qe[1], qe_y_expect, atol=1e-7)
    np.testing.assert_allclose(qe[[0, 2]], 0.0, atol=1e-9)
    # Tension decays tip-ward: |kappa| at the tip < at the base.
    kappa_y = table @ qe[1]
    assert abs(kappa_y[0]) < abs(kappa_y[-1]) * 0.95


def test_capstan_turning_accumulates_across_segments():
    """The capstan turning angle CHAINS across junctions: a straight
    2-chain with one helix turn per segment equals the single-rod
    two-turn helix closed form — and NOT the per-segment-restart value."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        segment_statics as ss,
        segments,
    )

    a, mu, length = 0.03, 0.8, 1.0
    cfg = ss.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=16, ne=3,
                                       total_length=length),
        tendons=(tendon.Tendon(helix=(a, 1.0, 0.0), capstan=mu),))
    lens = ss.segmented_tendon_lengths(
        jnp.zeros((2, 9), jnp.float64), cfg)
    w = 2.0 * np.pi * 2.0 / length                   # two global turns
    speed = np.sqrt(1.0 + (a * w) ** 2)
    c = a * w ** 2 / speed
    accumulated = speed * (1.0 - np.exp(-mu * c * length)) / (mu * c)
    restart = 2.0 * speed * (
        1.0 - np.exp(-mu * c * length / 2.0)) / (mu * c)
    np.testing.assert_allclose(float(lens[0]), accumulated, rtol=1e-9)
    assert abs(float(lens[0]) - restart) > 1e-3      # discriminates
