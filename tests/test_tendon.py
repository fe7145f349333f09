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
