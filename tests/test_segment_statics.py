"""Multi-segment statics BVP: exactness and consistency gates."""

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    rod,
    segment_statics,
    segments,
)


def _cfg(num=2, n=16, stiffness=(1.0, 1.0, 1.0), **kw):
    return segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(num, n=n), stiffness=stiffness, **kw)


def test_zero_load_zero_strain():
    sol = segment_statics.solve_segmented_statics(jnp.zeros(3), cfg=_cfg())
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.qe), 0.0, atol=1e-9)


def test_pure_tip_moment_piecewise_constant_curvature():
    """Tip couple with per-segment stiffness: kappa_s = M / EI_s EXACTLY in
    each segment (only the P0 mode of kappa_y is populated)."""
    m = 0.7
    ei = (1.0, 2.5, 0.5)
    cfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(3, n=16),
        stiffness=tuple((1.0, e, e) for e in ei))
    sol = segment_statics.solve_segmented_statics(
        jnp.zeros(3), tip_moment=jnp.asarray([0.0, m, 0.0]), cfg=cfg,
        tol=1e-11)
    assert bool(sol.converged)
    qe = np.asarray(sol.qe)                      # (3, 9)
    ne = 3
    for s, e in enumerate(ei):
        expect = np.zeros(9)
        expect[ne] = m / e                       # kappa_y, P0 mode
        np.testing.assert_allclose(qe[s], expect, atol=1e-8)


def test_uniform_chain_matches_single_rod():
    """Two equal segments == one rod of the total length (tip force, finite
    deflection): tip positions agree through the independent
    discretizations."""
    f = jnp.asarray([0.0, 0.0, 0.9])
    single = cosserat.solve_statics(
        f, cfg=cosserat.StaticsConfig(rod=rod.RodConfig(n=32)), tol=1e-10)
    assert bool(single.converged)
    chained = segment_statics.solve_segmented_statics(
        f, cfg=_cfg(num=2, n=16), tol=1e-10)
    assert bool(chained.converged)

    # compare GLOBAL tip positions through the forward kinematics
    sol1 = rod.rod_shape(single.qe, cfg=rod.RodConfig(n=32), method="picard",
                         iters=32)
    sol2 = segments.segmented_rod_shape(
        chained.qe, segments.uniform_segments(2, n=16), method="picard",
        iters=32)
    np.testing.assert_allclose(np.asarray(sol2.tip_position),
                               np.asarray(sol1.tip_position), atol=1e-6)


def test_stepped_stiffness_matches_unit_load_method():
    """Linear regime, stepped cantilever: tip deflection equals the
    unit-load integral  delta = int_0^L F (L-x)^2 / EI(x) dx  (piecewise
    closed form)."""
    ei = (2.0, 1.0)
    f_mag = 1e-4
    cfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=16),
        stiffness=tuple((1.0, e, e) for e in ei))
    sol = segment_statics.solve_segmented_statics(
        jnp.asarray([0.0, 0.0, f_mag], jnp.float64), cfg=cfg, tol=1e-14)
    assert bool(sol.converged)
    kin = segments.segmented_rod_shape(
        sol.qe, cfg.rods, method="picard", iters=32)
    tip_z = float(np.asarray(kin.tip_position)[2])

    # int F (L-x)^2/EI dx over [0, 1/2] with EI1, [1/2, 1] with EI2
    def seg_int(a, b, e):
        return ((1 - a) ** 3 - (1 - b) ** 3) / (3 * e)

    delta = f_mag * (seg_int(0.0, 0.5, ei[0]) + seg_int(0.5, 1.0, ei[1]))
    np.testing.assert_allclose(tip_z, delta, rtol=1e-5)


def test_residual_vanishes_at_solution_and_couples_segments():
    """The converged residual is ~0; perturbing the BASE segment's strain
    perturbs the residual of the TIP segment (chain coupling through the
    transported moment arm)."""
    f = jnp.asarray([0.2, 0.0, 0.5])
    cfg = _cfg(num=2, n=16)
    sol = segment_statics.solve_segmented_statics(f, cfg=cfg, tol=1e-11)
    assert bool(sol.converged)
    res = segment_statics.segmented_equilibrium_residual(
        sol.qe, f, jnp.zeros(3), cfg)
    assert float(jnp.max(jnp.abs(res))) < 1e-10

    bumped = sol.qe.at[0, 3].add(0.05)
    res_b = segment_statics.segmented_equilibrium_residual(
        bumped, f, jnp.zeros(3), cfg)
    assert float(jnp.max(jnp.abs(res_b[..., 1, :]))) > 1e-4


def test_vmap_over_load_batch():
    cfg = _cfg(num=2, n=16)
    loads = jnp.asarray(np.random.default_rng(3).uniform(-0.4, 0.4, (5, 3)))
    sols = jax.vmap(lambda f: segment_statics.solve_segmented_statics(
        f, cfg=cfg, tol=1e-9))(loads)
    assert np.asarray(sols.converged).all()
    ref = segment_statics.solve_segmented_statics(loads[2], cfg=cfg,
                                                  tol=1e-9)
    np.testing.assert_allclose(np.asarray(sols.qe)[2], np.asarray(ref.qe),
                               atol=1e-8)


def test_segmented_fused_jacobian_matches_jacfwd():
    """Kernel-lifted IFT for the chained system (VERDICT r2 next #3): the
    fused res+jac equals jacfwd through the chained f64 dense solves at
    LARGE amplitude (converged-value tests cannot see direction-table
    scrambles — the round-2 lesson)."""
    cfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=16),
        stiffness=((1.0, 1.0, 1.3), (1.0, 0.7, 1.0)))
    rng = np.random.default_rng(0)
    qe = jnp.asarray(rng.standard_normal((3, 2, 9)) * 0.8, jnp.float32)
    tf = jnp.asarray(rng.standard_normal((3, 3)) * 0.5, jnp.float32)
    tm = jnp.zeros((3, 3), jnp.float32)
    res_f, jac_f = segment_statics.segmented_residual_and_jacobian_fused(
        qe, tf, tm, cfg, iters=30, jac_iters=30, interpret=True)

    def resid(qf, f):
        r = segment_statics.segmented_equilibrium_residual(
            qf.reshape(2, 9), f, jnp.zeros(3, jnp.float64), cfg,
            iters=40, method="dense")
        return r.reshape(18)

    for i in range(3):
        q64 = jnp.asarray(np.asarray(qe[i]).reshape(18), jnp.float64)
        f64 = jnp.asarray(np.asarray(tf[i]), jnp.float64)
        jac_ref = jax.jacfwd(lambda q: resid(q, f64))(q64)
        scale = np.abs(np.asarray(jac_ref)).max()
        err = np.abs(np.asarray(jac_f[i]) - np.asarray(jac_ref)).max()
        assert err / scale < 1e-4, (i, err / scale)
        rerr = np.abs(np.asarray(res_f[i]) - np.asarray(resid(q64, f64))).max()
        assert rerr < 2e-5, (i, rerr)


def test_solve_segmented_statics_batched_matches_host():
    """The batched fused-tier multi-segment Newton reproduces the host
    jacfwd tier, and the piecewise-exact tip-couple law rides along."""
    cfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=16),
        stiffness=((1.0, 2.0, 2.0), (1.0, 1.0, 1.0)))
    loads = np.asarray([[0.0, 0.0, 0.5], [0.2, 0.0, 0.3],
                        [0.0, -0.3, 0.4], [0.1, 0.1, -0.2]], np.float32)
    sol = segment_statics.solve_segmented_statics_batched(
        jnp.asarray(loads), cfg=cfg, tol=1e-5, max_iter=12, iters=20,
        jac_iters=10, interpret=True)
    assert np.asarray(sol.converged).all()
    for i in range(4):
        ref = segment_statics.solve_segmented_statics(
            jnp.asarray(loads[i], jnp.float64), cfg=cfg, tol=1e-11)
        np.testing.assert_allclose(np.asarray(sol.qe)[i],
                                   np.asarray(ref.qe), atol=2e-5)
    # pure tip couple: kappa_s = M / EI_s exactly, now on the batched tier
    m = segment_statics.solve_segmented_statics_batched(
        jnp.zeros((1, 3)), tip_moment=jnp.asarray([0.0, 0.6, 0.0]),
        cfg=cfg, tol=1e-6, iters=20, jac_iters=10, interpret=True)
    assert np.asarray(m.converged).all()
    qe = np.asarray(m.qe)[0]
    np.testing.assert_allclose(qe[0, 3], 0.6 / 2.0, atol=1e-5)
    np.testing.assert_allclose(qe[1, 3], 0.6 / 1.0, atol=1e-5)


def test_follower_tip_force_differs():
    cfg_d = _cfg(num=2, n=16)
    cfg_f = _cfg(num=2, n=16, follower=True)
    f = jnp.asarray([0.0, 0.0, 0.8])
    sd = segment_statics.solve_segmented_statics(f, cfg=cfg_d, tol=1e-9)
    sf = segment_statics.solve_segmented_statics(f, cfg=cfg_f, tol=1e-9)
    assert bool(sd.converged) and bool(sf.converged)
    assert float(jnp.linalg.norm(sd.qe - sf.qe)) > 1e-2


def test_segmented_dd_residual_matches_f64():
    """dd chained residual (refined-fused junctions, EFT transports) vs the
    f64 dense chained residual at finite amplitude."""
    cfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=16),
        stiffness=((1.0, 1.0, 1.3), (1.0, 0.7, 1.0)))
    rng = np.random.default_rng(1)
    qe64 = 0.6 * rng.standard_normal((2, 2, 9))
    tf = jnp.asarray(0.4 * rng.standard_normal((2, 3)), jnp.float32)
    qe_hi, qe_lo = rod.split_strain(qe64)
    r_dd = segment_statics.segmented_equilibrium_residual_dd(
        (jnp.asarray(qe_hi), jnp.asarray(qe_lo)), tf,
        jnp.zeros((2, 3), jnp.float32), cfg, iters=22, interpret=True)
    r64 = segment_statics.segmented_equilibrium_residual(
        jnp.asarray(qe64), jnp.asarray(np.asarray(tf), jnp.float64),
        jnp.zeros(3, jnp.float64), cfg, iters=40, method="dense")
    scale = float(jnp.max(jnp.abs(r64)))
    err = float(jnp.max(jnp.abs(
        np.asarray(r_dd, np.float64) - np.asarray(r64))))
    assert err < 1e-7 * max(scale, 1.0), err


def test_segmented_batched_dd_newton_oracle_grade():
    """dd-residual batched multi-segment Newton: tol 1e-9 on device, the
    dd iterate lands on the host-f64 equilibrium at ~1e-11 and satisfies
    the TRUE f64 residual at the same grade — the multi-segment analogue
    of the single-rod dd tier (ROADMAP 'dd-grade segmented statics')."""
    cfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=16),
        stiffness=((1.0, 1.0, 1.3), (1.0, 0.7, 1.0)))
    loads = np.asarray([[0.0, 0.0, 0.5], [0.2, 0.0, 0.3]], np.float32)
    sol = segment_statics.solve_segmented_statics_batched(
        jnp.asarray(loads), cfg=cfg, tol=1e-9, max_iter=14, iters=20,
        jac_iters=10, interpret=True, dd_residual=True, dd_iters=22)
    assert np.asarray(sol.converged).all()
    qe_full = np.asarray(sol.qe, np.float64) + np.asarray(sol.qe_lo,
                                                          np.float64)
    for i in range(2):
        ref = segment_statics.solve_segmented_statics(
            jnp.asarray(loads[i], jnp.float64), cfg=cfg, tol=1e-12,
            max_iter=40)
        assert np.abs(qe_full[i] - np.asarray(ref.qe)).max() < 1e-10
        r = segment_statics.segmented_equilibrium_residual(
            jnp.asarray(qe_full[i]), jnp.asarray(loads[i], jnp.float64),
            jnp.zeros(3, jnp.float64), cfg, iters=40, method="dense")
        assert float(jnp.linalg.norm(r)) < 1e-10


def test_terminated_tendon_piecewise_exact():
    """MID-ROD TENDON TERMINATION (the documented single-rod limitation,
    solved the spectral way): a cable at constant body-z offset delta
    anchored at the FIRST junction of a 2-segment chain gives the exact
    piecewise equilibrium kappa_y = -T delta / EI on the covered segment
    and an identically straight segment beyond the anchor."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        segment_statics as ss,
        tendon,
    )

    delta, tension = 0.05, 2.0
    cfg = ss.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=14, ne=4),
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta)),),
        tendon_end=(0,))
    sol = ss.solve_segmented_statics(jnp.zeros(3), cfg=cfg,
                                     tension=jnp.asarray([tension]))
    assert bool(sol.converged)
    qe = np.asarray(sol.qe)                       # (2, na*ne), ne = 4
    expected = np.zeros_like(qe)
    expected[0, 4] = -tension * delta             # kappa_y const mode
    np.testing.assert_allclose(qe, expected, atol=1e-12)


def test_full_coverage_tendon_matches_single_rod_closed_form():
    """A tendon covering EVERY segment of a uniform chain reproduces the
    single-rod closed form kappa_y = -T delta / EI on all segments (the
    default tendon_end=None = global tip anchor)."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        segment_statics as ss,
        tendon,
    )

    delta, tension = 0.04, 1.5
    cfg = ss.SegmentedStaticsConfig(
        rods=segments.uniform_segments(3, n=12, ne=3),
        tendons=(tendon.Tendon(offset=(0.0, 0.0, delta)),))
    sol = ss.solve_segmented_statics(jnp.zeros(3), cfg=cfg,
                                     tension=jnp.asarray([tension]))
    assert bool(sol.converged)
    qe = np.asarray(sol.qe)                       # (3, 9), ne = 3
    expected = np.zeros_like(qe)
    expected[:, 3] = -tension * delta
    np.testing.assert_allclose(qe, expected, atol=1e-11)
