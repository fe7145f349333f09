"""Shape sensing / load identification (models/sensing.py).

The inverse problems have no reference counterpart (the reference is the
forward demo, `/root/reference/main.cpp:181-205`); ground truth here is
self-consistency — synthesize measurements from a known state through the
SAME spectral forward model the tests elsewhere gate against the f64
oracle, then require the estimators to recover that state — plus the
Gauss-Markov covariance law for the noisy case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    rod,
    sensing,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
    chebyshev,
)


def _rich_qe(dtype=jnp.float64):
    """Bending about both axes + torsion — every mode family excited, so
    the full 9-vector is observable from markers + tip frame."""
    return jnp.asarray(
        [0.35, -0.2, 0.1, 1.0, -0.5, 0.2, -0.6, 0.3, -0.1], dtype)


class TestInterpolationMatrix:
    def test_exact_at_nodes(self):
        n = 12
        x = chebyshev.cgl_points(n)
        p = chebyshev.interpolation_matrix(n, tuple(x.tolist()))
        np.testing.assert_allclose(p, np.eye(n), atol=1e-13)

    def test_exact_for_polynomials(self):
        n = 10
        x = chebyshev.cgl_points(n)
        ts = (0.05, 0.31, 0.5, 0.77, 0.93)
        p = chebyshev.interpolation_matrix(n, ts)
        for deg in range(n):
            vals = x**deg
            np.testing.assert_allclose(
                p @ vals, np.asarray(ts) ** deg, rtol=0, atol=1e-12,
                err_msg=f"degree {deg}")

    def test_spectral_accuracy_smooth(self):
        ts = (0.137, 0.52, 0.861)
        f = lambda x: np.sin(3.0 * x) * np.exp(x)
        errs = []
        for n in (6, 10, 16):
            p = chebyshev.interpolation_matrix(n, ts)
            errs.append(np.max(np.abs(p @ f(chebyshev.cgl_points(n))
                                      - f(np.asarray(ts)))))
        assert errs[1] < 1e-3 * errs[0] or errs[0] < 1e-10
        assert errs[2] < 1e-12

    def test_rejects_out_of_domain(self):
        with pytest.raises(ValueError):
            chebyshev.interpolation_matrix(8, (1.2,))


class TestMeasure:
    def test_marker_at_node_matches_solution(self):
        cfg = rod.RodConfig(n=16)
        qe = _rich_qe()
        # marker at grid point 3 (an unknown point, tip-first ordering)
        frac = float(cfg.points[3] / cfg.length)
        scfg = sensing.SensingConfig(rod=cfg, marker_fracs=(frac,))
        y = sensing.measure(qe, scfg)
        sol = rod.rod_shape(qe, cfg=cfg, method="picard", iters=24)
        np.testing.assert_allclose(np.asarray(y),
                                   np.asarray(sol.positions[3]), atol=1e-12)

    def test_strain_stations_are_linear(self):
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(rod=cfg, marker_fracs=(),
                                     strain_fracs=(0.2, 0.8))
        qe1, qe2 = _rich_qe(), jnp.flip(_rich_qe())
        y1 = sensing.measure(qe1, scfg)
        y2 = sensing.measure(qe2, scfg)
        y12 = sensing.measure(qe1 + 0.5 * qe2, scfg)
        np.testing.assert_allclose(np.asarray(y12),
                                   np.asarray(y1 + 0.5 * y2), atol=1e-12)

    def test_tip_quaternion_sign_canonical(self):
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(rod=cfg, marker_fracs=(1.0,),
                                     use_tip_quaternion=True)
        y = sensing.measure(_rich_qe(), scfg)
        assert y.shape == (7,)
        assert float(y[3]) >= 0.0  # w-component sign fixed


class TestFitStrain:
    def test_recovers_exactly_from_pose_stations(self):
        # 6-DoF stations (EM-tracker analogue) make the full modal strain
        # identifiable — orientation along the rod pins the torsion
        # PROFILE, which markers + a tip frame alone nearly cannot
        # (measured: smallest J singular value ~1e-5 there).
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(
            rod=cfg, marker_fracs=(), pose_fracs=(1 / 3, 2 / 3, 1.0))
        qe_true = _rich_qe()
        y = sensing.measure(qe_true, scfg)
        sol = sensing.fit_strain(y, scfg, tol=1e-12, max_iter=30)
        np.testing.assert_allclose(np.asarray(sol.qe), np.asarray(qe_true),
                                   atol=1e-8)
        assert float(sol.residual_norm) < 1e-10

    def test_markers_only_recover_the_shape(self):
        # Positions alone leave the torsion profile nearly unobservable
        # (a physical null space, not a solver artifact) — the SHAPE is
        # the identifiable quantity: whatever strain the fit lands on
        # must reproduce the full centerline, not just the markers.
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(
            rod=cfg, marker_fracs=(0.2, 0.4, 0.6, 0.8, 1.0))
        qe_true = _rich_qe()
        y = sensing.measure(qe_true, scfg)
        # Light damping + more iterations: the fit crawls along the
        # near-null torsion valley but the row-space (shape) converges.
        sol = sensing.fit_strain(y, scfg, tol=1e-12, max_iter=120,
                                 levenberg=1e-9)
        assert float(sol.residual_norm) < 1e-6
        r_true = rod.rod_shape(qe_true, cfg=cfg, method="picard").positions
        r_fit = rod.rod_shape(sol.qe, cfg=cfg, method="picard").positions
        assert float(jnp.max(jnp.abs(r_fit - r_true))) < 1e-5

    def test_batched_matches_loop(self):
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(
            rod=cfg, marker_fracs=(0.3, 0.6), pose_fracs=(0.5, 1.0))
        rng = np.random.default_rng(3)
        qes = jnp.asarray(0.6 * rng.standard_normal((3, 9)))
        ys = sensing.measure(qes, scfg)
        batched = sensing.fit_strain(ys, scfg, tol=1e-12, max_iter=30)
        for b in range(3):
            single = sensing.fit_strain(ys[b], scfg, tol=1e-12, max_iter=30)
            np.testing.assert_allclose(np.asarray(batched.qe[b]),
                                       np.asarray(single.qe), atol=1e-7)
            np.testing.assert_allclose(np.asarray(batched.qe[b]),
                                       np.asarray(qes[b]), atol=1e-7)

    def test_underdetermined_needs_regularization(self):
        # Tip-only tracking of 9 modes: 7 numbers cannot pin 9 — the
        # regularized fit still converges to a consistent interpolant.
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(rod=cfg, marker_fracs=(1.0,),
                                     use_tip_quaternion=True, reg=1e-8)
        qe_true = 0.5 * _rich_qe()
        y = sensing.measure(qe_true, scfg)
        sol = sensing.fit_strain(y, scfg, tol=1e-10, max_iter=40)
        # the MEASUREMENT is reproduced even though qe may differ
        y_hat = sensing.measure(sol.qe, scfg)
        np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y),
                                   atol=1e-5)

    def test_noise_scatter_matches_posterior_covariance(self):
        # Gauss-Markov gate: empirical estimator std over noise draws must
        # track sqrt(diag(Sigma_post)) within Monte-Carlo slack.
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(
            rod=cfg, marker_fracs=(), pose_fracs=(1 / 3, 2 / 3, 1.0))
        qe_true = _rich_qe()
        y_clean = sensing.measure(qe_true, scfg)
        sigma = 1e-5
        draws = 64
        rng = np.random.default_rng(7)
        noise = jnp.asarray(sigma * rng.standard_normal(
            (draws,) + y_clean.shape))
        sols = sensing.fit_strain(y_clean + noise, scfg,
                                  qe0=jnp.broadcast_to(qe_true,
                                                       (draws, 9)),
                                  tol=1e-14, max_iter=8)
        err = np.asarray(sols.qe) - np.asarray(qe_true)
        emp_std = err.std(axis=0)
        pred_std = np.sqrt(np.diag(np.asarray(
            sensing.posterior_covariance(qe_true, scfg, sigma))))
        ratio = emp_std / pred_std
        assert np.all(ratio > 0.5) and np.all(ratio < 2.0), ratio


class TestIdentifyTipLoad:
    def test_recovers_tip_force(self):
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(
            rod=cfg, marker_fracs=(0.25, 0.5, 0.75, 1.0))
        sc = cosserat.StaticsConfig(rod=cfg)
        f_true = jnp.asarray([0.12, -0.08, 0.2], jnp.float64)
        qe_star = cosserat.solve_statics(f_true, (0.0, 0.0, 0.0), sc,
                                         tol=1e-12).qe
        y = sensing.measure(qe_star, scfg)
        theta, sol = sensing.identify_tip_load(y, scfg, statics=sc,
                                               tol=1e-12, max_iter=20,
                                               statics_tol=1e-12)
        np.testing.assert_allclose(np.asarray(theta), np.asarray(f_true),
                                   atol=1e-7)
        assert float(sol.residual_norm) < 1e-9

    def test_recovers_force_and_moment_with_tip_frame(self):
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(
            rod=cfg, marker_fracs=(0.25, 0.5, 0.75, 1.0),
            use_tip_quaternion=True)
        sc = cosserat.StaticsConfig(rod=cfg)
        f_true = jnp.asarray([0.1, 0.05, -0.15], jnp.float64)
        m_true = jnp.asarray([0.03, -0.06, 0.02], jnp.float64)
        qe_star = cosserat.solve_statics(f_true, m_true, sc, tol=1e-12).qe
        y = sensing.measure(qe_star, scfg)
        theta, _ = sensing.identify_tip_load(
            y, scfg, statics=sc, estimate_moment=True, tol=1e-12,
            max_iter=25, statics_tol=1e-12)
        np.testing.assert_allclose(np.asarray(theta[:3]),
                                   np.asarray(f_true), atol=1e-6)
        np.testing.assert_allclose(np.asarray(theta[3:]),
                                   np.asarray(m_true), atol=1e-6)

    def test_batched_families(self):
        cfg = rod.RodConfig(n=16)
        scfg = sensing.SensingConfig(rod=cfg,
                                     marker_fracs=(0.5, 1.0))
        sc = cosserat.StaticsConfig(rod=cfg)
        rng = np.random.default_rng(11)
        forces = jnp.asarray(0.15 * rng.standard_normal((3, 3)))
        qe_star = jnp.stack([
            cosserat.solve_statics(forces[b], (0.0, 0.0, 0.0), sc,
                                   tol=1e-12).qe for b in range(3)])
        ys = jax.vmap(lambda q: sensing.measure(q, scfg))(qe_star)
        thetas, _ = sensing.identify_tip_load(ys, scfg, statics=sc,
                                              tol=1e-11, max_iter=20,
                                              statics_tol=1e-11)
        np.testing.assert_allclose(np.asarray(thetas), np.asarray(forces),
                                   atol=1e-5)
