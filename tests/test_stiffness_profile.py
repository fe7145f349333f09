"""Non-uniform constitutive profiles H(X): tapered/graded rods.

Closed-form anchor: under a PURE tip moment ``M e_y`` the body-frame
moment is ``M`` at every section regardless of the deformation (planar
bend about y keeps y invariant), so the equilibrium curvature is
``kappa_y(X) = M / EI_y(X)`` pointwise — choosing ``1/EI_y`` linear in
``X`` makes the exact solution a degree-1 polynomial, inside the modal
basis, and the discrete solve must hit it to Newton tolerance.
"""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
)


def _tapered_cfg(a=1.0, b=0.8, n=16, ne=3):
    rc = rod.RodConfig(n=n, ne=ne)
    prof = cosserat.stiffness_profile(
        lambda xs: np.stack(
            [np.ones_like(xs), 1.0 / (a + b * xs), np.ones_like(xs)],
            axis=-1),
        rc)
    return cosserat.StaticsConfig(rod=rc, stiffness=prof)


def test_tapered_tip_moment_exact_linear_curvature():
    a, b, m_y = 1.0, 0.8, 0.15
    cfg = _tapered_cfg(a, b)
    sol = cosserat.solve_statics(
        jnp.zeros(3, jnp.float64), tip_moment=jnp.asarray([0.0, m_y, 0.0],
                                                          jnp.float64),
        cfg=cfg, tol=1e-12)
    assert bool(sol.converged)
    # exact: kappa_y = M (a + b X); Legendre on [0,1]: P0=1, P1=2X-1
    expected = np.zeros(9)
    expected[3] = m_y * (a + b / 2.0)
    expected[4] = m_y * b / 2.0
    np.testing.assert_allclose(np.asarray(sol.qe), expected, atol=1e-10)
    kappa = rod.curvature_at_points(cfg.rod, sol.qe)
    xs = cfg.rod.points[:-1] / cfg.rod.length
    np.testing.assert_allclose(np.asarray(kappa[..., 1]),
                               m_y * (a + b * xs), atol=1e-10)


def test_constant_profile_matches_uniform_config():
    """A profile table that happens to be constant must reproduce the
    uniform-stiffness path bit-for-bit in both the residual and K_ee."""
    rc = rod.RodConfig(n=12)
    uni = cosserat.StaticsConfig(rod=rc, stiffness=(1.5, 2.5, 0.5))
    prof = cosserat.StaticsConfig(
        rod=rc,
        stiffness=cosserat.stiffness_profile(
            lambda xs: np.broadcast_to([1.5, 2.5, 0.5], (xs.shape[0], 3)),
            rc))
    rng = np.random.default_rng(0)
    qe = jnp.asarray(rng.standard_normal(9) * 0.2)
    f = jnp.asarray([0.1, 0.0, -0.2])
    r_u = cosserat.equilibrium_residual(qe, f, jnp.zeros(3), uni)
    r_p = cosserat.equilibrium_residual(qe, f, jnp.zeros(3), prof)
    np.testing.assert_array_equal(np.asarray(r_u), np.asarray(r_p))
    np.testing.assert_allclose(dynamics.stiffness_matrix(uni),
                               dynamics.stiffness_matrix(prof), atol=1e-14)


def test_dd_residual_with_profile_matches_f64():
    cfg = _tapered_cfg(n=16)
    rng = np.random.default_rng(5)
    loads = jnp.asarray(rng.uniform(-0.3, 0.3, (3, 3)), jnp.float32)
    qe = jnp.asarray(rng.standard_normal((3, 9)) * 0.2, jnp.float32)
    res_dd = cosserat.equilibrium_residual_dd(qe, loads, jnp.zeros(3), cfg)
    res64 = cosserat.equilibrium_residual(
        jnp.asarray(qe, jnp.float64),
        jnp.asarray(loads, jnp.float64)[:, None, :],
        jnp.zeros(3, jnp.float64), cfg, iters=40)
    scale = float(jnp.max(jnp.abs(res64)))
    assert float(jnp.max(jnp.abs(res_dd - res64))) < 1e-7 * max(scale, 1.0)


def test_fused_batched_newton_accepts_profile():
    """The fused-kernel batched statics tier consumes the same weak-form
    residual, so grid profiles must ride through unchanged (interpret mode
    on CPU)."""
    cfg = _tapered_cfg(n=16)
    loads = jnp.asarray([[0.0, 0.0, -0.25], [0.05, 0.0, -0.1]], jnp.float32)
    sol = cosserat.solve_statics_batched(loads, cfg=cfg, tol=1e-5,
                                         interpret=True)
    assert bool(jnp.all(sol.converged))
    res = cosserat.equilibrium_residual(
        jnp.asarray(sol.qe, jnp.float64), jnp.asarray(loads, jnp.float64)[:, None, :],
        jnp.zeros(3, jnp.float64), cfg, iters=40)
    assert float(jnp.max(jnp.abs(res))) < 5e-5


def test_tapered_frequencies_bracketed_by_uniform_limits():
    """First bending frequency of a stiffness-graded cantilever sits
    between the uniform rods built from its softest and stiffest values."""
    rc = rod.RodConfig(n=12, ne=4)
    prof = cosserat.stiffness_profile(
        lambda xs: np.stack([np.ones_like(xs), 2.0 - xs, 2.0 - xs],
                            axis=-1), rc)
    f_soft = dynamics.natural_frequencies(dynamics.DynamicsConfig(
        statics=cosserat.StaticsConfig(rod=rc, stiffness=(1.0, 1.0, 1.0))))
    f_hard = dynamics.natural_frequencies(dynamics.DynamicsConfig(
        statics=cosserat.StaticsConfig(rod=rc, stiffness=(1.0, 2.0, 2.0))))
    f_prof = dynamics.natural_frequencies(dynamics.DynamicsConfig(
        statics=cosserat.StaticsConfig(rod=rc, stiffness=prof)))
    lo, hi = np.sort(f_soft)[0], np.sort(f_hard)[0]
    f1 = np.sort(f_prof)[0]
    assert lo < f1 < hi


def test_profile_shape_validation():
    rc = rod.RodConfig(n=12)
    try:
        cosserat.stiffness_profile(lambda xs: np.ones((5, 3)), rc)
    except ValueError as e:
        assert "profile fn returned" in str(e)
    else:
        raise AssertionError("bad profile shape must raise")
