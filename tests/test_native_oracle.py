"""Cross-checks: native C++ oracle vs NumPy oracle vs JAX framework."""

import numpy as np
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    native_oracle,
    oracle,
)

pytestmark = pytest.mark.skipif(
    not native_oracle.is_available(), reason="native oracle failed to build"
)


def test_native_grid_matches_numpy():
    for n in (4, 16, 64):
        np.testing.assert_allclose(
            native_oracle.cgl_points(n), oracle.cgl_points(n), rtol=1e-15
        )


def test_native_diff_matrix_matches_numpy():
    for n in (8, 16, 33):
        np.testing.assert_allclose(
            native_oracle.diff_matrix(n), oracle.diff_matrix(n),
            rtol=1e-12, atol=1e-12,
        )


def test_native_legendre():
    for order in range(6):
        for t in (-1.0, -0.3, 0.0, 0.7, 1.0):
            assert native_oracle.legendre(order, t) == pytest.approx(
                oracle.legendre_p(order, t), rel=1e-14, abs=1e-15
            )


def test_native_solve_matches_numpy_oracle():
    q_ref, r_ref = oracle.integrate_position(oracle.demo_qe())
    q_nat, r_nat = native_oracle.solve_rod(oracle.demo_qe())
    np.testing.assert_allclose(q_nat, q_ref, atol=1e-13)
    np.testing.assert_allclose(r_nat, r_ref, atol=1e-13)


def test_native_solve_random_strains():
    rng = np.random.default_rng(3)
    for _ in range(3):
        qe = rng.standard_normal(9) * 1.5
        q_ref, r_ref = oracle.integrate_position(qe)
        q_nat, r_nat = native_oracle.solve_rod(qe)
        np.testing.assert_allclose(q_nat, q_ref, atol=1e-12)
        np.testing.assert_allclose(r_nat, r_ref, atol=1e-12)


def test_native_batch_matches_single():
    rng = np.random.default_rng(4)
    qes = rng.standard_normal((6, 9))
    qb, rb = native_oracle.solve_rod_batch(qes)
    for i in range(6):
        qs, rs = native_oracle.solve_rod(qes[i])
        np.testing.assert_allclose(qb[i], qs, atol=1e-14)
        np.testing.assert_allclose(rb[i], rs, atol=1e-14)


def test_native_other_grid_sizes():
    for n in (8, 32):
        q_ref, r_ref = oracle.integrate_position(oracle.demo_qe(), n=n)
        q_nat, r_nat = native_oracle.solve_rod(oracle.demo_qe(), n=n)
        np.testing.assert_allclose(q_nat, q_ref, atol=1e-12)
        np.testing.assert_allclose(r_nat, r_ref, atol=1e-12)


def test_framework_matches_native_oracle():
    import jax.numpy as jnp
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod

    qe = oracle.demo_qe()
    q_nat, r_nat = native_oracle.solve_rod(qe)
    sol = rod.rod_shape(jnp.asarray(qe), method="dense")
    np.testing.assert_allclose(np.asarray(sol.q_stack), q_nat, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.positions), r_nat, atol=1e-12)


def test_oracles_agree_at_nonunit_length():
    """Regression: both oracles must normalize arc length into the basis for
    L != 1 (the reference hard-codes L=1)."""
    qe = oracle.demo_qe()
    q_np, r_np = oracle.integrate_position(qe, length=2.0)
    q_nat, r_nat = native_oracle.solve_rod(qe, length=2.0)
    np.testing.assert_allclose(q_nat, q_np, atol=1e-12)
    np.testing.assert_allclose(r_nat, r_np, atol=1e-12)
