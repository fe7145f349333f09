"""Unit + property tests for the L1 spectral primitives (SURVEY.md §4a/b)."""

import numpy as np
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import chebyshev


def test_cgl_points_descending_endpoints():
    # Reference ordering (chebyshev_differentiation.h:26): x0 = L, x_{N-1} = 0.
    for n in (2, 5, 16):
        x = chebyshev.cgl_points(n)
        assert x[0] == pytest.approx(1.0)
        assert x[-1] == pytest.approx(0.0, abs=1e-16)
        assert np.all(np.diff(x) < 0)


def test_cgl_points_formula():
    n = 16
    x = chebyshev.cgl_points(n, length=2.0)
    j = np.arange(n)
    np.testing.assert_allclose(x, (1.0 + np.cos(np.pi * j / (n - 1))), rtol=1e-15)


def test_coefficients_c():
    c = chebyshev.coefficients_c(5)
    np.testing.assert_allclose(c, [2.0, -1.0, 1.0, -1.0, 2.0])


def test_diff_matrix_rows_sum_to_zero():
    for n in (4, 8, 16, 33):
        d = chebyshev.diff_matrix(n)
        np.testing.assert_allclose(d.sum(axis=1), np.zeros(n), atol=1e-11)


@pytest.mark.parametrize("n", [4, 8, 16, 24])
def test_diff_matrix_exact_on_polynomials(n):
    """Dn must differentiate polynomials of degree <= n-1 exactly."""
    x = chebyshev.cgl_points(n)
    d = chebyshev.diff_matrix(n)
    rng = np.random.default_rng(0)
    for deg in range(n):
        coeffs = rng.standard_normal(deg + 1)
        p = np.polynomial.Polynomial(coeffs)
        np.testing.assert_allclose(d @ p(x), p.deriv()(x), atol=1e-8 * max(1, n**2))


def test_diff_matrix_corner_closed_form():
    """d00 = 2*(2(n-1)^2+1)/6 on [0,1] (pdf eq. B.14 scaled by domain map)."""
    for n in (8, 16, 32):
        d = chebyshev.diff_matrix(n)
        expected = 2.0 * (2 * (n - 1) ** 2 + 1) / 6.0
        assert d[0, 0] == pytest.approx(expected, rel=1e-13)
        assert d[-1, -1] == pytest.approx(-expected, rel=1e-13)


def test_diff_matrix_length_scaling():
    d1 = chebyshev.diff_matrix(12, 1.0)
    d3 = chebyshev.diff_matrix(12, 3.0)
    np.testing.assert_allclose(d3, d1 / 3.0, rtol=1e-13)


def test_split_endpoint_last():
    d = chebyshev.diff_matrix(6)
    d_nn, d_in = chebyshev.split_endpoint(d, "last")
    assert d_nn.shape == (5, 5)
    assert d_in.shape == (5, 1)
    np.testing.assert_array_equal(d_nn, d[:5, :5])
    np.testing.assert_array_equal(d_in, d[:5, 5:])


def test_split_endpoint_first():
    d = chebyshev.diff_matrix(6)
    d_nn, d_in = chebyshev.split_endpoint(d, "first")
    assert d_nn.shape == (5, 5)
    np.testing.assert_array_equal(d_nn, d[1:, 1:])


def test_integration_matrix_inverts():
    g = chebyshev.integration_matrix(16)
    d_nn, _ = chebyshev.split_endpoint(chebyshev.diff_matrix(16), "last")
    np.testing.assert_allclose(g @ d_nn, np.eye(15), atol=1e-12)


def test_integration_matrix_quadrature():
    """Integrating f' from the base recovers f - f(0) at the unknown points."""
    n = 16
    x = chebyshev.cgl_points(n)
    g = chebyshev.integration_matrix(n)
    f = np.sin(3.0 * x) + x**2
    fp = 3.0 * np.cos(3.0 * x) + 2 * x
    # Solve Dn_NN y = fp_NN - Dn_IN * f(0)  ==  y = f_NN - 0 shift
    d = chebyshev.diff_matrix(n)
    d_nn, d_in = chebyshev.split_endpoint(d, "last")
    y = g @ (fp[: n - 1] - d_in[:, 0] * f[-1])
    np.testing.assert_allclose(y, f[: n - 1], atol=1e-9)


def test_cached_constants_are_frozen():
    """Regression: cached host constants are shared across every grid/config
    in the process — in-place edits must fail loudly."""
    for arr in (chebyshev.cgl_points(16), chebyshev.diff_matrix(16),
                chebyshev.integration_matrix(16),
                chebyshev.clenshaw_curtis_weights(16)):
        with pytest.raises(ValueError):
            arr[0] = 0.0


def test_terminal_value_grid():
    """known='first': integrate a terminal-value problem backward from the
    tip — the pdf's permutation general case the reference hard-codes away."""
    import jax.numpy as jnp
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        collocation as coll,
    )

    n, lam, y_end = 16, -1.7, 2.0
    grid = coll.make_grid(n, known="first")
    m = jnp.full((n - 1, 1, 1), lam, jnp.float64)
    sol = coll.solve_ivp_dense(grid, m, jnp.asarray([y_end], jnp.float64))
    x_unknown = grid.points[1:]
    exact = y_end * np.exp(lam * (x_unknown - 1.0))  # y(L)=y_end at x[0]=1
    np.testing.assert_allclose(np.asarray(sol[:, 0]), exact, rtol=1e-11)
