"""Tests for the L2 layers: strain bases and Lie/quaternion utilities."""

import numpy as np
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
    basis,
    lie,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    oracle,
)


def test_legendre_matches_closed_forms():
    x = np.linspace(-1, 1, 7)
    vals = basis.legendre_vals(x, 4)
    np.testing.assert_allclose(vals[:, 0], np.ones_like(x))
    np.testing.assert_allclose(vals[:, 1], x)
    np.testing.assert_allclose(vals[:, 2], 0.5 * (3 * x**2 - 1), rtol=1e-14)
    np.testing.assert_allclose(vals[:, 3], 0.5 * (5 * x**3 - 3 * x), rtol=1e-13, atol=1e-15)


def test_chebyshev_t_matches_closed_forms():
    x = np.linspace(-1, 1, 7)
    vals = basis.chebyshev_t_vals(x, 4)
    np.testing.assert_allclose(vals[:, 2], 2 * x**2 - 1, rtol=1e-14)
    np.testing.assert_allclose(vals[:, 3], 4 * x**3 - 3 * x, rtol=1e-13, atol=1e-15)


def test_phi_matrix_matches_oracle():
    for X in (0.0, 0.25, 0.8, 1.0):
        ours = basis.phi_matrix(X, na=3, ne=3)
        ref = oracle.phi(X, na=3, ne=3)
        np.testing.assert_allclose(ours, ref, rtol=1e-14, atol=1e-15)
        assert ours.shape == (3, 9)


def test_strain_at_points_equals_per_point_phi():
    rng = np.random.default_rng(1)
    qe = rng.standard_normal(9)
    pts = tuple(np.linspace(0, 1, 5).tolist())
    table = basis.basis_table(pts, 3)
    k = basis.strain_at_points(jnp.asarray(qe), table)
    for i, X in enumerate(pts):
        np.testing.assert_allclose(
            np.asarray(k[i]), oracle.phi(X) @ qe, rtol=1e-12, atol=1e-14
        )


def test_strain_at_points_batched():
    rng = np.random.default_rng(2)
    qe = rng.standard_normal((4, 9))
    pts = tuple(np.linspace(0, 1, 6).tolist())
    table = basis.basis_table(pts, 3)
    k = basis.strain_at_points(jnp.asarray(qe), table)
    assert k.shape == (4, 6, 3)
    for b in range(4):
        np.testing.assert_allclose(
            np.asarray(k[b]),
            np.asarray(basis.strain_at_points(jnp.asarray(qe[b]), table)),
            rtol=1e-12,
        )


def test_skew_antisymmetric_and_cross():
    v = jnp.asarray([1.0, -2.0, 3.0])
    s = np.asarray(lie.skew(v))
    np.testing.assert_allclose(s, -s.T)
    w = np.array([0.5, 0.7, -0.1])
    np.testing.assert_allclose(s @ w, np.cross(np.asarray(v), w), rtol=1e-14)
    np.testing.assert_allclose(np.asarray(lie.unskew(jnp.asarray(s))), v)


def test_ad_matches_reference_block_structure():
    strain = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0, 6.0])
    a = np.asarray(lie.ad(strain))
    k_hat = np.asarray(lie.skew(strain[:3]))
    g_hat = np.asarray(lie.skew(strain[3:]))
    np.testing.assert_allclose(a[:3, :3], k_hat)
    np.testing.assert_allclose(a[:3, 3:], np.zeros((3, 3)))
    np.testing.assert_allclose(a[3:, :3], g_hat)
    np.testing.assert_allclose(a[3:, 3:], k_hat)


def test_quat_skew_matches_reference_block():
    k = np.array([0.3, -1.2, 0.8])
    np.testing.assert_allclose(
        np.asarray(lie.quat_skew(jnp.asarray(k))), oracle.quat_a_matrix(k)
    )


def test_quat_skew_kinematics_preserves_norm():
    """A(K) is antisymmetric => d|q|^2/dt = 0 for q' = 1/2 A q."""
    a = np.asarray(lie.quat_skew(jnp.asarray([0.4, 1.0, -0.7])))
    np.testing.assert_allclose(a, -a.T)


def test_quat_to_rot_unnormalized_matches_eigen_formula():
    """Against the oracle's verbatim Eigen formula on a NON-unit quaternion."""
    q = np.array([0.9, 0.2, -0.4, 0.31])  # |q| != 1 on purpose
    r = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    w, x, y, z = q
    first_col = np.array(
        [1 - 2 * (y * y + z * z), 2 * (x * y + w * z), 2 * (x * z - w * y)]
    )
    np.testing.assert_allclose(r[:, 0], first_col, rtol=1e-14)
    np.testing.assert_allclose(
        np.asarray(lie.quat_tangent(jnp.asarray(q))), first_col, rtol=1e-14
    )


def test_quat_to_rot_normalized_is_orthogonal():
    q = jnp.asarray([0.9, 0.2, -0.4, 0.31])
    r = np.asarray(lie.quat_to_rot_normalized(q))
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.linalg.det(r) == pytest.approx(1.0, abs=1e-12)


def test_quat_multiply_identity_and_conjugate():
    rng = np.random.default_rng(3)
    q = rng.standard_normal(4)
    qn = q / np.linalg.norm(q)
    ident = jnp.asarray([1.0, 0, 0, 0])
    np.testing.assert_allclose(
        np.asarray(lie.quat_multiply(ident, jnp.asarray(q))), q, rtol=1e-14
    )
    prod = lie.quat_multiply(jnp.asarray(qn), lie.quat_conjugate(jnp.asarray(qn)))
    np.testing.assert_allclose(np.asarray(prod), [1, 0, 0, 0], atol=1e-14)


def test_Ad_adjoint_structure():
    """SE(3) adjoint [[R,0],[p^R,R]] — wrench/twist transport block form."""
    rng = np.random.default_rng(8)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    r = np.asarray(lie.quat_to_rot(jnp.asarray(q)))
    p = np.array([0.2, -0.5, 1.0])
    ad6 = np.asarray(lie.Ad(jnp.asarray(r), jnp.asarray(p)))
    np.testing.assert_allclose(ad6[:3, :3], r, atol=1e-12)
    np.testing.assert_allclose(ad6[:3, 3:], np.zeros((3, 3)))
    np.testing.assert_allclose(ad6[3:, :3],
                               np.asarray(lie.skew(jnp.asarray(p))) @ r,
                               atol=1e-12)
    np.testing.assert_allclose(ad6[3:, 3:], r, atol=1e-12)


def test_component_major_roundtrip():
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        collocation as coll,
    )

    rng = np.random.default_rng(9)
    s = jnp.asarray(rng.standard_normal((5, 15, 4)))
    flat = coll.to_component_major(s)
    assert flat.shape == (5, 60)
    back = coll.from_component_major(flat, 15, 4)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(s))
    # layout matches the reference stacking: flat[c*np+i] == s[i, c]
    np.testing.assert_array_equal(np.asarray(flat[0, 2 * 15 + 3]),
                                  np.asarray(s[0, 3, 2]))
