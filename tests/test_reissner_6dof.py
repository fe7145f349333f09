"""6-DoF Reissner strain support (shear + extension)."""

import numpy as np
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod

CFG6 = rod.RodConfig(n=16, na=6, ne=3)


def test_pure_extension_scales_centerline():
    """kappa = 0, gamma = (eps, 0, 0): straight rod stretched by 1+eps."""
    eps = 0.25
    qe = np.zeros(18)
    qe[9] = eps  # gamma_x, mode P0 (components 3..5 are gamma, ne=3 each)
    sol = rod.rod_shape(jnp.asarray(qe), cfg=CFG6, method="dense")
    x_grid = CFG6.points[:-1]
    np.testing.assert_allclose(
        np.asarray(sol.positions),
        np.stack([(1 + eps) * x_grid, 0 * x_grid, 0 * x_grid], -1),
        atol=1e-10,
    )


def test_pure_shear_tilts_centerline():
    """gamma = (0, s, 0) with zero curvature: r(X) = (X, sX, 0)."""
    s = 0.3
    qe = np.zeros(18)
    qe[12] = s  # gamma_y mode P0
    sol = rod.rod_shape(jnp.asarray(qe), cfg=CFG6, method="dense")
    x_grid = CFG6.points[:-1]
    np.testing.assert_allclose(
        np.asarray(sol.positions),
        np.stack([x_grid, s * x_grid, 0 * x_grid], -1),
        atol=1e-10,
    )


def test_zero_gamma_matches_kirchhoff():
    """na=6 with gamma=0 must reproduce the na=3 Kirchhoff solution."""
    rng = np.random.default_rng(0)
    kappa_modes = rng.standard_normal(9)
    qe6 = np.concatenate([kappa_modes, np.zeros(9)])
    sol6 = rod.rod_shape(jnp.asarray(qe6), cfg=CFG6, method="dense")
    sol3 = rod.rod_shape(jnp.asarray(kappa_modes), cfg=rod.RodConfig(n=16),
                         method="dense")
    np.testing.assert_allclose(np.asarray(sol6.quaternions),
                               np.asarray(sol3.quaternions), atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol6.positions),
                               np.asarray(sol3.positions), atol=1e-12)


def test_combined_bend_and_extension_picard():
    rng = np.random.default_rng(1)
    qe = jnp.asarray(rng.standard_normal((4, 18)) * 0.5, jnp.float32)
    sol_p = rod.rod_shape(qe, cfg=CFG6, method="picard")
    sol_d = rod.rod_shape(qe, cfg=CFG6, method="dense")
    np.testing.assert_allclose(np.asarray(sol_p.positions),
                               np.asarray(sol_d.positions), atol=1e-5)


def test_refined_rejects_6dof():
    with pytest.raises(NotImplementedError, match="6-DoF"):
        rod.rod_shape(jnp.zeros(18, jnp.float32), cfg=CFG6, method="refined")


def test_fused_paths_reject_6dof():
    """Regression: the Pallas kernels only model curvature; they must refuse
    na=6 configs instead of silently dropping gamma."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        rod_kernel,
    )

    with pytest.raises(NotImplementedError, match="na=3"):
        rod.rod_shape_refined_fused(jnp.zeros((4, 18), jnp.float32), cfg=CFG6)
    with pytest.raises(NotImplementedError, match="na=3"):
        rod_kernel.rod_shape_fused(jnp.zeros((4, 18), jnp.float32), cfg=CFG6,
                                   interpret=True)
