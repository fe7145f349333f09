"""6-DoF Reissner strain support (shear + extension)."""

import numpy as np
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod

CFG6 = rod.RodConfig(n=16, na=6, ne=3)


def test_timoshenko_tip_deflection():
    """Shear-compliant statics gate: a cantilever under a small transverse
    tip force deflects by F L^3 / (3 EI) + F L / (GA) (Timoshenko beam
    theory; exact in the linear limit)."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        cosserat,
    )

    EI, GA, EA, GJ = 1.0, 10.0, 50.0, 1.0
    L, F = 1.0, 1e-3
    cfg = cosserat.StaticsConfig(
        rod=rod.RodConfig(n=16, na=6, ne=3, length=L),
        stiffness=(GJ, EI, EI, EA, GA, GA),
    )
    sol = cosserat.solve_statics(jnp.asarray([0.0, 0.0, F]), cfg=cfg,
                                 tol=1e-12, max_iter=20)
    assert bool(sol.converged)
    shape = rod.rod_shape(sol.qe, cfg=cfg.rod, method="dense")
    tip_z = float(shape.tip_position[2])
    expected = F * L**3 / (3 * EI) + F * L / GA
    np.testing.assert_allclose(tip_z, expected, rtol=1e-5)
    # the shear term must actually matter at this GA
    assert abs(tip_z - F * L**3 / (3 * EI)) > 0.2 * F * L / GA


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


def test_refined_6dof_matches_dense_f64():
    """The dd-refined path at na=6: ~1e-12 vs the dense f64 solve."""
    rng = np.random.default_rng(2)
    qe64 = rng.standard_normal((4, 18)) * 0.5
    sol_d = rod.rod_shape(jnp.asarray(qe64), cfg=CFG6, method="dense")
    sol_r = rod.rod_shape(rod.split_strain(qe64), cfg=CFG6, method="refined")
    np.testing.assert_allclose(sol_r.positions_f64(),
                               np.asarray(sol_d.positions), atol=1e-11)
    np.testing.assert_allclose(sol_r.quaternions_f64(),
                               np.asarray(sol_d.quaternions), atol=1e-11)


def test_fused_6dof_matches_picard():
    """The fused Pallas kernel at na=6: gamma enters the in-kernel tangent."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        rod_kernel,
    )

    rng = np.random.default_rng(3)
    qes = jnp.asarray(rng.standard_normal((64, 18)) * 0.5, jnp.float32)
    qk, rk = rod_kernel.rod_shape_fused(qes, cfg=CFG6, tile=64,
                                        interpret=True)
    ref = rod.rod_shape(qes, cfg=CFG6, method="picard", iters=20)
    np.testing.assert_allclose(np.asarray(rk), np.asarray(ref.positions),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(qk), np.asarray(ref.quaternions),
                               atol=5e-5)


def test_fused_bc_6dof_matches_picard():
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        rod_kernel,
    )

    rng = np.random.default_rng(4)
    qes = jnp.asarray(rng.standard_normal((32, 18)) * 0.5, jnp.float32)
    q0 = jnp.asarray(rng.standard_normal((32, 4)), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True)
    r0 = jnp.asarray(rng.standard_normal((32, 3)), jnp.float32)
    qk, rk = rod_kernel.rod_shape_fused_bc(qes, q0, r0, cfg=CFG6, tile=32,
                                           interpret=True)
    ref = rod.rod_shape(qes, q_init=q0, r_init=r0, cfg=CFG6, method="picard",
                        iters=20)
    # bf16x3 ('high') matmul error scales with |r| (~1.5 here from the
    # random r0): 2e-4 absolute ~ the kernel's f32-tier contract.
    np.testing.assert_allclose(np.asarray(rk), np.asarray(ref.positions),
                               atol=2e-4)


def test_refined_fused_6dof_hits_gate():
    """Refined-fused path at na=6 vs dense f64: <= 1e-8 rel on BOTH
    implementations — the auto-selected single kernel (na=6 narrow support
    landed with the dd Reissner tangent) and the staged path."""
    rng = np.random.default_rng(5)
    qe64 = rng.standard_normal((64, 18)) * 0.5
    ref = rod.rod_shape(jnp.asarray(qe64), cfg=CFG6, method="dense")
    r_ref = np.asarray(ref.positions)
    for single in (None, False):
        sol = rod.rod_shape_refined_fused(rod.split_strain(qe64), cfg=CFG6,
                                          refine_steps=1, tile=64,
                                          interpret=True,
                                          single_kernel=single)
        rel = np.max(np.abs(sol.positions_f64() - r_ref))             / np.max(np.abs(r_ref))
        assert rel < 1e-8, (single, rel)


@pytest.mark.parametrize("n,iters", [(64, 24), (256, 28)])
def test_single_refined_kernel_na6_wide_tiers(n, iters):
    """na=6 Reissner on the wide-tier single refined kernels (VERDICT r2
    next #1): n=64 rides the PAIRED layout, n=256 the multi-lane-tile WIDE
    layout — both with the in-kernel dd Reissner tangent, <= 1e-8 rel vs
    the f64 dense solve.  ≙ `/root/reference/include/utilities.h:27-37`
    (`ad`) / rod_modeling.pdf ch. 1-2 made first-class at every grid size."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        refined_kernel,
    )

    cfg = rod.RodConfig(n=n, na=6, ne=3)
    rng = np.random.default_rng(n)
    qe64 = np.concatenate([0.5 * rng.standard_normal((3, 9)),
                           0.15 * rng.standard_normal((3, 9))], axis=1)
    qe_hi, qe_lo = rod.split_strain(qe64)
    q_hi, q_lo, r_hi, r_lo = refined_kernel.rod_shape_refined_kernel(
        jnp.asarray(qe_hi), qes_lo=jnp.asarray(qe_lo), cfg=cfg, iters=iters,
        corr_iters=iters, interpret=True)
    q = np.asarray(q_hi, np.float64) + np.asarray(q_lo, np.float64)
    r = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    sol = rod.rod_shape(jnp.asarray(qe64), cfg=cfg, method="dense")
    q_ref = np.asarray(sol.quaternions)
    r_ref = np.asarray(sol.positions)
    assert np.abs(q - q_ref).max() / np.abs(q_ref).max() < 1e-8
    assert np.abs(r - r_ref).max() / np.abs(r_ref).max() < 1e-8


def test_single_refined_kernel_bc_na6_paired():
    """General-BC paired refined kernel at na=6 (n=64 grid): the junction
    state enters in dd, gamma enters the in-kernel Reissner tangent."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        refined_kernel,
    )

    cfg = rod.RodConfig(n=64, na=6, ne=3)
    rng = np.random.default_rng(9)
    qe64 = np.concatenate([0.4 * rng.standard_normal((2, 9)),
                           0.1 * rng.standard_normal((2, 9))], axis=1)
    qe_hi, qe_lo = rod.split_strain(qe64)
    q0 = rng.standard_normal((2, 4))
    q0 /= np.linalg.norm(q0, axis=1, keepdims=True)
    r0 = 0.3 * rng.standard_normal((2, 3))
    b = refined_kernel.rod_shape_refined_kernel_bc(
        jnp.asarray(qe_hi), jnp.asarray(q0, np.float32),
        jnp.asarray(r0, np.float32), qes_lo=jnp.asarray(qe_lo), cfg=cfg,
        iters=24, corr_iters=24, interpret=True)
    qb = np.asarray(b[0], np.float64) + np.asarray(b[1], np.float64)
    rb = np.asarray(b[2], np.float64) + np.asarray(b[3], np.float64)
    solb = rod.rod_shape(jnp.asarray(qe64), q_init=jnp.asarray(q0),
                         r_init=jnp.asarray(r0), cfg=cfg, method="dense")
    # f32-rounded BCs bound the agreement (cf. the narrow-kernel BC gate)
    assert np.abs(qb - np.asarray(solb.quaternions)).max() < 5e-7
    assert np.abs(rb - np.asarray(solb.positions)).max() < 5e-7


def test_single_refined_kernel_na6_matches_dense_f64():
    """The fully-fused single refined kernel now covers 6-DoF Reissner
    strains in the narrow layout (dd Reissner tangent in-kernel): ~1e-11
    vs the f64 dense solve, general BCs included."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        refined_kernel,
    )

    cfg = rod.RodConfig(n=16, na=6, ne=3)
    rng = np.random.default_rng(0)
    qe64 = np.concatenate([0.6 * rng.standard_normal((4, 9)),
                           0.15 * rng.standard_normal((4, 9))], axis=1)
    qe_hi, qe_lo = rod.split_strain(qe64)
    q_hi, q_lo, r_hi, r_lo = refined_kernel.rod_shape_refined_kernel(
        jnp.asarray(qe_hi), qes_lo=jnp.asarray(qe_lo), cfg=cfg, iters=22,
        corr_iters=22, tile=64, interpret=True)
    q = np.asarray(q_hi, np.float64) + np.asarray(q_lo, np.float64)
    r = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    sol = rod.rod_shape(jnp.asarray(qe64), cfg=cfg, method="dense")
    q_ref = np.asarray(sol.quaternions)
    r_ref = np.asarray(sol.positions)
    assert np.abs(q - q_ref).max() / np.abs(q_ref).max() < 1e-9
    assert np.abs(r - r_ref).max() / np.abs(r_ref).max() < 1e-9

    # general-BC variant against the dense solve with the same BCs
    q0 = rng.standard_normal((4, 4))
    q0 /= np.linalg.norm(q0, axis=1, keepdims=True)
    r0 = 0.3 * rng.standard_normal((4, 3))
    b = refined_kernel.rod_shape_refined_kernel_bc(
        jnp.asarray(qe_hi), jnp.asarray(q0, np.float32),
        jnp.asarray(r0, np.float32), qes_lo=jnp.asarray(qe_lo), cfg=cfg,
        iters=22, corr_iters=22, tile=64, interpret=True)
    qb = np.asarray(b[0], np.float64) + np.asarray(b[1], np.float64)
    rb = np.asarray(b[2], np.float64) + np.asarray(b[3], np.float64)
    solb = rod.rod_shape(jnp.asarray(qe64), q_init=jnp.asarray(q0),
                         r_init=jnp.asarray(r0), cfg=cfg, method="dense")
    # f32-rounded BCs: agreement at the BC-rounding level, not dd level
    assert np.abs(qb - np.asarray(solb.quaternions)).max() < 5e-7
    assert np.abs(rb - np.asarray(solb.positions)).max() < 5e-7
