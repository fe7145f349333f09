"""Fused Pallas kernel vs the XLA reference path (interpret mode on CPU).

Hardware-mode numerics are exercised by bench.py / scripts on the real chip
(measured there: 'high' ~9e-6 vs the XLA f32 path, 'highest' ~2e-7).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
    rod_kernel,
)


def _ref(qes, iters=20):
    return rod.rod_shape(qes, method="picard", iters=iters)


def test_fused_matches_picard():
    rng = np.random.default_rng(0)
    qes = jnp.asarray(rng.standard_normal((512, 9)), jnp.float32)
    ref = _ref(qes)
    # 'highest' = full f32 MXU passes; 'high' = emulated bf16x3 (~1e-5).
    for prec, tol in (("highest", 2e-6), ("high", 5e-5)):
        q, r = rod_kernel.rod_shape_fused(qes, tile=256, interpret=True,
                                          precision=prec)
        np.testing.assert_allclose(np.asarray(q), np.asarray(ref.quaternions),
                                   atol=tol)
        np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                                   atol=tol)


def test_fused_ragged_batch_padding():
    """Batch not a multiple of the tile: padding must not leak."""
    rng = np.random.default_rng(1)
    qes = jnp.asarray(rng.standard_normal((300, 9)), jnp.float32)
    q, r = rod_kernel.rod_shape_fused(qes, tile=256, interpret=True)
    assert q.shape == (300, 15, 4)
    assert r.shape == (300, 15, 3)
    ref = _ref(qes)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                               atol=5e-5)


def test_fused_demo_strain_golden():
    qe = rod.demo_qe()[None, :].repeat(256, axis=0)
    q, r = rod_kernel.rod_shape_fused(qe, tile=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(r[0, 0]), [0.562673, 0.0, -0.745914], atol=5e-6
    )
    np.testing.assert_allclose(
        np.asarray(q[0, 0]), [0.799770, 0.0, 0.600307, 0.0], atol=5e-6
    )


def test_fused_rod_packing_independence():
    """Rods must not bleed into their packed partner (2 rods share a column
    block): solve a batch where adjacent rods differ wildly."""
    rng = np.random.default_rng(2)
    qes = np.zeros((256, 9), np.float32)
    qes[::2] = rng.standard_normal((128, 9)) * 3.0  # big strains even rods
    # odd rods zero strain -> straight rods
    q, r = rod_kernel.rod_shape_fused(jnp.asarray(qes), tile=256, interpret=True)
    x_grid = rod.RodConfig().points[:-1]
    straight = np.stack([x_grid, 0 * x_grid, 0 * x_grid], axis=-1)
    np.testing.assert_allclose(np.asarray(r[1::2]),
                               np.broadcast_to(straight, (128, 15, 3)),
                               atol=2e-6)


def test_fused_too_large_n_rejected():
    """Grids with 32 < n-1 <= 512 route to the (multi-tile) wide layout;
    beyond that the fused paths must still refuse loudly."""
    with pytest.raises(ValueError, match="n-1 <= 512"):
        rod_kernel.rod_shape_fused(
            jnp.zeros((4, 9), jnp.float32), cfg=rod.RodConfig(n=600),
            interpret=True,
        )


@pytest.mark.parametrize("n", [8, 24, 33])
def test_fused_other_grid_orders(n):
    """Generalized packing: 4 rods/column (n<=9), 1 rod/column (n<=33)."""
    rng = np.random.default_rng(7)
    cfg = rod.RodConfig(n=n)
    qes = jnp.asarray(rng.standard_normal((300, 9)), jnp.float32)
    q, r = rod_kernel.rod_shape_fused(qes, cfg=cfg, tile=256, interpret=True)
    ref = rod.rod_shape(qes, cfg=cfg, method="picard", iters=20)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref.quaternions),
                               atol=5e-5)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                               atol=5e-5)


def test_rod_shape_method_fused_guards():
    """method='fused' keeps the reference's unnormalized semantics; custom
    BCs route to rod_shape_fused_bc (exercised directly elsewhere)."""
    rng = np.random.default_rng(5)
    qes = jnp.asarray(rng.standard_normal((64, 9)), jnp.float32)
    with pytest.raises(NotImplementedError, match="unnormalized"):
        rod.rod_shape(qes, method="fused", normalize_quaternions=True)


def test_fused_bc_matches_picard_random_boundaries():
    rng = np.random.default_rng(0)
    qes = jnp.asarray(rng.standard_normal((300, 9)), jnp.float32)
    q0 = rng.standard_normal((300, 4))
    q0 = jnp.asarray(q0 / np.linalg.norm(q0, axis=1, keepdims=True), jnp.float32)
    r0 = jnp.asarray(rng.standard_normal((300, 3)), jnp.float32)
    q, r = rod_kernel.rod_shape_fused_bc(qes, q0, r0, tile=256, interpret=True)
    ref = rod.rod_shape(qes, q_init=q0, r_init=r0, method="picard", iters=20)
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref.quaternions),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                               atol=1e-4)


def test_fused_rejects_empty_batch():
    with pytest.raises(ValueError, match="non-empty"):
        rod_kernel.rod_shape_fused(jnp.zeros((0, 9), jnp.float32),
                                   interpret=True)


class TestWideLayout:
    """32 < n-1 < 128: the wide layout (points on lanes, VERDICT r1 #6)."""

    CFG64 = rod.RodConfig(n=64)

    def test_fused_n64_matches_picard(self):
        rng = np.random.default_rng(31)
        qes = jnp.asarray(rng.standard_normal((40, 9)) * 0.5, jnp.float32)
        q, r = rod_kernel.rod_shape_fused(qes, cfg=self.CFG64, iters=24,
                                          interpret=True)
        ref = rod.rod_shape(qes, cfg=self.CFG64, method="picard", iters=24)
        np.testing.assert_allclose(np.asarray(q), np.asarray(ref.quaternions),
                                   atol=5e-5)
        np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                                   atol=5e-5)

    def test_fused_bc_n64(self):
        rng = np.random.default_rng(32)
        qes = jnp.asarray(rng.standard_normal((33, 9)) * 0.5, jnp.float32)
        q0 = jnp.asarray(rng.standard_normal((33, 4)), jnp.float32)
        q0 = q0 / jnp.linalg.norm(q0, axis=-1, keepdims=True)
        r0 = jnp.asarray(rng.standard_normal((33, 3)), jnp.float32)
        q, r = rod_kernel.rod_shape_fused_bc(qes, q0, r0, cfg=self.CFG64,
                                             iters=24, interpret=True)
        ref = rod.rod_shape(qes, q_init=q0, r_init=r0, cfg=self.CFG64,
                            method="picard", iters=24)
        np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                                   atol=2e-4)

    def test_correction_n64(self):
        from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
            collocation as coll,
        )

        rng = np.random.default_rng(33)
        qes = jnp.asarray(rng.standard_normal((40, 9)) * 0.5, jnp.float32)
        rhs = jnp.asarray(rng.standard_normal((40, 63, 4)) * 0.1, jnp.float32)
        x = rod_kernel.picard_correction_fused(qes, rhs, cfg=self.CFG64,
                                               iters=24, interpret=True)
        m = rod._ode_blocks(
            rod.curvature_at_points(self.CFG64, qes)[..., :3].astype(jnp.float32))
        ref = coll.solve_ivp_picard(self.CFG64.grid, m, rhs=rhs, iters=24)
        np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=5e-6)

    def test_fused_6dof_n64(self):
        cfg6 = rod.RodConfig(n=64, na=6, ne=3)
        rng = np.random.default_rng(34)
        qes = jnp.asarray(rng.standard_normal((40, 18)) * 0.4, jnp.float32)
        q, r = rod_kernel.rod_shape_fused(qes, cfg=cfg6, iters=24,
                                          interpret=True)
        ref = rod.rod_shape(qes, cfg=cfg6, method="picard", iters=24)
        np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                                   atol=5e-5)

    def test_refined_fused_n64_hits_gate(self):
        from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
            oracle,
        )

        qe_dd = rod.split_strain(oracle.demo_qe())
        qdd = (jnp.tile(qe_dd[0], (40, 1)), jnp.tile(qe_dd[1], (40, 1)))
        sol = rod.rod_shape_refined_fused(qdd, cfg=self.CFG64,
                                          refine_steps=1, interpret=True)
        _, r_ref = oracle.integrate_position(oracle.demo_qe(), n=64)
        rel = (np.max(np.abs(sol.positions_f64()[0] - r_ref))
               / np.max(np.abs(r_ref)))
        assert rel < 1e-8, rel

    def test_statics_batched_n64(self):
        from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
            cosserat,
        )

        scfg = cosserat.StaticsConfig(rod=self.CFG64)
        loads = jnp.asarray(
            np.random.default_rng(35).uniform(-0.4, 0.4, (8, 3)), jnp.float32)
        sol = cosserat.solve_statics_batched(loads, cfg=scfg, tol=1e-5,
                                             max_iter=12, iters=16,
                                             interpret=True)
        assert np.asarray(sol.converged).all()


def test_paired_wide_layout_parity_n64():
    """ROADMAP 'wide-layout MAC efficiency': grids with 32 < n-1 <= 64 fold
    TWO rods per 128 lanes with block-diagonal operators (64 rods per MXU
    pass).  Parity vs the XLA picard path for base, BC, and correction
    kernels at a ragged batch size."""
    cfg = rod.RodConfig(n=64)
    rng = np.random.default_rng(3)
    qes = jnp.asarray(0.6 * rng.standard_normal((70, 9)), jnp.float32)
    q, r = rod_kernel.rod_shape_fused(qes, cfg=cfg, iters=24, interpret=True)
    ref = rod.rod_shape(qes, cfg=cfg, method="picard", iters=24)
    assert float(jnp.max(jnp.abs(q - ref.quaternions.astype(jnp.float32)))) \
        < 2e-5
    assert float(jnp.max(jnp.abs(r - ref.positions.astype(jnp.float32)))) \
        < 2e-5

    q0 = jnp.asarray(rng.standard_normal((70, 4)), jnp.float32)
    q0 = q0 / jnp.linalg.norm(q0, axis=1, keepdims=True)
    r0 = jnp.asarray(rng.standard_normal((70, 3)), jnp.float32)
    qb, rb = rod_kernel.rod_shape_fused_bc(qes, q0, r0, cfg=cfg, iters=24,
                                           interpret=True)
    refb = rod.rod_shape(qes, q_init=q0, r_init=r0, cfg=cfg,
                         method="picard", iters=24)
    assert float(jnp.max(jnp.abs(qb - refb.quaternions.astype(jnp.float32)))) \
        < 1e-4
    assert float(jnp.max(jnp.abs(rb - refb.positions.astype(jnp.float32)))) \
        < 1e-4

    # correction vs per-sample dense solves
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        collocation as coll,
        lie,
    )

    rhs = jnp.asarray(0.1 * rng.standard_normal((5, 63, 4)), jnp.float32)
    x = np.asarray(rod_kernel.picard_correction_fused(
        qes[:5], rhs, cfg=cfg, iters=24, interpret=True), np.float64)
    k = np.asarray(rod.curvature_at_points(cfg, jnp.asarray(qes[:5],
                                                            jnp.float64)))
    for i in range(5):
        m_blocks = 0.5 * np.asarray(lie.quat_skew(jnp.asarray(k[i])))
        a_nn = np.asarray(coll.collocation_matrix(cfg.grid, m_blocks))
        r_cm = np.asarray(rhs[i], np.float64).T.reshape(-1)
        x_ref = np.linalg.solve(a_nn, r_cm).reshape(4, 63).T
        assert np.abs(x[i] - x_ref).max() < 1e-5


def test_multitile_wide_f32_parity_n129_n256():
    """Grids beyond one lane tile (n-1 in 129..512) ride the wide kernels
    with wider lane dimensions; parity vs the XLA picard path."""
    rng = np.random.default_rng(1)
    for n in (129, 256):
        cfg = rod.RodConfig(n=n)
        qes = jnp.asarray(0.5 * rng.standard_normal((3, 9)), jnp.float32)
        q, r = rod_kernel.rod_shape_fused(qes, cfg=cfg, iters=28,
                                          interpret=True)
        ref = rod.rod_shape(qes, cfg=cfg, method="picard", iters=28)
        assert float(jnp.max(jnp.abs(
            q - ref.quaternions.astype(jnp.float32)))) < 2e-5
        assert float(jnp.max(jnp.abs(
            r - ref.positions.astype(jnp.float32)))) < 2e-5
