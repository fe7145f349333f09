"""refined_fused pipeline + fast residual (interpret-mode Pallas on CPU)."""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
    collocation as coll,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
    rod_kernel,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    oracle,
)

CFG = rod.RodConfig()


def test_residual_quat_matches_generic():
    rng = np.random.default_rng(0)
    qes = jnp.asarray(rng.standard_normal((8, 9)), jnp.float32)
    k_dd = rod._curvature_dd(CFG, qes)
    m_dd = (rod._ode_blocks(k_dd[0]), rod._ode_blocks(k_dd[1]))
    x_hi = jnp.asarray(rng.standard_normal((8, 15, 4)), jnp.float32)
    x_lo = jnp.asarray(rng.standard_normal((8, 15, 4)) * 1e-8, jnp.float32)
    rhs_hi = jnp.asarray(rng.standard_normal((8, 15, 4)), jnp.float32)
    rhs_lo = jnp.zeros_like(rhs_hi)
    g = CFG.grid
    r1 = coll.residual_dd(g, m_dd, x_hi, x_lo, rhs_hi, rhs_lo)
    r2 = coll.residual_quat_dd(g, k_dd, x_hi, x_lo, rhs_hi, rhs_lo)
    v1 = np.asarray(r1[0], np.float64) + np.asarray(r1[1], np.float64)
    v2 = np.asarray(r2[0], np.float64) + np.asarray(r2[1], np.float64)
    np.testing.assert_allclose(v1, v2, atol=1e-11)


def test_residual_zero_at_exact_solution():
    """The dd residual evaluated at the oracle solution must be ~0."""
    qe = oracle.demo_qe()
    q_stack, _ = oracle.integrate_position(qe)
    x64 = q_stack.reshape(4, 15).T[None]          # (1, 15, 4) point-major
    x_hi = jnp.asarray(x64, jnp.float32)
    x_lo = jnp.asarray(x64 - np.asarray(x_hi, np.float64), jnp.float32)
    qe_hi, qe_lo = rod.split_strain(qe)
    k_dd = rod._curvature_dd(CFG, (qe_hi[None], qe_lo[None]))
    g = CFG.grid
    import experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.doubledouble as dd

    dn_in_hi, dn_in_lo = g.dn_in_dd
    q0 = jnp.asarray([1.0, 0, 0, 0], jnp.float32)
    rhs_hi, rhs_lo = dd.dd_scale(
        *dd.dd_mul_f32(jnp.asarray(dn_in_hi)[:, None],
                       jnp.asarray(dn_in_lo)[:, None], q0[None, None, :]),
        -1.0,
    )
    r_hi, r_lo = coll.residual_quat_dd(g, k_dd, x_hi, x_lo, rhs_hi, rhs_lo)
    res = np.abs(np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64))
    assert res.max() < 1e-11


def test_correction_kernel_solves_system():
    """picard_correction_fused(qe, rhs) must satisfy the collocation system."""
    rng = np.random.default_rng(1)
    qes = jnp.asarray(rng.standard_normal((16, 9)), jnp.float32)
    rhs = jnp.asarray(rng.standard_normal((16, 15, 4)), jnp.float32)
    x = rod_kernel.picard_correction_fused(qes, rhs, tile=16 if False else 256,
                                           interpret=True)
    m = rod._ode_blocks(rod.curvature_at_points(CFG, qes))
    ref = coll.solve_ivp_picard(CFG.grid, m, rhs=rhs, iters=24)
    np.testing.assert_allclose(np.asarray(x), np.asarray(ref), atol=5e-5)


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((300, 15, 4)), jnp.float32)
    packed, b_pad = rod_kernel.pack_state(x, tile=256)
    assert packed.shape == (128, b_pad // 2)
    back = rod_kernel.unpack_state(packed, 300, 15, 4, tile=256)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_refined_fused_hits_gate_interpret():
    """Full refined_fused pipeline vs the f64 oracle (interpret mode)."""
    qe = oracle.demo_qe()
    _, r_ref = oracle.integrate_position(qe)
    qe_hi, qe_lo = rod.split_strain(qe)
    qdd = (jnp.tile(qe_hi, (64, 1)), jnp.tile(qe_lo, (64, 1)))
    sol = rod.rod_shape_refined_fused(qdd, refine_steps=1, tile=64,
                                      interpret=True)
    r64 = sol.positions_f64()[0]
    rel = np.max(np.abs(r64 - r_ref)) / np.max(np.abs(r_ref))
    assert rel < 1e-8, rel
