"""Fully-fused refined kernel (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
    refined_kernel,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    oracle,
)


def test_matches_oracle_at_exact_inputs():
    """At f32-representable strains the kernel must hit ~1e-10 absolute."""
    rng = np.random.default_rng(3)
    qes = jnp.asarray(rng.standard_normal((64, 9)), jnp.float32)
    q_hi, q_lo, r_hi, r_lo = refined_kernel.rod_shape_refined_kernel(
        qes, tile=64, interpret=True
    )
    qk = np.asarray(q_hi, np.float64) + np.asarray(q_lo, np.float64)
    rk = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    for i in range(4):
        q_ref, r_ref = oracle.integrate_position(np.asarray(qes[i], np.float64))
        q_flat = np.swapaxes(qk[i], -1, -2).reshape(-1)
        assert np.max(np.abs(q_flat - q_ref)) < 1e-9
        assert np.max(np.abs(rk[i] - r_ref)) < 1e-9


def test_dd_input_hits_gate_vs_f64_oracle():
    qe_dd = rod.split_strain(oracle.demo_qe())
    qdd = (jnp.tile(qe_dd[0], (64, 1)), jnp.tile(qe_dd[1], (64, 1)))
    sol = rod.rod_shape_refined_fused(qdd, refine_steps=1, tile=64,
                                      interpret=True)
    q_ref, r_ref = oracle.integrate_position(oracle.demo_qe())
    rel = np.max(np.abs(sol.positions_f64()[0] - r_ref)) / np.max(np.abs(r_ref))
    assert rel < 1e-10, rel


def test_ragged_batch():
    rng = np.random.default_rng(5)
    qes = jnp.asarray(rng.standard_normal((70, 9)), jnp.float32)
    q_hi, q_lo, r_hi, r_lo = refined_kernel.rod_shape_refined_kernel(
        qes, tile=64, interpret=True
    )
    assert q_hi.shape == (70, 15, 4)
    assert r_hi.shape == (70, 15, 3)
    # padding must not leak into real rods
    single = refined_kernel.rod_shape_refined_kernel(qes[69:70], tile=64,
                                                     interpret=True)
    np.testing.assert_allclose(np.asarray(q_hi[69]), np.asarray(single[0][0]),
                               atol=1e-7)


def test_single_kernel_autoselect_matches_staged():
    rng = np.random.default_rng(6)
    qes = jnp.asarray(rng.standard_normal((64, 9)), jnp.float32)
    auto = rod.rod_shape_refined_fused(qes, refine_steps=1, tile=64,
                                       interpret=True)          # single kernel
    staged = rod.rod_shape_refined_fused(qes, refine_steps=1, tile=64,
                                         interpret=True, single_kernel=False)
    np.testing.assert_allclose(staged.positions_f64(), auto.positions_f64(),
                               atol=1e-9)


def test_moderate_curvature_within_gate():
    """Regression: rho = |K| L / 2 = 5 must stay under the 1e-8 gate with
    the default iteration counts (corr_iters=12 broke this once)."""
    qe = np.zeros(9)
    qe[3] = 10.0
    q_ref, r_ref = oracle.integrate_position(qe)
    qes = jnp.tile(jnp.asarray(qe, jnp.float32), (64, 1))
    sol = rod.rod_shape_refined_fused(qes, refine_steps=1, tile=64,
                                      interpret=True)
    rel = np.max(np.abs(sol.positions_f64()[0] - r_ref)) / np.max(np.abs(r_ref))
    assert rel < 1e-8, rel


def test_precision_request_respected():
    """precision != 'high' must not silently route to the single kernel."""
    qes = jnp.zeros((64, 9), jnp.float32)
    sol = rod.rod_shape_refined_fused(qes, refine_steps=1, tile=64,
                                      interpret=True, precision="highest")
    assert sol.positions_dd is not None
    import pytest

    with pytest.raises(ValueError, match="high"):
        rod.rod_shape_refined_fused(qes, refine_steps=1, single_kernel=True,
                                    precision="highest")
