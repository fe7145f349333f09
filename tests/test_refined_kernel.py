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


def test_validity_guard_raises_on_concrete_strong_strain():
    """rho > 5 with a concrete strain must be a loud trace-time error
    (never a silent int8 wrap, VERDICT r1 weak #2)."""
    import pytest

    qe = np.zeros(9, np.float32)
    qe[3] = 12.0          # constant |K| = 12 -> rho = 6
    qes = jnp.tile(jnp.asarray(qe), (64, 1))
    assert rod.strain_rho(qes, rod.RodConfig()) == pytest.approx(6.0)
    with pytest.raises(ValueError, match="rho"):
        rod.rod_shape_refined_fused(qes, refine_steps=1, tile=64,
                                    interpret=True)
    # The guard is an opt-out, not a wall.
    sol = rod.rod_shape_refined_fused(qes, refine_steps=1, tile=64,
                                      interpret=True, check_validity=False,
                                      iters=40, corr_iters=40)
    assert sol.positions is not None


def test_validity_sentinel_poisons_overflow_under_jit():
    """Inside jit the trace-time check cannot run; the kernel's in-kernel
    sentinel must NaN-poison rods whose Picard state exceeds the int8
    window instead of wrapping."""
    import jax

    qe_bad = np.zeros(9, np.float32)
    qe_bad[3] = 16.0      # rho = 8: transient max ~ 8^8/8! >> 4 -> overflow
    qes = jnp.tile(jnp.asarray(qe_bad), (64, 1))

    @jax.jit
    def solve(q):
        return refined_kernel.rod_shape_refined_kernel(q, tile=64,
                                                       interpret=True)

    q_hi, _, r_hi, _ = solve(qes)
    assert np.isnan(np.asarray(q_hi)).all()
    assert np.isnan(np.asarray(r_hi)).all()


def test_validity_sentinel_keeps_valid_rods_clean():
    """Mixed batch: only the out-of-domain rods are poisoned."""
    import jax

    qe_bad = np.zeros(9, np.float32)
    qe_bad[3] = 16.0
    qe_ok = np.asarray(rod.demo_qe())
    qes = jnp.asarray(np.stack([qe_ok] * 32 + [qe_bad] * 32), jnp.float32)

    @jax.jit
    def solve(q):
        return refined_kernel.rod_shape_refined_kernel(q, tile=64,
                                                       interpret=True)

    q_hi, q_lo, r_hi, r_lo = solve(qes)
    assert np.isnan(np.asarray(q_hi[32:])).all()
    good = np.asarray(r_hi[:32], np.float64) + np.asarray(r_lo[:32], np.float64)
    assert np.isfinite(good).all()
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
        oracle as oracle_mod,
    )

    _, r_ref = oracle_mod.integrate_position(np.asarray(qe_ok, np.float64))
    assert np.max(np.abs(good[0] - r_ref)) < 1e-7


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


def test_auto_picard_iters_accuracy_intact():
    """iters='auto' adapts the MXU pass count to the batch's strain bound
    without giving up the accuracy gate (ROADMAP r1 adaptive iteration)."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
        oracle as oracle_mod,
    )

    qe_dd = rod.split_strain(0.4 * oracle_mod.demo_qe())
    qdd = (jnp.tile(qe_dd[0], (64, 1)), jnp.tile(qe_dd[1], (64, 1)))
    k = rod.auto_picard_iters(qdd, rod.RodConfig())
    assert 6 <= k < 20            # small strain -> fewer passes
    sol = rod.rod_shape_refined_fused(qdd, refine_steps=1, iters="auto",
                                      tile=64, interpret=True)
    q_ref, r_ref = oracle_mod.integrate_position(
        np.asarray(0.4 * oracle_mod.demo_qe(), np.float64))
    rel = np.max(np.abs(sol.positions_f64()[0] - r_ref)) / np.max(np.abs(r_ref))
    assert rel < 1e-8, rel
    # traced input: no concrete bound -> None (callers keep defaults)
    import jax

    assert jax.eval_shape(
        lambda q: jnp.zeros(()), qdd[0]
    ) is not None  # smoke
    def traced(q):
        assert rod.auto_picard_iters(q, rod.RodConfig()) is None
        return q

    jax.jit(traced)(qdd[0])


def test_wide_refined_kernel_matches_dense_f64():
    """ROADMAP r3: the single refined kernel in the WIDE layout (n-1 > 32)
    — dd input at n=64 within the 1e-8 gate vs the f64 dense solve."""
    cfg = rod.RodConfig(n=64)
    rng = np.random.default_rng(7)
    qe64 = 0.8 * rng.standard_normal((5, 9))
    qe_hi, qe_lo = rod.split_strain(qe64)
    q_hi, q_lo, r_hi, r_lo = refined_kernel.rod_shape_refined_kernel(
        jnp.asarray(qe_hi), qes_lo=jnp.asarray(qe_lo), cfg=cfg, iters=24,
        corr_iters=24, interpret=True)
    q = np.asarray(q_hi, np.float64) + np.asarray(q_lo, np.float64)
    r = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    sol = rod.rod_shape(jnp.asarray(qe64), cfg=cfg, method="dense")
    q_ref = np.asarray(sol.quaternions)
    r_ref = np.asarray(sol.positions)
    assert np.abs(q - q_ref).max() / np.abs(q_ref).max() < 1e-8
    assert np.abs(r - r_ref).max() / np.abs(r_ref).max() < 1e-8


def test_wide_refined_kernel_ragged_batch_and_sentinel():
    """Wide layout: a non-multiple-of-32 batch unpacks correctly, and an
    out-of-domain rod (rho > 5) comes back NaN while its neighbours stay
    clean."""
    cfg = rod.RodConfig(n=48)
    rng = np.random.default_rng(8)
    qes = 0.5 * rng.standard_normal((37, 9))
    qes[11] = 0.0
    qes[11, 3] = 12.0          # rho = 6: beyond the validity domain
    q_hi, q_lo, r_hi, r_lo = refined_kernel.rod_shape_refined_kernel(
        jnp.asarray(qes, jnp.float32), cfg=cfg, iters=20, corr_iters=20,
        interpret=True)
    q = np.asarray(q_hi, np.float64) + np.asarray(q_lo, np.float64)
    r = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    assert np.isnan(q[11]).all() and np.isnan(r[11]).all()
    clean = [i for i in range(37) if i != 11]
    assert np.isfinite(q[clean]).all() and np.isfinite(r[clean]).all()
    # ragged correctness: rod 36 == its single-rod wide solve
    q1_hi, q1_lo, r1_hi, r1_lo = refined_kernel.rod_shape_refined_kernel(
        jnp.asarray(qes[36:37], jnp.float32), cfg=cfg, iters=20,
        corr_iters=20, interpret=True)
    np.testing.assert_allclose(
        q[36], np.asarray(q1_hi, np.float64)[0] + np.asarray(q1_lo,
                                                             np.float64)[0],
        atol=1e-12)
    np.testing.assert_allclose(
        r[36], np.asarray(r1_hi, np.float64)[0] + np.asarray(r1_lo,
                                                             np.float64)[0],
        atol=1e-12)


def test_multitile_wide_n256_refined_matches_dense_f64():
    """Multi-lane-tile wide layout: the N=256 high-order config (BASELINE
    config #5's grid) on the single refined kernel, ~1e-10 vs f64 dense."""
    cfg = rod.RodConfig(n=256)
    qe64 = 0.5 * np.random.default_rng(2).standard_normal((2, 9))
    qe_hi, qe_lo = rod.split_strain(qe64)
    q_hi, q_lo, r_hi, r_lo = refined_kernel.rod_shape_refined_kernel(
        jnp.asarray(qe_hi), qes_lo=jnp.asarray(qe_lo), cfg=cfg, iters=28,
        corr_iters=28, interpret=True)
    q = np.asarray(q_hi, np.float64) + np.asarray(q_lo, np.float64)
    r = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    sol = rod.rod_shape(jnp.asarray(qe64), cfg=cfg, method="dense")
    q_ref = np.asarray(sol.quaternions)
    r_ref = np.asarray(sol.positions)
    assert np.abs(q - q_ref).max() / np.abs(q_ref).max() < 1e-8
    assert np.abs(r - r_ref).max() / np.abs(r_ref).max() < 1e-8
