"""Multi-segment rods: junction continuity, global-field equivalence, N=256."""

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    ivp,
    rod,
    segments,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    oracle,
)


def test_two_segments_match_single_rod_constant_curvature():
    """Constant curvature: 2x half-length segments == 1 full rod (both equal
    the quaternion-exponential closed form at the junctions/tip)."""
    k = np.array([0.0, 2.0, 0.0])
    qe_const = np.zeros(9)
    qe_const[3] = 2.0  # kappa_y, mode P0
    cfg = segments.uniform_segments(2, n=16)
    seg_qe = jnp.asarray(np.broadcast_to(qe_const, (2, 9)))
    sol = segments.segmented_rod_shape(seg_qe, cfg, method="dense")
    # closed form at X = 0.5 and 1.0
    _, exact_mid = ivp.rotating_frame_ivp(k=tuple(k), n=16, length=1.0)
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import lie

    for X, jq in ((0.5, sol.junction_quaternions[0]),
                  (1.0, sol.junction_quaternions[1])):
        theta = np.linalg.norm(k) * X
        u = k / np.linalg.norm(k)
        exact = np.array([np.cos(theta / 2), *(u * np.sin(theta / 2))])
        np.testing.assert_allclose(np.asarray(jq), exact, atol=1e-10)


def test_segmented_matches_single_rod_demo_field():
    """The demo Legendre strain field re-projected onto 4 segments must give
    the same tip state as the single-rod solve (spectral accuracy)."""
    qe = oracle.demo_qe()
    cfg = segments.uniform_segments(4, n=16)
    seg_qe = segments.project_global_strain(qe, cfg)
    assert seg_qe.shape == (4, 9)
    sol = segments.segmented_rod_shape(jnp.asarray(seg_qe), cfg, method="dense")
    single = rod.rod_shape(jnp.asarray(qe), method="dense")
    np.testing.assert_allclose(np.asarray(sol.tip_quaternion),
                               np.asarray(single.tip_quaternion), atol=1e-9)
    np.testing.assert_allclose(np.asarray(sol.tip_position),
                               np.asarray(single.tip_position), atol=1e-9)


def test_junction_continuity_is_exact():
    rng = np.random.default_rng(0)
    cfg = segments.uniform_segments(3, n=12)
    seg_qe = jnp.asarray(rng.standard_normal((3, 9)), jnp.float64)
    sol = segments.segmented_rod_shape(seg_qe, cfg, method="dense")
    # Segment s+1's implied base state equals segment s's tip by chaining;
    # verify the recorded junction trace is consistent with segment tips.
    for s in range(3):
        np.testing.assert_array_equal(
            np.asarray(sol.junction_quaternions[s]),
            np.asarray(sol.quaternions[s][0]),
        )


def test_segmented_batched_vmap():
    rng = np.random.default_rng(1)
    cfg = segments.uniform_segments(2, n=8)
    seg_qe = jnp.asarray(rng.standard_normal((5, 2, 9)), jnp.float32)
    sol = segments.segmented_rod_shape(seg_qe, cfg, method="picard")
    assert sol.junction_positions.shape == (5, 2, 3)
    single = segments.segmented_rod_shape(seg_qe[2], cfg, method="picard")
    np.testing.assert_allclose(np.asarray(sol.tip_position[2]),
                               np.asarray(single.tip_position), atol=1e-5)


def test_high_order_n256():
    """N=256 high-order solve: matches the N=16 solution of the demo field
    (both spectrally converged) and the f64 oracle at N=256."""
    qe = oracle.demo_qe()
    sol = segments.high_order_shape(jnp.asarray(qe), n=256, method="dense")
    single16 = rod.rod_shape(jnp.asarray(qe), method="dense")
    np.testing.assert_allclose(np.asarray(sol.tip_position),
                               np.asarray(single16.tip_position), atol=1e-9)
    q_ref, r_ref = oracle.integrate_position(qe, n=256)
    np.testing.assert_allclose(np.asarray(sol.positions), r_ref, atol=1e-8)


def test_high_order_picard_converges():
    qe = oracle.demo_qe()
    dense = segments.high_order_shape(jnp.asarray(qe), n=64, method="dense")
    pic = segments.high_order_shape(jnp.asarray(qe), n=64, method="picard",
                                    iters=48)
    np.testing.assert_allclose(np.asarray(pic.positions),
                               np.asarray(dense.positions), atol=1e-9)


def _oracle_chain(seg_qe64, cfg):
    """f64 chained oracle solve: per-segment reference semantics with the
    junction state threaded through (ground truth for the dd chains)."""
    q = np.array([1.0, 0.0, 0.0, 0.0])
    r = np.zeros(3)
    tips_q, tips_r = [], []
    for s, seg in enumerate(cfg.segments):
        q_stack, r_stack = oracle.integrate_position(
            seg_qe64[s], q_init=q, r_init=r, n=seg.n, length=seg.length
        )
        npts = seg.n - 1
        q = np.array([q_stack[0], q_stack[npts], q_stack[2 * npts],
                      q_stack[3 * npts]])
        r = r_stack[0]
        tips_q.append(q)
        tips_r.append(r)
    return np.stack(tips_q), np.stack(tips_r)


def test_bc_kernel_matches_oracle_general_inits():
    """The refined BC kernel at random junction states: ~1e-9 absolute vs
    the f64 oracle with the same inits."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        refined_kernel as rfk,
    )

    rng = np.random.default_rng(21)
    qes64 = rng.standard_normal((8, 9))
    q064 = rng.standard_normal((8, 4))
    q064 /= np.linalg.norm(q064, axis=-1, keepdims=True)
    r064 = rng.standard_normal((8, 3))

    qe_hi, qe_lo = rod.split_strain(qes64)
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        doubledouble as dd,
    )

    q0_hi, q0_lo = dd.split_f64(q064)
    r0_hi, r0_lo = dd.split_f64(r064)
    q_hi, q_lo, r_hi, r_lo = rfk.rod_shape_refined_kernel_bc(
        jnp.asarray(qe_hi), jnp.asarray(q0_hi), jnp.asarray(r0_hi),
        qes_lo=jnp.asarray(qe_lo), q_init_lo=jnp.asarray(q0_lo),
        r_init_lo=jnp.asarray(r0_lo), tile=64, interpret=True,
    )
    qk = np.asarray(q_hi, np.float64) + np.asarray(q_lo, np.float64)
    rk = np.asarray(r_hi, np.float64) + np.asarray(r_lo, np.float64)
    for i in range(8):
        q_ref, r_ref = oracle.integrate_position(qes64[i], q_init=q064[i],
                                                 r_init=r064[i])
        q_flat = np.swapaxes(qk[i], -1, -2).reshape(-1)
        assert np.max(np.abs(q_flat - q_ref)) < 1e-9
        assert np.max(np.abs(rk[i] - r_ref)) < 1e-9


def test_segmented_refined_fused_hits_gate_vs_oracle_chain():
    """VERDICT r1 done-criterion: multi-segment refined-fused within 1e-8
    of the f64 oracle chained solve (junctions never drop to f32)."""
    rng = np.random.default_rng(13)
    cfg = segments.uniform_segments(3, n=16, total_length=3.0)
    seg_qe64 = rng.standard_normal((3, 9))
    tips_q_ref, tips_r_ref = _oracle_chain(seg_qe64, cfg)

    qe_dd = rod.split_strain(seg_qe64[None])   # lead batch axis of 1
    sol = segments.segmented_rod_shape(
        (jnp.asarray(qe_dd[0]), jnp.asarray(qe_dd[1])), cfg,
        method="refined_fused", tile=64, interpret=True,
    )
    scale = np.max(np.abs(tips_r_ref))
    assert np.max(np.abs(sol.tip_position_f64()[0] - tips_r_ref[-1])) / scale < 1e-8
    assert np.max(np.abs(sol.tip_quaternion_f64()[0] - tips_q_ref[-1])) < 1e-8
    # every junction, not just the tip
    (jq_hi, jq_lo), (jr_hi, jr_lo) = sol.junction_dd
    jr = np.asarray(jr_hi, np.float64)[0] + np.asarray(jr_lo, np.float64)[0]
    np.testing.assert_allclose(jr, tips_r_ref, atol=1e-8 * scale)


def test_segmented_refined_fused_f32_strain_input():
    """Plain f32 strain input (no dd pair) also rides the chain."""
    rng = np.random.default_rng(14)
    cfg = segments.uniform_segments(2, n=12, total_length=1.0)
    seg_qe = rng.standard_normal((2, 9)).astype(np.float32)
    sol = segments.segmented_rod_shape(jnp.asarray(seg_qe)[None], cfg,
                                       method="refined_fused", tile=64,
                                       interpret=True)
    tips_q_ref, tips_r_ref = _oracle_chain(seg_qe.astype(np.float64), cfg)
    np.testing.assert_allclose(sol.tip_position_f64()[0], tips_r_ref[-1],
                               atol=1e-8)


def test_segmented_fused_matches_picard():
    """method='fused' chains segments through the general-BC Pallas kernel."""
    rng = np.random.default_rng(9)
    cfg = segments.uniform_segments(3, n=16)
    seg_qe = jnp.asarray(rng.standard_normal((256, 3, 9)), jnp.float32)
    fused = segments.segmented_rod_shape(seg_qe, cfg, method="fused",
                                         iters=20, tile=256, interpret=True)
    pic = segments.segmented_rod_shape(seg_qe, cfg, method="picard", iters=20)
    np.testing.assert_allclose(np.asarray(fused.tip_position),
                               np.asarray(pic.tip_position), atol=2e-4)
    np.testing.assert_allclose(np.asarray(fused.junction_quaternions),
                               np.asarray(pic.junction_quaternions), atol=2e-4)


def test_segmented_refined_fused_wide_grids():
    """Accuracy chains with WIDE segment grids (n-1 > 32): the wide-BC
    variant of the single refined kernel carries dd junction states, so a
    2x n=48 chain stays ~1e-9-grade vs the f64 chained dense solve."""
    cfg = segments.uniform_segments(2, n=48)
    rng = np.random.default_rng(5)
    qe64 = 0.5 * rng.standard_normal((3, 2, 9))
    qe_hi, qe_lo = rod.split_strain(qe64)
    sol = segments.segmented_rod_shape(
        (jnp.asarray(qe_hi), jnp.asarray(qe_lo)), cfg,
        method="refined_fused", iters=22, corr_iters=22, interpret=True)
    ref = segments.segmented_rod_shape(jnp.asarray(qe64), cfg,
                                       method="dense")
    tip_ref = np.asarray(ref.tip_position)
    rel = np.abs(sol.tip_position_f64() - tip_ref).max() / \
        np.abs(tip_ref).max()
    assert rel < 1e-8
    assert np.abs(sol.tip_quaternion_f64()
                  - np.asarray(ref.tip_quaternion)).max() < 1e-8
