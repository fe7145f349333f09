"""Golden tests: framework vs algorithm-exact f64 oracle vs SURVEY values.

SURVEY.md §4 measured ground truth for the reference demo (N=16, demo qe):
tip quaternion ~ (0.799770, 0, 0.600307, 0); tip position
~ (0.562673, 0, -0.745914); max | |q|-1 | ~ 1.8e-12.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import collocation as coll
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import oracle

CFG = rod.RodConfig(n=16)


@pytest.fixture(scope="module")
def oracle_solution():
    return oracle.integrate_position(oracle.demo_qe())


def test_oracle_matches_survey_golden_values(oracle_solution):
    q_stack, r_stack = oracle_solution
    npts = 15
    tip_q = np.array([q_stack[0], q_stack[npts], q_stack[2 * npts], q_stack[3 * npts]])
    np.testing.assert_allclose(tip_q, [0.799770, 0.0, 0.600307, 0.0], atol=1e-6)
    np.testing.assert_allclose(r_stack[0], [0.562673, 0.0, -0.745914], atol=1e-6)


def test_oracle_quaternion_norm_preservation(oracle_solution):
    q_stack, _ = oracle_solution
    q = q_stack.reshape(4, 15).T
    norms = np.linalg.norm(q, axis=1)
    assert np.max(np.abs(norms - 1.0)) < 1e-11


def test_dense_f64_matches_oracle(oracle_solution):
    """Our dense path (f64 on CPU) vs the oracle: same discrete system."""
    q_stack, r_stack = oracle_solution
    sol = rod.rod_shape(jnp.asarray(oracle.demo_qe()), cfg=CFG, method="dense")
    np.testing.assert_allclose(np.asarray(sol.q_stack), q_stack, rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.positions), r_stack, rtol=0, atol=1e-12)


def test_picard_f64_matches_oracle(oracle_solution):
    q_stack, r_stack = oracle_solution
    sol = rod.rod_shape(jnp.asarray(oracle.demo_qe()), cfg=CFG, method="picard")
    np.testing.assert_allclose(np.asarray(sol.q_stack), q_stack, atol=1e-12)
    np.testing.assert_allclose(np.asarray(sol.positions), r_stack, atol=1e-12)


def test_refined_f32_hits_accuracy_gate(oracle_solution):
    """The TPU path (f32 + double-word refinement) must be <=1e-8 rel Linf
    vs the f64 oracle — the BASELINE.json accuracy gate, checked here on the
    CPU backend with identical f32 semantics.  The strain enters as a
    double-word pair so the *input* survives the f32 boundary too."""
    q_stack, r_stack = oracle_solution
    qe_dd = rod.split_strain(oracle.demo_qe())
    sol = rod.rod_shape(qe_dd, cfg=CFG, method="refined")
    assert sol.quaternions.dtype == jnp.float32
    q64 = sol.quaternions_f64()
    q_flat = np.swapaxes(q64, -1, -2).reshape(-1)
    q_err = np.max(np.abs(q_flat - q_stack))
    r_err = np.max(np.abs(sol.positions_f64() - r_stack))
    scale_q = np.max(np.abs(q_stack))
    scale_r = np.max(np.abs(r_stack))
    assert q_err / scale_q < 1e-8, f"quaternion rel Linf {q_err/scale_q:.3e}"
    assert r_err / scale_r < 1e-8, f"position rel Linf {r_err/scale_r:.3e}"


def test_refined_quaternion_norms(oracle_solution):
    qe32 = jnp.asarray(oracle.demo_qe(), jnp.float32)
    sol = rod.rod_shape(qe32, cfg=CFG, method="refined")
    norms = np.linalg.norm(np.asarray(sol.quaternions, np.float64), axis=-1)
    assert np.max(np.abs(norms - 1.0)) < 1e-7


def test_collocation_matrix_matches_oracle_a_nn():
    """Dense assembly == the reference's updateA scatter (component-major)."""
    qe = oracle.demo_qe()
    dn = oracle.diff_matrix(16)
    d_nn = np.kron(np.eye(4), dn[:15, :15])
    a_ref = oracle.update_a(qe, d_nn)
    k = rod.curvature_at_points(CFG, jnp.asarray(qe))
    m = 0.5 * np.asarray(
        jnp.stack([jnp.asarray(oracle.quat_a_matrix(np.asarray(ki))) for ki in k])
    )
    a_ours = np.asarray(coll.collocation_matrix(CFG.grid, jnp.asarray(m)))
    np.testing.assert_allclose(a_ours, a_ref, rtol=0, atol=1e-13)


def test_condition_number_matches_survey():
    qe = oracle.demo_qe()
    dn = oracle.diff_matrix(16)
    a_ref = oracle.update_a(qe, np.kron(np.eye(4), dn[:15, :15]))
    assert np.linalg.cond(a_ref) == pytest.approx(186, rel=0.2)


def test_vmap_matches_loop():
    """Batched-vs-single consistency (SURVEY.md §4e)."""
    rng = np.random.default_rng(7)
    qes = jnp.asarray(rng.standard_normal((5, 9)) * 1.5)
    batched = rod.rod_shape(qes, cfg=CFG, method="dense")
    for b in range(5):
        single = rod.rod_shape(qes[b], cfg=CFG, method="dense")
        np.testing.assert_allclose(
            np.asarray(batched.quaternions[b]), np.asarray(single.quaternions),
            atol=1e-12,
        )
        np.testing.assert_allclose(
            np.asarray(batched.positions[b]), np.asarray(single.positions),
            atol=1e-12,
        )


def test_jit_picard_batched():
    rng = np.random.default_rng(11)
    qes = jnp.asarray(rng.standard_normal((8, 9)), jnp.float32)
    fn = jax.jit(lambda q: rod.rod_shape(q, cfg=CFG, method="picard").positions)
    out = fn(qes)
    assert out.shape == (8, 15, 3)
    ref = rod.rod_shape(qes, cfg=CFG, method="picard").positions
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6)


def test_random_strains_refined_vs_oracle():
    """Accuracy gate on random strain fields, not just the demo."""
    rng = np.random.default_rng(23)
    for _ in range(3):
        qe = rng.standard_normal(9) * 2.0
        q_ref, r_ref = oracle.integrate_position(qe)
        sol = rod.rod_shape(rod.split_strain(qe), cfg=CFG, method="refined")
        q_flat = np.swapaxes(sol.quaternions_f64(), -1, -2).reshape(-1)
        q_err = np.max(np.abs(q_flat - q_ref))
        r_err = np.max(np.abs(sol.positions_f64() - r_ref))
        assert q_err / np.max(np.abs(q_ref)) < 1e-8
        assert r_err / np.max(np.abs(r_ref)) < 1e-8


def test_spectral_convergence_sweep():
    """Exponential tip-error decay vs an N=64 self-reference (SURVEY.md §4d)."""
    qe = oracle.demo_qe()
    _, r64 = oracle.integrate_position(qe, n=64)
    tip64 = r64[0]
    errors = {}
    for n in (8, 12, 16, 24):
        sol = rod.rod_shape(
            jnp.asarray(qe), cfg=rod.RodConfig(n=n), method="dense"
        )
        errors[n] = float(np.max(np.abs(np.asarray(sol.tip_position) - tip64)))
    assert errors[8] < 1e-3
    assert errors[12] < 1e-6
    assert errors[16] < 1e-9
    assert errors[24] < 1e-12
    assert errors[12] < errors[8] * 1e-1
    assert errors[16] < errors[12] * 1e-1


def test_chebyshev_basis_variant_end_to_end():
    """The thesis' Chebyshev-T modal basis through the full solve: must
    agree with the Legendre solve when the strain FIELD is identical
    (project the demo Legendre field onto T_j modes exactly — both bases
    span degree-2 polynomials)."""
    import numpy.polynomial as npoly

    qe_leg = oracle.demo_qe()
    # convert each component's Legendre coeffs to Chebyshev coeffs
    qe_cheb = np.zeros(9)
    for a in range(3):
        leg = npoly.legendre.Legendre(qe_leg[a * 3:(a + 1) * 3])
        cheb = leg.convert(kind=npoly.chebyshev.Chebyshev)
        qe_cheb[a * 3:a * 3 + len(cheb.coef)] = cheb.coef
    cfg_cheb = rod.RodConfig(n=16, basis="chebyshev")
    sol_c = rod.rod_shape(jnp.asarray(qe_cheb), cfg=cfg_cheb, method="dense")
    sol_l = rod.rod_shape(jnp.asarray(qe_leg), cfg=CFG, method="dense")
    np.testing.assert_allclose(np.asarray(sol_c.positions),
                               np.asarray(sol_l.positions), atol=1e-12)


def test_multidim_batch_axes():
    """(..., na*ne) leading axes of any rank through picard and dense."""
    rng = np.random.default_rng(31)
    qes = jnp.asarray(rng.standard_normal((2, 3, 9)), jnp.float32)
    sol = rod.rod_shape(qes, cfg=CFG, method="picard")
    assert sol.positions.shape == (2, 3, 15, 3)
    flat = rod.rod_shape(qes.reshape(6, 9), cfg=CFG, method="picard")
    np.testing.assert_allclose(
        np.asarray(sol.positions.reshape(6, 15, 3)),
        np.asarray(flat.positions), atol=1e-6,
    )
