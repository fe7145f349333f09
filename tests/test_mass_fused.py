"""Fused-kernel mass-matrix tier: parity vs the XLA assembly and the RK4
trajectory lane."""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
    segments,
    segment_statics,
)
import pytest


def _cfg(n=16, ne=3, na=3):
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n, na=na, ne=ne))
    return dynamics.DynamicsConfig(statics=scfg, rho_a=1.0, rho_i=1e-2)


def test_mass_matrix_fused_matches_xla():
    """Same quadrature, kernel-grade tangents: relative Frobenius gap to
    the f64 XLA assembly at the kernels' f32/bf16 grade."""
    cfg = _cfg()
    rng = np.random.default_rng(3)
    qe = jnp.asarray(0.5 * rng.standard_normal((8, 9)))
    m_ref = np.asarray(dynamics.mass_matrix(qe, cfg, iters=20), np.float64)
    m_f = np.asarray(dynamics.mass_matrix_fused(qe, cfg, iters=20,
                                                interpret=True), np.float64)
    rel = (np.linalg.norm(m_f - m_ref, axis=(-2, -1))
           / np.linalg.norm(m_ref, axis=(-2, -1)))
    assert rel.max() < 2e-3, rel.max()
    # symmetric PSD survives the fused route
    assert np.abs(m_f - np.swapaxes(m_f, -1, -2)).max() < 1e-6
    assert np.linalg.eigvalsh(m_f).min() > 0.0


def test_mass_matrix_fused_reissner_na6():
    """6-DoF Reissner: the shear/extension direction tangents enter the
    translational block through the fused b-map jvp."""
    cfg = _cfg(na=6, ne=2)
    rng = np.random.default_rng(4)
    qe = jnp.asarray(np.concatenate(
        [0.4 * rng.standard_normal((4, 6)),
         0.1 * rng.standard_normal((4, 6))], axis=1))
    m_ref = np.asarray(dynamics.mass_matrix(qe, cfg, iters=20), np.float64)
    m_f = np.asarray(dynamics.mass_matrix_fused(qe, cfg, iters=20,
                                                interpret=True), np.float64)
    rel = np.linalg.norm(m_f - m_ref) / np.linalg.norm(m_ref)
    assert rel < 3e-3, rel


def test_simulate_fused_mass_tier_matches_default():
    """Short free-oscillation trajectories from both tiers agree at the
    f32-kernel grade (the mass gap enters through a well-conditioned
    solve; cond(M) is O(10) at these amplitudes)."""
    cfg = _cfg()
    qe0 = jnp.zeros((4, 9)).at[:, 4].set(0.25).at[1, 2].set(0.1)
    qd0 = jnp.zeros_like(qe0)
    ref = dynamics.simulate(qe0, qd0, cfg, dt=0.004, steps=12, iters=14,
                            record_energy=False)
    fus = dynamics.simulate(qe0, qd0, cfg, dt=0.004, steps=12, iters=14,
                            record_energy=False, mass_tier="fused")
    np.testing.assert_allclose(np.asarray(fus.qes), np.asarray(ref.qes),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(fus.qds), np.asarray(ref.qds),
                               atol=5e-3)


def test_mass_matrix_fused_rejects_segmented_config():
    seg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=8))
    cfg = dynamics.SegmentedDynamicsConfig(statics=seg, rho_a=1.0,
                                           rho_i=1e-2)
    with pytest.raises(ValueError, match="single-rod"):
        dynamics.mass_matrix_fused(jnp.zeros(cfg.nq), cfg)
