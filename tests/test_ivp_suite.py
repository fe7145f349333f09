"""Analytic IVP suite: closed-form gates + spectral convergence (§4d)."""

import numpy as np
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import ivp


def test_exponential_ivp_accuracy():
    numeric, exact = ivp.exponential_ivp(lam=-2.5, n=24)
    np.testing.assert_allclose(np.asarray(numeric), np.asarray(exact),
                               rtol=1e-12, atol=1e-13)


def test_exponential_ivp_growth():
    numeric, exact = ivp.exponential_ivp(lam=1.7, n=24)
    np.testing.assert_allclose(np.asarray(numeric), np.asarray(exact), rtol=1e-12)


def test_exponential_convergence_is_spectral():
    errs = ivp.convergence_sweep(ivp.exponential_ivp, ns=(6, 8, 12, 16), lam=-2.5)
    assert errs[8] < errs[6] * 0.2
    assert errs[12] < errs[8] * 0.05
    assert errs[16] < 1e-12


def test_oscillator_ivp_accuracy():
    numeric, exact = ivp.oscillator_ivp(omega=6.0, forcing_freq=2.0, n=32)
    np.testing.assert_allclose(np.asarray(numeric), np.asarray(exact),
                               rtol=1e-10, atol=1e-11)


def test_oscillator_convergence_sweep():
    errs = ivp.convergence_sweep(ivp.oscillator_ivp, ns=(8, 12, 16, 24, 32))
    assert errs[12] < errs[8]
    assert errs[24] < errs[12] * 1e-4
    assert errs[32] < 1e-10


def test_oscillator_resonance_rejected():
    with pytest.raises(ValueError, match="resonant"):
        ivp.oscillator_ivp(omega=2.0, forcing_freq=2.0)


def test_rotating_frame_matches_quaternion_exponential():
    numeric, exact = ivp.rotating_frame_ivp(k=(0.5, 2.0, -1.0), n=24)
    np.testing.assert_allclose(np.asarray(numeric), np.asarray(exact),
                               rtol=1e-11, atol=1e-12)


def test_rotating_frame_picard_matches_dense():
    num_p, exact = ivp.rotating_frame_ivp(k=(0.0, 3.0, 0.0), n=16, method="picard")
    np.testing.assert_allclose(np.asarray(num_p), np.asarray(exact),
                               rtol=1e-9, atol=1e-10)


def test_rotating_frame_zero_curvature():
    numeric, exact = ivp.rotating_frame_ivp(k=(0.0, 0.0, 0.0), n=8)
    np.testing.assert_allclose(np.asarray(numeric), np.asarray(exact), atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(numeric), np.broadcast_to([1.0, 0, 0, 0], numeric.shape),
        atol=1e-13,
    )


def test_rotating_frame_nonidentity_initial_quaternion():
    """Regression: A(K) q is RIGHT-multiplication by the body rate, so the
    closed form is q0 (x) exp(Xk/2) — a rotated q0 must still match."""
    import math

    q0 = (math.cos(0.4), math.sin(0.4), 0.0, 0.0)
    numeric, exact = ivp.rotating_frame_ivp(k=(0.0, 2.0, 0.0), q0=q0, n=20)
    np.testing.assert_allclose(np.asarray(numeric), np.asarray(exact),
                               rtol=1e-11, atol=1e-12)
