"""Exact int8-plane (Ozaki) double-word matmul building block."""

import numpy as np
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
    doubledouble as dd,
    ozaki,
)


def _dd_split(a64):
    hi = np.asarray(a64, np.float32)
    lo = np.asarray(a64 - hi.astype(np.float64), np.float32)
    return jnp.asarray(hi), jnp.asarray(lo)


def test_const_plane_reconstruction_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((64, 64)) * 85.0  # Dn-like magnitudes
    planes, e = ozaki.plane_decompose_const(a)
    recon = sum(
        2.0 ** e * planes[k].astype(np.float64) / 128.0 ** (k + 1)
        for k in range(planes.shape[0])
    )
    assert np.max(np.abs(recon - a)) < 2.0 ** (e - 53)
    assert np.max(np.abs(planes)) <= 64


def test_plane_decompose_covers_small_values():
    """Small-magnitude f32 values keep their mantissa inside the window."""
    x = jnp.asarray([[1e-4, -3e-3, 0.9, -0.2]], jnp.float32)
    planes = ozaki.plane_decompose(x, 1, 8)
    recon = sum(
        2.0 ** 1 * np.asarray(p, np.float64) / 128.0 ** (m + 1)
        for m, p in enumerate(planes)
    )
    np.testing.assert_allclose(recon, np.asarray(x, np.float64),
                               atol=2.0 ** (1 - 55))


def test_matmul_dd_reaches_double_word_accuracy():
    rng = np.random.default_rng(1)
    a64 = np.kron(np.eye(8), rng.standard_normal((16, 16)) * 40)
    planes, e = ozaki.plane_decompose_const(a64)
    x64 = rng.standard_normal((128, 96)) * 1.3
    x_hi, x_lo = _dd_split(x64)
    y_hi, y_lo = ozaki.matmul_dd(planes, e, x_hi, x_lo, x_exp=3,
                                 pair_budget=7)
    y = np.asarray(y_hi, np.float64) + np.asarray(y_lo, np.float64)
    ref = a64 @ x64
    scale = np.max(np.abs(ref))
    assert np.max(np.abs(y - ref)) / scale < 1e-13


def test_matmul_dd_single_word_input():
    rng = np.random.default_rng(2)
    a64 = rng.standard_normal((32, 32)) * 10
    planes, e = ozaki.plane_decompose_const(a64)
    x = jnp.asarray(rng.standard_normal((32, 8)), jnp.float32)
    y_hi, y_lo = ozaki.matmul_dd(planes, e, x, None, x_exp=3, pair_budget=7)
    y = np.asarray(y_hi, np.float64) + np.asarray(y_lo, np.float64)
    ref = a64 @ np.asarray(x, np.float64)
    assert np.max(np.abs(y - ref)) / np.max(np.abs(ref)) < 1e-12


def test_matmul_dd_beats_f32_matmul():
    """The point of the exercise: accuracy far beyond an f32 HIGHEST matmul."""
    rng = np.random.default_rng(3)
    a64 = rng.standard_normal((64, 64)) * 40
    planes, e = ozaki.plane_decompose_const(a64)
    x64 = rng.standard_normal((64, 32))
    x_hi, x_lo = _dd_split(x64)
    ref = a64 @ x64
    y_hi, y_lo = ozaki.matmul_dd(planes, e, x_hi, x_lo, x_exp=3, pair_budget=7)
    ozaki_err = np.max(np.abs(
        np.asarray(y_hi, np.float64) + np.asarray(y_lo, np.float64) - ref
    ))
    f32 = jnp.dot(jnp.asarray(a64, jnp.float32), x_hi, precision="highest")
    f32_err = np.max(np.abs(np.asarray(f32, np.float64) - ref))
    assert ozaki_err < f32_err * 1e-4
