"""Result persistence + checkpoint/resume."""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    calibration,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import io


def test_save_load_results_roundtrip(tmp_path):
    q = jnp.ones((4, 15, 4))
    r = np.arange(12.0).reshape(4, 3)
    p = io.save_results(tmp_path / "sweep.npz", quaternions=q, tips=r)
    back = io.load_results(p)
    np.testing.assert_array_equal(back["quaternions"], np.asarray(q))
    np.testing.assert_array_equal(back["tips"], r)


def test_checkpoint_restore_train_state(tmp_path):
    params = calibration.init_params(4, seed=3)
    io.save_train_state(tmp_path / "ckpt", params)
    blank = calibration.init_params(4, seed=99)
    restored = io.restore_train_state(tmp_path / "ckpt", blank)
    np.testing.assert_allclose(np.asarray(restored.w), np.asarray(params.w))
    np.testing.assert_allclose(np.asarray(restored.b), np.asarray(params.b))
