"""Differentiable rod calibration — gradient flows through the spectral solve.

The reference is forward-only; differentiability is a new TPU-native
capability (everything in ``ops/`` is built from jax primitives, so
``jax.grad`` works through the collocation solve).  This module packages the
canonical *training-step* workload used by the multi-chip dry-run and the
BVP machinery:

    learn a linear map  W : load features -> strain modes  such that the
    rod's spectrally-integrated tip position matches observed targets,

i.e. inverse kinematics fitted by SGD, with the forward model being the full
quaternion+position spectral solve.  Under a ``rods``-sharded batch the
gradient of the mean loss contracts over rods, which XLA lowers to a
``psum`` over the ICI mesh — the framework's data-parallel training path.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from . import rod

__all__ = [
    "CalibrationParams",
    "init_params",
    "predict_tips",
    "calibration_loss",
    "make_train_step",
]


class CalibrationParams(NamedTuple):
    """Linear strain decoder: ``qe_i = features_i @ w + b``."""

    w: jnp.ndarray  # (num_features, na*ne)
    b: jnp.ndarray  # (na*ne,)


def init_params(num_features: int, cfg: rod.RodConfig = rod.RodConfig(),
                scale: float = 0.1, seed: int = 0) -> CalibrationParams:
    key = jax.random.PRNGKey(seed)
    nq = cfg.na * cfg.ne
    w = scale * jax.random.normal(key, (num_features, nq), jnp.float32)
    return CalibrationParams(w=w, b=jnp.zeros((nq,), jnp.float32))


def predict_tips(params: CalibrationParams, features,
                 cfg: rod.RodConfig = rod.RodConfig(), iters: int = 24):
    """Forward model: features -> strain -> spectral solve -> tip position."""
    qe = features @ params.w + params.b
    sol = rod.rod_shape(qe, cfg=cfg, method="picard", iters=iters)
    return sol.tip_position


def calibration_loss(params: CalibrationParams, features, targets,
                     cfg: rod.RodConfig = rod.RodConfig(), iters: int = 24):
    tips = predict_tips(params, features, cfg, iters)
    return jnp.mean(jnp.sum((tips - targets) ** 2, axis=-1))


def make_train_step(optimizer: optax.GradientTransformation | None = None,
                    cfg: rod.RodConfig = rod.RodConfig(), iters: int = 24):
    """One SGD/Adam step through the spectral solve (jit-ready).

    Returns ``step(params, opt_state, features, targets) ->
    (params, opt_state, loss)``.  With ``features``/``targets`` sharded over
    the ``rods`` mesh axis and params replicated, the gradient reduction is
    an automatic cross-chip ``psum``.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-2)

    def step(params, opt_state, features, targets):
        loss, grads = jax.value_and_grad(
            lambda p: calibration_loss(p, features, targets, cfg, iters)
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return step, optimizer
