"""Differentiable inverse kinematics: fit a load→strain decoder by SGD.

Gradients flow through the spectral collocation solve (implicit-function
custom JVP), so the rod model itself is the forward pass of a small learned
controller.  Run: python examples/inverse_kinematics.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    calibration,
    rod,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    cfg = rod.RodConfig(n=12)
    num_features, batch = 6, (32 if smoke else 512)
    epochs = 5 if smoke else 200
    rng = np.random.default_rng(0)

    # Ground truth: an unknown decoder generates tip targets.
    true_params = calibration.init_params(num_features, cfg, scale=0.4, seed=7)
    feats = jnp.asarray(rng.standard_normal((batch, num_features)), jnp.float32)
    targets = calibration.predict_tips(true_params, feats, cfg, iters=12)

    params = calibration.init_params(num_features, cfg, scale=0.0, seed=1)
    step, optimizer = calibration.make_train_step(cfg=cfg, iters=12)
    opt_state = optimizer.init(params)
    jit_step = jax.jit(step)

    for epoch in range(epochs):
        params, opt_state, loss = jit_step(params, opt_state, feats, targets)
        if epoch % 40 == 0 or epoch == epochs - 1:
            print(f"epoch {epoch:3d}: loss {float(loss):.3e}")

    pred = calibration.predict_tips(params, feats[:4], cfg, iters=12)
    print("\nfitted tips   :", np.round(np.asarray(pred), 4).tolist())
    print("target tips   :", np.round(np.asarray(targets[:4]), 4).tolist())


if __name__ == "__main__":
    main()
