"""Cosserat statics with load continuation (BASELINE configs #3/#5).

Sweeps a tip-force schedule into the strongly nonlinear elastica regime,
printing converged strain modes and tip positions, then saves the sweep.
Run: python examples/statics_sweep.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax.numpy as jnp
import numpy as np

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    rod,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import io


def main():
    import jax

    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16 if smoke else 32))
    alphas = [0.25, 0.5] if smoke \
        else [0.25, 0.5, 1.0, 1.5, 2.0, 3.0]   # F L^2 / EI
    loads = jnp.asarray([[0.0, 0.0, a] for a in alphas], jnp.float32)
    # tol chosen for the f32 device path (f64 oracle-grade statics runs on
    # the CPU backend, see tests); jit once, reuse across the schedule.
    sols = cosserat.load_continuation(loads, cfg=cfg, tol=3e-5)
    tip_fn = jax.jit(
        lambda qe: rod.rod_shape(qe, cfg=cfg.rod, method="picard").tip_position
    )
    tips = []
    for a, s in zip(alphas, sols):
        tips.append(np.asarray(tip_fn(s.qe)))
        print(f"alpha={a:4.2f}: converged={bool(s.converged)} "
              f"iters={int(s.iterations)} tip={np.round(tips[-1], 4)}")
    io.save_results("/tmp/statics_sweep.npz",
                    alphas=np.asarray(alphas), tips=np.stack(tips),
                    qe=np.stack([np.asarray(s.qe) for s in sols]))
    print("saved -> /tmp/statics_sweep.npz")


if __name__ == "__main__":
    main()
