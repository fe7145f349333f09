"""Throughput tour of every solve path on the attached accelerator.

Run: python examples/throughput.py  (first compile ~1-2 min on TPU)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    rod,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
    rod_kernel,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    profiling,
)


def main():
    # SPECTRAL_SMOKE=1: tiny-shape CI pass on the CPU backend (Pallas in
    # interpret mode) — catches example rot without hardware.
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    print("device:", jax.devices()[0])
    b = 256 if smoke else 131072
    tile = 128 if smoke else rod_kernel.DEFAULT_TILE
    qes = jnp.asarray(np.random.default_rng(0).standard_normal((b, 9)),
                      jnp.float32)

    paths = {
        "xla picard f32": jax.jit(
            lambda q: jnp.sum(rod.rod_shape(q, method="picard").positions)
        ),
        "pallas fused f32": jax.jit(
            lambda q: sum(jnp.sum(o) for o in rod_kernel.rod_shape_fused(
                q, tile=tile, interpret=smoke))
        ),
        "refined_fused (<=1e-8 gate)": jax.jit(
            lambda q: jnp.sum(
                rod.rod_shape_refined_fused(q, refine_steps=1, tile=tile,
                                            interpret=smoke).positions
            )
        ),
    }
    for name, fn in paths.items():
        dt, rate = profiling.throughput(fn, qes, items=b,
                                        reps=2 if smoke else 20)
        print(f"{name:28s}: {dt*1e3:7.2f} ms  {rate/1e6:7.2f} M solves/s")

    # Nonlinear statics BVPs (Newton + AD Jacobians), batched via vmap.
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    loads = jnp.asarray(
        np.random.default_rng(1).uniform(-0.4, 0.4,
                                         (64 if smoke else 4096, 3)),
        jnp.float32
    )
    f = jax.jit(lambda fl: jnp.sum(jax.vmap(
        lambda x: cosserat.solve_statics(x, cfg=cfg, tol=1e-5, max_iter=12,
                                         iters=16).qe
    )(fl)))
    dt, rate = profiling.throughput(f, loads, reps=2 if smoke else 5,
                                    items=loads.shape[0])  # ~45k/s with IFT Jacobians
    print(f"{'batched statics BVP':28s}: {dt*1e3:7.2f} ms  {rate:7.0f} BVP solves/s")


if __name__ == "__main__":
    main()
