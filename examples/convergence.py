"""Spectral convergence sweep (BASELINE config #2).

Prints the exponential decay of the tip error with grid order for the demo
strain field and two analytic IVPs.  Run: python examples/convergence.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Numerics demo: run in f64 on the CPU backend (the TPU perf paths are
# exercised by examples/throughput.py and bench.py).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import ivp
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
    diagnostics,
    oracle,
)


def main():
    import jax.numpy as jnp

    print("rod demo field, tip error vs N=64 reference:")
    for n, err in diagnostics.convergence_report(
        jnp.asarray(oracle.demo_qe())
    ).items():
        print(f"  N={n:3d}: {err:.3e}")

    print("y' = -2.5 y:")
    for n, err in ivp.convergence_sweep(ivp.exponential_ivp, lam=-2.5).items():
        print(f"  N={n:3d}: {err:.3e}")

    print("forced oscillator (omega=6, nu=2):")
    for n, err in ivp.convergence_sweep(ivp.oscillator_ivp).items():
        print(f"  N={n:3d}: {err:.3e}")


if __name__ == "__main__":
    main()
