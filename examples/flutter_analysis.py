"""Flutter and divergence of the compressed cantilever, end to end.

The classical stability trilogy on one rod (the circulatory-systems
counterpart of examples/bifurcation_diagram.py), using the dynamics
spectrum tools:

1. dead axial load -> DIVERGENCE: omega_1^2 crosses zero at Euler's
   P_cr = pi^2/4 (clamped-free, EI = L = 1);
2. follower axial load -> FLUTTER: the first two omega^2 branches
   approach, coalesce, and split into a complex pair at Beck's
   P_f ~ 20.05 — no real part ever crosses zero (no divergence);
3. Kelvin-Voigt material damping -> the ZIEGLER DESTABILIZATION
   PARADOX: for vanishing internal damping the critical load DROPS to
   the classical limit ~10.94, found by the same pole-sign bisection.

Run: python examples/flutter_analysis.py
(forces the CPU backend: host-driven f64 eigenanalysis, not a
device-throughput workload.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    n, ne = (10, 3) if smoke else (14, 5)
    tol = 0.2 if smoke else 0.02
    rc = rod.RodConfig(n=n, ne=ne)

    # 1. Euler divergence (dead load).
    cfg_dead = dynamics.DynamicsConfig(
        statics=cosserat.StaticsConfig(rod=rc), rho_a=1.0, rho_i=1e-4)
    p_euler = dynamics.critical_load(cfg_dead, load_hi=5.0, bisect_tol=tol)
    print(f"Euler divergence load : {p_euler:8.4f}   "
          f"(classical pi^2/4 = {np.pi ** 2 / 4:.4f})")

    # 2. Beck flutter (follower load): watch the coalescence, then bisect.
    scfg_f = cosserat.StaticsConfig(rod=rc, follower=True)
    cfg_beck = dynamics.DynamicsConfig(statics=scfg_f, rho_a=1.0,
                                       rho_i=1e-4)
    loads = [0.0, 8.0, 16.0] if smoke else [0.0, 5.0, 10.0, 15.0, 19.0]
    print("follower-load frequency coalescence (omega_1^2, omega_2^2):")
    for p in loads:
        om2 = np.sort(dynamics.linearized_spectrum(
            cfg_beck, tip_force=(-p, 0.0, 0.0), symmetric=False).real)
        print(f"  P = {p:5.1f}:  {om2[0]:9.3f}  {om2[2]:9.3f}")
    p_beck = dynamics.critical_load(cfg_beck, load_lo=15.0, load_hi=25.0,
                                    bisect_tol=tol)
    print(f"Beck flutter load     : {p_beck:8.4f}   (classical ~20.05)")

    # 3. Ziegler paradox: internal (Kelvin-Voigt) damping destabilizes.
    kvs = [1e-3] if smoke else [1e-2, 1e-3]
    for kv in kvs:
        cfg_z = dynamics.DynamicsConfig(statics=scfg_f, rho_a=1.0,
                                        rho_i=1e-4, kv_damping=kv)
        p_z = dynamics.critical_load(cfg_z, load_lo=5.0, load_hi=15.0,
                                     bisect_tol=tol)
        print(f"kv = {kv:7.0e} critical : {p_z:8.4f}   "
              f"(vanishing-damping limit ~10.94)")
    print("the paradox: an infinitesimal material damping nearly HALVES "
          "the flutter load.")


if __name__ == "__main__":
    main()
