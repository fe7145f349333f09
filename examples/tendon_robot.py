"""Tendon-driven continuum section: forward statics, workspace, and IK.

The canonical continuum-robot configuration — three cables at 120 degrees
around the backbone — driven end to end through the framework: actuated
equilibria (`dynamics.solve_contact_statics` with the exact routed-length
gradient forces of models/tendon.py), a batched workspace sweep, actuated
small-oscillation spectra, and inverse actuation (`tendon.tendon_ik`,
Gauss-Newton on the tip map with implicit-function sensitivities).

Run: python examples/tendon_robot.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    rod,
    tendon,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    n = 12 if smoke else 16
    delta = 0.05
    offsets = [(0.0, delta * np.cos(a), delta * np.sin(a))
               for a in (0.0, 2 * np.pi / 3, 4 * np.pi / 3)]
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n, ne=3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg,
        tendons=tuple(tendon.Tendon(offset=o) for o in offsets))

    # --- forward statics: one actuated equilibrium ---
    # f32-realistic tolerances (the example runs on the default device
    # dtype; under x64 these converge in one Newton step).
    t_vec = jnp.asarray([2.0, 0.0, 0.5])
    sol = dynamics.solve_contact_statics(cfg, tension=t_vec, tol=1e-6)
    tip = rod.rod_shape(sol.qe, cfg=cfg.rod, method="picard",
                        iters=16).tip_position
    print(f"tensions {np.asarray(t_vec)} -> tip {np.asarray(tip).round(6)} "
          f"(converged={bool(sol.converged)})")

    # --- batched workspace sweep: a grid of tension pairs in ONE call ---
    m = 3 if smoke else 7
    t1, t2 = np.meshgrid(np.linspace(0.0, 3.0, m), np.linspace(0.0, 3.0, m),
                         indexing="ij")
    tensions = jnp.asarray(
        np.stack([t1.ravel(), t2.ravel(), np.zeros(m * m)], axis=-1))
    sols = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros((m * m, 9)), tension=tensions, tol=1e-6)
    tips = rod.rod_shape(sols.qe, cfg=cfg.rod, method="picard",
                         iters=16).tip_position
    reach = np.linalg.norm(np.asarray(tips)[:, 1:], axis=-1)
    print(f"workspace sweep ({m}x{m} tension grid): lateral reach "
          f"{reach.min():.4f}..{reach.max():.4f}, all converged="
          f"{bool(jnp.all(sols.converged))}")

    # --- actuated vibration spectrum about a loaded equilibrium ---
    omega2 = dynamics.linearized_spectrum(cfg, qe=sol.qe, tension=t_vec)
    print(f"first actuated frequencies {np.sqrt(omega2[:3]).round(4)}")

    # --- inverse actuation: put the tip at a target ---
    ik = tendon.tendon_ik(tip, cfg, gn_steps=6 if smoke else 14)
    print(f"IK to {np.asarray(tip).round(6)}: tensions "
          f"{np.asarray(ik.tension).round(4)}, tip error "
          f"{float(ik.tip_error):.2e}")


if __name__ == "__main__":
    main()
