"""Contact dynamics walkthrough: obstacles, friction, and a rod-rod scene.

Three short stories on one stage (none of which the static reference —
/root/reference/main.cpp, single rod, no environment — could tell):

1. a damped rod drapes over a SPHERE under gravity and rests on it,
2. the same drop with Coulomb FRICTION bleeds a lateral kick's energy,
3. two overlapping cantilevers push each other apart through ROD-ROD
   contact (exact-gradient pairwise penalty).

Run: python examples/contact_scene.py      (SPECTRAL_SMOKE=1 for tiny)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import jax
import jax.numpy as jnp
import numpy as np

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics as dyn,
    rod,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import io


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=8 if smoke else 12,
                                                    ne=3))
    steps = 30 if smoke else 240
    nq = scfg.rod.na * scfg.rod.ne
    qe0 = jnp.zeros(nq)
    qd0 = jnp.zeros(nq)

    def grid(qe):
        return np.asarray(rod.rod_shape(qe, cfg=scfg.rod, method="picard",
                                        iters=24).positions)

    # 1. drape over a sphere
    sphere = dyn.ContactSphere(center=(0.6, 0.0, -0.5), radius=0.35,
                               stiffness=1e4, smoothing=1e-3)
    cfg = dyn.DynamicsConfig(statics=scfg, rho_a=1.0, rho_i=1e-2,
                             damping=6.0, gravity=(0.0, 0.0, -8.0),
                             contact=sphere)
    qe_drape = jax.jit(lambda a, b: dyn.simulate_implicit(
        a, b, cfg, dt=0.015, steps=steps, iters=12, tol=1e-8,
        record_energy=False).qes[-1])(qe0, qd0)
    pen = float(jnp.max(sphere.gap(jnp.asarray(grid(qe_drape)))))
    print(f"sphere drape: max penetration {pen:.4f} "
          f"(compliance-limited; free fall would reach ~0.33)")

    # 2. friction vs frictionless ringing on the floor
    amps = {}
    for mu in (0.0, 0.8):
        cfg_f = dyn.DynamicsConfig(
            statics=scfg, rho_a=1.0, rho_i=1e-2, gravity=(0.0, 0.0, -8.0),
            contact=dyn.ContactPlane(normal=(0.0, 0.0, 1.0), offset=-0.02,
                                     stiffness=2e3, smoothing=2e-3,
                                     friction=mu))
        kick = jnp.zeros(nq).at[6].set(2.0)
        tr = jax.jit(lambda a, b: dyn.simulate(
            a, b, cfg_f, dt=0.002, steps=4 * steps, iters=12,
            record_energy=False))(qe0, kick)
        amps[mu] = float(jnp.max(jnp.abs(tr.qes[-steps:, 6])))
    print(f"friction: late lateral amplitude mu=0: {amps[0.0]:.4f}  "
          f"mu=0.8: {amps[0.8]:.4f}")

    # 3. two-rod scene: clamped 0.08 apart, contact distance 0.1
    rr = dyn.RodRodContact(radius=0.05, stiffness=2e3, smoothing=2e-3)
    bases = np.array([[0.0, 0.0, 0.0], [0.0, 0.08, 0.0]])
    cfg_s = dyn.DynamicsConfig(statics=scfg, rho_a=1.0, rho_i=1e-2,
                               damping=4.0)
    tr = jax.jit(lambda a, b: dyn.simulate_scene(
        a, b, cfg_s, rr, bases, dt=0.004, steps=3 * steps, iters=12,
        record_energy=False))(jnp.zeros((2, nq)), jnp.zeros((2, nq)))
    r_all = np.stack([grid(tr.qes[-1][i]) for i in range(2)]) \
        + bases[:, None, :]
    tip_sep = float(np.linalg.norm(r_all[0][0] - r_all[1][0]))
    print(f"rod-rod: tip separation {tip_sep:.4f} "
          f"(clamped at 0.08, contact distance 0.10)")

    io.save_results("/tmp/contact_scene.npz", qe_drape=np.asarray(qe_drape),
                    scene_qes=np.asarray(tr.qes[-1]), bases=bases)
    print("saved -> /tmp/contact_scene.npz")


if __name__ == "__main__":
    main()
