"""Magnetic soft continuum robot (catheter): field steering, workspace,
magnetoelastic buckling, rotating-field dynamics.

The untethered counterpart of the tendon section — an axially magnetized
rod steered by an external uniform field (Helmholtz coils) and pulled by
a field gradient (Maxwell coils), driven end to end through the
framework: magnetically actuated equilibria
(`dynamics.solve_contact_statics` with the exact dipole-potential
gradient forces of models/magnetics.py), a batched field-workspace
sweep, the anti-aligned-field magnetoelastic buckling threshold
(`dynamics.linearized_spectrum`), and a rotating-field steering protocol
(`dynamics.simulate` with a time-dependent `b_field`).

Run: python examples/magnetic_catheter.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    magnetics,
    rod,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    n = 12 if smoke else 16
    m_mag, ei = 0.5, 1.0
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=n, ne=3),
                                  stiffness=(1.0, ei, ei))
    cfg = dynamics.DynamicsConfig(
        statics=scfg,
        magnets=(magnetics.Magnet(moment=(m_mag, 0.0, 0.0)),))

    # --- forward statics: one steered equilibrium ---
    b_vec = jnp.asarray([0.0, 0.0, 0.8])
    sol = dynamics.solve_contact_statics(cfg, b_field=b_vec, tol=1e-6)
    tip = rod.rod_shape(sol.qe, cfg=cfg.rod, method="picard",
                        iters=16).tip_position
    print(f"field {np.asarray(b_vec)} -> tip {np.asarray(tip).round(6)} "
          f"(converged={bool(sol.converged)})")

    # --- batched field-workspace sweep: a polar grid of steering fields ---
    m = 3 if smoke else 8
    mags = np.linspace(0.2, 1.5, m)
    angs = np.linspace(0.0, 2 * np.pi, m, endpoint=False)
    bm, ba = np.meshgrid(mags, angs, indexing="ij")
    fields = jnp.asarray(np.stack(
        [np.zeros(m * m), (bm * np.sin(ba)).ravel(),
         (bm * np.cos(ba)).ravel()], axis=-1))
    sols = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros((m * m, 9)), b_field=fields, tol=1e-6)
    tips = rod.rod_shape(sols.qe, cfg=cfg.rod, method="picard",
                         iters=16).tip_position
    reach = np.linalg.norm(np.asarray(tips)[:, 1:], axis=-1)
    print(f"workspace: {m * m} fields in one call, lateral reach "
          f"{reach.min():.3f}..{reach.max():.3f}, "
          f"all converged={bool(np.asarray(sols.converged).all())}")

    # --- gradient pulling: Maxwell-coil term (B0, G) ---
    grad = np.zeros((3, 3))
    grad[2, 0] = 0.5                       # dB_z/dx pulls the axial magnet
    sol_g = dynamics.solve_contact_statics(
        cfg, b_field=(np.zeros(3), grad), tol=1e-6)
    tip_g = rod.rod_shape(sol_g.qe, cfg=cfg.rod, method="picard",
                          iters=16).tip_position
    print(f"gradient dBz/dx=0.5 -> tip {np.asarray(tip_g).round(6)}")

    # --- magnetoelastic buckling: anti-aligned axial field ---
    b_star = np.pi ** 2 * ei / (4.0 * m_mag * cfg.rod.length ** 2)
    for frac in ([0.8, 1.2] if smoke else [0.5, 0.9, 1.1, 1.5]):
        om2 = dynamics.linearized_spectrum(
            cfg, b_field=(-frac * b_star, 0.0, 0.0))
        state = "stable" if om2[0] > 0 else "BUCKLED"
        print(f"anti-aligned B = {frac:.1f} B*  ->  min omega^2 = "
              f"{float(om2[0]):+.3f}  ({state});  classical B* = "
              f"{b_star:.4f}")

    # --- rotating-field steering protocol ---
    steps = 40 if smoke else 400
    omega = 2.0

    def b_of_t(t):
        return 0.8 * jnp.stack(
            [0.0 * t, jnp.sin(omega * t), jnp.cos(omega * t)])

    cfg_d = dynamics.DynamicsConfig(statics=scfg, magnets=cfg.magnets,
                                    damping=0.5)
    traj = dynamics.simulate(jnp.zeros(9), jnp.zeros(9), cfg_d, dt=5e-3,
                             steps=steps, b_field=b_of_t,
                             record_energy=False)
    qes = np.asarray(traj.qes)
    print(f"rotating field: max |kappa_y modes| {np.max(np.abs(qes[:, 3:6])):.3f}, "
          f"max |kappa_z modes| {np.max(np.abs(qes[:, 6:9])):.3f} "
          f"(out-of-plane sweep)")


if __name__ == "__main__":
    main()
