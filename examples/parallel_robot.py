"""Parallel continuum robot: batched workspace map of a 3-leg platform.

Three extensible legs (na = 6) clamped on a ground circle and welded to a
rigid platform; a grid of lateral platform loads solves in ONE batched
device call of the coupled [leg strains, grip wrenches, platform pose]
Newton (models/constrained.py), then the 6x6 compliance about the rest
pose is printed — symmetric because the legs are hyperelastic and the
grips workless.

Run: python examples/parallel_robot.py   (SPECTRAL_SMOKE=1 for tiny)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The finite-difference compliance probe needs f64 (h = 1e-5 differences
# of ~1e-6 poses drown in f32 roundoff); set before any jax arrays exist.
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
import numpy as np

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    constrained,
    cosserat,
    dynamics,
    rod,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    ea, radius = 100.0, 0.3
    s = float(np.sqrt(2) / 2)
    bases = tuple(
        (radius * np.cos(a), radius * np.sin(a), 0.0)
        for a in (0.0, 2 * np.pi / 3, 4 * np.pi / 3))
    cfg = dynamics.DynamicsConfig(statics=cosserat.StaticsConfig(
        rod=rod.RodConfig(n=8 if smoke else 16, ne=2 if smoke else 4, na=6),
        stiffness=(1.0, 1.0, 1.0, ea, 50.0, 50.0)))
    robot = constrained.PlatformRobot(
        cfg=cfg, base_positions=bases,
        base_quaternions=((s, 0.0, -s, 0.0),) * 3, attach_points=bases)

    # Workspace map: a grid of lateral loads, one batched coupled solve.
    m = 2 if smoke else 5
    fx, fy = np.meshgrid(np.linspace(-0.3, 0.3, m),
                         np.linspace(-0.3, 0.3, m))
    loads = jnp.asarray(
        np.stack([fx.ravel(), fy.ravel(), np.full(m * m, -0.2)], -1))
    sol = constrained.solve_platform(robot, platform_force=loads,
                                     tol=1e-8, max_iter=40,
                                     iters=10 if smoke else 16)
    conv = np.asarray(sol.converged)
    pos = np.asarray(sol.platform_position)
    print(f"workspace: {conv.sum()}/{conv.size} converged")
    print("platform xy displacement range:",
          np.abs(pos[:, :2]).max(axis=0))
    print("platform sink under Fz=-0.2:",
          1.0 - pos[conv, 2].mean(), "(~", 0.2 / (3 * ea), "axial)")

    # Compliance about the precompressed rest state: 12 FD solves, one call.
    h = 1e-5
    w0 = jnp.asarray([0.0, 0.0, -0.2, 0.0, 0.0, 0.0])
    eye = jnp.eye(6, dtype=w0.dtype)
    wr = jnp.concatenate([w0 + h * eye, w0 - h * eye], axis=0)
    sol2 = constrained.solve_platform(
        robot, platform_force=wr[:, :3], platform_moment=wr[:, 3:],
        tol=1e-10, max_iter=60, iters=10 if smoke else 16)
    quat = np.asarray(sol2.platform_quaternion)
    pose = np.concatenate(
        [np.asarray(sol2.platform_position), 2.0 * quat[:, 1:] / quat[:, :1]],
        axis=-1)
    comp = (pose[:6] - pose[6:]) / (2.0 * h)
    asym = np.abs(comp - comp.T).max() / np.abs(comp).max()
    print("compliance diag:", np.diag(comp))
    print(f"compliance asymmetry (should be ~0): {asym:.2e}")


if __name__ == "__main__":
    main()
