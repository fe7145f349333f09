"""Bifurcation diagram of the axially-compressed cantilever, end to end.

Demonstrates the full stability-analysis workflow on the classical Euler
column (the pitchfork the reference's theory supports but never exercises):

1. pencil eigenanalysis of the trivial branch -> predicted buckling loads;
2. arc-length walk UP the trivial branch with stability monitors;
3. automatic critical-point detection + classification (branch point);
4. branch switching onto the post-buckling path (both mirror branches);
5. Koiter unfolding: a small transverse imperfection turns the pitchfork
   into a fold, traced by walking DOWN the complementary branch.

Run: python examples/bifurcation_diagram.py
(forces the CPU backend: this is a host-driven f64 analysis loop — dozens
of tiny Newton solves — not a device-throughput workload.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    bifurcation,
    cosserat,
    rod,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    stiff = (1.0, 1.0, 1.3)          # split y/z bending: simple eigenvalues
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16), stiffness=stiff)
    axial = (-1.0, 0.0, 0.0)
    ne = cfg.rod.ne

    lams = bifurcation.linearized_buckling_loads(axial, cfg=cfg)
    lams = lams[lams > 0]
    print("pencil buckling loads:", np.round(lams[:4], 4))
    print(f"Euler P_cr = pi^2 EI / 4 = {np.pi ** 2 / 4:.4f} "
          f"(y-plane, EI=1); z-plane at x1.3")

    path = cosserat.arc_length_continuation(axial, cfg=cfg, ds=0.35, steps=9,
                                            tol=1e-10)
    stab = bifurcation.path_stability(path, axial, cfg=cfg)
    print("\ntrivial-branch walk: lambda =",
          np.round(np.asarray(path.lambdas), 3))
    print("unstable eigenvalue count:", stab.n_unstable)

    cp = bifurcation.detect_critical_points(
        path, axial, cfg=cfg, stability=stab,
        bisect_steps=10 if smoke else 48)[0]
    print(f"\ncritical point: kind={cp.kind}, lambda={cp.lam:.6f}, "
          f"left-null coupling={cp.coupling:.2e}")

    print("\npost-buckling branches (amplitude = |qe|):")
    for d in (1.0, -1.0):
        br = bifurcation.switch_branch(cp, axial, cfg=cfg, direction=d,
                                       ds=0.35, steps=6, tol=1e-9)
        amps = np.linalg.norm(np.asarray(br.qes), axis=1)
        print(f"  direction {d:+.0f}: lambda="
              f"{np.round(np.asarray(br.lambdas), 3)} |qe|="
              f"{np.round(amps, 3)}")

    if smoke:
        return   # CI smoke stops before the (slow) Koiter unfolding study

    # Koiter unfolding: walk the complementary branch of the imperfect
    # column down through its fold nose.
    d = 1.0 if cp.null_vector[ne] > 0 else -1.0
    br = bifurcation.switch_branch(cp, axial, cfg=cfg, direction=d, ds=0.4,
                                   steps=8, tol=1e-9)
    f_eps = (-1.0, 0.0, 0.01)
    lam_hi = float(np.asarray(br.lambdas)[-1])
    anchor = cosserat.solve_statics(
        lam_hi * jnp.asarray(f_eps, jnp.float64), cfg=cfg,
        qe0=jnp.asarray(np.asarray(br.qes)[-1]), tol=1e-10, max_iter=50)
    walk = cosserat.arc_length_continuation(
        f_eps, cfg=cfg, qe0=anchor.qe, lambda_start=lam_hi, ds=0.3,
        steps=14, tol=1e-9, direction=-1.0)
    pts = bifurcation.detect_critical_points(walk, f_eps, cfg=cfg)
    print("\nimperfect column (eps = 0.01) critical points:")
    for p in pts:
        print(f"  kind={p.kind}, lambda={p.lam:.4f}, "
              f"coupling={p.coupling:.3f}")
    print("(the fold nose sits at lambda_c + O(eps^(2/3)); the second "
          "'branch' point is z-plane buckling riding the unstable sheet)")


if __name__ == "__main__":
    main()
