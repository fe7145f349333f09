"""Optimal control of a tendon-driven rod: swing the tip through a dynamic
maneuver by gradient descent THROUGH the simulator.

The showcase of the differentiable TPU stack (models/control.py): the RK4
time loop is a pure `lax.scan`, so the gradient of a terminal tip cost with
respect to a knot-parameterized tension schedule is one `jax.grad` — exact
reverse-mode through every mass-matrix IFT tangent and load pullback — and
the whole Adam optimization runs as a single device-resident jitted scan.

Also demonstrates Floquet analysis (`dynamics.floquet_multipliers`): the
monodromy matrix of a parametrically driven rod by AD of the flow map,
locating the Mathieu 2:1 instability tongue with the rigorous |mu| = 1
criterion.

Run: python examples/optimal_control.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    control,
    cosserat,
    dynamics,
    rod,
    tendon,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))

    # Two antagonist cables bending about y.
    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=8 if smoke else 12,
                                                    ne=2 if smoke else 3))
    cfg = dynamics.DynamicsConfig(
        statics=scfg, rho_a=1.0, rho_i=1e-2, damping=0.4,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, 0.06)),
                 tendon.Tendon(offset=(0.0, 0.0, -0.06))))
    dt = 1.0 / float(dynamics.natural_frequencies(cfg).max())
    steps = 14 if smoke else max(20, int(round(0.9 / dt)))

    # Target: the terminal tip of a reference maneuver (exactly reachable).
    kn_true = jnp.asarray([[0.0, 0.0], [1.4, 0.2], [2.2, 0.0]])
    ref = control.rollout(kn_true, cfg, dt, steps, channel="tension",
                          transform=jax.nn.softplus, iters=10)
    target = control.tip_positions(ref.qes[-1], cfg)
    print(f"maneuver target tip: {np.asarray(target).round(4)}")

    cost = control.tip_target_cost(cfg, target, effort_weight=1e-5,
                                   transform=jax.nn.softplus)
    sol = control.optimize_protocol(
        cost, jnp.full((3, 2), -1.0), cfg, dt, steps, channel="tension",
        transform=jax.nn.softplus, iterations=8 if smoke else 80,
        iters=10)
    final = control.rollout(sol.knots, cfg, dt, steps, channel="tension",
                            transform=jax.nn.softplus, iters=10)
    miss = float(jnp.linalg.norm(
        control.tip_positions(final.qes[-1], cfg) - target))
    print(f"loss {float(sol.losses[0]):.2e} -> {float(sol.losses[-1]):.2e} "
          f"in {sol.losses.shape[0]} Adam steps; terminal tip miss {miss:.4f}")
    print("optimized tension knots (softplus-transformed):")
    print(np.asarray(jax.nn.softplus(sol.knots)).round(3))

    # --- Floquet: the Mathieu 2:1 tongue by the rigorous criterion ---
    freqs = np.sort(dynamics.natural_frequencies(cfg))
    w1, w_max = float(freqs[0]), float(freqs[-1])
    p1 = 0.5 * (np.pi ** 2 / 4.0)
    cases = (("2:1 tongue", 2.0 * w1),) if smoke else \
        (("2:1 tongue", 2.0 * w1), ("detuned", 1.37 * w1))
    for name, om in cases:
        period = 2.0 * np.pi / om
        fsteps = int(np.ceil(period * w_max / 0.4))
        mus = dynamics.floquet_multipliers(
            cfg, period, fsteps,
            tip_force=lambda t, _om=om: jnp.asarray([-p1, 0.0, 0.0])
            * jnp.cos(_om * t))
        mmax = float(jnp.max(jnp.abs(mus)))
        verdict = "UNSTABLE" if mmax > 1 else "stable"
        print(f"Floquet max|mu| at {name}: {mmax:.3f} ({verdict})")


if __name__ == "__main__":
    main()
