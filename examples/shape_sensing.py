"""Shape sensing, load identification, and EKF tracking — the deployed
inverse loop of a continuum robot.

The reference prints the forward shape for one hard-coded strain
(`/root/reference/main.cpp:181-205`); a deployed robot runs the other
direction.  This example drives the full inverse stack on simulated
sensors:

1. **Static shape fit** (`sensing.fit_strain`): recover the modal strain
   from noisy markers + a tracked tip frame, batched Gauss-Newton with
   exact AD Jacobians through the spectral solve.
2. **Posterior uncertainty** (`sensing.posterior_covariance`): the
   Gauss-Markov error bars of that fit.
3. **Tip-load identification** (`sensing.identify_tip_load`): the wrench
   that produced an equilibrium shape, via IFT tangents through the
   statics solve.
4. **EKF tracking** (`estimation.ekf`): time-recursive estimation of a
   swinging rod from streaming measurements, process model = one RK4 step
   of the Lagrangian dynamics.

Run: python examples/shape_sensing.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# Estimation is precision-sensitive (GN tol 1e-12, f64 posteriors): pin
# the CPU backend + x64 like the other precision-bound examples.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    dynamics,
    estimation,
    rod,
    sensing,
)


def main():
    smoke = bool(os.environ.get("SPECTRAL_SMOKE"))
    rng = np.random.default_rng(0)
    rc = rod.RodConfig(n=10, na=3, ne=2)
    nq = rc.na * rc.ne

    # --- 1. static shape fit from noisy markers + tip pose -------------
    # markers + tip pose leave the torsion PROFILE nearly null (the
    # posterior below reports that honestly); two FBG strain stations
    # close it (ROADMAP r4 sensing notes on identifiability).
    scfg = sensing.SensingConfig(rod=rc, marker_fracs=(0.33, 0.66, 1.0),
                                 pose_fracs=(1.0,),
                                 strain_fracs=(0.4, 0.8))
    qe_true = jnp.asarray(0.4 * rng.standard_normal(nq), jnp.float64)
    sigma = 1e-3
    y = sensing.measure(qe_true, scfg)
    y_noisy = y + sigma * jnp.asarray(rng.standard_normal(y.shape))
    fit = sensing.fit_strain(y_noisy, scfg, tol=1e-12, max_iter=20)
    err = float(jnp.linalg.norm(fit.qe - qe_true))
    print(f"shape fit: |qe_hat - qe_true| = {err:.2e} "
          f"({int(fit.iterations)} GN iters, noise sigma {sigma:g})")

    # --- 2. error bars: predicted posterior stds ------------------------
    cov = sensing.posterior_covariance(fit.qe, scfg, noise_sigma=sigma)
    stds = np.sqrt(np.diag(np.asarray(cov)))
    print(f"posterior stds per mode: {stds.round(5)}")
    print(f"   (actual per-mode errors: "
          f"{np.abs(np.asarray(fit.qe - qe_true)).round(5)})")

    # --- 3. tip-load identification from an equilibrium shape ----------
    stat_cfg = cosserat.StaticsConfig(rod=rc)
    f_true = jnp.asarray([0.0, 0.12, -0.3])
    eq = cosserat.solve_statics(f_true, cfg=stat_cfg, tol=1e-11)
    y_eq = sensing.measure(eq.qe, scfg)
    y_eq = y_eq + 1e-4 * jnp.asarray(rng.standard_normal(y_eq.shape))
    theta, sol = sensing.identify_tip_load(y_eq, scfg, statics=stat_cfg)
    print(f"tip-load id: true {np.asarray(f_true)} -> estimated "
          f"{np.asarray(theta).round(4)}")
    print("   (the AXIAL component is the stiff direction — a near-"
          "inextensible rod barely bends under it, so noise amplifies "
          "there; the transverse components identify tightly)")

    # --- 4. EKF tracking of a swinging rod ------------------------------
    dcfg = dynamics.DynamicsConfig(statics=stat_cfg, rho_a=1.0, rho_i=1e-2)
    fcfg = estimation.FilterConfig(dynamics=dcfg, sensing=scfg, dt=0.01,
                                   r_sigma=1e-3)
    d = 2 * nq
    steps = 10 if smoke else 30
    x0_mean = np.zeros(d)
    x0_mean[2] = 0.35                      # bent release
    x0_true = jnp.asarray(x0_mean) + 0.01 * jnp.asarray(
        rng.standard_normal(d))
    xs, ys = estimation.simulate_measurements(
        x0_true[:nq], x0_true[nq:], fcfg, steps, jax.random.PRNGKey(2))
    res = estimation.ekf(ys, fcfg, jnp.asarray(x0_mean),
                         1e-4 * jnp.eye(d))
    rmse_qe = float(jnp.sqrt(jnp.mean(
        (res.xs[steps // 2:, :nq] - xs[steps // 2:, :nq]) ** 2)))
    nis = float(jnp.mean(res.nis))
    print(f"EKF over {steps} frames: strain rmse {rmse_qe:.2e}, "
          f"NIS {nis:.1f} (m = {ys.shape[-1]}) — "
          f"{'consistent' if nis < 2 * ys.shape[-1] else 'INCONSISTENT'}")

    # smoothed (RTS) pass tightens the history
    xs_s, _ = estimation.rts_smoother(res, fcfg)
    rmse_s = float(jnp.sqrt(jnp.mean(
        (xs_s[steps // 2:, :nq] - xs[steps // 2:, :nq]) ** 2)))
    print(f"RTS smoother: strain rmse {rmse_s:.2e} "
          f"({'improves' if rmse_s < rmse_qe else 'matches'} the filter)")


if __name__ == "__main__":
    main()
