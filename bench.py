"""North-star benchmark: batched N=16 rod-kinematics spectral solves/sec.

Runs on whatever accelerator JAX finds (the driver provides one real TPU
chip).  Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": "solves/sec", "vs_baseline": N}``.

The headline number is the **refined** path (double-word accuracy,
<=1e-8 rel Linf vs the f64 Eigen-reference oracle — verified inline here);
the plain-f32 picard throughput and the measured accuracy ride along in
"extra".  ``vs_baseline`` is the ratio against the BASELINE.json build
target of 1e6 solves/sec (the reference publishes no numbers of its own —
it is a single-rod, single-thread CPU program).
"""

import json
import os
import time

import numpy as np


def _measure(fn, arg, reps: int | None = None):
    import jax

    if reps is None:
        reps = int(os.environ.get("BENCH_REPS", 20))
    out = fn(arg)
    assert out.ndim == 0, "bench fns must reduce to a scalar on device"
    # scalar fetch = real sync (block_until_ready is unreliable over tunnel)
    _ = float(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(arg)
    # host fetch of a scalar forces completion of the final execution
    _ = float(out)
    return (time.perf_counter() - t0) / reps


_ERRORS: dict = {}


def _try_rate(name, count, fn, arg, reps=None):
    """Measure one EXTRA row, never letting it kill the headline metric
    (round 3 lost the whole bench to one OOMing extra).  Returns
    rate-per-sec or the error class string."""
    import sys
    import traceback

    try:
        return round(count / _measure(fn, arg, reps=reps), 1)
    except Exception as e:  # noqa: BLE001 — any device/compile failure
        _ERRORS[name] = f"{type(e).__name__}: {str(e)[:200]}"
        traceback.print_exc(limit=3, file=sys.stderr)
        return None


def main():
    import jax

    # Persistent compilation cache: the fused kernels compile in ~1-2 min
    # cold; cache them across bench runs on this machine.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass
    import jax.numpy as jnp

    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import rod
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import oracle

    cfg = rod.RodConfig(n=16)
    # BENCH_BATCH / BENCH_REPS overrides for smoke tests on slow backends;
    # Pallas kernels run in interpret mode on the CPU backend.
    batch = int(os.environ.get("BENCH_BATCH", 131072))
    interpret = jax.default_backend() == "cpu"
    tile = min(batch, 2048)
    rng = np.random.default_rng(0)
    # 0.8x keeps every rod inside the fused paths' validity domain
    # (rho = max|K| L/2 <= 5; the raw N(0,1) draw has one rod at 5.11,
    # which the refined kernel's sentinel would now rightly NaN-poison).
    # Throughput is value-independent.
    qes = jnp.asarray(0.8 * rng.standard_normal((batch, 9)), jnp.float32)

    # Adaptive iteration counts from the batch's actual strain bound
    # (rho = 4.09 here -> 18 vs the static worst-case 20); the SAME counts
    # feed the timed step and the inline accuracy gate below.
    auto_iters = rod.auto_picard_iters(qes, cfg) or 20

    def refined_step(q):
        # Headline: Pallas-fused f32 solves + one double-word IR pass
        # (measured ~1e-11 rel Linf — gate is 1e-8; see inline check below).
        sol = rod.rod_shape_refined_fused(q, cfg=cfg, refine_steps=1,
                                          iters=auto_iters,
                                          corr_iters=auto_iters,
                                          tile=tile, interpret=interpret)
        return jnp.sum(sol.positions) + jnp.sum(sol.quaternions)

    def picard_step(q):
        sol = rod.rod_shape(q, cfg=cfg, method="picard")
        return jnp.sum(sol.positions) + jnp.sum(sol.quaternions)

    dt_refined = _measure(jax.jit(refined_step), qes)
    rate_picard = _try_rate("picard", batch, jax.jit(picard_step), qes)

    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops.pallas import (
        rod_kernel,
    )

    def fused_step(q):
        qk, rk = rod_kernel.rod_shape_fused(q, cfg=cfg, tile=tile,
                                            interpret=interpret)
        return jnp.sum(qk) + jnp.sum(rk)

    rate_fused = _try_rate("fused", batch, jax.jit(fused_step), qes)

    # Small-strain lane: the adaptive iteration count's headroom (rho ~ 1.3
    # -> ~10 MXU passes instead of 18; ROADMAP r1 'adaptive Picard').
    qes_small = 0.25 * qes
    small_iters = rod.auto_picard_iters(qes_small, cfg) or 20

    def refined_small_step(q):
        sol = rod.rod_shape_refined_fused(q, cfg=cfg, refine_steps=1,
                                          iters=small_iters,
                                          corr_iters=small_iters,
                                          tile=tile, interpret=interpret)
        return jnp.sum(sol.positions) + jnp.sum(sol.quaternions)

    rate_small = _try_rate("refined_small", batch,
                           jax.jit(refined_small_step), qes_small)

    # N=64 accuracy path through the WIDE single refined kernel (ROADMAP
    # r3: right-multiplied Ozaki planes; 5.5x the staged path on v5e).
    cfg64 = rod.RodConfig(n=64)
    qes64 = qes[:min(batch, 32768)]
    auto64 = rod.auto_picard_iters(qes64, cfg64) or 24

    def refined64_step(q):
        sol = rod.rod_shape_refined_fused(q, cfg=cfg64, refine_steps=1,
                                          iters=auto64, corr_iters=auto64,
                                          interpret=interpret)
        return jnp.sum(sol.positions) + jnp.sum(sol.quaternions)

    rate_refined64 = _try_rate("refined_n64", qes64.shape[0],
                               jax.jit(refined64_step), qes64, reps=5)

    # N=256 high-order config (BASELINE #5 grid) on the multi-tile wide
    # single refined kernel.
    cfg256 = rod.RodConfig(n=256)
    qes256 = qes[:min(batch, 8192)]
    auto256 = rod.auto_picard_iters(qes256, cfg256) or 28

    def refined256_step(q):
        sol = rod.rod_shape_refined_fused(q, cfg=cfg256, refine_steps=1,
                                          iters=auto256, corr_iters=auto256,
                                          interpret=interpret)
        return jnp.sum(sol.positions) + jnp.sum(sol.quaternions)

    rate_refined256 = _try_rate("refined_n256", qes256.shape[0],
                                jax.jit(refined256_step), qes256, reps=3)

    # Inline accuracy gate vs the f64 algorithm-exact oracle (demo strain),
    # on the SAME code path AND iteration counts as the headline timing.
    qe_hi, qe_lo = rod.split_strain(oracle.demo_qe())
    qe_dd = (jnp.tile(qe_hi, (tile, 1)), jnp.tile(qe_lo, (tile, 1)))
    sol = rod.rod_shape_refined_fused(qe_dd, cfg=cfg, refine_steps=1,
                                      iters=auto_iters, corr_iters=auto_iters,
                                      tile=tile, interpret=interpret)
    _, r_ref = oracle.integrate_position(oracle.demo_qe())
    rel_err = float(
        np.max(np.abs(sol.positions_f64()[0] - r_ref)) / np.max(np.abs(r_ref))
    )

    # Nonlinear statics BVP throughput (Newton + IFT Jacobians), vmapped.
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        cosserat,
    )

    statics_cfg = cosserat.StaticsConfig(rod=cfg)
    loads = jnp.asarray(
        np.random.default_rng(1).uniform(-0.4, 0.4, (min(batch, 16384), 3)),
        jnp.float32,
    )

    def statics_step(fl):
        # Batched Newton on the fused-kernel path (IFT tangents on the MXU,
        # Gauss-Jordan Newton steps on the VPU) — 238k BVP/s on v5e vs the
        # 44k of round 1's vmapped XLA path.
        return jnp.sum(cosserat.solve_statics_batched(
            fl, cfg=statics_cfg, tol=1e-5, max_iter=12, iters=16,
            interpret=interpret).qe)

    rate_statics = _try_rate("statics", loads.shape[0],
                             jax.jit(statics_step), loads, reps=5)

    # BASELINE config #3's own grid (N=64) through the wide fused layout.
    statics64_cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=64))
    loads64 = loads[:min(loads.shape[0], 4096)]

    def statics64_step(fl):
        return jnp.sum(cosserat.solve_statics_batched(
            fl, cfg=statics64_cfg, tol=1e-5, max_iter=12, iters=16,
            interpret=interpret).qe)

    rate_statics64 = _try_rate("statics_n64", loads64.shape[0],
                               jax.jit(statics64_step), loads64, reps=3)

    # 6-DoF Reissner strains on the PAIRED single refined kernel (r3: the
    # dd Reissner tangent covers every layout tier; measured ~free vs na=3).
    cfg6 = rod.RodConfig(n=64, na=6, ne=3)
    b6 = min(batch, 8192) if not interpret else min(batch // 2, 1024)
    qes6 = jnp.concatenate([0.5 * qes[:b6], 0.15 * qes[:b6]], axis=1)

    def reissner64_step(q):
        sol = rod.rod_shape_refined_fused(q, cfg=cfg6, refine_steps=1,
                                          iters=24, corr_iters=24,
                                          interpret=interpret)
        return jnp.sum(sol.positions) + jnp.sum(sol.quaternions)

    rate_reissner64 = _try_rate("reissner6dof_n64", qes6.shape[0],
                                jax.jit(reissner64_step), qes6, reps=5)

    # Multi-segment statics on the fused tier (r3 kernel-lifted IFT:
    # 12-13x the jacfwd-through-the-chain tier on v5e).
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        segment_statics,
        segments,
    )

    seg_cfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=16),
        stiffness=((1.0, 2.0, 2.0), (1.0, 1.0, 1.0)))
    seg_loads = loads[:min(loads.shape[0],
                           8192 if not interpret else 512)]

    def seg_statics_step(fl):
        return jnp.sum(segment_statics.solve_segmented_statics_batched(
            fl, cfg=seg_cfg, tol=1e-5, max_iter=10, iters=16, jac_iters=8,
            interpret=interpret).qe)

    rate_seg = _try_rate("segmented_statics", seg_loads.shape[0],
                         jax.jit(seg_statics_step), seg_loads, reps=3)

    # Rod dynamics throughput: batched RK4 Lagrangian steps (mass-matrix
    # IFT tangents + Gauss-Jordan per stage) — rod-steps/sec over a family
    # of initial conditions in one device-resident lax.scan.
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        dynamics,
    )

    dyn_cfg = dynamics.DynamicsConfig(statics=statics_cfg, rho_a=1.0,
                                      rho_i=1e-2)
    b_dyn = max(8, min(batch // 64, 2048))
    dyn_steps = 25
    qe_dyn = 0.3 * qes[:b_dyn]

    def dynamics_step(q):
        traj = dynamics.simulate(q, jnp.zeros_like(q), dyn_cfg, dt=0.002,
                                 steps=dyn_steps, iters=10,
                                 record_energy=False)
        return jnp.sum(traj.qes[-1])

    rate_dyn = _try_rate("dynamics_rk4", b_dyn * dyn_steps,
                         jax.jit(dynamics_step), qe_dyn, reps=3)

    # The fused-mass lane (r5): M(qe) assembled on the MXU from the
    # fused-kernel IFT tangents per RK4 stage (mass_tier='fused',
    # forward-only) — measured 26x the XLA-mass lane on v5e.
    def dynamics_fused_step(q):
        traj = dynamics.simulate(q, jnp.zeros_like(q), dyn_cfg, dt=0.002,
                                 steps=dyn_steps, iters=10,
                                 record_energy=False, mass_tier="fused")
        return jnp.sum(traj.qes[-1])

    rate_dyn_fused = _try_rate("dynamics_rk4_fused", b_dyn * dyn_steps,
                               jax.jit(dynamics_fused_step), qe_dyn, reps=3)

    # Tendon-actuated equilibria (the continuum-robot workspace sweep):
    # batched damped Newton on the Lagrangian balance with exact
    # routed-length-gradient actuation forces (models/tendon.py).
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        tendon,
    )

    act_cfg = dynamics.DynamicsConfig(
        statics=statics_cfg,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, 0.05)),
                 tendon.Tendon(offset=(0.0, 0.043, -0.025)),
                 tendon.Tendon(offset=(0.0, -0.043, -0.025))))
    # jac_chunk=3 streams the Newton-Jacobian tangent passes (the
    # all-directions vmap at B=4096 OOMed the 16 GB v5e in round 3 —
    # ~20 live 1 GB tangent buffers); B=2048 + chunking fits with margin.
    b_act = max(8, min(batch // 64, 2048)) if not interpret else 64
    tens = jnp.asarray(
        np.random.default_rng(2).uniform(0.0, 2.0, (b_act, 3)), jnp.float32)
    qe0_act = jnp.zeros((b_act, 9), jnp.float32)

    def actuated_step(t):
        return jnp.sum(dynamics.solve_contact_statics(
            act_cfg, qe0=qe0_act, tension=t, tol=2e-5, max_iter=12,
            iters=12, jac_chunk=3).qe)

    rate_act = _try_rate("actuated_statics", b_act,
                         jax.jit(actuated_step), tens, reps=3)

    # Native C++ CPU baseline (reference algorithm, OpenMP threads).
    cpu_baseline = None
    try:
        import subprocess
        from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.utils import (
            native_oracle,
        )

        if native_oracle.is_available():
            out = subprocess.run(
                [str(native_oracle.bench_path()), "16384", "16", "3"],
                capture_output=True, text=True, timeout=300, check=True,
            )
            cpu_baseline = json.loads(out.stdout.strip())
    except Exception:
        pass

    value = batch / dt_refined
    print(json.dumps({
        "metric": "batched N=16 rod-kinematics spectral solves/sec (refined, <=1e-8 path)",
        "value": round(value, 1),
        "unit": "solves/sec",
        "vs_baseline": round(value / 1e6, 3),
        "extra": {
            "device": str(jax.devices()[0]),
            "batch": batch,
            "picard_f32_solves_per_sec": rate_picard,
            "pallas_fused_f32_solves_per_sec": rate_fused,
            "refined_ms_per_batch": round(dt_refined * 1e3, 3),
            "refined_auto_iters": auto_iters,
            "refined_small_strain_solves_per_sec": rate_small,
            "refined_small_strain_iters": small_iters,
            "refined_n64_solves_per_sec": rate_refined64,
            "refined_n256_solves_per_sec": rate_refined256,
            "statics_bvp_solves_per_sec": rate_statics,
            "statics_n64_bvp_solves_per_sec": rate_statics64,
            "reissner6dof_n64_solves_per_sec": rate_reissner64,
            "segmented_statics_bvp_solves_per_sec": rate_seg,
            "dynamics_rk4_rod_steps_per_sec": rate_dyn,
            "dynamics_rk4_fused_mass_rod_steps_per_sec": rate_dyn_fused,
            "actuated_statics_solves_per_sec": rate_act,
            "rel_linf_error_vs_f64_reference": rel_err,
            "accuracy_gate_1e-8": rel_err <= 1e-8,
            "cpu_reference_baseline": cpu_baseline,
            "row_errors": _ERRORS or None,
        },
    }))


if __name__ == "__main__":
    main()
