"""Multi-chip sharding of rod batches over a TPU mesh.

The reference has **no** parallelism or communication layer (SURVEY.md §2:
single-threaded CPU, no MPI/NCCL/threads) — this module is the new
capability the repo's CUDA study materials aspired to, built the TPU way:
``jax.sharding.Mesh`` + ``NamedSharding`` annotations, letting XLA insert
ICI collectives.  Rods are embarrassingly parallel, so the dominant axis is
**data parallelism over rods** (axis ``"rods"``); gradient reductions in
calibration/training flows become ``psum`` over that axis automatically.

For very high-order single problems (N=256 multi-segment rods) the state is
still small enough for one chip (SURVEY.md §5), so no sequence/tensor axis
is needed for the solve itself; a ``"segments"`` axis is reserved for
multi-segment batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "shard_rods",
    "replicate",
    "sharded_rod_shape",
    "sharded_solve_statics",
    "sharded_segmented_statics",
    "sharded_riks_walk",
    "sharded_simulate",
    "sharded_actuated_statics",
    "sharded_platform_statics",
    "sharded_ctr_workspace",
    "sharded_ekf",
]

RODS_AXIS = "rods"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D device mesh over the rod-batch axis."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (RODS_AXIS,))


def shard_rods(mesh: Mesh, arr):
    """Place a ``(B, ...)`` batch with its leading axis split over the mesh."""
    spec = P(RODS_AXIS, *([None] * (arr.ndim - 1)))
    return jax.device_put(arr, NamedSharding(mesh, spec))


def replicate(mesh: Mesh, arr):
    return jax.device_put(arr, NamedSharding(mesh, P()))


def sharded_rod_shape(mesh: Mesh, method: str = "picard", **kwargs):
    """jit-compiled batched rod solve with explicit batch sharding.

    Returns a function ``qes (B, na*ne) -> (quaternions, positions)`` whose
    input/output live sharded over the ``rods`` axis; XLA keeps everything
    local to each chip (no collectives — rods are independent), which is the
    communication-optimal layout.

    ``method='fused'`` runs the Pallas kernel per shard under ``shard_map``
    (a pallas_call is not auto-partitionable): each chip solves its local
    slab VMEM-resident — the Pallas x sharding composition for multi-chip
    100k+-rod sweeps.  ``method='refined'`` does the same with the single
    accuracy-gated refined kernel (outputs are the dd sums ``hi + lo``).
    """
    from ..models import rod

    batch_spec = NamedSharding(mesh, P(RODS_AXIS, None))
    out_spec = NamedSharding(mesh, P(RODS_AXIS, None, None))

    if method in ("fused", "refined"):
        if method == "fused":
            from ..ops.pallas import rod_kernel as rk

            def local_step(qes):
                return rk.rod_shape_fused(qes, **kwargs)
        else:
            from ..ops.pallas import refined_kernel as rfk

            def local_step(qes):
                q_hi, q_lo, r_hi, r_lo = rfk.rod_shape_refined_kernel(
                    qes, **kwargs
                )
                return q_hi + q_lo, r_hi + r_lo

        step = jax.shard_map(
            local_step, mesh=mesh,
            in_specs=P(RODS_AXIS, None),
            out_specs=(P(RODS_AXIS, None, None), P(RODS_AXIS, None, None)),
            # pallas_call's out_shape carries no varying-mesh-axes info
            check_vma=False,
        )
        return jax.jit(step, in_shardings=batch_spec,
                       out_shardings=(out_spec, out_spec))

    def step(qes):
        sol = rod.rod_shape(qes, method=method, **kwargs)
        return sol.quaternions, sol.positions

    return jax.jit(
        step, in_shardings=batch_spec, out_shardings=(out_spec, out_spec)
    )


def sharded_solve_statics(mesh: Mesh, cfg=None, **kwargs):
    """Multi-chip batched statics: ``loads (B, 3) -> StaticsSolution``.

    Each chip runs the full fused-path Newton (`solve_statics_batched`) on
    its local slab of the load batch under ``shard_map`` — rods are
    independent, so there are no collectives and no cross-chip
    synchronization: a chip whose slab converges early simply finishes its
    ``while_loop`` sooner.  ``iterations`` is reported per rod (each rod
    carries its shard's Newton count).
    """
    import jax.numpy as jnp

    from ..models import cosserat

    if cfg is None:
        cfg = cosserat.StaticsConfig()

    def local(loads):
        sol = cosserat.solve_statics_batched(loads, cfg=cfg, **kwargs)
        iters = jnp.full(loads.shape[:1], sol.iterations)
        return sol.qe, iters, sol.residual_norm, sol.converged

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(RODS_AXIS, None),
        out_specs=(P(RODS_AXIS, None), P(RODS_AXIS), P(RODS_AXIS),
                   P(RODS_AXIS)),
        check_vma=False,      # pallas_call carries no varying-axes info
    )
    batch_spec = NamedSharding(mesh, P(RODS_AXIS, None))
    jitted = jax.jit(step, in_shardings=batch_spec)

    def solve(loads):
        qe, iters, rnorm, conv = jitted(loads)
        return cosserat.StaticsSolution(qe=qe, iterations=iters,
                                        residual_norm=rnorm, converged=conv)

    return solve


def sharded_actuated_statics(mesh: Mesh, cfg, **kwargs):
    """Multi-chip tendon-actuated equilibria: ``tension (B, K)`` ->
    :class:`~.dynamics.ContactStaticsSolution` — the workspace-sweep
    workload of a tendon-driven section (``cfg.tendons`` required).  Each
    chip Newton-solves its local slab of actuation commands
    (:func:`~.dynamics.solve_contact_statics` is batched over leading
    axes); rods are independent, so no collectives."""
    import jax.numpy as jnp

    from ..models import dynamics

    if not cfg.tendons:
        raise ValueError("sharded_actuated_statics needs cfg.tendons")
    nq = cfg.rod.na * cfg.rod.ne

    def local(tension):
        qe0 = jnp.zeros(tension.shape[:-1] + (nq,), tension.dtype)
        sol = dynamics.solve_contact_statics(cfg, qe0=qe0, tension=tension,
                                             **kwargs)
        iters = jnp.full(tension.shape[:1], sol.iterations)
        return sol.qe, iters, sol.residual_norm, sol.converged

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(RODS_AXIS, None),
        out_specs=(P(RODS_AXIS, None), P(RODS_AXIS), P(RODS_AXIS),
                   P(RODS_AXIS)),
        check_vma=False,
    )
    jitted = jax.jit(step, in_shardings=NamedSharding(mesh, P(RODS_AXIS,
                                                              None)))

    def solve(tension):
        qe, iters, rnorm, conv = jitted(tension)
        return dynamics.ContactStaticsSolution(
            qe=qe, residual_norm=rnorm, iterations=iters, converged=conv)

    return solve


def sharded_magnetic_statics(mesh: Mesh, cfg, **kwargs):
    """Multi-chip magnetically actuated equilibria: uniform applied
    fields ``b (B, 3)`` -> :class:`~.dynamics.ContactStaticsSolution` —
    the field-workspace sweep of a magnetic continuum robot
    (``cfg.magnets`` required; models/magnetics.py).  Each chip
    Newton-solves its local slab of field commands; rods are independent,
    so no collectives."""
    import jax.numpy as jnp

    from ..models import dynamics

    if not cfg.magnets:
        raise ValueError("sharded_magnetic_statics needs cfg.magnets")
    nq = cfg.nq

    def local(b):
        qe0 = jnp.zeros(b.shape[:-1] + (nq,), b.dtype)
        sol = dynamics.solve_contact_statics(cfg, qe0=qe0, b_field=b,
                                             **kwargs)
        iters = jnp.full(b.shape[:1], sol.iterations)
        return sol.qe, iters, sol.residual_norm, sol.converged

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(RODS_AXIS, None),
        out_specs=(P(RODS_AXIS, None), P(RODS_AXIS), P(RODS_AXIS),
                   P(RODS_AXIS)),
        check_vma=False,
    )
    jitted = jax.jit(step, in_shardings=NamedSharding(mesh, P(RODS_AXIS,
                                                              None)))

    def solve(b):
        qe, iters, rnorm, conv = jitted(b)
        return dynamics.ContactStaticsSolution(
            qe=qe, residual_norm=rnorm, iterations=iters, converged=conv)

    return solve


def sharded_ctr_workspace(mesh: Mesh, cfg, **kwargs):
    """Multi-chip concentric-tube-robot workspace sweep: actuation angles
    ``alphas (B, T)`` -> ``(theta (B, T, n), tips (B, 3), iterations,
    residual_norm)`` — each chip Newton-solves its local slab of the
    actuation grid (models/ctr.py torsion BVP) and chains the backbone
    shape; samples are independent, so no collectives."""
    from ..models import ctr as ctr_mod

    shape_kwargs = {k: kwargs.pop(k) for k in ("method", "iters")
                    if k in kwargs}

    def local(alphas):
        sol = ctr_mod.solve_ctr(alphas, cfg, **kwargs)
        shp = ctr_mod.ctr_shape(sol.theta, cfg, **shape_kwargs)
        iters = jnp.full(alphas.shape[:1], sol.iterations)
        return (sol.theta, shp.positions[..., 0, :], iters,
                jnp.linalg.norm(sol.residual, axis=-1))

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(RODS_AXIS, None),
        out_specs=(P(RODS_AXIS, None, None), P(RODS_AXIS, None),
                   P(RODS_AXIS), P(RODS_AXIS)),
        check_vma=False,
    )
    return jax.jit(step, in_shardings=NamedSharding(mesh, P(RODS_AXIS,
                                                            None)))


def sharded_ekf(mesh: Mesh, cfg, **kwargs):
    """Multi-chip fleet estimation: run B independent EKFs (a fleet of
    instrumented rods, or Monte-Carlo consistency replicas) sharded over
    the mesh.  ``(ys (steps, B, m), x0 (B, 2nq), p0 (2nq, 2nq)
    replicated)`` -> ``(xs (steps, B, 2nq), covs, nis)`` — the filter
    recursion is per-sample, so no collectives."""
    from ..models import estimation as est_mod

    def local(ys, x0, p0):
        res = est_mod.ekf(ys, cfg, x0, p0, **kwargs)
        return res.xs, res.covs, res.nis

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, RODS_AXIS, None), P(RODS_AXIS, None), P()),
        out_specs=(P(None, RODS_AXIS, None),
                   P(None, RODS_AXIS, None, None), P(None, RODS_AXIS)),
        check_vma=False,
    )
    return jax.jit(step, in_shardings=(
        NamedSharding(mesh, P(None, RODS_AXIS, None)),
        NamedSharding(mesh, P(RODS_AXIS, None)),
        NamedSharding(mesh, P()),
    ))


def sharded_segmented_statics(mesh: Mesh, cfg=None, **kwargs):
    """Multi-chip batched MULTI-SEGMENT statics: ``loads (B, 3)`` ->
    :class:`~.segment_statics.SegmentedStaticsSolution` with ``qe``
    ``(B, S, nq)``.  Each chip runs the fused-tier chained Newton
    (``solve_segmented_statics_batched``) on its local slab — segments
    chain WITHIN a chip (the junction trace is a local value), rods stay
    embarrassingly parallel across chips.  ``dd_residual=True`` is
    forwarded AND its ``qe_lo`` words come back sharded."""
    import jax.numpy as jnp

    from ..models import segment_statics

    if cfg is None:
        cfg = segment_statics.SegmentedStaticsConfig()
    dd = bool(kwargs.get("dd_residual"))

    def local(loads):
        sol = segment_statics.solve_segmented_statics_batched(
            loads, cfg=cfg, **kwargs)
        iters = jnp.full(loads.shape[:1], sol.iterations)
        out = (sol.qe, iters, sol.residual_norm, sol.converged)
        return out + (sol.qe_lo,) if dd else out

    out_specs = (P(RODS_AXIS, None, None), P(RODS_AXIS), P(RODS_AXIS),
                 P(RODS_AXIS))
    if dd:
        out_specs = out_specs + (P(RODS_AXIS, None, None),)
    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(RODS_AXIS, None),
        out_specs=out_specs,
        check_vma=False,      # pallas_call carries no varying-axes info
    )
    batch_spec = NamedSharding(mesh, P(RODS_AXIS, None))
    jitted = jax.jit(step, in_shardings=batch_spec)

    def solve(loads):
        out = jitted(loads)
        qe, iters, rnorm, conv = out[:4]
        return segment_statics.SegmentedStaticsSolution(
            qe=qe, iterations=iters, residual_norm=rnorm, converged=conv,
            qe_lo=out[4] if dd else None)

    return solve


def sharded_riks_walk(mesh: Mesh, cfg=None, dd_residual: bool = False,
                      monitor_stability: bool = False, **kwargs):
    """Multi-chip batched Riks continuation: ``load_refs (B, 3)`` ->
    :class:`~.cosserat.BatchedContinuationPath` with the SAMPLE axis (axis
    1 of every ``(steps, B, ...)`` output) sharded over the mesh.  Each
    chip scans its own family of load rays — paths are independent, so the
    device-resident walk needs no collectives.  ``dd_residual=True`` runs
    the dd corrector per shard (dd path points come back in
    ``qes_lo``/``lambdas_lo``); ``monitor_stability=True`` returns the
    per-shard determinant monitors too."""
    from ..models import cosserat

    if cfg is None:
        cfg = cosserat.StaticsConfig()

    def local(load_refs):
        path = cosserat.arc_length_continuation_batched(
            load_refs, cfg=cfg, dd_residual=dd_residual,
            monitor_stability=monitor_stability, **kwargs)
        out = (path.lambdas, path.qes, path.converged)
        if monitor_stability:
            out = out + (path.det_sign, path.log_abs_det)
        if dd_residual:
            out = out + (path.lambdas_lo, path.qes_lo)
        return out

    out_specs = (P(None, RODS_AXIS), P(None, RODS_AXIS, None),
                 P(None, RODS_AXIS))
    if monitor_stability:
        out_specs = out_specs + (P(None, RODS_AXIS), P(None, RODS_AXIS))
    if dd_residual:
        out_specs = out_specs + (P(None, RODS_AXIS),
                                 P(None, RODS_AXIS, None))
    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(RODS_AXIS, None),
        out_specs=out_specs,
        check_vma=False,
    )
    jitted = jax.jit(step,
                     in_shardings=NamedSharding(mesh, P(RODS_AXIS, None)))

    def walk(load_refs):
        out = list(jitted(load_refs))
        lam, qes, conv = out[:3]
        rest = out[3:]
        extra = {}
        if monitor_stability:
            extra.update(det_sign=rest[0], log_abs_det=rest[1])
            rest = rest[2:]
        if dd_residual:
            extra.update(lambdas_lo=rest[0], qes_lo=rest[1])
        return cosserat.BatchedContinuationPath(lambdas=lam, qes=qes,
                                                converged=conv, **extra)

    return walk


def sharded_simulate(mesh: Mesh, cfg=None, implicit: bool = False,
                     **kwargs):
    """Multi-chip rod dynamics: ``(qe0, qd0) (B, nq)`` ->
    :class:`~.dynamics.Trajectory` with the SAMPLE axis (axis 1 of every
    ``(steps, B, ...)`` output) sharded over the mesh.  Each chip scans
    its own family of initial conditions through the RK4
    (:func:`~.dynamics.simulate`) or implicit-Newmark (``implicit=True``,
    :func:`~.dynamics.simulate_implicit`) integrator — trajectories are
    independent, so the device-resident time loop needs no collectives.
    ``kwargs`` (``dt``, ``steps``, driven ``tip_force``/``tip_moment``/
    ``base_accel`` protocols, ...) forward to the integrator; callables
    of ``t`` are traced per shard on local slabs, so per-sample drives
    must index only the LOCAL batch (use replicated drive parameters or
    constants — the usual protocols)."""
    from ..models import dynamics

    if cfg is None:
        cfg = dynamics.DynamicsConfig()

    def local(qe0, qd0):
        fn = dynamics.simulate_implicit if implicit else dynamics.simulate
        traj = fn(qe0, qd0, cfg, **kwargs)
        return traj.times, traj.qes, traj.qds, traj.energies

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(RODS_AXIS, None), P(RODS_AXIS, None)),
        out_specs=(P(None), P(None, RODS_AXIS, None),
                   P(None, RODS_AXIS, None), P(None, RODS_AXIS)),
        check_vma=False,
    )
    batch_spec = NamedSharding(mesh, P(RODS_AXIS, None))
    jitted = jax.jit(step, in_shardings=(batch_spec, batch_spec))

    def run(qe0, qd0):
        times, qes, qds, energies = jitted(qe0, qd0)
        return dynamics.Trajectory(times=times, qes=qes, qds=qds,
                                   energies=energies)

    return run


def sharded_platform_statics(mesh: Mesh, robot, **kwargs):
    """Multi-chip parallel-continuum-robot workspace maps: platform
    wrenches ``(B, 6)`` (world force + moment) ->
    :class:`~.constrained.PlatformSolution` — each chip Newton-solves its
    local slab of the wrench family (:func:`~.constrained.solve_platform`
    is batched over leading axes of the applied wrench); robots in a
    family are independent, so no collectives."""
    from ..models import constrained

    def local(wrench):
        sol = constrained.solve_platform(
            robot, platform_force=wrench[..., :3],
            platform_moment=wrench[..., 3:], **kwargs)
        iters = jnp.full(wrench.shape[:1], sol.iterations)
        return (sol.qe, sol.platform_position, sol.platform_quaternion,
                sol.reaction_force, sol.reaction_moment,
                sol.residual_norm, iters, sol.converged)

    step = jax.shard_map(
        local, mesh=mesh,
        in_specs=P(RODS_AXIS, None),
        out_specs=(P(RODS_AXIS), P(RODS_AXIS), P(RODS_AXIS), P(RODS_AXIS),
                   P(RODS_AXIS), P(RODS_AXIS), P(RODS_AXIS), P(RODS_AXIS)),
        check_vma=False,
    )
    jitted = jax.jit(step, in_shardings=NamedSharding(mesh, P(RODS_AXIS,
                                                              None)))

    def solve(wrench):
        (qe, pos, quat, rf, rm, rnorm, iters, conv) = jitted(wrench)
        return constrained.PlatformSolution(
            qe=qe, platform_position=pos, platform_quaternion=quat,
            reaction_force=rf, reaction_moment=rm, residual_norm=rnorm,
            iterations=iters, converged=conv)

    return solve
