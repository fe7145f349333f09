"""Sharding + differentiability tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    calibration,
    rod,
)
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.parallel import (
    mesh as mesh_lib,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

CFG = rod.RodConfig(n=8)


def test_sharded_solve_matches_single_device():
    mesh = mesh_lib.make_mesh(8)
    rng = np.random.default_rng(0)
    qes = jnp.asarray(rng.standard_normal((64, 9)), jnp.float32)
    sharded = mesh_lib.shard_rods(mesh, qes)
    solve = mesh_lib.sharded_rod_shape(mesh, method="picard", cfg=CFG)
    q, r = solve(sharded)
    ref = rod.rod_shape(qes, cfg=CFG, method="picard")
    np.testing.assert_allclose(np.asarray(q), np.asarray(ref.quaternions),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                               rtol=1e-5, atol=1e-6)
    # Output really is sharded over the rods axis.
    assert len(q.sharding.device_set) == 8


def test_gradients_flow_through_spectral_solve():
    """jax.grad through the full collocation solve (new capability —
    the reference is forward-only)."""
    def tip_x(qe):
        return rod.rod_shape(qe, cfg=CFG, method="picard").tip_position[0]

    qe = jnp.asarray(np.zeros(9), jnp.float32)
    g = jax.grad(tip_x)(qe)
    assert g.shape == (9,)
    # Finite-difference check on one coordinate.
    eps = 1e-3
    e3 = jnp.zeros(9).at[3].set(eps)
    fd = (tip_x(qe + e3) - tip_x(qe - e3)) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g[3]), np.asarray(fd), rtol=1e-3, atol=1e-4)


def test_calibration_training_step_reduces_loss():
    rng = np.random.default_rng(5)
    feats = jnp.asarray(rng.standard_normal((32, 4)), jnp.float32)
    # Targets generated from a known decoder => fit is achievable.
    true_params = calibration.init_params(4, CFG, scale=0.3, seed=9)
    targets = calibration.predict_tips(true_params, feats, CFG, iters=8)

    params = calibration.init_params(4, CFG, scale=0.0, seed=1)
    step, optimizer = calibration.make_train_step(cfg=CFG, iters=8)
    opt_state = optimizer.init(params)
    jit_step = jax.jit(step)
    loss0 = calibration.calibration_loss(params, feats, targets, CFG, iters=8)
    for _ in range(50):
        params, opt_state, loss = jit_step(params, opt_state, feats, targets)
    assert float(loss) < 0.5 * float(loss0)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as graft

    graft.dryrun_multichip(8)


def test_dryrun_multichip_self_provisions(monkeypatch):
    """The driver contract: outside pytest (no conftest bootstrap, possibly
    an already-initialized 1-device backend), dryrun_multichip must provision
    its own 8-virtual-CPU-device mesh via subprocess re-exec."""
    import __graft_entry__ as graft

    monkeypatch.delenv("XLA_FLAGS", raising=False)
    monkeypatch.setenv("JAX_PLATFORMS", "")
    graft._respawn_dryrun(8)


def test_entry_compiles():
    import __graft_entry__ as graft

    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    q, r = out
    assert q.shape == (256, 15, 4)
    assert r.shape == (256, 15, 3)


def test_implicit_jvp_matches_unrolled_differentiation():
    """IFT custom JVP == differentiating through the unrolled iteration."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        collocation as coll,
    )

    grid = CFG.grid
    rng = np.random.default_rng(11)
    m = jnp.asarray(rng.standard_normal((CFG.n - 1, 4, 4)) * 0.3)
    rhs = jnp.asarray(rng.standard_normal((CFG.n - 1, 4)))

    def f_implicit(mm):
        return coll.solve_ivp_picard_implicit(grid, mm, rhs, 30)

    def f_unrolled(mm):
        return coll.solve_ivp_picard(grid, mm, rhs=rhs, iters=30)

    j1 = jax.jacfwd(f_implicit)(m)
    j2 = jax.jacfwd(f_unrolled)(m)
    np.testing.assert_allclose(np.asarray(j1), np.asarray(j2),
                               rtol=1e-7, atol=1e-9)


def test_sharded_fused_kernel_matches_picard():
    """Pallas kernel under shard_map: each chip solves its local slab."""
    mesh = mesh_lib.make_mesh(8)
    rng = np.random.default_rng(3)
    qes = jnp.asarray(rng.standard_normal((1024, 9)), jnp.float32)
    sharded = mesh_lib.shard_rods(mesh, qes)
    solve = mesh_lib.sharded_rod_shape(mesh, method="fused", tile=128,
                                       interpret=True)
    q, r = solve(sharded)
    ref = rod.rod_shape(qes, cfg=rod.RodConfig(), method="picard", iters=20)
    np.testing.assert_allclose(np.asarray(r), np.asarray(ref.positions),
                               atol=5e-5)
    assert len(q.sharding.device_set) == 8


def test_sharded_statics_matches_unsharded():
    """Multi-chip batched statics: each chip Newton-solves its own slab
    under shard_map (no collectives); results equal the single-device
    batched solve."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        cosserat,
        rod,
    )
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.parallel import (
        mesh as pmesh,
    )

    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(21)
    loads = jnp.asarray(rng.uniform(-0.4, 0.4, (64, 3)), jnp.float32)
    solve = pmesh.sharded_solve_statics(mesh, cfg=cfg, tol=1e-5, max_iter=12,
                                        iters=16, interpret=True)
    sol = solve(pmesh.shard_rods(mesh, loads))
    assert np.asarray(sol.converged).all()
    ref = cosserat.solve_statics_batched(loads, cfg=cfg, tol=1e-5,
                                         max_iter=12, iters=16,
                                         interpret=True)
    np.testing.assert_allclose(np.asarray(sol.qe), np.asarray(ref.qe),
                               atol=2e-5)


def test_sharded_simulate_matches_unsharded():
    """Multi-chip rod dynamics: each chip scans its local family of
    initial conditions through the RK4 time loop under shard_map
    (trajectories independent, no collectives); results equal the
    single-device batched integration."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        cosserat,
        dynamics,
        rod,
    )
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.parallel import (
        mesh as pmesh,
    )

    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=8))
    cfg = dynamics.DynamicsConfig(statics=scfg, rho_a=1.0, rho_i=1e-2)
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(7)
    qe0 = jnp.asarray(rng.uniform(-0.2, 0.2, (16, 9)), jnp.float32)
    qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (16, 9)), jnp.float32)
    sim = pmesh.sharded_simulate(mesh, cfg=cfg, dt=0.01, steps=3, iters=8)
    traj = sim(pmesh.shard_rods(mesh, qe0), pmesh.shard_rods(mesh, qd0))
    assert traj.qes.shape == (3, 16, 9)
    assert len(traj.qes.sharding.device_set) == 8
    ref = dynamics.simulate(qe0, qd0, cfg, dt=0.01, steps=3, iters=8)
    np.testing.assert_allclose(np.asarray(traj.qes), np.asarray(ref.qes),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(traj.energies),
                               np.asarray(ref.energies), rtol=2e-4)


def test_sharded_actuated_statics_matches_unsharded():
    """Multi-chip tendon workspace sweep: each chip Newton-solves its slab
    of actuation commands under shard_map; results equal the
    single-device batched actuated solve."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        cosserat,
        dynamics,
        rod,
        tendon,
    )
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.parallel import (
        mesh as pmesh,
    )

    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=8))
    cfg = dynamics.DynamicsConfig(
        statics=scfg,
        tendons=(tendon.Tendon(offset=(0.0, 0.0, 0.05)),
                 tendon.Tendon(offset=(0.0, 0.05, 0.0))))
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(11)
    tensions = jnp.asarray(rng.uniform(0.0, 1.5, (16, 2)), jnp.float32)
    act = pmesh.sharded_actuated_statics(mesh, cfg=cfg, tol=1e-5,
                                         max_iter=10, iters=10)
    sol = act(pmesh.shard_rods(mesh, tensions))
    assert np.asarray(sol.converged).all()
    assert len(sol.qe.sharding.device_set) == 8
    ref = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros((16, 9), jnp.float32), tension=tensions,
        tol=1e-5, max_iter=10, iters=10)
    np.testing.assert_allclose(np.asarray(sol.qe), np.asarray(ref.qe),
                               atol=3e-5)


def test_sharded_magnetic_statics_matches_unsharded():
    """Multi-chip magnetic field-workspace sweep: each chip Newton-solves
    its slab of applied-field commands under shard_map; results equal the
    single-device batched magnetic solve."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        cosserat,
        dynamics,
        magnetics,
        rod,
    )
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.parallel import (
        mesh as pmesh,
    )

    scfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=8))
    cfg = dynamics.DynamicsConfig(
        statics=scfg, magnets=(magnetics.Magnet(moment=(0.5, 0.0, 0.0)),))
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(13)
    fields = jnp.asarray(rng.uniform(-0.3, 0.3, (16, 3)), jnp.float32)
    mag = pmesh.sharded_magnetic_statics(mesh, cfg=cfg, tol=1e-5,
                                         max_iter=10, iters=10)
    sol = mag(pmesh.shard_rods(mesh, fields))
    assert np.asarray(sol.converged).all()
    assert len(sol.qe.sharding.device_set) == 8
    ref = dynamics.solve_contact_statics(
        cfg, qe0=jnp.zeros((16, 9), jnp.float32), b_field=fields,
        tol=1e-5, max_iter=10, iters=10)
    np.testing.assert_allclose(np.asarray(sol.qe), np.asarray(ref.qe),
                               atol=3e-5)


def test_sharded_segmented_simulate_matches_unsharded():
    """Multi-chip MULTI-SEGMENT dynamics: the chained-kinematic-map RK4
    loop (dynamics.SegmentedDynamicsConfig) under shard_map equals the
    single-device batched integration — the hooks keep every per-sample
    junction-chain solve local to its chip."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        dynamics,
        segment_statics,
        segments,
    )
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.parallel import (
        mesh as pmesh,
    )

    sscfg = segment_statics.SegmentedStaticsConfig(
        rods=segments.uniform_segments(2, n=8))
    cfg = dynamics.SegmentedDynamicsConfig(statics=sscfg, rho_a=1.0,
                                           rho_i=1e-2)
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(11)
    qe0 = jnp.asarray(rng.uniform(-0.2, 0.2, (16, cfg.nq)), jnp.float32)
    qd0 = jnp.asarray(rng.uniform(-0.2, 0.2, (16, cfg.nq)), jnp.float32)
    sim = pmesh.sharded_simulate(mesh, cfg=cfg, dt=0.01, steps=3, iters=8)
    traj = sim(pmesh.shard_rods(mesh, qe0), pmesh.shard_rods(mesh, qd0))
    assert traj.qes.shape == (3, 16, cfg.nq)
    assert len(traj.qes.sharding.device_set) == 8
    ref = dynamics.simulate(qe0, qd0, cfg, dt=0.01, steps=3, iters=8)
    # f32 grade, slightly looser than the single-rod gate: sharded vs
    # unsharded compile to different fusion orders and the junction
    # chain amplifies the roundoff (measured 4/864 elements past 2e-6).
    np.testing.assert_allclose(np.asarray(traj.qes), np.asarray(ref.qes),
                               rtol=1e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(traj.energies),
                               np.asarray(ref.energies), rtol=2e-4)


def test_sharded_platform_statics_matches_unsharded():
    """Multi-chip PCR workspace map: each chip Newton-solves its slab of
    platform wrenches under shard_map; results equal the single-device
    batched coupled solve."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        constrained,
        cosserat,
        dynamics,
        rod,
    )
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.parallel import (
        mesh as pmesh,
    )

    s = float(np.sqrt(2) / 2)
    cfg = dynamics.DynamicsConfig(statics=cosserat.StaticsConfig(
        rod=rod.RodConfig(n=8, ne=2, na=6),
        stiffness=(1.0, 1.0, 1.0, 50.0, 25.0, 25.0)))
    bases = ((-0.2, 0.0, 0.0), (0.2, 0.0, 0.0))
    robot = constrained.PlatformRobot(
        cfg=cfg, base_positions=bases,
        base_quaternions=((s, 0.0, -s, 0.0),) * 2, attach_points=bases)
    mesh = pmesh.make_mesh(8)
    rng = np.random.default_rng(7)
    wrench = jnp.asarray(rng.uniform(-0.02, 0.02, (16, 6)), jnp.float64)
    solve = pmesh.sharded_platform_statics(mesh, robot, tol=1e-8,
                                           max_iter=25, iters=10)
    sol = solve(pmesh.shard_rods(mesh, wrench))
    assert np.asarray(sol.converged).all()
    assert len(sol.qe.sharding.device_set) == 8
    ref = constrained.solve_platform(
        robot, platform_force=wrench[:, :3], platform_moment=wrench[:, 3:],
        tol=1e-8, max_iter=25, iters=10)
    np.testing.assert_allclose(np.asarray(sol.qe), np.asarray(ref.qe),
                               atol=1e-8)
    np.testing.assert_allclose(np.asarray(sol.platform_position),
                               np.asarray(ref.platform_position), atol=1e-8)
