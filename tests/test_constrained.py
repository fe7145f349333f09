"""Constrained-tip BVPs and platform-coupled parallel continuum robots.

models/constrained.py generalizes the reference's free-tip cantilever
(`/root/reference/main.cpp:91-176`) to prescribed tip poses and rigid
platforms.  Gates are classical frame-analysis closed forms (propped
cantilever 3qL/8, fixed-fixed qL^2/12 and qL/2), exact nonlinear
identities (axial pin under tip load, uniform PCR compression), a
reduction to the unconstrained solver, and the compliance-symmetry law
of conservative systems.
"""

import numpy as np
import jax
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    constrained,
    cosserat,
    dynamics,
    rod,
)


def _cfg(n=16, ne=5, na=3, stiffness=(1.0, 1.0, 1.0), **kw):
    return dynamics.DynamicsConfig(
        statics=cosserat.StaticsConfig(rod=rod.RodConfig(n=n, ne=ne, na=na),
                                       stiffness=stiffness), **kw)


def test_propped_cantilever_reaction_three_eighths():
    """Uniform load q on a cantilever with a transverse tip prop: the
    classical redundant-frame result R = 3 q L / 8 (linear regime via a
    tiny load; the roller is tip_axes=(1, 2) — the axial pin of an
    inextensible leg is singular, see the module docstring)."""
    g = 1e-4
    cfg = _cfg(gravity=(0.0, 0.0, -g))
    sol = constrained.solve_tip_constrained(
        cfg, tip_position=jnp.asarray([1.0, 0.0, 0.0]), tip_axes=(1, 2),
        tol=1e-13)
    assert bool(sol.converged)
    np.testing.assert_allclose(float(sol.reaction_force[2]), 3.0 * g / 8.0,
                               rtol=1e-6)
    assert abs(float(sol.reaction_force[1])) < 1e-12
    # KKT multiplier == physical force: releasing the constraint and
    # APPLYING the reaction as a tip load reproduces the same equilibrium.
    free = dynamics.solve_contact_statics(
        cfg, tip_force=sol.reaction_force, tol=1e-13)
    np.testing.assert_allclose(np.asarray(free.qe), np.asarray(sol.qe),
                               atol=1e-11)


def test_fixed_fixed_end_moment_and_shear():
    """Welded (guided) tip under uniform load: end shear q L / 2 and end
    moment q L^2 / 12 — the fixed-fixed beam closed forms."""
    g = 1e-4
    cfg = _cfg(gravity=(0.0, 0.0, -g))
    sol = constrained.solve_tip_constrained(
        cfg, tip_position=jnp.asarray([1.0, 0.0, 0.0]), tip_axes=(1, 2),
        tip_quaternion=jnp.asarray([1.0, 0.0, 0.0, 0.0]), tol=1e-13)
    assert bool(sol.converged)
    np.testing.assert_allclose(float(sol.reaction_force[2]), g / 2.0,
                               rtol=1e-6)
    np.testing.assert_allclose(float(sol.reaction_moment[1]), g / 12.0,
                               rtol=1e-6)


def test_axial_pin_extensible_exact_nonlinear():
    """na = 6 leg, all-3-axes pin at the undeformed tip, axial tip load F:
    the reaction absorbs the load EXACTLY (any F, no linearization) and
    the rod stays undeformed."""
    cfg = _cfg(na=6, stiffness=(1.0, 1.0, 1.0, 80.0, 40.0, 40.0))
    f = jnp.asarray([0.7, 0.0, 0.0])
    sol = constrained.solve_tip_constrained(
        cfg, tip_position=jnp.asarray([1.0, 0.0, 0.0]), tip_force=f,
        tol=1e-12)
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.reaction_force),
                               -np.asarray(f), atol=1e-11)
    np.testing.assert_allclose(np.asarray(sol.qe), 0.0, atol=1e-11)


def test_large_deflection_pinned_tip_batched():
    """Large-deflection regime: a FAMILY of displaced pin targets solves
    in one batched call; constraints are satisfied to solver tolerance
    and the balance residual vanishes with the reaction as tip load."""
    cfg = _cfg(n=14, ne=4)
    targets = jnp.asarray([[0.96, 0.0, 0.12],
                           [0.93, 0.05, 0.18],
                           [0.97, -0.08, 0.06]])
    sol = constrained.solve_tip_constrained(cfg, tip_position=targets,
                                            tip_axes=(1, 2), tol=1e-10)
    assert bool(jnp.all(sol.converged))
    r, _ = cfg.state_full(sol.qe, 16)
    np.testing.assert_allclose(np.asarray(r[:, 0, 1:]),
                               np.asarray(targets[:, 1:]), atol=1e-9)
    res = dynamics._balance_residual_fn(
        cfg, sol.reaction_force, None, 16, None, None, None, None)(sol.qe)
    assert float(jnp.max(jnp.linalg.norm(res, axis=-1))) < 1e-9


def _vertical_pcr(ea=100.0, radius=0.3, ne=3):
    s = float(np.sqrt(2) / 2)
    qv = (s, 0.0, -s, 0.0)                 # local e1 -> world e3
    bases = tuple(
        (radius * np.cos(a), radius * np.sin(a), 0.0)
        for a in (0.0, 2 * np.pi / 3, 4 * np.pi / 3))
    cfg = _cfg(n=12, ne=ne, na=6,
               stiffness=(1.0, 1.0, 1.0, ea, 50.0, 50.0))
    return constrained.PlatformRobot(
        cfg=cfg, base_positions=bases, base_quaternions=(qv,) * 3,
        attach_points=bases)


def test_platform_single_leg_reduces_to_free_cantilever():
    """R = 1 with a platform force: the platform is unconstrained, so the
    coupled solve must equal the plain cantilever under that tip force —
    and the grip reaction must equal the applied force."""
    cfg = _cfg(n=12, ne=3, na=6, stiffness=(1.0, 1.0, 1.0, 100.0, 50.0, 50.0))
    robot = constrained.PlatformRobot(
        cfg=cfg, base_positions=((0.0, 0.0, 0.0),),
        base_quaternions=((1.0, 0.0, 0.0, 0.0),),
        attach_points=((0.0, 0.0, 0.0),))
    f = jnp.asarray([0.0, 0.01, -0.02])
    sol = constrained.solve_platform(robot, platform_force=f, tol=1e-11)
    assert bool(sol.converged)
    ref = dynamics.solve_contact_statics(cfg, tip_force=f, tol=1e-11)
    np.testing.assert_allclose(np.asarray(sol.qe[0]), np.asarray(ref.qe),
                               atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.reaction_force[0]),
                               np.asarray(f), atol=1e-10)


def test_platform_uniform_compression_exact():
    """Symmetric 3-leg PCR under a vertical platform load F: each leg
    carries F/3 axially and the platform sinks by F L / (3 EA) — exact
    for the constant-extension mode at ANY F below buckling."""
    ea, fz = 100.0, 0.6
    robot = _vertical_pcr(ea=ea)
    sol = constrained.solve_platform(
        robot, platform_force=jnp.asarray([0.0, 0.0, -fz]), tol=1e-11)
    assert bool(sol.converged)
    np.testing.assert_allclose(float(sol.platform_position[2]),
                               1.0 - fz / (3.0 * ea), atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.platform_position[:2]), 0.0,
                               atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(sol.platform_quaternion),
        np.asarray([1.0, 0.0, 0.0, 0.0]), atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.reaction_force[:, 2]),
                               -fz / 3.0, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sol.reaction_force[:, :2]), 0.0,
                               atol=1e-10)


def test_platform_compliance_symmetric():
    """The 6x6 platform compliance d(pose)/d(wrench) about the
    compressed rest state is SYMMETRIC to machine grade (Castigliano —
    legs hyperelastic, grips workless), probed by batched central finite
    differences: 12 perturbed solves in ONE device call.  Any
    force/moment frame-transport error in the platform rows breaks the
    F_x->rotvec_y vs M_y->p_x conjugate pairs.  (About a TILTED state
    the raw (p, rotvec)-chart compliance is symmetric only to O(phi) ~
    1e-3 — the dexp chart correction — measured 4e-4 at phi ~ 1e-3; the
    compressed state isolates the transport check at 1e-10.)"""
    robot = _vertical_pcr()
    w0 = jnp.asarray([0.0, 0.0, -0.3, 0.0, 0.0, 0.0])
    h = 1e-5
    eye = jnp.eye(6, dtype=jnp.float64)
    wrench = jnp.concatenate(
        [w0 + h * eye, w0 - h * eye], axis=0)           # (12, 6)
    sol = constrained.solve_platform(
        robot, platform_force=wrench[:, :3], platform_moment=wrench[:, 3:],
        tol=1e-12, max_iter=80)
    assert bool(jnp.all(sol.converged))
    # Pose chart conjugate to the (world force, world moment about the
    # platform origin) wrench: (position, world rotation vector).
    pos = np.asarray(sol.platform_position)
    quat = np.asarray(sol.platform_quaternion)
    rotvec = 2.0 * quat[:, 1:] / quat[:, :1]            # small angles
    pose = np.concatenate([pos, rotvec], axis=-1)       # (12, 6)
    comp = (pose[:6] - pose[6:]) / (2.0 * h)            # (6, 6) d pose/d w
    assert np.abs(comp).max() > 1e-2                    # non-trivial
    np.testing.assert_allclose(comp, comp.T,
                               atol=1e-8 * np.abs(comp).max())


def test_platform_lateral_portal_sway():
    """Two-leg portal frame, rigid girder, lateral load H in the frame
    plane: sway = H L^3/(24 EI) + H L/(2 GA) (fixed-fixed Timoshenko
    columns — the stiff axial couple pins the girder rotation), and the
    overturning moment H*L is carried by the axial force couple H L / d.
    Classical portal analysis, linear regime."""
    ei, ea, ga, d_sep, h_load = 1.0, 1e6, 5e3, 0.5, 1e-4
    s = float(np.sqrt(2) / 2)
    qv = (s, 0.0, -s, 0.0)                 # legs point up (world z)
    bases = ((-d_sep / 2, 0.0, 0.0), (d_sep / 2, 0.0, 0.0))
    cfg = _cfg(n=14, ne=5, na=6,
               stiffness=(1.0, ei, ei, ea, ga, ga))
    robot = constrained.PlatformRobot(
        cfg=cfg, base_positions=bases, base_quaternions=(qv,) * 2,
        attach_points=bases)
    sol = constrained.solve_platform(
        robot, platform_force=jnp.asarray([h_load, 0.0, 0.0]), tol=1e-13)
    assert bool(sol.converged)
    sway = float(sol.platform_position[0])
    expect = h_load / (24.0 * ei) + h_load / (2.0 * ga)
    np.testing.assert_allclose(sway, expect, rtol=1e-3)
    # Axial couple balances the overturning moment H * L about the base.
    fz = np.asarray(sol.reaction_force[:, 2])
    np.testing.assert_allclose(abs(fz[1] - fz[0]), h_load * 1.0 / d_sep,
                               rtol=1e-3)
    np.testing.assert_allclose(fz.sum(), 0.0, atol=1e-10)


def test_platform_stability_single_leg_euler_column():
    """R = 1 (free platform): the reduced Hessian is the leg's own, and
    the vertical leg under a dead axial platform load loses stability at
    the Euler cantilever load pi^2 EI / 4 L^2 = 2.467."""
    s = float(np.sqrt(2) / 2)
    cfg = _cfg(n=12, ne=4, na=6,
               stiffness=(1.0, 1.0, 1.0, 1e4, 1e3, 1e3))
    robot = constrained.PlatformRobot(
        cfg=cfg, base_positions=((0.0, 0.0, 0.0),),
        base_quaternions=((s, 0.0, -s, 0.0),),
        attach_points=((0.0, 0.0, 0.0),))
    euler = np.pi ** 2 / 4.0
    st = constrained.platform_stability(
        robot, platform_force=jnp.asarray([0.0, 0.0, -0.5 * euler]))
    assert bool(st.solution.converged) and bool(st.stable)
    lam = constrained.platform_critical_load(
        robot, unit_force=(0.0, 0.0, -1.0), lam_lo=1.5, lam_hi=3.5,
        bisect_steps=10, tol=1e-9)
    np.testing.assert_allclose(lam, euler, rtol=1e-2)


def test_platform_portal_sway_buckling_two_modes():
    """Two-leg portal under total vertical load — the 3D mode competition:

    ISOTROPIC legs buckle OUT of the frame plane first, where the girder
    offers no overturning resistance (legs separated along x, sway along
    y): two parallel cantilevers, lambda_cr = 2 pi^2 EI / 4 L^2 = 4.93.
    BRACING the out-of-plane bending (EI_z = 50) exposes the classical
    IN-plane sway portal: fixed-guided columns (girder rotation pinned by
    the stiff axial couple), lambda_cr = 2 pi^2 EI / L^2 = 19.74.  Both
    recovered to <1% by the same bisection."""
    s = float(np.sqrt(2) / 2)
    bases = ((-0.25, 0.0, 0.0), (0.25, 0.0, 0.0))
    qv = ((s, 0.0, -s, 0.0),) * 2
    cfg = _cfg(n=12, ne=4, na=6,
               stiffness=(1.0, 1.0, 1.0, 1e6, 1e4, 1e4))
    robot = constrained.PlatformRobot(
        cfg=cfg, base_positions=bases, base_quaternions=qv,
        attach_points=bases)
    lam = constrained.platform_critical_load(
        robot, unit_force=(0.0, 0.0, -1.0), lam_lo=3.0, lam_hi=7.0,
        bisect_steps=9, tol=1e-9)
    np.testing.assert_allclose(lam, 2.0 * np.pi ** 2 / 4.0, rtol=1e-2)
    # local e3 bends the leg in the world y (out-of-plane) direction
    cfg2 = _cfg(n=12, ne=4, na=6,
                stiffness=(1.0, 1.0, 50.0, 1e6, 1e4, 1e4))
    robot2 = constrained.PlatformRobot(
        cfg=cfg2, base_positions=bases, base_quaternions=qv,
        attach_points=bases)
    lam2 = constrained.platform_critical_load(
        robot2, unit_force=(0.0, 0.0, -1.0), lam_lo=10.0, lam_hi=26.0,
        bisect_steps=9, tol=1e-9)
    np.testing.assert_allclose(lam2, 2.0 * np.pi ** 2, rtol=1e-2)


def test_platform_ik_recovers_forward_pose():
    """Tendon-driven PCR inverse actuation: forward-solve a tension set,
    then recover the platform position from platform_ik — pose error
    below 1e-6 (tensions may be redundant; the pose is the contract)."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import tendon

    s = float(np.sqrt(2) / 2)
    bases = tuple((0.25 * np.cos(a), 0.25 * np.sin(a), 0.0)
                  for a in (0.0, 2 * np.pi / 3, 4 * np.pi / 3))
    cfg = _cfg(n=8, ne=2, na=6, stiffness=(1.0, 1.0, 1.0, 100.0, 50.0, 50.0),
               tendons=(tendon.Tendon(offset=(0.0, 0.0, 0.04)),))
    robot = constrained.PlatformRobot(
        cfg=cfg, base_positions=bases, base_quaternions=((s, 0.0, -s, 0.0),) * 3,
        attach_points=bases)
    t_true = jnp.asarray([[0.8], [0.2], [0.1]])
    fwd = constrained.solve_platform(robot, tension=t_true, tol=1e-11)
    assert bool(fwd.converged)
    target = fwd.platform_position
    ik = constrained.platform_ik(robot, target_position=target,
                                 gn_steps=8, tol=1e-11)
    assert float(ik.pose_error) < 1e-6
    assert float(jnp.min(ik.tension)) >= 0.0
