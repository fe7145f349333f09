"""Cosserat statics BVP: physical gates + Newton convergence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    cosserat,
    rod,
)

CFG16 = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
CFG32 = cosserat.StaticsConfig(rod=rod.RodConfig(n=32))


def test_zero_load_zero_strain():
    sol = cosserat.solve_statics(jnp.zeros(3), cfg=CFG16)
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.qe), np.zeros(9), atol=1e-9)


def test_pure_tip_moment_constant_curvature():
    """Tip couple M_y: internal moment is uniform -> kappa_y = M/EI exactly,
    i.e. only the (component y, mode P0) coefficient is non-zero."""
    m = 0.8
    sol = cosserat.solve_statics(
        jnp.zeros(3), tip_moment=jnp.asarray([0.0, m, 0.0]), cfg=CFG16,
    )
    assert bool(sol.converged)
    qe = np.asarray(sol.qe)
    expected = np.zeros(9)
    expected[3] = m  # component a=1 (kappa_y), mode e=0, H=1
    np.testing.assert_allclose(qe, expected, atol=1e-6)


def test_small_force_matches_linear_beam_theory():
    """Tip force F_z << EI/L^2: Euler-Bernoulli tip deflection F L^3 / (3 EI)."""
    f = 1e-3
    sol = cosserat.solve_statics(jnp.asarray([0.0, 0.0, f]), cfg=CFG16)
    assert bool(sol.converged)
    shape = rod.rod_shape(sol.qe, cfg=CFG16.rod, method="picard")
    tip_dz = float(shape.tip_position[2])
    assert tip_dz == pytest.approx(f / 3.0, rel=2e-3)


def test_moderate_force_grid_convergence():
    """N=16 and N=32 must agree (spectral convergence of the BVP)."""
    f = jnp.asarray([0.0, 0.0, 0.5])
    qe16 = np.asarray(cosserat.solve_statics(f, cfg=CFG16).qe)
    qe32 = np.asarray(cosserat.solve_statics(f, cfg=CFG32).qe)
    np.testing.assert_allclose(qe16, qe32, atol=1e-6)


def test_residual_vanishes_at_solution():
    f = jnp.asarray([0.1, 0.0, 0.4])
    sol = cosserat.solve_statics(f, cfg=CFG16)
    res = cosserat.equilibrium_residual(sol.qe, f, jnp.zeros(3), CFG16)
    assert float(jnp.linalg.norm(res)) < 1e-8


def test_load_continuation_large_deflection():
    """Continuation to alpha = F L^2 / EI = 3 (strongly nonlinear elastica).

    Tip positions cross-checked against the classic Bisshopp–Drucker
    elastica solution regime: deflection is large but the rod does not
    self-intersect; x_tip shrinks monotonically with load."""
    loads = jnp.asarray([[0, 0, 0.5], [0, 0, 1.0], [0, 0, 2.0], [0, 0, 3.0]])
    sols = cosserat.load_continuation(loads, cfg=CFG32)
    assert all(bool(s.converged) for s in sols)
    tips = [
        np.asarray(rod.rod_shape(s.qe, cfg=CFG32.rod, method="picard").tip_position)
        for s in sols
    ]
    xs = [t[0] for t in tips]
    zs = [t[2] for t in tips]
    assert all(xs[i + 1] < xs[i] for i in range(3)), "x_tip must shrink with load"
    assert all(zs[i + 1] > zs[i] for i in range(3)), "z_tip must grow with load"
    # Bisshopp–Drucker: at alpha = F L^2 / EI = 3, delta/L ~ 0.6; loose gate.
    assert 0.4 < zs[-1] < 0.75
    assert 0.5 < xs[-1] < 0.85


def test_statics_vmap_over_loads():
    loads = jnp.asarray([[0.0, 0.0, 0.2], [0.0, 0.1, 0.3], [0.05, 0.0, 0.1]])
    vsol = jax.vmap(lambda f: cosserat.solve_statics(f, cfg=CFG16))(loads)
    assert vsol.qe.shape == (3, 9)
    for i in range(3):
        single = cosserat.solve_statics(loads[i], cfg=CFG16)
        np.testing.assert_allclose(np.asarray(vsol.qe[i]), np.asarray(single.qe),
                                   atol=1e-7)


def test_intrinsic_curvature_rest_state():
    """With kappa0 = qe and no load, qe = kappa0 is the equilibrium."""
    kappa0 = np.zeros(9)
    kappa0[3] = 1.2
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16), kappa0=tuple(kappa0))
    sol = cosserat.solve_statics(jnp.zeros(3), cfg=cfg, qe0=jnp.asarray(kappa0))
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.qe), kappa0, atol=1e-7)


def test_stiffness_scaling():
    """Doubling EI halves the curvature response to a tip moment."""
    m = jnp.asarray([0.0, 0.5, 0.0])
    cfg2 = cosserat.StaticsConfig(rod=rod.RodConfig(n=16), stiffness=(2.0, 2.0, 2.0))
    qe1 = np.asarray(cosserat.solve_statics(jnp.zeros(3), m, CFG16).qe)
    qe2 = np.asarray(cosserat.solve_statics(jnp.zeros(3), m, cfg2).qe)
    np.testing.assert_allclose(qe2, qe1 / 2.0, atol=1e-7)


def test_partial_integral_matrix_exact():
    """Tail-integral operator must integrate polynomials exactly."""
    import numpy as np
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        chebyshev,
    )

    n = 16
    x = chebyshev.cgl_points(n)
    t = chebyshev.partial_integral_matrix(n)
    for deg in range(6):
        f = x**deg
        exact = (1.0 - x ** (deg + 1)) / (deg + 1)  # int_x^1 s^deg ds
        np.testing.assert_allclose(t @ f, exact, atol=1e-12)


def test_uniform_load_matches_linear_beam_theory():
    """Small uniform load w_z: Euler-Bernoulli tip deflection w L^4 / (8 EI)."""
    w = 1e-3
    cfg = cosserat.StaticsConfig(
        rod=rod.RodConfig(n=16), distributed_force=(0.0, 0.0, w)
    )
    sol = cosserat.solve_statics(jnp.zeros(3), cfg=cfg)
    assert bool(sol.converged)
    shape = rod.rod_shape(sol.qe, cfg=cfg.rod, method="picard")
    tip_dz = float(shape.tip_position[2])
    assert tip_dz == pytest.approx(w / 8.0, rel=3e-3)


def test_gravity_plus_tip_force_superpose_in_linear_regime():
    w, f = 1e-4, 1e-4
    cfg_w = cosserat.StaticsConfig(rod=rod.RodConfig(n=16),
                                   distributed_force=(0.0, 0.0, w))
    both = cosserat.solve_statics(jnp.asarray([0.0, 0.0, f]), cfg=cfg_w)
    only_w = cosserat.solve_statics(jnp.zeros(3), cfg=cfg_w)
    cfg0 = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    only_f = cosserat.solve_statics(jnp.asarray([0.0, 0.0, f]), cfg=cfg0)
    np.testing.assert_allclose(
        np.asarray(both.qe), np.asarray(only_w.qe) + np.asarray(only_f.qe),
        atol=1e-8,
    )


def test_elastica_matches_bisshopp_drucker_table():
    """Tip deflections vs the classic Bisshopp-Drucker (1945) elastica
    solution: delta/L = 0.30172 (alpha=1), 0.49346 (alpha=2),
    0.60325 (alpha=3).  Validates the geometrically exact solve to ~1e-3."""
    loads = jnp.asarray([[0, 0, 0.5], [0, 0, 1.0], [0, 0, 2.0], [0, 0, 3.0]])
    sols = cosserat.load_continuation(loads, cfg=CFG32)
    tips = {
        float(l[2]): float(
            rod.rod_shape(s.qe, cfg=CFG32.rod, method="picard").tip_position[2]
        )
        for l, s in zip(loads, sols)
    }
    assert tips[1.0] == pytest.approx(0.30172, abs=2e-3)
    assert tips[2.0] == pytest.approx(0.49346, abs=2e-3)
    assert tips[3.0] == pytest.approx(0.60325, abs=2e-3)


def test_gauss_jordan_solve_matches_lapack():
    """ops/smallsolve: the TPU-native batched tiny solve (the LAPACK
    batched-LU replacement) must match to roundoff, pivoting included."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        smallsolve,
    )

    rng = np.random.default_rng(7)
    a = rng.standard_normal((64, 9, 9))
    b = rng.standard_normal((64, 9, 2))
    x = smallsolve.gauss_jordan_solve(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), np.linalg.solve(a, b),
                               atol=1e-11)
    # a permutation matrix has zero leading pivots everywhere: pivoting test
    perm = np.stack([np.eye(6)[rng.permutation(6)] for _ in range(8)])
    b1 = rng.standard_normal((8, 6))
    x1 = smallsolve.gauss_jordan_solve(jnp.asarray(perm), jnp.asarray(b1))
    np.testing.assert_allclose(np.asarray(x1),
                               np.linalg.solve(perm, b1[..., None])[..., 0],
                               atol=1e-12)


def test_solve_statics_batched_matches_per_sample():
    """The fused-path batched Newton == vmapped per-sample Newton (both
    converge to the same equilibria at tol)."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    rng = np.random.default_rng(11)
    loads = jnp.asarray(rng.uniform(-0.4, 0.4, (16, 3)), jnp.float32)
    ref = jax.vmap(lambda f: cosserat.solve_statics(
        f, cfg=cfg, tol=1e-5, max_iter=12, iters=16))(loads)
    new = cosserat.solve_statics_batched(loads, cfg=cfg, tol=1e-5,
                                         max_iter=12, iters=16,
                                         interpret=True)
    assert np.asarray(new.converged).all()
    np.testing.assert_allclose(np.asarray(new.qe), np.asarray(ref.qe),
                               atol=2e-5)


def test_solve_statics_batched_6dof():
    cfg6 = cosserat.StaticsConfig(
        rod=rod.RodConfig(n=16, na=6, ne=3),
        stiffness=(1.0, 1.0, 1.0, 50.0, 10.0, 10.0),
    )
    rng = np.random.default_rng(12)
    loads = jnp.asarray(rng.uniform(-0.3, 0.3, (8, 3)), jnp.float32)
    new = cosserat.solve_statics_batched(loads, cfg=cfg6, tol=1e-5,
                                         max_iter=12, iters=16,
                                         interpret=True)
    assert np.asarray(new.converged).all()
    ref = jax.vmap(lambda f: cosserat.solve_statics(
        f, cfg=cfg6, tol=1e-5, max_iter=12, iters=16))(loads)
    np.testing.assert_allclose(np.asarray(new.qe), np.asarray(ref.qe),
                               atol=2e-5)


def test_dd_residual_newton_hits_1e9_tolerance():
    """VERDICT r1 #9: the double-word statics residual + dd strain iterate
    lets device-side Newton converge to 1e-9-class TRUE residuals (the f32
    path floors near the f32 ulp of qe, ~1e-8)."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    rng = np.random.default_rng(1)
    loads = jnp.asarray(rng.uniform(-0.4, 0.4, (8, 3)), jnp.float32)
    sol = cosserat.solve_statics_batched(loads, cfg=cfg, tol=1e-9,
                                         max_iter=25, iters=16,
                                         interpret=True, dd_residual=True)
    assert np.asarray(sol.converged).all()
    # TRUE residual, evaluated in f64 at the dd strain
    qe64 = np.asarray(sol.qe, np.float64) + np.asarray(sol.qe_lo, np.float64)
    res = cosserat.equilibrium_residual(
        jnp.asarray(qe64), jnp.asarray(loads, jnp.float64)[:, None, :],
        jnp.zeros(3, jnp.float64), cfg, iters=48)
    assert float(jnp.max(jnp.abs(res))) < 1e-9


def test_dd_residual_matches_f64_definition():
    """equilibrium_residual_dd == the f64 residual (unnormalized-R variant
    differs by O(||q|-1|) ~ 1e-12) up to the f32 output cast."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    rng = np.random.default_rng(2)
    loads = jnp.asarray(rng.uniform(-0.4, 0.4, (4, 3)), jnp.float32)
    qe = jnp.asarray(rng.standard_normal((4, 9)) * 0.2, jnp.float32)
    res_dd = cosserat.equilibrium_residual_dd(qe, loads, jnp.zeros(3), cfg)
    res64 = cosserat.equilibrium_residual(
        jnp.asarray(qe, jnp.float64),
        jnp.asarray(loads, jnp.float64)[:, None, :],
        jnp.zeros(3, jnp.float64), cfg, iters=40)
    scale = float(jnp.max(jnp.abs(res64)))
    assert float(jnp.max(jnp.abs(res_dd - res64))) < 1e-7 * max(scale, 1.0)


def test_snap_through_riks_traces_where_newton_jumps():
    """VERDICT r1 #8: combined tip force + moment drives the rod through a
    near-singular (bifurcation-bubble) region at lambda ~ 5.6 where
    load-controlled warm-started Newton SNAPS to a distant branch
    (discontinuous |dqe| ~ 0.9 even at dlambda = 0.05), while Riks
    arc-length continuation walks a continuous equilibrium path through
    the same window."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    F = jnp.asarray([1.0, 0.01, 0.0], jnp.float64)
    M = jnp.asarray([0.0, -2.0, 0.0], jnp.float64)
    step = jax.jit(lambda f, m, q0: cosserat.solve_statics(
        f, tip_moment=m, cfg=cfg, qe0=q0, tol=1e-10, max_iter=50,
        method="dense"))

    # Warm onto the connected branch (coarser stepping here can land on a
    # different solution sheet and miss the snap).
    qe = jnp.zeros(9, jnp.float64)
    for lam in np.arange(0.4, 5.41, 0.2):
        sol = step(lam * F, lam * M, qe)
        assert bool(sol.converged)
        qe = sol.qe

    # (a) load-controlled Newton: the branch is lost discontinuously when
    # a load step lands inside the near-singular sliver (lam ~ 5.58-5.62,
    # det(J) crosses zero twice) — the Newton step blows up along the soft
    # out-of-plane direction and converges on a distant sheet.
    jumps, qe_n = [], qe
    for lam in np.arange(5.45, 5.80, 0.025):
        sol = step(lam * F, lam * M, qe_n)
        if bool(sol.converged):
            jumps.append(float(jnp.linalg.norm(sol.qe - qe_n)))
            qe_n = sol.qe
        else:
            jumps.append(np.inf)
    assert max(jumps) > 0.5, jumps   # snap: jump or outright failure

    # (b) Riks: walks CONTINUOUSLY through the limit point — lambda rises
    # to the fold (~5.577), turns BACK (the decreasing stretch below is
    # the signature load-controlled stepping can never produce), and
    # continues on the post-fold branch.
    path = cosserat.arc_length_continuation(
        F, cfg=cfg, tip_moment_ref=tuple(np.asarray(M)), qe0=qe,
        lambda_start=5.4, ds=0.1, steps=25, tol=1e-9, method="dense")
    assert np.asarray(path.converged).all()
    lams = np.asarray(path.lambdas)
    assert (np.diff(lams) < -1e-4).any()      # limit point traversed
    assert lams.max() > 5.55                  # reached the fold region
    dq = np.linalg.norm(np.diff(np.asarray(path.qes), axis=0), axis=1)
    assert dq.max() < 0.25, dq.max()  # no branch jump anywhere on the path


def test_follower_load_differs_from_dead_load():
    """follower=True rotates the tip force with the deformation; at finite
    deflection the equilibrium must differ from the dead-load one, and at
    zero deflection they coincide."""
    cfg_dead = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    cfg_fol = cosserat.StaticsConfig(rod=rod.RodConfig(n=16), follower=True)
    F = jnp.asarray([0.0, 0.0, 0.8])
    sd = cosserat.solve_statics(F, cfg=cfg_dead, tol=1e-9)
    sf = cosserat.solve_statics(F, cfg=cfg_fol, tol=1e-9)
    assert bool(sd.converged) and bool(sf.converged)
    assert float(jnp.linalg.norm(sd.qe - sf.qe)) > 1e-2
    # tiny load: follower == dead to first order
    Ft = jnp.asarray([0.0, 0.0, 1e-4])
    sd0 = cosserat.solve_statics(Ft, cfg=cfg_dead, tol=1e-12)
    sf0 = cosserat.solve_statics(Ft, cfg=cfg_fol, tol=1e-12)
    np.testing.assert_allclose(np.asarray(sd0.qe), np.asarray(sf0.qe),
                               atol=1e-7)


def test_batched_riks_matches_host_paths():
    """arc_length_continuation_batched == B independent host Riks walks
    (smooth elastica branches, f32-path tolerance)."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    load_refs = np.asarray([[0.0, 0.0, 0.6],
                            [0.3, 0.0, 0.4],
                            [0.0, 0.2, -0.5]], np.float32)
    batched = cosserat.arc_length_continuation_batched(
        load_refs, cfg=cfg, ds=0.25, steps=8, tol=2e-5, iters=16,
        interpret=True)
    assert np.asarray(batched.converged).all()
    for s in range(load_refs.shape[0]):
        host = cosserat.arc_length_continuation(
            jnp.asarray(load_refs[s], jnp.float64), cfg=cfg, ds=0.25,
            steps=8, tol=1e-9, method="picard")
        assert np.asarray(host.converged).all()
        # f32 arc positions drift ~1e-3 over 8 steps (corrector tol 2e-5
        # compounds through the tangent); the PATH is the same.
        np.testing.assert_allclose(np.asarray(batched.lambdas)[:, s],
                                   np.asarray(host.lambdas), atol=5e-3)
        np.testing.assert_allclose(np.asarray(batched.qes)[:, s],
                                   np.asarray(host.qes), atol=2e-2)


def test_batched_riks_dd_residual_tight_tol():
    """dd-grade batched Riks (VERDICT r2 next #2): the corrector converges
    at tol 1e-8 on device (the f32 tier floors near 1e-5), and the dd path
    points agree with the host f64 dense walker at ~1e-6 — a 1000x
    tightening of the f32-tier gate."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    load_refs = np.asarray([[0.0, 0.0, 0.6], [0.3, 0.0, 0.4]], np.float32)
    batched = cosserat.arc_length_continuation_batched(
        load_refs, cfg=cfg, ds=0.25, steps=5, tol=1e-8, max_corrector=20,
        iters=16, interpret=True, dd_residual=True)
    assert np.asarray(batched.converged).all()
    lam = (np.asarray(batched.lambdas, np.float64)
           + np.asarray(batched.lambdas_lo, np.float64))
    qes = (np.asarray(batched.qes, np.float64)
           + np.asarray(batched.qes_lo, np.float64))
    for s in range(2):
        host = cosserat.arc_length_continuation(
            jnp.asarray(load_refs[s], jnp.float64), cfg=cfg, ds=0.25,
            steps=5, tol=1e-11, method="dense")
        assert np.asarray(host.converged).all()
        np.testing.assert_allclose(lam[:, s], np.asarray(host.lambdas),
                                   atol=1e-6)
        np.testing.assert_allclose(qes[:, s], np.asarray(host.qes),
                                   atol=1e-6)
    # every dd path point is an equilibrium of the TRUE (f64) residual AT
    # ITS dd LOAD FACTOR to the corrector tolerance (measured ~1e-14 after
    # the exact lam (x) load_ref dd product landed; the f32 product
    # floored this at ~6e-8) — the claim the f32 tier cannot make
    for s in range(2):
        r = cosserat.equilibrium_residual(
            jnp.asarray(qes[-1, s], jnp.float64),
            jnp.asarray(lam[-1, s] * load_refs[s], jnp.float64),
            jnp.zeros(3, jnp.float64), cfg, iters=40, method="dense")
        assert float(jnp.linalg.norm(r)) < 1e-8


def test_batched_riks_traverses_fold_family():
    """A BATCH of imperfect-pitchfork load rays (two imperfection sizes)
    walked DOWN from a high anchor on the complementary branch: every
    sample must round its fold nose (lambda reverses) in one device-wide
    scan, and the noses must order by Koiter's eps^(2/3) law."""
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
        bifurcation,
    )

    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16),
                                 stiffness=(1.0, 1.0, 1.3))
    ne = cfg.rod.ne
    axial = (-1.0, 0.0, 0.0)
    path = cosserat.arc_length_continuation(axial, cfg=cfg, ds=0.35, steps=9,
                                            tol=1e-10)
    cp = bifurcation.detect_critical_points(path, axial, cfg=cfg)[0]
    d = 1.0 if cp.null_vector[ne] > 0 else -1.0
    branch = bifurcation.switch_branch(cp, axial, cfg=cfg, direction=d,
                                       ds=0.4, steps=8, tol=1e-9)
    lam_hi = float(np.asarray(branch.lambdas)[-1])
    qe_hi = np.asarray(branch.qes)[-1]

    eps = np.asarray([0.01, 0.025], np.float32)
    load_refs = np.stack([[-1.0, 0.0, e] for e in eps]).astype(np.float32)
    qe0 = jnp.asarray(np.stack([qe_hi, qe_hi]), jnp.float32)
    # tol: the f32 residual floor at these amplitudes (|qe| ~ 2.6,
    # lam ~ 4) is ~1e-5..1e-4; tighter tols make the corrector report
    # failure at the floor and over-halve the arc near the nose.
    walk = cosserat.arc_length_continuation_batched(
        load_refs, cfg=cfg, qe0=qe0, lambda_start=lam_hi, ds=0.3, steps=30,
        tol=1e-4, max_corrector=25, iters=16, interpret=True,
        direction=-1.0)
    conv = np.asarray(walk.converged)               # (steps, B)
    lams = np.asarray(walk.lambdas)
    # False rows are arc-halving retries (the sample repeats its state);
    # each sample must still make real progress THROUGH its fold.
    for s in range(2):
        assert conv[:, s].sum() >= 8
        ls = lams[conv[:, s], s]
        assert (np.diff(ls) < 0).any()              # walked down
        assert (np.diff(ls) > 0).any()              # ... and turned back
    noses = lams.min(axis=0)
    assert noses[1] > noses[0] + 0.02               # bigger eps, higher nose
    assert (noses > cp.lam).all()                   # above the perfect P_cr


def test_fused_jacobian_exact_at_large_amplitude():
    """Regression: the direction-table einsum in _fused_state_and_tangents
    must keep the (point, component) axes in place — the scrambled variant
    ("aebp" + reshape) cost a 31% Jacobian error at |qe| ~ 2, invisible to
    converged-value tests (Newton still found the roots, just at a linear
    rate) but fatal to Riks correctors near folds."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16),
                                 stiffness=(1.0, 1.0, 1.3))
    qe = np.zeros(9)
    qe[3], qe[4], qe[5], qe[2] = 2.2, -0.6, 0.15, 0.05
    lam = 4.0
    load = np.asarray([-1.0, 0.0, 0.01])

    _, jac = cosserat.residual_and_jacobian_fused(
        jnp.asarray(qe[None], jnp.float32),
        jnp.asarray(lam * load[None, None], jnp.float32),
        jnp.zeros((1, 1, 3), jnp.float32), cfg, iters=16, tile=2048,
        interpret=True)
    jac = np.asarray(jac[0], np.float64)

    def res_f64(q):
        return cosserat.equilibrium_residual(
            q, lam * jnp.asarray(load, jnp.float64),
            jnp.zeros(3, jnp.float64), cfg, iters=48)

    j64 = np.asarray(jax.jacfwd(res_f64)(jnp.asarray(qe)), np.float64)
    assert np.abs(jac - j64).max() < 1e-4 * np.abs(j64).max()


def test_dd_residual_distributed_force_matches_f64():
    """ROADMAP r3: the dd partial-integral transport — the double-word
    residual with a constant distributed load (gravity) matches the f64
    definition, for both the Kirchhoff moment rows and the Reissner force
    rows."""
    rng = np.random.default_rng(4)
    loads = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)), jnp.float32)
    for rc, nq, stiff in (
        (rod.RodConfig(n=16), 9, (1.0, 1.0, 1.0)),
        (rod.RodConfig(n=16, na=6, ne=3), 18,
         (1.0, 1.0, 1.0, 50.0, 10.0, 10.0)),
    ):
        cfg = cosserat.StaticsConfig(rod=rc, stiffness=stiff,
                                     distributed_force=(0.0, 0.0, -0.6))
        qe = jnp.asarray(rng.standard_normal((4, nq)) * 0.2, jnp.float32)
        res_dd = cosserat.equilibrium_residual_dd(qe, loads, jnp.zeros(3),
                                                  cfg)
        res64 = cosserat.equilibrium_residual(
            jnp.asarray(qe, jnp.float64),
            jnp.asarray(loads, jnp.float64)[:, None, :],
            jnp.zeros(3, jnp.float64), cfg, iters=40)
        scale = float(jnp.max(jnp.abs(res64)))
        assert float(jnp.max(jnp.abs(res_dd - res64))) < 1e-7 * max(scale, 1.0)


def test_dd_residual_newton_under_gravity_hits_1e9():
    """Batched dd-residual Newton reaches 1e-9 TRUE residuals with a
    distributed load in play (the transport rides the dd path end-to-end)."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16),
                                 distributed_force=(0.0, 0.0, -0.4))
    rng = np.random.default_rng(5)
    loads = jnp.asarray(rng.uniform(-0.3, 0.3, (4, 3)), jnp.float32)
    sol = cosserat.solve_statics_batched(loads, cfg=cfg, tol=1e-9,
                                         max_iter=25, iters=16,
                                         interpret=True, dd_residual=True)
    assert np.asarray(sol.converged).all()
    qe64 = np.asarray(sol.qe, np.float64) + np.asarray(sol.qe_lo, np.float64)
    res = cosserat.equilibrium_residual(
        jnp.asarray(qe64), jnp.asarray(loads, jnp.float64)[:, None, :],
        jnp.zeros(3, jnp.float64), cfg, iters=48)
    assert float(jnp.max(jnp.abs(res))) < 1e-9


def test_det_sign_logabs_matches_numpy():
    from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import (
        smallsolve,
    )

    rng = np.random.default_rng(9)
    a = rng.standard_normal((64, 7, 7))
    sign, logabs = smallsolve.det_sign_logabs(jnp.asarray(a))
    s_ref, l_ref = np.linalg.slogdet(a)
    np.testing.assert_allclose(np.asarray(sign), s_ref, atol=1e-12)
    np.testing.assert_allclose(np.asarray(logabs), l_ref, rtol=1e-10)


def test_solve_statics_differentiable_compliance():
    """IFT sensitivities through the equilibrium: in the linear regime the
    tip-deflection gradient d(tip_z)/d(F_z) equals the cantilever
    compliance L^3/3EI; at finite load jax.grad matches central finite
    differences of the full solve."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))

    def tip_z(f):
        qe = cosserat.solve_statics_differentiable(
            f, jnp.zeros(3, jnp.float64), cfg, 1e-11, 40, 32)
        sol = rod.rod_shape(qe, cfg=cfg.rod, method="picard", iters=32)
        return sol.tip_position[2]

    g = jax.grad(tip_z)(jnp.asarray([0.0, 0.0, 1e-6], jnp.float64))
    np.testing.assert_allclose(float(g[2]), 1.0 / 3.0, rtol=1e-6)

    f0 = jnp.asarray([0.1, 0.0, 0.8], jnp.float64)
    g = np.asarray(jax.grad(tip_z)(f0))
    eps = 1e-6
    for c in range(3):
        e = jnp.zeros(3, jnp.float64).at[c].set(eps)
        fd = (float(tip_z(f0 + e)) - float(tip_z(f0 - e))) / (2 * eps)
        np.testing.assert_allclose(g[c], fd, rtol=1e-5, atol=1e-9)

    # forward mode too (jacfwd exercises the custom JVP directly)
    jac = jax.jacfwd(tip_z)(f0)
    np.testing.assert_allclose(np.asarray(jac), g, rtol=1e-10)


def test_equilibrium_residual_auto_routes_by_rho():
    """method='auto': inside the Picard validity domain the auto residual
    equals the picard one; beyond rho ~ 5 it equals the DENSE one where
    plain picard has silently degraded."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    f = jnp.asarray([0.1, 0.0, 0.3], jnp.float64)
    m = jnp.zeros(3, jnp.float64)

    qe_small = jnp.zeros(9, jnp.float64).at[4].set(1.0)      # rho ~ 0.9
    r_auto = cosserat.equilibrium_residual(qe_small, f, m, cfg,
                                           method="auto")
    r_pic = cosserat.equilibrium_residual(qe_small, f, m, cfg,
                                          method="picard")
    np.testing.assert_allclose(np.asarray(r_auto), np.asarray(r_pic),
                               atol=1e-14)

    qe_big = jnp.zeros(9, jnp.float64).at[3].set(14.0)       # rho = 7
    r_auto = cosserat.equilibrium_residual(qe_big, f, m, cfg, method="auto")
    r_dense = cosserat.equilibrium_residual(qe_big, f, m, cfg,
                                            method="dense")
    r_pic = cosserat.equilibrium_residual(qe_big, f, m, cfg,
                                          method="picard")
    np.testing.assert_allclose(np.asarray(r_auto), np.asarray(r_dense),
                               atol=1e-12)
    # sanity: the guard matters — plain picard is measurably off out here
    assert float(jnp.max(jnp.abs(r_pic - r_dense))) > 1e-7

    # jit + jacfwd compose through the cond (Newton usability)
    jac = jax.jit(jax.jacfwd(lambda q: cosserat.equilibrium_residual(
        q, f, m, cfg, method="auto")))(qe_big)
    jac_dense = jax.jacfwd(lambda q: cosserat.equilibrium_residual(
        q, f, m, cfg, method="dense"))(qe_big)
    np.testing.assert_allclose(np.asarray(jac), np.asarray(jac_dense),
                               atol=1e-10)


def test_equilibrium_residual_auto_mixed_rho_batch():
    """VERDICT r2 next #8: a MIXED batch (one strong-curvature sample among
    mild ones) routes the whole batch to the dense path — every sample must
    then match its per-sample dense residual (the mild ones lose nothing:
    dense == picard inside the validity domain).  Per-sample where-masking
    was rejected by design: under jit's static shapes it would compute BOTH
    branches for everyone (~11x) while batch-max routing pays the dense
    cost (~10x) only when a batch actually contains an offender — see
    docs/BENCHMARKS.md (auto-routing note)."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    f = jnp.asarray([[0.1, 0.0, 0.3]] * 3, jnp.float64)[:, None, :]
    m = jnp.zeros(3, jnp.float64)
    qe = jnp.zeros((3, 9), jnp.float64)
    qe = qe.at[0, 4].set(1.0)        # rho ~ 0.9 (mild)
    qe = qe.at[1, 3].set(14.0)       # rho = 7 (beyond the Picard domain)
    qe = qe.at[2, 5].set(0.5)        # mild
    r_auto = cosserat.equilibrium_residual(qe, f, m, cfg, method="auto")
    r_dense = cosserat.equilibrium_residual(qe, f, m, cfg, method="dense")
    np.testing.assert_allclose(np.asarray(r_auto), np.asarray(r_dense),
                               atol=1e-12)
    # and with NO offender the same call stays on the picard branch
    qe_mild = qe.at[1, 3].set(0.3)
    r_auto2 = cosserat.equilibrium_residual(qe_mild, f, m, cfg,
                                            method="auto")
    r_pic = cosserat.equilibrium_residual(qe_mild, f, m, cfg,
                                          method="picard")
    np.testing.assert_allclose(np.asarray(r_auto2), np.asarray(r_pic),
                               atol=1e-14)


def test_line_search_extends_cold_start_radius():
    """VERDICT r1 weakness: full-step Newton wanders for strong cold-start
    loads; the backtracking line search converges there and lands on the
    same equilibrium a warm-started continuation finds."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    f = jnp.asarray([0.0, 0.0, 12.0], jnp.float64)

    plain = cosserat.solve_statics(f, cfg=cfg, tol=1e-9, max_iter=40,
                                   method="auto")
    assert not bool(plain.converged)

    ls = cosserat.solve_statics(f, cfg=cfg, tol=1e-9, max_iter=40,
                                method="auto", line_search=True)
    assert bool(ls.converged)
    # a TRUE equilibrium (strong loads have multiple sheets; globalized
    # Newton may land on a different one than a continuation sweep —
    # verify the physics, not the sheet)
    res = cosserat.equilibrium_residual(ls.qe, f, jnp.zeros(3, jnp.float64),
                                        cfg, method="dense")
    assert float(jnp.max(jnp.abs(res))) < 1e-9


def test_dd_residual_supports_follower_loads():
    """Regression: the dd residual previously ignored cfg.follower — it now
    rotates the body-frame tip force at the dd tip rotation and matches the
    f64 dense follower residual."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16), follower=True)
    rng = np.random.default_rng(3)
    qe1 = 0.5 * rng.standard_normal(9)
    qh, ql = rod.split_strain(qe1)
    f32 = jnp.asarray([0.1, 0.0, 0.4], jnp.float32)
    r_dd = cosserat.equilibrium_residual_dd(
        (jnp.asarray(qh), jnp.asarray(ql)), f32, jnp.zeros(3, jnp.float32),
        cfg, iters=24)
    r64 = cosserat.equilibrium_residual(
        jnp.asarray(qe1), jnp.asarray([0.1, 0.0, 0.4], jnp.float64),
        jnp.zeros(3, jnp.float64), cfg, iters=40, method="dense")
    err = float(jnp.max(jnp.abs(np.asarray(r_dd, np.float64)
                                - np.asarray(r64))))
    assert err < 1e-7, err
    # and it differs from the dead-load dd residual at finite deflection
    cfg_dead = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    r_dead = cosserat.equilibrium_residual_dd(
        (jnp.asarray(qh), jnp.asarray(ql)), f32, jnp.zeros(3, jnp.float32),
        cfg_dead, iters=24)
    assert float(jnp.max(jnp.abs(r_dd - r_dead))) > 1e-3
