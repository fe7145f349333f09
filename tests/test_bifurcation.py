"""Bifurcation tooling: buckling detection, classification, branch switch.

The physical gate is Euler buckling of the axially-compressed cantilever
(clamped-free column): the straight state is an equilibrium for every load,
and its Jacobian loses definiteness at P_cr = pi^2 EI / (4 L^2) — the
classical pitchfork the reference's theory (rod_modeling.pdf ch. 2)
supports but its code never exercises.
"""

import numpy as np
import jax.numpy as jnp

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import (
    bifurcation,
    cosserat,
    rod,
)

# Compressive dead tip force along the undeformed axis (+x is the rod
# direction for the default base frame).
AXIAL = (-1.0, 0.0, 0.0)
EULER_CANTILEVER = np.pi ** 2 / 4.0   # EI = 1, L = 1


def _axial_cfg(ne=3):
    return cosserat.StaticsConfig(rod=rod.RodConfig(n=16, ne=ne))


def test_trivial_branch_is_equilibrium_for_all_loads():
    cfg = _axial_cfg()
    for lam in (0.0, 1.0, 3.0):
        res = cosserat.equilibrium_residual(
            jnp.zeros(9, jnp.float64), lam * jnp.asarray(AXIAL, jnp.float64),
            jnp.zeros(3, jnp.float64), cfg)
        assert float(jnp.max(jnp.abs(res))) < 1e-12


def test_linearized_buckling_matches_euler_formula():
    """Smallest positive pencil eigenvalue ~ pi^2/4 (Galerkin error of the
    3-mode Legendre strain basis; ne=5 tightens it by ~2 orders)."""
    lams = bifurcation.linearized_buckling_loads(AXIAL, cfg=_axial_cfg())
    positive = lams[lams > 0]
    assert positive.size > 0
    assert abs(positive[0] - EULER_CANTILEVER) < 0.02 * EULER_CANTILEVER

    lams5 = bifurcation.linearized_buckling_loads(AXIAL, cfg=_axial_cfg(ne=5))
    pos5 = lams5[lams5 > 0]
    assert abs(pos5[0] - EULER_CANTILEVER) < 2e-4 * EULER_CANTILEVER
    # Richer basis converges FROM ABOVE (Rayleigh quotient upper bound).
    assert pos5[0] <= positive[0] + 1e-9


def test_buckling_load_rejects_nontrivial_branch():
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16))
    try:
        bifurcation.linearized_buckling_loads((0.0, 0.0, -1.0), cfg=cfg)
    except ValueError as e:
        assert "trivial branch" in str(e)
    else:
        raise AssertionError("transverse load has no trivial branch")


def test_detect_and_classify_pitchfork_on_trivial_branch():
    """Walk the trivial branch through P_cr: path_stability flags the det
    sign change, detect_critical_points refines it onto the pencil
    eigenvalue (same discretization -> agreement ~1e-6) and classifies it
    as a branch point (res_lam = 0 on the trivial branch)."""
    cfg = _axial_cfg()
    path = cosserat.arc_length_continuation(
        AXIAL, cfg=cfg, ds=0.35, steps=9, tol=1e-10, method="picard")
    assert np.asarray(path.converged).all()
    # trivial branch: qe stays ~0, lambda climbs past P_cr
    assert float(np.abs(np.asarray(path.qes)).max()) < 1e-8
    assert float(np.asarray(path.lambdas)[-1]) > EULER_CANTILEVER

    stab = bifurcation.path_stability(path, AXIAL, cfg=cfg)
    assert (stab.det_sign != 0).all()
    assert stab.n_unstable[0] == 0          # pre-buckling: stable
    assert stab.n_unstable[-1] >= 1         # post-buckling: index >= 1

    points = bifurcation.detect_critical_points(path, AXIAL, cfg=cfg,
                                                stability=stab)
    assert len(points) >= 1
    cp = points[0]
    lam_pencil = bifurcation.linearized_buckling_loads(AXIAL, cfg=cfg)
    lam_pencil = lam_pencil[lam_pencil > 0][0]
    assert cp.kind == "branch"
    assert abs(cp.lam - lam_pencil) < 1e-6 * lam_pencil
    assert np.linalg.norm(cp.qe) < 1e-8
    # The buckling mode bends, it does not twist: torsion block ~ empty.
    ne = cfg.rod.ne
    assert np.linalg.norm(cp.null_vector[:ne]) < 1e-6


def test_switch_branch_walks_supercritical_postbuckling():
    """Out of the pitchfork: the buckled branch carries growing deflection
    with lambda INCREASING past P_cr (supercritical), stays converged, and
    the mirror branch (direction=-1) is its reflection."""
    cfg = _axial_cfg()
    path = cosserat.arc_length_continuation(
        AXIAL, cfg=cfg, ds=0.35, steps=9, tol=1e-10, method="picard")
    cp = bifurcation.detect_critical_points(path, AXIAL, cfg=cfg)[0]

    branch = bifurcation.switch_branch(cp, AXIAL, cfg=cfg, ds=0.25, steps=6,
                                       tol=1e-9)
    assert np.asarray(branch.converged).all()
    qes = np.asarray(branch.qes)
    lams = np.asarray(branch.lambdas)
    amp = np.linalg.norm(qes, axis=1)
    assert amp[0] > 1e-3                       # left the trivial branch
    assert amp[-1] > amp[0]                    # deflection grows
    assert (lams > cp.lam - 1e-6).all()        # supercritical pitchfork
    assert lams[-1] > cp.lam + 1e-3

    mirror = bifurcation.switch_branch(cp, AXIAL, cfg=cfg, direction=-1.0,
                                       ds=0.25, steps=6, tol=1e-9)
    np.testing.assert_allclose(np.asarray(mirror.qes), -qes, atol=1e-6)
    np.testing.assert_allclose(np.asarray(mirror.lambdas), lams, atol=1e-6)

    # Every branch point satisfies equilibrium at finite amplitude.
    res = cosserat.equilibrium_residual(
        jnp.asarray(qes[-1]), lams[-1] * jnp.asarray(AXIAL, jnp.float64),
        jnp.zeros(3, jnp.float64), cfg)
    assert float(jnp.linalg.norm(res)) < 1e-8


def test_imperfection_unfolds_pitchfork_into_detected_fold():
    """Koiter imperfection-sensitivity, end to end: a tiny transverse load
    component unfolds the buckling pitchfork — the complementary branch
    then has a genuine limit point (nose) just above P_cr.  Walking that
    branch DOWN from a high-load anchor (direction=-1), the tooling must
    (a) classify the nose as 'fold' (lambda reverses; O(1) left-null
    coupling), and (b) find the SECOND pitchfork — z-plane buckling at
    exactly (EI_z/EI_y) P_cr — riding the unstable return branch, with
    zero coupling."""
    stiff = (1.0, 1.0, 1.3)    # split the y/z degeneracy: simple eigenvalues
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16), stiffness=stiff)
    ne = cfg.rod.ne
    lam_c = bifurcation.linearized_buckling_loads(AXIAL, cfg=cfg)
    lam_c = float(lam_c[lam_c > 0][0])

    # Perfect problem: onto the (y-bending) post-buckling branch, walked to
    # finite amplitude so the imperfect anchor lands beyond the nose.
    path = cosserat.arc_length_continuation(AXIAL, cfg=cfg, ds=0.35, steps=9,
                                            tol=1e-10)
    cp = bifurcation.detect_critical_points(path, AXIAL, cfg=cfg)[0]
    assert cp.kind == "branch"
    d = 1.0 if cp.null_vector[ne] > 0 else -1.0   # +kappa_y side
    branch = bifurcation.switch_branch(cp, AXIAL, cfg=cfg, direction=d,
                                       ds=0.4, steps=8, tol=1e-9)
    assert np.asarray(branch.converged).all()

    # Imperfect load: the eps z-component favours NEGATIVE kappa_y, so the
    # +kappa_y branch is the complementary (disconnected) one with the fold.
    f_eps = (-1.0, 0.0, 0.01)
    lam_hi = float(np.asarray(branch.lambdas)[-1])
    anchor = cosserat.solve_statics(
        lam_hi * jnp.asarray(f_eps, jnp.float64), cfg=cfg,
        qe0=jnp.asarray(np.asarray(branch.qes)[-1]), tol=1e-10, max_iter=50)
    assert bool(anchor.converged)

    walk = cosserat.arc_length_continuation(
        f_eps, cfg=cfg, qe0=anchor.qe, lambda_start=lam_hi, ds=0.3,
        steps=14, tol=1e-9, direction=-1.0)
    assert np.asarray(walk.converged).all()
    lams = np.asarray(walk.lambdas)
    assert lams.min() > lam_c                # nose sits ABOVE the perfect
    assert (np.diff(lams) > 0).any()         # ... and the path turned back

    points = bifurcation.detect_critical_points(walk, f_eps, cfg=cfg)
    kinds = [p.kind for p in points]
    folds = [p for p in points if p.kind == "fold"]
    assert folds, kinds
    nose = folds[0]
    # Koiter: nose at lam_c + O(eps^(2/3)), well below the anchor.
    assert lam_c < nose.lam < lam_c + 0.35
    assert nose.coupling > 0.3

    branches = [p for p in points if p.kind == "branch"]
    assert branches, kinds
    # z-plane pitchfork at (EI_z/EI_y) * lam_c, zero left-null coupling.
    assert abs(branches[0].lam - 1.3 * lam_c) < 1e-3 * lam_c
    assert branches[0].coupling < 1e-6


def test_batched_walk_detsign_monitor_brackets_buckling():
    """Device-side stability monitors in the batched Riks scan: walking the
    trivial branch of the anisotropic compressed column, det(J) flips sign
    exactly at the (simple) buckling eigenvalue — the bracketing segment of
    the monitored batched path must contain the pencil prediction."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16),
                                 stiffness=(1.0, 1.0, 1.3))
    lam_c = bifurcation.linearized_buckling_loads(AXIAL, cfg=cfg)
    lam_c = float(lam_c[lam_c > 0][0])
    load_refs = np.asarray([AXIAL, AXIAL], np.float32)   # 2-sample batch
    walk = cosserat.arc_length_continuation_batched(
        load_refs, cfg=cfg, ds=0.35, steps=9, tol=1e-4, iters=16,
        interpret=True, monitor_stability=True)
    assert np.asarray(walk.converged).all()
    signs = np.asarray(walk.det_sign)                     # (steps, B)
    lams = np.asarray(walk.lambdas)
    for s in range(2):
        flips = np.nonzero(np.diff(signs[:, s]) != 0)[0]
        assert flips.size == 1, signs[:, s]
        k = flips[0]
        assert lams[k, s] < lam_c < lams[k + 1, s]
    assert np.isfinite(np.asarray(walk.log_abs_det)).all()


def test_switch_branch_batched_matches_host_walks():
    """Device-batched branch switching (VERDICT r2 next #4): BOTH pitchfork
    branches of the compressed column in ONE lax.scan, each matching its
    per-path host walk; the two branches are mirror images."""
    cfg = cosserat.StaticsConfig(rod=rod.RodConfig(n=16),
                                 stiffness=(1.0, 1.0, 1.3))
    path = cosserat.arc_length_continuation(AXIAL, cfg=cfg, ds=0.35,
                                            steps=9, tol=1e-10)
    cp = bifurcation.detect_critical_points(path, AXIAL, cfg=cfg)[0]
    assert cp.kind == "branch"

    load_refs = np.tile(np.asarray(AXIAL, np.float32), (2, 1))
    walk = bifurcation.switch_branch_batched(
        np.tile(cp.qe.astype(np.float32), (2, 1)), cp.lam,
        np.tile(cp.null_vector.astype(np.float32), (2, 1)), load_refs,
        cfg=cfg, directions=np.asarray([1.0, -1.0]), ds=0.4, steps=6,
        tol=2e-5, max_corrector=15, iters=16, interpret=True)
    assert np.asarray(walk.converged).all()
    for d, s in ((1.0, 0), (-1.0, 1)):
        host = bifurcation.switch_branch(cp, AXIAL, cfg=cfg, direction=d,
                                         ds=0.4, steps=6, tol=1e-9)
        assert np.asarray(host.converged).all()
        np.testing.assert_allclose(np.asarray(walk.lambdas)[:, s],
                                   np.asarray(host.lambdas), atol=1e-4)
        np.testing.assert_allclose(np.asarray(walk.qes)[:, s],
                                   np.asarray(host.qes), atol=1e-4)
    # supercritical pitchfork symmetry: q(+) == -q(-)
    np.testing.assert_allclose(np.asarray(walk.qes)[:, 0],
                               -np.asarray(walk.qes)[:, 1], atol=1e-5)
