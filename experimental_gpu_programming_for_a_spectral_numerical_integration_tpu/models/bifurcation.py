"""Bifurcation tooling for statics continuation paths.

The reference ships only forward kinematics (`/root/reference/main.cpp`),
but the statics BVP built on its theory (rod_modeling.pdf ch. 2) has folds
and bifurcations — Euler buckling of the axially-compressed cantilever is
the canonical one — and the round-2 snap-through hunt showed this structure
is subtle to find by manual probing.  This module automates it:

* :func:`path_stability` — det(J) sign / eigenvalue monitors along a
  :class:`~.cosserat.ContinuationPath` (Jacobians batched on device via
  ``vmap(jacfwd)``, spectra on the host — ``nq`` is 9-18, host ``eig`` is
  free next to the device solves).
* :func:`detect_critical_points` — bracket det(J) sign changes between
  converged path points, refine by bisection *along the equilibrium path*
  (reusing the Riks corrector to stay on it), and classify each point as a
  **fold** or a **branch point** via the standard left-null-vector test:
  at a simple fold ``phi^T d res/d lambda != 0`` (the load direction leaves
  the range of J), at a branch point it vanishes.
* :func:`linearized_buckling_loads` — on a trivial branch (``res(qe0,
  lam) = 0`` for all ``lam``, e.g. the straight axially-loaded column) the
  Jacobian is exactly affine in ``lambda``, so every critical load is a
  generalized eigenvalue of the pencil ``(J0, -J1)``; solved host-side by
  the shift-invert trick ``lam = -1/mu, mu in eig(J0^{-1} J1)`` (no
  SciPy QZ needed).
* :func:`switch_branch` — pseudo-arclength walk onto the bifurcated branch:
  anchor at the critical point with the *null eigenvector* as the initial
  tangent ``t0 = (psi_null, 0)``; the Riks normal-plane constraint then
  excludes the trivial branch (on it the constraint residual is ``-ds``,
  never 0), so the corrector lands on the post-buckling branch.

Gates (tests/test_bifurcation.py): the detected buckling load of the
compressed cantilever matches Euler's ``P_cr = pi^2 EI / (4 L^2)`` to
discretization error AND the pencil eigenvalue of the same discretization
to ~1e-6; it classifies 'branch' while the snap-through critical point
classifies 'fold'; switch_branch walks a supercritical post-buckling path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from . import cosserat

__all__ = [
    "StabilityInfo",
    "CriticalPoint",
    "path_stability",
    "detect_critical_points",
    "linearized_buckling_loads",
    "switch_branch",
    "switch_branch_batched",
]


class StabilityInfo(NamedTuple):
    """Per-path-point spectral monitors of the equilibrium Jacobian.

    ``det_sign``/``log_abs_det`` from ``slogdet``; ``eig_min_real`` the
    smallest real part over the spectrum (crosses 0 exactly where stability
    is lost); ``n_unstable`` the count of eigenvalues with negative real
    part (the Morse index for the symmetric/conservative case).
    """

    det_sign: np.ndarray       # (steps,)
    log_abs_det: np.ndarray    # (steps,)
    eig_min_real: np.ndarray   # (steps,)
    n_unstable: np.ndarray     # (steps,) int


class CriticalPoint(NamedTuple):
    segment: int               # path segment [i, i+1] bracketing the point
    kind: str                  # 'fold' | 'branch'
    lam: float                 # refined load factor
    qe: np.ndarray             # refined strain modes (nq,)
    null_vector: np.ndarray    # right null eigenvector of J (unit norm)
    coupling: float            # |phi^T res_lam| / (|phi| |res_lam|); ~0 at
                               # a branch point, O(1) at a fold


def _residual_fn(load_ref, tip_moment_ref, cfg, iters, method):
    load_ref = jnp.asarray(load_ref)
    tip_moment_ref = jnp.asarray(tip_moment_ref, load_ref.dtype)

    def res(qe, lam):
        return cosserat.equilibrium_residual(
            qe, lam * load_ref, lam * tip_moment_ref, cfg, iters, method)

    return res


def path_jacobians(qes, lambdas, load_ref, cfg: cosserat.StaticsConfig,
                   tip_moment_ref=(0.0, 0.0, 0.0), iters: int = 24,
                   method: str = "picard"):
    """Equilibrium Jacobians ``(steps, nq, nq)`` along a path, on device."""
    res = _residual_fn(load_ref, tip_moment_ref, cfg, iters, method)
    jac = jax.jit(jax.vmap(lambda qe, lam: jax.jacfwd(res)(qe, lam)))
    return jac(jnp.asarray(qes), jnp.asarray(lambdas))


def path_stability(path: cosserat.ContinuationPath, load_ref,
                   cfg: cosserat.StaticsConfig = cosserat.StaticsConfig(),
                   tip_moment_ref=(0.0, 0.0, 0.0), iters: int = 24,
                   method: str = "picard") -> StabilityInfo:
    """Spectral stability monitors at every point of a continuation path."""
    jacs = np.asarray(path_jacobians(path.qes, path.lambdas, load_ref, cfg,
                                     tip_moment_ref, iters, method),
                      np.float64)
    signs, logdets, eig_min, n_unst = [], [], [], []
    for j in jacs:
        sign, logdet = np.linalg.slogdet(j)
        ev = np.linalg.eigvals(j)
        signs.append(sign)
        logdets.append(logdet)
        eig_min.append(float(ev.real.min()))
        n_unst.append(int((ev.real < 0).sum()))
    return StabilityInfo(det_sign=np.asarray(signs),
                         log_abs_det=np.asarray(logdets),
                         eig_min_real=np.asarray(eig_min),
                         n_unstable=np.asarray(n_unst, np.int64))


def _classify(j, res_lam, fold_tol, lam_lo, lam_c, lam_hi):
    """(kind, null_vector, coupling) from the Jacobian, the load slope, and
    the bracket geometry.

    Two independent fold signals, either suffices:

    * geometric — the refined ``lam_c`` is an *extremum* of its bracketing
      segment (the path's load factor reverses at a limit point, whereas it
      passes through the interior at a branch point);
    * algebraic — the left null vector couples to the load direction,
      ``|phi^T res_lam| / |res_lam| > fold_tol`` (exactly zero at a branch
      point; can be small-but-finite at a fold whose ``res_lam`` is
      dominated by well-conditioned directions, which is why the geometric
      test leads).
    """
    ev, vr = np.linalg.eig(j)
    k = int(np.argmin(np.abs(ev)))
    psi = np.real(vr[:, k])
    psi = psi / np.linalg.norm(psi)
    evl, vl = np.linalg.eig(j.T)
    kl = int(np.argmin(np.abs(evl)))
    phi = np.real(vl[:, kl])
    phi = phi / np.linalg.norm(phi)
    rl = np.asarray(res_lam, np.float64)
    rl_norm = np.linalg.norm(rl)
    coupling = float(abs(phi @ rl) / max(rl_norm, 1e-30))
    margin = 1e-8 * (1.0 + abs(lam_c))
    interior = (lam_c - lam_lo) * (lam_hi - lam_c) > margin ** 2
    if rl_norm < 1e-9:
        kind = "branch"          # trivial branch: res_lam == 0 identically
    elif not interior or coupling > fold_tol:
        kind = "fold"
    else:
        kind = "branch"
    return kind, psi, coupling


def detect_critical_points(path: cosserat.ContinuationPath, load_ref,
                           cfg: cosserat.StaticsConfig = cosserat.StaticsConfig(),
                           tip_moment_ref=(0.0, 0.0, 0.0), iters: int = 24,
                           method: str = "picard",
                           stability: StabilityInfo | None = None,
                           tol: float = 1e-9, max_corrector: int = 25,
                           psi_weight: float = 1.0,
                           bisect_steps: int = 48, fold_tol: float = 1e-2,
                           ) -> list[CriticalPoint]:
    """Locate and classify singular-Jacobian crossings along a path.

    A crossing is flagged wherever the *unstable eigenvalue count* changes
    between consecutive converged path points — this catches det(J) sign
    changes AND even-multiplicity crossings det is blind to (e.g. the
    DOUBLE buckling eigenvalue of an isotropic column, where y- and
    z-bending buckle at the same load).  Each bracket is refined by
    bisection in the path parameter: the midpoint predictor is projected
    back onto the equilibrium manifold with the Riks corrector (secant
    tangent), so the refinement walks the actual path, not the chord.
    """
    res = _residual_fn(load_ref, tip_moment_ref, cfg, iters, method)
    if stability is None:
        stability = path_stability(path, load_ref, cfg, tip_moment_ref,
                                   iters, method)
    qes = np.asarray(path.qes, np.float64)
    lams = np.asarray(path.lambdas, np.float64)
    conv = np.asarray(path.converged)
    nq = qes.shape[1]
    dtype = jnp.asarray(qes).dtype
    _, corrector = cosserat._riks_machinery(res, nq, dtype, tol,
                                            max_corrector, psi_weight)
    jac_fn = jax.jit(jax.jacfwd(res))

    def count_at(x):
        ev = np.linalg.eigvals(np.asarray(jac_fn(x[:nq], x[nq]), np.float64))
        return int((ev.real < 0).sum())

    points = []
    for i in range(len(lams) - 1):
        if not (conv[i] and conv[i + 1]):
            continue
        if stability.n_unstable[i] == stability.n_unstable[i + 1]:
            continue
        xa = jnp.asarray(np.concatenate([qes[i], lams[i:i + 1]]), dtype)
        xb = jnp.asarray(np.concatenate([qes[i + 1], lams[i + 1:i + 2]]),
                         dtype)
        # Secant tangent of the bracketing segment (metric-normalized).
        dx = xb - xa
        t = dx / jnp.sqrt(jnp.sum(dx[:nq] ** 2)
                          + psi_weight ** 2 * dx[nq] ** 2)
        ca = int(stability.n_unstable[i])
        for _ in range(bisect_steps):
            xm_pred = 0.5 * (xa + xb)
            xm, ok = corrector(xm_pred, t)
            if not bool(ok):
                # Too close to the singular point for the corrector (J_aug
                # degenerates at a branch point): fall back to the chord
                # midpoint — the bracket is already tight.
                xm = xm_pred
            if count_at(xm) == ca:
                xa = xm
            else:
                xb = xm
            if abs(float(xb[nq] - xa[nq])) < 1e-12 and \
               float(jnp.linalg.norm(xb[:nq] - xa[:nq])) < 1e-12:
                break
        x_c = 0.5 * (xa + xb)
        j_c = np.asarray(jac_fn(x_c[:nq], x_c[nq]), np.float64)
        rl = np.asarray(res(x_c[:nq], 1.0) - res(x_c[:nq], 0.0), np.float64)
        kind, null_vec, coupling = _classify(j_c, rl, fold_tol,
                                             lams[i], float(x_c[nq]),
                                             lams[i + 1])
        points.append(CriticalPoint(
            segment=i, kind=kind, lam=float(x_c[nq]),
            qe=np.asarray(x_c[:nq], np.float64),
            null_vector=null_vec, coupling=coupling))
    return points


def linearized_buckling_loads(load_ref,
                              cfg: cosserat.StaticsConfig = cosserat.StaticsConfig(),
                              tip_moment_ref=(0.0, 0.0, 0.0), qe0=None,
                              iters: int = 24, method: str = "picard",
                              real_tol: float = 1e-8):
    """Critical load factors on a trivial branch, by linear eigenanalysis.

    Requires ``res(qe0, lam) = 0`` for every ``lam`` (checked): then
    ``J(lam) = J0 + lam J1`` *exactly* (the residual is affine in the
    load), and ``det J(lam) = 0`` iff ``lam = -1/mu`` for a nonzero
    eigenvalue ``mu`` of ``J0^{-1} J1``.  Returns the nearly-real ``lam``
    sorted by magnitude (host f64).  The smallest positive one is the
    classical buckling load — for the axially-compressed cantilever,
    Euler's ``pi^2 EI / (4 L^2)`` up to the modal-basis Galerkin error.
    """
    res = _residual_fn(load_ref, tip_moment_ref, cfg, iters, method)
    nq = cfg.rod.na * cfg.rod.ne
    if qe0 is None:
        qe0 = np.zeros(nq) if cfg.kappa0 is None else np.asarray(cfg.kappa0)
    qe0 = jnp.asarray(qe0)
    r0 = np.asarray(res(qe0, 0.0), np.float64)
    r1 = np.asarray(res(qe0, 1.0), np.float64)
    if np.linalg.norm(r0) > 1e-6 or np.linalg.norm(r1) > 1e-6:
        raise ValueError(
            "linearized_buckling_loads needs a trivial branch: res(qe0, "
            f"lam) must vanish for all lam (got |res(0)| = "
            f"{np.linalg.norm(r0):.2e}, |res(1)| = {np.linalg.norm(r1):.2e})"
            "; use detect_critical_points along a continuation path instead"
        )
    jac_fn = jax.jit(jax.jacfwd(res))
    j0 = np.asarray(jac_fn(qe0, 0.0), np.float64)
    j1 = np.asarray(jac_fn(qe0, 1.0), np.float64) - j0
    mu = np.linalg.eigvals(np.linalg.solve(j0, j1))
    mu = mu[np.abs(mu) > 1e-12]
    lam = -1.0 / mu
    lam = lam[np.abs(lam.imag) <= real_tol * np.maximum(np.abs(lam), 1.0)]
    lam = np.real(lam)
    return lam[np.argsort(np.abs(lam))]


def switch_branch(point: CriticalPoint, load_ref,
                  cfg: cosserat.StaticsConfig = cosserat.StaticsConfig(),
                  tip_moment_ref=(0.0, 0.0, 0.0), direction: float = 1.0,
                  ds: float = 0.1, steps: int = 20, tol: float = 1e-8,
                  max_corrector: int = 25, psi_weight: float = 1.0,
                  iters: int = 24, method: str = "picard",
                  ) -> cosserat.ContinuationPath:
    """Walk the bifurcated branch out of a branch point.

    The initial pseudo-arclength tangent is the null direction ``t0 =
    (direction * null_vector, 0)``: the first Riks constraint plane is then
    normal to the buckling mode, which the trivial branch cannot satisfy
    (its constraint residual is ``-ds``), so the first corrector converges
    onto the post-buckling branch; subsequent steps use the standard
    tangent update.  ``direction=-1`` walks the mirror branch (for the
    symmetric pitchfork they are reflections).
    """
    res = _residual_fn(load_ref, tip_moment_ref, cfg, iters, method)
    nq = point.qe.shape[0]
    dtype = jnp.asarray(point.qe).dtype
    tangent, corrector = cosserat._riks_machinery(res, nq, dtype, tol,
                                                  max_corrector, psi_weight)
    psi0 = np.asarray(point.null_vector, np.float64)
    psi0 = direction * psi0 / np.linalg.norm(psi0)
    x0 = jnp.asarray(np.concatenate([point.qe, [point.lam]]), dtype)
    t0 = jnp.asarray(np.concatenate([psi0, [0.0]]), dtype)
    return cosserat._riks_walk(tangent, corrector, x0, t0, ds, steps)


def switch_branch_batched(qe_c, lam_c, null_vectors, load_refs,
                          cfg: cosserat.StaticsConfig = cosserat.StaticsConfig(),
                          tip_moment_refs=None, directions=1.0,
                          ds: float = 0.1, steps: int = 20,
                          tol: float = 2e-5, max_corrector: int = 10,
                          psi_weight: float = 1.0, iters: int = 16,
                          tile: int = None, interpret: bool = False,
                          monitor_stability: bool = False,
                          dd_residual: bool = False, dd_iters: int = 24,
                          refine_steps: int = 2,
                          ) -> cosserat.BatchedContinuationPath:
    """Device-batched branch switching: a FAMILY of post-buckling walks in
    ONE ``lax.scan`` (VERDICT r2 next #4 — :func:`switch_branch` walks the
    host one path at a time).

    ``qe_c (B, nq)`` / ``lam_c (B,)`` / ``null_vectors (B, nq)`` anchor
    each sample at its critical point (e.g. the same detected branch point
    replicated with ``directions = [+1, -1]`` for the two pitchfork
    branches, or per-mode null vectors for a multi-mode study);
    ``load_refs (B, 3)`` the per-sample load rays.  The first predictor
    steps along the null direction — the Riks normal-plane constraint then
    excludes the trivial branch exactly as in the host walker — and every
    corrector iterate is one fused-kernel state+tangent evaluation over
    the whole batch.  f32-grade at the default ``tol``;
    ``dd_residual=True`` runs the dd corrector (1e-8-class walks, dd path
    points in ``qes_lo``/``lambdas_lo``).
    """
    load_refs = jnp.asarray(load_refs, jnp.float32)
    b = load_refs.shape[0]
    nq = cfg.rod.na * cfg.rod.ne
    qe_c = jnp.asarray(qe_c, jnp.float32)
    if qe_c.shape != (b, nq) or jnp.shape(null_vectors) != (b, nq):
        raise ValueError(
            f"switch_branch_batched: qe_c/null_vectors must be (B, nq) = "
            f"({b}, {nq}); got {qe_c.shape} / {jnp.shape(null_vectors)}"
        )
    if tip_moment_refs is None:
        tip_moment_refs = jnp.zeros_like(load_refs)
    tip_moment_refs = jnp.broadcast_to(
        jnp.asarray(tip_moment_refs, jnp.float32), (b, 3))
    if tile is None:
        tile = cosserat._pick_tile(b, cfg.rod)

    psi0 = jnp.asarray(null_vectors, jnp.float32)
    psi0 = psi0 / jnp.linalg.norm(psi0, axis=1, keepdims=True)
    psi0 = psi0 * jnp.broadcast_to(
        jnp.asarray(directions, jnp.float32), (b,))[:, None]
    lam_c = jnp.broadcast_to(jnp.asarray(lam_c, jnp.float32), (b,))
    x = jnp.concatenate([jnp.asarray(qe_c, jnp.float32),
                         lam_c[:, None]], axis=1)           # (B, nq+1)
    t0 = jnp.concatenate([psi0, jnp.zeros((b, 1), jnp.float32)], axis=1)
    # keller_init=False: the bordered tangent system is SINGULAR at a
    # branch-point anchor — the null-vector seed IS the first tangent.
    return cosserat._batched_riks_engine(
        load_refs, tip_moment_refs, cfg, x, jnp.zeros_like(x), t0, False,
        ds, steps, tol, max_corrector, psi_weight, iters, tile, interpret,
        monitor_stability, dd_residual, dd_iters, refine_steps)
