"""Shape sensing and load identification — the inverse problems of the rod.

The reference is a forward-only demo (`/root/reference/main.cpp:181-205`
prints the shape for one hard-coded strain); a deployed continuum robot
runs the OTHER direction: noisy measurements come in (electromagnetic /
optical markers along the backbone, FBG curvature stations, a tracked tip
frame) and the state — modal strain ``qe``, or the external load that
produced it — must be recovered at rate.  Because every forward operator
here is differentiable jax code, the estimators are plain batched
Gauss-Newton loops whose Jacobians are exact AD of the *spectral* forward
model — no finite differences, no hand-derived sensitivities, vmappable
over thousands of measurement sets in one device call.

Measurement model (:func:`measure`): any combination of

* **markers** — world positions at arbitrary arclength fractions,
  spectrally interpolated off the CGL grid
  (:func:`~..ops.chebyshev.interpolation_matrix` — exact at nodes,
  exponentially accurate between them, so sensor placement is NOT tied to
  the collocation grid);
* **strain stations** — body-frame strain components at arbitrary
  arclengths (the FBG analogue), linear in ``qe`` through the modal basis;
* **tip quaternion** — a tracked tip frame (sign-canonicalized: ``q`` and
  ``-q`` are the same rotation).

Estimators:

* :func:`fit_strain` — regularized Gauss-Newton (Levenberg damping +
  per-sample backtracking line search) for ``qe`` from one or a batch of
  measurement vectors.
* :func:`posterior_covariance` — the linearized (Gauss-Markov) posterior
  ``sigma^2 (J^T J + reg I)^{-1} (J^T J) (J^T J + reg I)^{-1}`` for
  i.i.d. measurement noise; the tests Monte-Carlo-gate the predicted
  marginals against empirical estimator scatter.
* :func:`identify_tip_load` — estimate the tip wrench from shape
  measurements: Gauss-Newton over loads with the equilibrium map
  ``loads -> qe*`` differentiated by the implicit-function rule
  (`cosserat.solve_statics_differentiable`), i.e. each Jacobian column is
  one IFT tangent through the statics solve — never through the Newton
  iteration itself.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import basis as basis_ops
from ..ops import chebyshev, smallsolve
from . import cosserat, rod

__all__ = [
    "SensingConfig",
    "SensingSolution",
    "measure",
    "measurement_size",
    "fit_strain",
    "posterior_covariance",
    "identify_tip_load",
]


@dataclasses.dataclass(frozen=True)
class SensingConfig:
    """Static sensor layout + estimator configuration (hashable, valid as a
    jit static argument like every config in the package).

    ``marker_fracs`` / ``strain_fracs`` are arclength FRACTIONS in
    ``(0, 1]`` of ``rod.length`` (the base is known — a marker there
    carries no information).  ``reg`` is the Tikhonov weight on ``qe``
    (needed when the sensor set under-determines the ``na*ne`` modes, e.g.
    tip-only tracking of a many-mode rod).
    """

    rod: rod.RodConfig = rod.RodConfig()
    marker_fracs: tuple = (0.25, 0.5, 0.75, 1.0)
    strain_fracs: tuple = ()
    pose_fracs: tuple = ()
    use_tip_quaternion: bool = False
    marker_weight: float = 1.0
    strain_weight: float = 1.0
    quat_weight: float = 1.0
    reg: float = 0.0
    iters: int = 24
    method: str = "picard"

    def __post_init__(self):
        for f in (tuple(self.marker_fracs) + tuple(self.strain_fracs)
                  + tuple(self.pose_fracs)):
            if not 0.0 < f <= 1.0:
                raise ValueError(
                    f"sensor fractions must lie in (0, 1], got {f}")

    @functools.cached_property
    def marker_interp(self) -> np.ndarray:
        """(k, n) spectral interpolation rows at the marker arclengths."""
        xs = tuple(float(f) * self.rod.length for f in self.marker_fracs)
        return chebyshev.interpolation_matrix(self.rod.n, xs,
                                              self.rod.length)

    @functools.cached_property
    def pose_interp(self) -> np.ndarray:
        """(k, n) interpolation rows at the 6-DoF pose stations."""
        xs = tuple(float(f) * self.rod.length for f in self.pose_fracs)
        return chebyshev.interpolation_matrix(self.rod.n, xs,
                                              self.rod.length)

    @functools.cached_property
    def strain_table(self) -> np.ndarray:
        """(k, ne) modal-basis table at the strain stations."""
        return basis_ops.basis_table(tuple(float(f) for f in
                                           self.strain_fracs),
                                     self.rod.ne, self.rod.basis)


def measurement_size(cfg: SensingConfig) -> int:
    return (3 * len(cfg.marker_fracs)
            + cfg.rod.na * len(cfg.strain_fracs)
            + 7 * len(cfg.pose_fracs)
            + (4 if cfg.use_tip_quaternion else 0))


def _canonical_quat(q):
    """Fix the double-cover sign: w >= 0 (ties keep the raw sign — the
    demo-family rods never reach w = 0 exactly)."""
    return q * jnp.where(q[..., :1] >= 0, 1.0, -1.0)


def measure(qe, cfg: SensingConfig = SensingConfig()):
    """Forward measurement model ``qe (..., na*ne) -> y (..., m)``.

    Runs the full spectral kinematics (`rod.rod_shape`, quaternion solve
    chained into position quadrature — `main.cpp:91-176` semantics), lifts
    the grid shape to the sensor arclengths, and flattens every enabled
    channel (markers, strain stations, tip quaternion) into one weighted
    vector.  Pure jax: ``jacfwd``/``vmap`` give exact batched sensitivity
    matrices, which is all the estimators below need.
    """
    qe = jnp.asarray(qe)
    rc = cfg.rod
    parts = []
    need_shape = (cfg.marker_fracs or cfg.pose_fracs
                  or cfg.use_tip_quaternion)
    if need_shape:
        sol = rod.rod_shape(qe, cfg=rc, method=cfg.method, iters=cfg.iters)
        # Full-grid fields: solution points are the tip-first unknowns
        # (grid indices 0..n-2); the base (index n-1) carries the known
        # BCs of the reference BVP — r_init = 0 (`main.cpp:163`) and
        # q_init = (1,0,0,0) (`main.cpp:109`).
        base_r = jnp.zeros(sol.positions.shape[:-2] + (1, 3), qe.dtype)
        r_full = jnp.concatenate([sol.positions, base_r], axis=-2)
        if cfg.marker_fracs:
            p = jnp.asarray(cfg.marker_interp, qe.dtype)
            markers = jnp.einsum("kn,...nc->...kc", p, r_full,
                                 precision="highest")
            parts.append(cfg.marker_weight
                         * markers.reshape(qe.shape[:-1] + (-1,)))
        if cfg.pose_fracs:
            # 6-DoF stations (EM-tracker analogue): position + quaternion
            # per station.  The quaternion field's components are smooth
            # along arclength, so spectral interpolation applies
            # componentwise; the sign is canonicalized per station.
            base_q = jnp.broadcast_to(
                jnp.asarray(rod.DEFAULT_Q_INIT, qe.dtype),
                sol.quaternions.shape[:-2] + (1, 4))
            q_full = jnp.concatenate([sol.quaternions, base_q], axis=-2)
            p = jnp.asarray(cfg.pose_interp, qe.dtype)
            pos = jnp.einsum("kn,...nc->...kc", p, r_full,
                             precision="highest")
            quat = _canonical_quat(jnp.einsum("kn,...nc->...kc", p, q_full,
                                              precision="highest"))
            parts.append(cfg.marker_weight
                         * pos.reshape(qe.shape[:-1] + (-1,)))
            parts.append(cfg.quat_weight
                         * quat.reshape(qe.shape[:-1] + (-1,)))
    if cfg.strain_fracs:
        table = jnp.asarray(cfg.strain_table, qe.dtype)
        strains = basis_ops.strain_at_points(qe, table)   # (..., k, na)
        parts.append(cfg.strain_weight
                     * strains.reshape(qe.shape[:-1] + (-1,)))
    if cfg.use_tip_quaternion:
        parts.append(cfg.quat_weight
                     * _canonical_quat(sol.tip_quaternion))
    if not parts:
        raise ValueError("SensingConfig defines no sensors")
    return jnp.concatenate(parts, axis=-1)


class SensingSolution(NamedTuple):
    """``qe (..., na*ne)``, residual 2-norm per sample, iterations used."""

    qe: jnp.ndarray
    residual_norm: jnp.ndarray
    iterations: jnp.ndarray


def _gauss_newton(fwd, y, z0, reg: float, tol: float, max_iter: int,
                  levenberg: float):
    """Batched damped Gauss-Newton on ``fwd(z) - y`` with Tikhonov ``reg``.

    Normal-equation steps ``(J^T J + (reg + lm) I) d = J^T r + reg z``
    solved by the unrolled VPU Gauss-Jordan (`ops/smallsolve.py` — tiny
    static systems; LAPACK batched LU is pathological on TPU), with a
    per-sample backtracking step search over ``{1, 1/2, ..., 1/16}`` on the
    REGULARIZED objective.  ``fwd`` maps ``(..., p) -> (..., m)`` over
    arbitrary leading axes; the Jacobian is built by ``jacfwd`` through the
    whole spectral forward model, shape-preserving under batch.
    """
    z0 = jnp.asarray(z0)
    p = z0.shape[-1]
    eye = jnp.eye(p, dtype=z0.dtype)
    alphas = jnp.asarray([1.0, 0.5, 0.25, 0.125, 0.0625], z0.dtype)

    def resid(z):
        return fwd(z) - y

    def objective(r, z):
        return (jnp.sum(r * r, axis=-1)
                + reg * jnp.sum(z * z, axis=-1))

    def cond(state):
        z, k, r = state
        return jnp.logical_and(k < max_iter,
                               jnp.max(jnp.linalg.norm(r, axis=-1)) > tol)

    def _jac(z):
        # jacfwd over the last axis only, batched over leading dims: push
        # the p unit directions through in one vmap (p is tiny — <= na*ne).
        basis = jnp.eye(p, dtype=z.dtype)
        def one(e):
            return jax.jvp(resid, (z,), (jnp.broadcast_to(e, z.shape),))[1]
        cols = jax.vmap(one)(basis)                  # (p, ..., m)
        return jnp.moveaxis(cols, 0, -1)             # (..., m, p)

    def body(state):
        z, k, r = state
        jac = _jac(z)
        jtj = jnp.einsum("...mi,...mj->...ij", jac, jac)
        jtr = jnp.einsum("...mi,...m->...i", jac, r)
        # Levenberg damping RELATIVE to the Jacobian scale (dtype-robust):
        # at a straight start the higher torsion modes have exactly zero
        # sensitivity (their arclength integral vanishes by Legendre
        # orthogonality), so the undamped normal matrix is singular — the
        # damped step is simply zero along those null directions and the
        # modes re-enter once the iterate bends.  The damping moves only
        # the path, not the fixpoint (J^T r + reg z = 0 either way).
        diag = jnp.einsum("...ii->...i", jtj)
        lm = levenberg * (1.0 + jnp.max(diag, axis=-1))
        lhs = jtj + (reg + lm[..., None])[..., None] * eye
        rhs = jtr + reg * z
        step = smallsolve.gauss_jordan_solve(lhs, rhs)
        # Per-sample backtracking on the regularized objective; candidate 0
        # is the current iterate so a worthless step degrades to 1/16 of
        # itself rather than diverging.
        a = jnp.concatenate([jnp.zeros((1,), z.dtype), alphas]).reshape(
            (6,) + (1,) * z.ndim)
        cand = z[None] - a * step[None]               # (6, ..., p)
        r_c = resid(cand)
        obj = objective(r_c, cand)                    # (6, ...)
        ok = obj[1:] < obj[0]
        idx = 1 + jnp.where(jnp.any(ok, axis=0), jnp.argmax(ok, axis=0),
                            jnp.argmin(obj[1:], axis=0))
        sel = idx.reshape((1,) + idx.shape + (1,))
        z = jnp.take_along_axis(cand, sel, axis=0)[0]
        r = jnp.take_along_axis(r_c, sel, axis=0)[0]
        return z, k + 1, r

    z, k, r = jax.lax.while_loop(cond, body,
                                 (z0, jnp.zeros((), jnp.int32), resid(z0)))
    return z, k, r


def fit_strain(measurements, cfg: SensingConfig = SensingConfig(),
               qe0=None, tol: float = 1e-10, max_iter: int = 25,
               levenberg: float = 1e-7) -> SensingSolution:
    """Recover modal strain ``qe`` from measurement vectors.

    ``measurements (..., m)`` with ``m = measurement_size(cfg)`` — batched
    over leading axes in ONE device call (the Jacobian build, normal
    solves, and line search are all shape-preserving under batch).
    ``tol`` is on the max per-sample residual 2-norm; with noisy data set
    it below the noise floor and let ``max_iter`` terminate.  jittable.
    """
    y = jnp.asarray(measurements)
    nq = cfg.rod.na * cfg.rod.ne
    if qe0 is None:
        qe0 = jnp.zeros(y.shape[:-1] + (nq,), y.dtype)
    fwd = functools.partial(measure, cfg=cfg)
    z, k, r = _gauss_newton(fwd, y, jnp.asarray(qe0, y.dtype), cfg.reg,
                            tol, max_iter, levenberg)
    return SensingSolution(qe=z, residual_norm=jnp.linalg.norm(r, axis=-1),
                           iterations=k)


def posterior_covariance(qe, cfg: SensingConfig = SensingConfig(),
                         noise_sigma: float = 1.0):
    """Linearized estimator covariance at ``qe`` for i.i.d. noise.

    Gauss-Markov: with ``J = d measure/d qe`` and Tikhonov ``reg``, the
    (possibly biased) regularized estimator has covariance
    ``sigma^2 A^{-1} J^T J A^{-1}`` with ``A = J^T J + reg I`` — for
    ``reg = 0`` just ``sigma^2 (J^T J)^{-1}``, the Cramér-Rao bound the
    Monte-Carlo test checks the estimator actually attains.  Batched over
    leading axes of ``qe``; returns ``(..., nq, nq)``.
    """
    qe = jnp.asarray(qe)
    p = qe.shape[-1]
    basis = jnp.eye(p, dtype=qe.dtype)
    fwd = functools.partial(measure, cfg=cfg)

    def one(e):
        return jax.jvp(fwd, (qe,), (jnp.broadcast_to(e, qe.shape),))[1]

    jac = jnp.moveaxis(jax.vmap(one)(basis), 0, -1)     # (..., m, p)
    jtj = jnp.einsum("...mi,...mj->...ij", jac, jac)
    a = jtj + cfg.reg * jnp.eye(p, dtype=qe.dtype)
    a_inv = smallsolve.gauss_jordan_solve(a, jnp.eye(p, dtype=qe.dtype))
    return (noise_sigma ** 2) * jnp.einsum(
        "...ij,...jk,...kl->...il", a_inv, jtj, a_inv)


def identify_tip_load(measurements, cfg: SensingConfig = SensingConfig(),
                      statics: cosserat.StaticsConfig | None = None,
                      estimate_moment: bool = False, theta0=None,
                      tol: float = 1e-10, max_iter: int = 25,
                      levenberg: float = 1e-9,
                      statics_tol: float = 1e-9,
                      statics_max_iter: int = 30):
    """Estimate the tip wrench from shape measurements of an equilibrium.

    Forward map: ``theta -> qe*(theta) -> measure(qe*)`` where ``qe*`` is
    the static equilibrium under tip load ``theta`` (force, optionally
    + moment), differentiated by the IFT rule of
    :func:`cosserat.solve_statics_differentiable` — each Gauss-Newton
    Jacobian column is one implicit tangent through the statics solve, so
    the iteration count of the inner Newton never enters the AD graph.
    Batched over leading axes of ``measurements``.  Returns
    ``(theta (..., 3 or 6), SensingSolution)`` — ``theta[..., :3]`` is the
    force, ``theta[..., 3:]`` the moment when ``estimate_moment``.
    """
    y = jnp.asarray(measurements)
    sc = statics if statics is not None else cosserat.StaticsConfig(
        rod=cfg.rod)
    if sc.rod != cfg.rod:
        raise ValueError("statics.rod and sensing rod configs differ")
    p = 6 if estimate_moment else 3
    if theta0 is None:
        theta0 = jnp.zeros(y.shape[:-1] + (p,), y.dtype)

    m = measurement_size(cfg)

    def one(t):
        force = t[:3]
        moment = t[3:] if estimate_moment else jnp.zeros((3,), t.dtype)
        qe = cosserat.solve_statics_differentiable(
            force, moment, sc, statics_tol, statics_max_iter, cfg.iters)
        return measure(qe, cfg)

    def fwd(theta):
        # The inner statics Newton runs a scalar-cond while_loop, so batch
        # axes (samples AND the line search's candidate axis) are lifted by
        # vmap over a flattened leading dim instead of broadcasting into
        # the loop carry.
        flat = theta.reshape((-1, p))
        out = jax.vmap(one)(flat)
        return out.reshape(theta.shape[:-1] + (m,))

    z, k, r = _gauss_newton(fwd, y, jnp.asarray(theta0, y.dtype), 0.0,
                            tol, max_iter, levenberg)
    sol = SensingSolution(qe=z, residual_norm=jnp.linalg.norm(r, axis=-1),
                          iterations=k)
    return z, sol
