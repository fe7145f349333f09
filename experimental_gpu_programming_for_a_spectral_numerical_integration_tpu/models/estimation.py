"""Dynamic state estimation — EKF / RTS smoothing of rod motion.

Completes the sensing stack (models/sensing.py recovers a STATIC shape
per measurement frame) with time-recursive estimation: an extended
Kalman filter whose process model is one RK4 step of the strain-space
Lagrangian dynamics (models/dynamics.py) and whose measurement model is
the spectral sensing map (markers / strain stations / pose stations),
plus the Rauch–Tung–Striebel backward pass.  Everything is exact-AD:
the state-transition Jacobian ``F`` is the linearization of the full
nonlinear integrator step (forward-mode unit directions through the
spectral solves' implicit tangents), the measurement Jacobian ``H`` is
``jacfwd`` of the sensing map — no hand-derived or finite-difference
system matrices anywhere.

State: ``x = [qe, qd] (..., 2 nq)``.  All operations are
shape-preserving over leading batch axes, so B independent filters (e.g.
Monte-Carlo consistency runs, or a fleet of catheters) run in ONE
``lax.scan``.  Covariances use the Joseph stabilized update.

The reference has no estimation layer (forward demo only,
`/root/reference/main.cpp:181-205`); this realizes the deployment loop
its kinematics exist for.  Gates (tests/test_estimation.py): NEES
chi-square consistency against Monte-Carlo truth, filter beats
per-frame static fits, RTS beats the filter, driven-protocol tracking.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import smallsolve
from . import dynamics as dynamics_mod
from . import sensing as sensing_mod

__all__ = [
    "FilterConfig",
    "FilterResult",
    "ekf",
    "rts_smoother",
    "simulate_measurements",
]


@dataclasses.dataclass(frozen=True)
class FilterConfig:
    """Process + measurement models and noise levels (hashable/static).

    ``q_accel``: white modal-acceleration process noise PSD — the
    standard piecewise-constant-acceleration discretization fills
    ``Q = q_accel [[dt^4/4, dt^3/2], [dt^3/2, dt^2]]`` per mode.
    ``r_sigma``: i.i.d. measurement noise std in the WEIGHTED measurement
    space of :func:`sensing.measure` (set the per-channel weights in the
    sensing config to whiten heterogeneous sensors).
    """

    dynamics: dynamics_mod.DynamicsConfig
    sensing: sensing_mod.SensingConfig
    dt: float
    q_accel: float = 1e-6
    r_sigma: float = 1e-3
    iters: int = 12

    def __post_init__(self):
        if self.dynamics.rod != self.sensing.rod:
            raise ValueError("dynamics and sensing rod configs differ")

    @property
    def nq(self) -> int:
        return self.dynamics.nq

    @functools.cached_property
    def process_noise(self) -> np.ndarray:
        """(2 nq, 2 nq) discretized white-acceleration covariance."""
        nq, dt = self.nq, self.dt
        eye = np.eye(nq)
        q = np.block([
            [dt ** 4 / 4.0 * eye, dt ** 3 / 2.0 * eye],
            [dt ** 3 / 2.0 * eye, dt ** 2 * eye],
        ])
        return self.q_accel * q


class FilterResult(NamedTuple):
    """Stacked filter history, leading time axis.

    ``xs (steps, ..., 2nq)`` / ``covs`` are the POSTERIOR (updated)
    estimates; ``xs_pred`` / ``covs_pred`` the priors and ``fs`` the
    step-transition Jacobians (kept for the RTS backward pass);
    ``nis (steps, ...)`` the normalized innovation squared — its mean
    should sit near the measurement dimension for a consistent filter.
    """

    xs: jnp.ndarray
    covs: jnp.ndarray
    xs_pred: jnp.ndarray
    covs_pred: jnp.ndarray
    fs: jnp.ndarray
    nis: jnp.ndarray


def _rk4_step(x, t, cfg: FilterConfig, tip_force=None, tip_moment=None):
    """One RK4 step of the strain-space dynamics on the packed state."""
    nq = cfg.nq
    dt = cfg.dt
    dtype = x.dtype

    def deriv(xx, tt):
        qe, qd = xx[..., :nq], xx[..., nq:]
        qdd = dynamics_mod.accelerations(
            qe, qd, cfg.dynamics,
            dynamics_mod._load_at(tip_force, tt, dtype), cfg.iters,
            tip_moment=dynamics_mod._load_at(tip_moment, tt, dtype))
        return jnp.concatenate([qd, qdd], axis=-1)

    k1 = deriv(x, t)
    k2 = deriv(x + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = deriv(x + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = deriv(x + dt * k3, t + dt)
    return x + dt / 6.0 * (k1 + 2 * k2 + 2 * k3 + k4)


def _measure_state(x, cfg: FilterConfig):
    return sensing_mod.measure(x[..., :cfg.nq], cfg.sensing)


def _jac_columns(fn, x, width):
    """(..., out, width) forward-mode Jacobian over the last axis —
    the shared linearize-over-unit-directions pattern (batch-safe)."""
    _, f_lin = jax.linearize(fn, x)
    eyes = jnp.eye(width, dtype=x.dtype)
    cols = jax.vmap(lambda e: f_lin(jnp.broadcast_to(e, x.shape)))(eyes)
    return jnp.moveaxis(cols, 0, -1)


def ekf(ys, cfg: FilterConfig, x0, p0, t0: float = 0.0,
        tip_force=None, tip_moment=None) -> FilterResult:
    """Extended Kalman filter over a measurement sequence.

    ``ys (steps, ..., m)``: one weighted measurement vector per step
    (taken AFTER each process step — the predict/update cycle);
    ``x0 (..., 2nq)`` / ``p0 (..., 2nq, 2nq)``: prior mean/covariance.
    ``tip_force`` / ``tip_moment``: KNOWN drives (constant or callables
    of time, as in :func:`dynamics.simulate`) — the filter tracks the
    driven motion and estimates only the state.  Batched over leading
    axes; jittable.
    """
    ys = jnp.asarray(ys)
    x0 = jnp.asarray(x0)
    dtype = x0.dtype
    d = 2 * cfg.nq
    p0 = jnp.broadcast_to(jnp.asarray(p0, dtype), x0.shape + (d,))
    q_proc = jnp.asarray(cfg.process_noise, dtype)
    r_var = jnp.asarray(cfg.r_sigma ** 2, dtype)
    eye_d = jnp.eye(d, dtype=dtype)

    def step(carry, y):
        x, p, t = carry
        t1 = t + cfg.dt

        # -- predict -------------------------------------------------
        fstep = lambda xx: _rk4_step(xx, t, cfg, tip_force, tip_moment)
        x_pred = fstep(x)
        f = _jac_columns(fstep, x, d)                     # (..., d, d)
        p_pred = jnp.einsum("...ij,...jk,...lk->...il", f, p, f) + q_proc

        # -- update --------------------------------------------------
        hfn = lambda xx: _measure_state(xx, cfg)
        y_hat = hfn(x_pred)
        h = _jac_columns(hfn, x_pred, d)                  # (..., m, d)
        nu = y - y_hat
        m_eye = jnp.eye(y.shape[-1], dtype=dtype)
        s = jnp.einsum("...mi,...ij,...kj->...mk", h, p_pred, h) \
            + r_var * m_eye
        hp = jnp.einsum("...mi,...ij->...mj", h, p_pred)  # (..., m, d)
        k_t = smallsolve.gauss_jordan_solve(s, hp)        # S^-1 H P
        x_new = x_pred + jnp.einsum("...md,...m->...d", k_t, nu)
        ikh = eye_d - jnp.einsum("...md,...mi->...di", k_t, h)
        # Joseph form: PSD-stable under roundoff
        p_new = (jnp.einsum("...di,...ij,...ej->...de", ikh, p_pred, ikh)
                 + r_var * jnp.einsum("...md,...me->...de", k_t, k_t))
        nis = jnp.einsum("...m,...m->...", nu,
                         smallsolve.gauss_jordan_solve(s, nu))
        return (x_new, p_new, t1), (x_new, p_new, x_pred, p_pred, f, nis)

    (_, _, _), hist = jax.lax.scan(
        step, (x0, p0, jnp.asarray(t0, dtype)), ys)
    return FilterResult(*hist)


def rts_smoother(result: FilterResult, cfg: FilterConfig):
    """Rauch–Tung–Striebel backward pass: smoothed means/covariances
    ``(steps, ..., 2nq)`` / ``(steps, ..., 2nq, 2nq)`` from the stored
    filter history (gain ``G = P F^T P_pred^{-1}`` per step)."""
    xs, ps = result.xs, result.covs
    xp, pp, fs = result.xs_pred, result.covs_pred, result.fs

    def back(carry, inp):
        x_next_s, p_next_s = carry
        x, p, x_pred1, p_pred1, f1 = inp
        # G = P F^T P_pred^{-1}  (solve on the symmetric predicted cov)
        pf = jnp.einsum("...ij,...kj->...ik", p, f1)       # P F^T
        g = jnp.swapaxes(
            smallsolve.gauss_jordan_solve(p_pred1, jnp.swapaxes(pf, -1, -2)),
            -1, -2)
        x_s = x + jnp.einsum("...ij,...j->...i", g, x_next_s - x_pred1)
        p_s = p + jnp.einsum("...ij,...jk,...lk->...il",
                             g, p_next_s - p_pred1, g)
        return (x_s, p_s), (x_s, p_s)

    # the last filtered state is already smoothed; walk backwards over
    # transitions t -> t+1 using the PREDICTED quantities of step t+1
    init = (xs[-1], ps[-1])
    inputs = (xs[:-1], ps[:-1], xp[1:], pp[1:], fs[1:])
    (_, _), (xs_s, ps_s) = jax.lax.scan(back, init, inputs, reverse=True)
    xs_s = jnp.concatenate([xs_s, xs[-1:]], axis=0)
    ps_s = jnp.concatenate([ps_s, ps[-1:]], axis=0)
    return xs_s, ps_s


def simulate_measurements(qe0, qd0, cfg: FilterConfig, steps: int,
                          key, t0: float = 0.0, tip_force=None,
                          tip_moment=None):
    """Truth trajectory + noisy measurement sequence for filter tests:
    runs the SAME process model as the filter and adds i.i.d. Gaussian
    noise of ``cfg.r_sigma`` in the weighted measurement space.  Returns
    ``(xs_true (steps, ..., 2nq), ys (steps, ..., m))``."""
    x0 = jnp.concatenate([jnp.asarray(qe0), jnp.asarray(qd0)], axis=-1)

    def step(carry, _):
        x, t = carry
        x1 = _rk4_step(x, t, cfg, tip_force, tip_moment)
        return (x1, t + cfg.dt), x1

    (_, _), xs = jax.lax.scan(
        step, (x0, jnp.asarray(t0, x0.dtype)), None, length=steps)
    y_clean = jax.vmap(lambda x: _measure_state(x, cfg))(xs)
    noise = cfg.r_sigma * jax.random.normal(key, y_clean.shape,
                                            dtype=y_clean.dtype)
    return xs, y_clean + noise
