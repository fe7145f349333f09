"""Analytic-solution IVP suite (BASELINE.json config #2).

Closed-form linear IVPs driven through the same collocation core as the rod
workload, used for convergence sweeps (the 'spectral accuracy' acceptance
criterion — exponential error decay in N, SURVEY.md §4d) and as examples of
the general ``y' = M(X) y + g(X)`` API with state dimensions other than the
rod's d=4:

* :func:`exponential_ivp` — ``y' = lam y`` (d=1), solution ``y0 e^{lam X}``.
* :func:`oscillator_ivp` — forced oscillator ``u'' + w^2 u = A sin(nu X)``
  as a d=2 first-order system, with its textbook particular+homogeneous
  closed form (non-resonant ``nu != w``).
* :func:`rotating_frame_ivp` — ``q' = 1/2 A(k) q`` with *constant* curvature
  — the rod kinematics case whose exact solution is the quaternion
  exponential; ties the rod workload itself to a closed form.
* :func:`convergence_sweep` — error-vs-N curves for any of the above.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..ops import collocation as coll
from ..ops import lie

__all__ = [
    "exponential_ivp",
    "oscillator_ivp",
    "rotating_frame_ivp",
    "convergence_sweep",
]


def _solve(grid, m_blocks, y0, g=None, method="dense", iters=40):
    if method == "dense":
        return coll.solve_ivp_dense(grid, m_blocks, y0, g=g)
    return coll.solve_ivp_picard(grid, m_blocks, y0, g=g, iters=iters)


def exponential_ivp(lam: float = -2.5, y0: float = 1.0, n: int = 16,
                    length: float = 1.0, method: str = "dense", dtype=jnp.float64):
    """``y' = lam y, y(0) = y0`` on ``[0, length]``.

    Returns ``(numeric, exact)`` at the n-1 unknown CGL points (tip first).
    """
    grid = coll.make_grid(n, length)
    npts = grid.num_unknown
    m = jnp.full((npts, 1, 1), lam, dtype=dtype)
    sol = _solve(grid, m, jnp.asarray([y0], dtype), method=method)
    exact = y0 * np.exp(lam * grid.points[:npts])
    return sol[..., 0], jnp.asarray(exact, dtype)


def oscillator_ivp(omega: float = 6.0, forcing_amp: float = 1.0,
                   forcing_freq: float = 2.0, u0: float = 1.0, v0: float = 0.0,
                   n: int = 16, length: float = 1.0, method: str = "dense",
                   dtype=jnp.float64):
    """Forced oscillator ``u'' + omega^2 u = A sin(nu X)``, ``u(0)=u0``,
    ``u'(0)=v0``, as the d=2 system ``(u, v)' = [[0,1],[-w^2,0]](u,v) +
    (0, A sin(nu X))``.  Non-resonant (``nu != omega``) closed form:

    ``u_p = A/(w^2-nu^2) sin(nu X)``;
    ``u = (u0) cos(wX) + (v0 - nu A/(w^2-nu^2))/w sin(wX) + u_p``.

    Returns ``(numeric (np, 2), exact (np, 2))``.
    """
    if abs(omega - forcing_freq) < 1e-9:
        raise ValueError("resonant forcing_freq == omega not supported")
    grid = coll.make_grid(n, length)
    npts = grid.num_unknown
    x = grid.points[:npts]
    m_one = np.array([[0.0, 1.0], [-(omega**2), 0.0]])
    m = jnp.asarray(np.broadcast_to(m_one, (npts, 2, 2)), dtype)
    g = jnp.asarray(
        np.stack([np.zeros(npts), forcing_amp * np.sin(forcing_freq * x)], axis=-1),
        dtype,
    )
    sol = _solve(grid, m, jnp.asarray([u0, v0], dtype), g=g, method=method)

    c_p = forcing_amp / (omega**2 - forcing_freq**2)
    b = (v0 - forcing_freq * c_p) / omega
    u = u0 * np.cos(omega * x) + b * np.sin(omega * x) + c_p * np.sin(forcing_freq * x)
    v = (-u0 * omega * np.sin(omega * x) + b * omega * np.cos(omega * x)
         + c_p * forcing_freq * np.cos(forcing_freq * x))
    exact = jnp.asarray(np.stack([u, v], axis=-1), dtype)
    return sol, exact


def rotating_frame_ivp(k=(0.0, 2.0, 0.0), q0=(1.0, 0.0, 0.0, 0.0), n: int = 16,
                       length: float = 1.0, method: str = "dense",
                       dtype=jnp.float64):
    """Constant-curvature quaternion kinematics ``q' = 1/2 A(k) q``.

    ``A(K) q = q (x) (0, K)`` is *right* multiplication by the body rate, so
    the exact solution is ``q(X) = q0 (x) exp(X k / 2)`` with
    ``exp(theta u / 2) = (cos(theta/2), u sin(theta/2))``, ``theta = |k| X``.
    This is the rod workload (`/root/reference/main.cpp:91-118`) specialized
    to a single constant mode, giving it a closed-form gate.
    """
    grid = coll.make_grid(n, length)
    npts = grid.num_unknown
    k = np.asarray(k, np.float64)
    m_one = 0.5 * np.asarray(lie.quat_skew(jnp.asarray(k)))
    m = jnp.asarray(np.broadcast_to(m_one, (npts, 4, 4)), dtype)
    sol = _solve(grid, m, jnp.asarray(q0, dtype), method=method)

    x = grid.points[:npts]
    norm = np.linalg.norm(k)
    theta = norm * x
    if norm < 1e-300:
        exp_q = np.stack([np.ones_like(x), 0 * x, 0 * x, 0 * x], axis=-1)
    else:
        u = k / norm
        exp_q = np.stack(
            [np.cos(theta / 2)]
            + [u[i] * np.sin(theta / 2) for i in range(3)],
            axis=-1,
        )
    q0j = jnp.asarray(np.broadcast_to(np.asarray(q0, np.float64), exp_q.shape))
    exact = lie.quat_multiply(q0j, jnp.asarray(exp_q))
    return sol, jnp.asarray(exact, dtype)


def convergence_sweep(problem, ns=(6, 8, 12, 16, 24, 32), **kwargs):
    """Max-abs error at the unknown points vs N.  ``problem`` is one of the
    suite functions; returns ``{n: error}`` — expected exponential decay."""
    errors = {}
    for n in ns:
        numeric, exact = problem(n=n, **kwargs)
        errors[n] = float(jnp.max(jnp.abs(numeric - exact)))
    return errors
