"""Concentric-tube robot layer (models/ctr.py).

Physics gates: the twist-rigid aligned state, the linearized cosh
closed form, an f64 shooting oracle for the nonlinear two-tube BVP,
spectral convergence, the exact snapping threshold ``sqrt(c) L = pi/2``,
post-snap bistability, constant-curvature shape closed forms (including
parity with the modal single-rod solver), telescoping reduction, and
IFT differentiability against finite differences.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.models import ctr, rod
from experimental_gpu_programming_for_a_spectral_numerical_integration_tpu.ops import chebyshev


def _pair(kappa, stiff_ratio=1.0, g_over_k=1.0 / 1.3, n=24, length=1.0):
    """Two-tube config: tube 1 scaled by ``stiff_ratio``; ``g = k *
    g_over_k`` (circular section, nu = 0.3 → g/k = 1/1.3)."""
    return ctr.CTRConfig(
        tubes=(
            ctr.Tube(curvature=kappa, bending_stiffness=stiff_ratio,
                     torsional_stiffness=stiff_ratio * g_over_k),
            ctr.Tube(curvature=kappa, bending_stiffness=1.0,
                     torsional_stiffness=g_over_k),
        ),
        n=n, length=length,
    )


def _pair_with_c(c_target, n=24, length=1.0):
    """Identical-tube pair whose relative-angle ODE is phi'' = c sin phi
    with c = c_target: c = kappa^2 (k/2) (2/g) = kappa^2 k / g."""
    g_over_k = 1.0 / 1.3
    kappa = np.sqrt(c_target * g_over_k)
    return _pair(kappa, n=n, length=length)


def _shoot_oracle(c, alpha, length, xs):
    """f64 shooting oracle for phi'' = c sin(phi), phi(0) = alpha,
    phi'(L) = 0: RK4 + bisection on phi'(0), cubic-Hermite readout at
    the (off-grid) query points ``xs`` (measured from the base)."""

    def integrate(p, n_steps):
        h = length / n_steps
        y = np.array([alpha, p], np.float64)
        traj = np.empty((n_steps + 1, 2))
        traj[0] = y

        def f(y):
            return np.array([y[1], c * np.sin(y[0])])

        for i in range(n_steps):
            k1 = f(y)
            k2 = f(y + 0.5 * h * k1)
            k3 = f(y + 0.5 * h * k2)
            k4 = f(y + h * k3)
            y = y + (h / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            traj[i + 1] = y
        return traj

    lo, hi = -20.0, 0.0
    assert integrate(hi, 2000)[-1, 1] > 0 and integrate(lo, 2000)[-1, 1] < 0
    for _ in range(80):
        mid = 0.5 * (lo + hi)
        if integrate(mid, 2000)[-1, 1] > 0:
            hi = mid
        else:
            lo = mid
    p = 0.5 * (lo + hi)
    n_steps = 40000
    h = length / n_steps
    traj = integrate(p, n_steps)
    out = []
    for x in xs:
        i = min(int(x / h), n_steps - 1)
        t = x / h - i
        y0, d0 = traj[i]
        y1, d1 = traj[i + 1]
        h00 = (1 + 2 * t) * (1 - t) ** 2
        h10 = t * (1 - t) ** 2
        h01 = t * t * (3 - 2 * t)
        h11 = t * t * (t - 1)
        out.append(h00 * y0 + h * h10 * d0 + h01 * y1 + h * h11 * d1)
    return np.array(out)


def test_aligned_pair_is_twist_rigid():
    """Equal base angles → zero tube-tube moment; theta == alpha exactly
    and the solver accepts it at iteration 0."""
    cfg = _pair(kappa=2.0, stiff_ratio=3.0)
    alphas = jnp.asarray([0.7, 0.7])
    sol = ctr.solve_ctr(alphas, cfg)
    np.testing.assert_allclose(np.asarray(sol.theta), 0.7, rtol=0, atol=1e-12)
    assert int(sol.iterations) == 0
    assert float(ctr.ctr_stability(sol.theta, alphas, cfg)) > 0.0


def test_linear_limit_matches_cosh_closed_form():
    """Small relative angle: phi(s) = phi0 cosh(sqrt(c)(L-s))/cosh(sqrt(c)L)."""
    c = 1.44
    cfg = _pair_with_c(c, n=24)
    phi0 = 1e-3
    alphas = jnp.asarray([phi0 / 2, -phi0 / 2])
    sol = ctr.solve_ctr(alphas, cfg, tol=1e-13)
    theta = np.asarray(sol.theta)
    phi = theta[0] - theta[1]                       # (n,) tip first
    s = np.asarray(cfg.grid.points)                 # descending, s in [0, 1]
    rc = np.sqrt(c)
    exact = phi0 * np.cosh(rc * (1.0 - s)) / np.cosh(rc)
    # the ~1.9e-8 floor is the closed form's own O(phi0^2) linearization
    # error — the discretization sits below 1e-10 (convergence test)
    np.testing.assert_allclose(phi, exact, rtol=5e-8)


def test_nonlinear_matches_shooting_oracle():
    c = 1.44
    cfg = _pair_with_c(c, n=24)
    alpha = 2.4
    alphas = jnp.asarray([alpha / 2, -alpha / 2])
    sol = ctr.solve_ctr(alphas, cfg, tol=1e-13)
    theta = np.asarray(sol.theta)
    phi = theta[0] - theta[1]
    s = np.asarray(cfg.grid.points)
    exact = _shoot_oracle(c, alpha, 1.0, list(s))
    np.testing.assert_allclose(phi, exact, rtol=2e-8, atol=2e-9)


def test_spectral_convergence_of_tip_twist():
    """Tip relative angle converges spectrally in n (Ritz + CC quadrature
    inherit the grid's exponential accuracy for smooth solutions)."""
    c = 2.25
    alpha = 2.0
    tips = {}
    for n in (10, 14, 28):
        cfg = _pair_with_c(c, n=n)
        sol = ctr.solve_ctr(jnp.asarray([alpha / 2, -alpha / 2]), cfg,
                            tol=1e-13)
        th = np.asarray(sol.theta)
        tips[n] = th[0, 0] - th[1, 0]
    e10 = abs(tips[10] - tips[28])
    e14 = abs(tips[14] - tips[28])
    assert e14 < 1e-9, e14
    assert e14 < e10 * 0.2 or e10 < 1e-12


def test_snapping_threshold_exact():
    """The antagonist state phi = pi changes stability exactly at
    sqrt(c) L = pi/2 (linearized second variation with delta(0)=0,
    delta'(L)=0 admits sin(sqrt(c) s) first)."""
    for margin, stable in ((0.9, True), (1.1, False)):
        c = (margin * np.pi / 2) ** 2
        cfg = _pair_with_c(c, n=24)
        assert np.isclose(ctr.two_tube_snap_parameter(cfg),
                          margin * np.pi / 2, rtol=1e-12)
        alphas = jnp.asarray([np.pi / 2, -np.pi / 2])
        sol = ctr.solve_ctr(alphas, cfg)
        # theta == alpha (phi == pi) is an exact equilibrium either way
        np.testing.assert_allclose(
            np.asarray(sol.theta[0] - sol.theta[1]), np.pi, atol=1e-12)
        lam = float(ctr.ctr_stability(sol.theta, alphas, cfg))
        assert (lam > 0) == stable, (margin, lam)


def test_post_snap_bistability():
    """Above threshold the antagonist actuation admits two mirror-image
    STABLE branches away from phi = pi."""
    c = (1.15 * np.pi / 2) ** 2
    cfg = _pair_with_c(c, n=24)
    alphas = jnp.asarray([np.pi / 2, -np.pi / 2])
    s = np.asarray(cfg.grid.points)
    rc = np.sqrt(c)
    branches = []
    for sign in (+1.0, -1.0):
        # perturb along the unstable mode sin(sqrt(c) s) (vanishes at
        # the base) with finite amplitude — a generic small kick relaxes
        # back to the pi saddle under the norm-decreasing line search
        pert = sign * 1.0 * np.sin(rc * s)
        theta0 = jnp.asarray(np.stack([np.pi / 2 + pert / 2,
                                       -np.pi / 2 - pert / 2]))
        sol = ctr.solve_ctr(alphas, cfg, theta0=theta0, tol=1e-12)
        phi_tip = float(sol.theta[0, 0] - sol.theta[1, 0])
        assert float(jnp.linalg.norm(sol.residual)) < 1e-10
        assert float(ctr.ctr_stability(sol.theta, alphas, cfg)) > 0.0
        branches.append(phi_tip)
    lo, hi = sorted(branches)
    assert hi - np.pi > 0.05 and np.pi - lo > 0.05
    np.testing.assert_allclose(hi - np.pi, np.pi - lo, rtol=1e-6)


def test_aligned_shape_constant_curvature_circle():
    """Aligned tubes bend on a circular arc of the blended curvature;
    cross-gate the pointwise-strain shape path against the closed form
    AND the modal single-rod solver (ne = 1 constant mode)."""
    kap1, kap2, k1 = 2.0, 1.0, 3.0
    cfg = ctr.CTRConfig(
        tubes=(ctr.Tube(kap1, k1, k1 / 1.3), ctr.Tube(kap2, 1.0, 1.0 / 1.3)),
        n=16)
    alpha = 0.3
    alphas = jnp.asarray([alpha, alpha])
    sol = ctr.solve_ctr(alphas, cfg)
    shape = ctr.ctr_shape(sol.theta, cfg, method="dense")
    kc = (k1 * kap1 + 1.0 * kap2) / (k1 + 1.0)
    s = np.asarray(cfg.grid.points)[:-1]
    a_cross_e1 = np.array([0.0, np.sin(alpha), -np.cos(alpha)])
    exact = (np.sin(kc * s) / kc)[:, None] * np.array([1.0, 0, 0]) \
        + ((1 - np.cos(kc * s)) / kc)[:, None] * a_cross_e1
    np.testing.assert_allclose(np.asarray(shape.positions), exact,
                               atol=1e-11)
    rc = rod.RodConfig(n=16, na=3, ne=1)
    qe = jnp.asarray([0.0, kc * np.cos(alpha), kc * np.sin(alpha)])
    ref = rod.rod_shape(qe, cfg=rc, method="dense")
    np.testing.assert_allclose(np.asarray(shape.positions),
                               np.asarray(ref.positions), atol=1e-12)
    np.testing.assert_allclose(np.asarray(shape.quaternions),
                               np.asarray(ref.quaternions), atol=1e-12)


def test_batched_solve_matches_per_sample():
    c = 1.0
    cfg = _pair_with_c(c, n=16)
    phis = np.linspace(0.3, 2.4, 5)
    alphas = jnp.asarray(np.stack([phis / 2, -phis / 2], axis=-1))
    batched = ctr.solve_ctr(alphas, cfg, tol=1e-12)
    for b in range(5):
        single = ctr.solve_ctr(alphas[b], cfg, tol=1e-12)
        np.testing.assert_allclose(np.asarray(batched.theta[b]),
                                   np.asarray(single.theta), atol=1e-10)
    tips = ctr.ctr_shape(batched.theta, cfg).positions[:, 0]
    assert tips.shape == (5, 3)


def test_ift_jacobian_matches_finite_differences():
    cfg = _pair_with_c(1.44, n=16)
    alphas = np.array([0.9, -0.7])
    ell = 1.0

    def tip(a, l):
        theta = ctr.solve_ctr_differentiable(jnp.asarray(a), cfg,
                                             length=l, tol=1e-12)
        return ctr.ctr_shape(theta, cfg, length=l,
                             method="dense").positions[0]

    jac_a = np.asarray(jax.jacfwd(tip, argnums=0)(jnp.asarray(alphas),
                                                  jnp.asarray(ell)))
    jac_l = np.asarray(jax.jacfwd(tip, argnums=1)(jnp.asarray(alphas),
                                                  jnp.asarray(ell)))
    eps = 1e-6
    for j in range(2):
        da = np.zeros(2)
        da[j] = eps
        fd = (np.asarray(tip(alphas + da, ell))
              - np.asarray(tip(alphas - da, ell))) / (2 * eps)
        np.testing.assert_allclose(jac_a[:, j], fd, rtol=2e-5, atol=1e-8)
    fd_l = (np.asarray(tip(alphas, ell + eps))
            - np.asarray(tip(alphas, ell - eps))) / (2 * eps)
    np.testing.assert_allclose(jac_l, fd_l, rtol=2e-5, atol=1e-8)


def test_telescoping_reduction_and_two_arc_closed_form():
    cfg = _pair(kappa=1.5, n=16)
    alphas = jnp.asarray([0.6, -0.4])

    # extension -> 0 reduces to the plain full-overlap robot
    tel = ctr.solve_ctr_telescoping(alphas, overlap=1.0, extension=1e-9,
                                    cfg=cfg, method="dense", tol=1e-12)
    plain = ctr.solve_ctr(alphas, cfg, tol=1e-12)
    base_tip = ctr.ctr_shape(plain.theta, cfg,
                             method="dense").positions[0]
    np.testing.assert_allclose(np.asarray(tel.tip), np.asarray(base_tip),
                               atol=1e-8)

    # aligned tubes: two circular arcs, exact closed form
    alpha = 0.25
    rho, ext = 0.6, 0.5
    tel = ctr.solve_ctr_telescoping(
        jnp.asarray([alpha, alpha]), overlap=rho, extension=ext, cfg=cfg,
        method="dense", tol=1e-12)
    kap = 1.5
    kc = kap                                      # identical curvatures blend
    a_cross_e1 = np.array([0.0, np.sin(alpha), -np.cos(alpha)])
    e1 = np.array([1.0, 0.0, 0.0])

    def arc(kappa_, s):
        return (np.sin(kappa_ * s) / kappa_) * e1 \
            + ((1 - np.cos(kappa_ * s)) / kappa_) * a_cross_e1

    def rot_about(axis, ang, v):
        axis = axis / np.linalg.norm(axis)
        return (v * np.cos(ang) + np.cross(axis, v) * np.sin(ang)
                + axis * np.dot(axis, v) * (1 - np.cos(ang)))

    r_j = arc(kc, rho)
    axis = np.array([0.0, np.cos(alpha), np.sin(alpha)])
    tip_exact = r_j + rot_about(axis, kc * rho, arc(kap, ext))
    np.testing.assert_allclose(np.asarray(tel.tip), tip_exact, atol=1e-10)


def test_telescoping_differentiable_wrt_overlap():
    cfg = _pair(kappa=1.2, n=16)
    alphas = jnp.asarray([0.8, -0.5])

    def tip_x(rho):
        tel = ctr.solve_ctr_telescoping(
            alphas, overlap=rho, extension=0.4, cfg=cfg,
            differentiable=True, tol=1e-12)
        return tel.tip[0]

    g = float(jax.grad(tip_x)(jnp.asarray(0.7)))
    eps = 1e-6
    fd = (float(tip_x(jnp.asarray(0.7 + eps)))
          - float(tip_x(jnp.asarray(0.7 - eps)))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=5e-5, atol=1e-8)


def test_mean_twist_mode_decouples():
    """For equal torsional stiffness the g-weighted mean twist satisfies
    theta_mean'' = 0 with theta_mean'(L) = 0, i.e. it is CONSTANT — an
    exact structural invariant of the two-tube energy (the interaction
    depends only on the relative angle)."""
    cfg = _pair_with_c(1.44, n=20)
    alphas = jnp.asarray([1.3, 0.1])                # mean 0.7, phi = 1.2
    sol = ctr.solve_ctr(alphas, cfg, tol=1e-13)
    mean = np.asarray(0.5 * (sol.theta[0] + sol.theta[1]))
    np.testing.assert_allclose(mean, 0.7, rtol=0, atol=1e-11)
