"""Cosserat-rod spectral kinematics — the flagship workload (reference L4/L5).

TPU-native re-design of `/root/reference/main.cpp`:

* :func:`quaternion_kinematics` ≙ ``integrateQuaternions()`` (`main.cpp:91-118`)
  — solve ``Q' = 1/2 A(K(X)) Q`` spectrally, ``Q(0) = q_init``.
* :func:`rod_shape` ≙ ``integrateQuaternions`` + ``integratePosition()``
  (`main.cpp:145-176`) — chain the position quadrature ``r' = R(Q) e1``,
  ``r(0) = r_init``, sharing one grid (the reference recomputes the entire
  quaternion solve inside ``integratePosition``, `main.cpp:147`; we don't).
* :func:`demo_qe` ≙ the hard-coded strain of the demo driver (`main.cpp:187-195`).

Everything is batched over arbitrary leading axes of ``qe`` / ``q_init`` /
``r_init`` and jit-friendly; the solver method is selectable:

* ``method="refined"`` (default) — f32 Picard + double-word iterative
  refinement; ~1e-12 relative accuracy on TPU hardware with no f64 support.
* ``method="picard"`` — plain f32, ~1e-6; carries an implicit-function
  custom JVP so Newton/gradient flows cost one extra solve per tangent.
* ``method="fused"``  — the Pallas VMEM kernel (fastest f32; custom
  boundary conditions route to the general-BC kernel variant).
* ``method="dense"``  — batched LU on the assembled system; runs in f64 when
  x64 is enabled (CPU oracle parity) and is the Jacobian carrier for BVPs.

See also :func:`rod_shape_refined_fused` — the accuracy-gated headline path.

Quirk parity: the position RHS uses the **unnormalized** quaternion→rotation
exactly as the reference does (`main.cpp:130-136`); pass
``normalize_quaternions=True`` for the corrected variant.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from ..ops import basis as basis_ops
from ..ops import collocation as coll
from ..ops import doubledouble as dd
from ..ops import lie

__all__ = [
    "RodConfig",
    "demo_qe",
    "curvature_at_points",
    "quaternion_kinematics",
    "rod_shape",
    "rod_shape_refined_fused",
    "split_strain",
    "strain_rho",
    "auto_picard_iters",
    "RodSolution",
]

DEFAULT_Q_INIT = np.array([1.0, 0.0, 0.0, 0.0])
DEFAULT_R_INIT = np.zeros(3)


@dataclass(frozen=True)
class RodConfig:
    """Static problem configuration ≙ the reference's compile-time constants
    (`main.cpp:4-13`): N Chebyshev points, d=4 quaternion state, ``na``
    strain components × ``ne`` modes, rod length, and the modal basis
    (Legendre per `utilities.h:59`; 'chebyshev' per the thesis option).
    """

    n: int = 16
    na: int = 3
    ne: int = 3
    length: float = 1.0
    basis: str = "legendre"

    @property
    def grid(self) -> coll.SpectralGrid:
        return coll.make_grid(self.n, self.length)

    @functools.cached_property
    def basis_table(self) -> np.ndarray:
        """(n-1, ne) f64 table P_e(x_i) at the *unknown* points — the
        reference evaluates ``Phi`` only at points 0..N-2 (`main.cpp:66`)."""
        pts = tuple((self.points[:-1] / self.length).tolist())
        return basis_ops.basis_table(pts, self.ne, self.basis)

    @functools.cached_property
    def basis_table_dd(self):
        return dd.split_f64(self.basis_table)

    @property
    def points(self) -> np.ndarray:
        return self.grid.points


def demo_qe(dtype=jnp.float32):
    """The demo strain vector of `main.cpp:187-195`: pure bending about the
    body-y axis with three Legendre modes."""
    return jnp.asarray(
        [0.0, 0.0, 0.0,
         1.2877691307032, -1.63807499160786, 0.437406679142598,
         0.0, 0.0, 0.0],
        dtype=dtype,
    )


def curvature_at_points(cfg: RodConfig, qe):
    """``K(x_i) = Phi(x_i) @ qe`` at the n-1 unknown points: ``(..., n-1, na)``."""
    return basis_ops.strain_at_points(jnp.asarray(qe), cfg.basis_table)


def split_strain(qe_f64):
    """Host-side split of an f64 strain vector into a double-word f32 pair.

    Pass the result as ``qe=(hi, lo)`` to :func:`quaternion_kinematics` /
    :func:`rod_shape` (method='refined') to preserve f64-grade *inputs* on
    f32-only TPU hardware — otherwise the f32 rounding of ``qe`` alone
    perturbs the solution at the ~6e-8 level.
    """
    return dd.split_f64(np.asarray(qe_f64, np.float64))


def _as_dd_input(qe):
    if isinstance(qe, tuple):
        hi, lo = qe
        return jnp.asarray(hi, jnp.float32), jnp.asarray(lo, jnp.float32)
    qe = jnp.asarray(qe)
    if qe.dtype == jnp.float64:
        hi = qe.astype(jnp.float32)
        return hi, (qe - hi.astype(jnp.float64)).astype(jnp.float32)
    return jnp.asarray(qe, jnp.float32), None


def _curvature_dd(cfg: RodConfig, qe, table_dd=None):
    """Strain field in double-word form from the exact f64 basis table.

    ``qe`` may be an f32 array or a dd pair ``(hi, lo)`` from
    :func:`split_strain`.  ``table_dd`` overrides the config's
    unknown-points table (e.g. the statics BVP evaluates on the full grid).
    """
    p_hi, p_lo = cfg.basis_table_dd if table_dd is None else table_dd
    qe_hi, qe_lo = _as_dd_input(qe)
    shape = qe_hi.shape[:-1] + (cfg.na, cfg.ne)
    modes_hi = qe_hi.reshape(shape)[..., None, :, :]            # (..., 1, na, ne)
    modes_lo = (
        jnp.zeros_like(modes_hi) if qe_lo is None
        else qe_lo.reshape(shape)[..., None, :, :]
    )
    a_hi = jnp.asarray(p_hi)[:, None, :]                        # (np, 1, ne)
    a_lo = jnp.asarray(p_lo)[:, None, :]
    a_hi, a_lo, b_hi, b_lo = coll._broadcast4(a_hi, a_lo, modes_hi, modes_lo)
    return dd.dd_contract_axis(a_hi, a_lo, b_hi, b_lo, cfg.ne)  # (..., np, na)


def _ode_blocks(k):
    """Per-point system matrix ``M_i = 1/2 A(K_i)`` of ``Q' = M Q``."""
    return 0.5 * lie.quat_skew(k)


def strain_rho(qe, cfg: RodConfig) -> float:
    """Picard contraction parameter ``rho = max_i |K(x_i)|_2 * L / 2``.

    ``|A(K)|_2 = |K|_2``, so ``rho`` bounds the Volterra operator norm of
    the quaternion ODE — the quantity that controls Picard convergence and
    the fused kernels' int8 fixed-point window (see
    ``diagnostics.picard_error_bound``).  Host-side (NumPy); ``qe`` must be
    concrete.
    """
    qe_hi = np.asarray(qe[0] if isinstance(qe, tuple) else qe, np.float64)
    modes = qe_hi.reshape(qe_hi.shape[:-1] + (cfg.na, cfg.ne))
    k = np.einsum("pe,...ae->...pa", cfg.basis_table, modes)[..., :3]
    return float(np.max(np.linalg.norm(k, axis=-1), initial=0.0)
                 * cfg.length / 2.0)


def auto_picard_iters(qe, cfg: RodConfig, tol: float = 1e-5,
                      floor: int = 6) -> int | None:
    """Iteration count from the batch's actual strain magnitude.

    Uses the Volterra truncation bound (``diagnostics.picard_error_bound``)
    at the batch-max ``rho``: small-strain batches need far fewer MXU
    passes than the worst-case default (rho=1 -> 10 vs 20, ~2x fewer
    passes; ROADMAP r1 'adaptive iteration counts').  Returns ``None`` when
    ``qe`` is traced (no concrete bound available — callers keep their
    static default).  Rounded up to a multiple of 2 to limit recompiles.
    """
    import jax

    qe_hi = qe[0] if isinstance(qe, tuple) else qe
    if isinstance(qe_hi, jax.core.Tracer):
        return None
    from ..utils import diagnostics

    rho = max(strain_rho(qe, cfg), 0.25)
    k = diagnostics.picard_iterations_needed(rho, tol)
    return max(floor, -(-k // 2) * 2)


def _check_rho(qe, cfg: RodConfig, max_rho: float, where: str):
    """Trace-time validity guard for the fused/Ozaki paths.

    Skipped when ``qe`` is a tracer (inside user jit) — there the refined
    kernel's in-kernel NaN-poisoning sentinel takes over
    (ops/pallas/refined_kernel.py), so an out-of-domain input is loud
    either way, never a silent int8 wrap.
    """
    import jax

    qe_hi = qe[0] if isinstance(qe, tuple) else qe
    if isinstance(qe_hi, jax.core.Tracer):
        return
    rho = strain_rho(qe, cfg)
    if rho > max_rho:
        raise ValueError(
            f"{where}: strain too strong for the fused Picard paths — "
            f"rho = max|K| L/2 = {rho:.2f} > {max_rho} risks non-convergence "
            "and int8-window overflow in the exact residual. Raise iters/"
            "corr_iters and pass check_validity=False if you have verified "
            "convergence (diagnostics.picard_error_bound), use "
            "method='refined' (XLA), or split the rod into segments "
            "(models/segments.py)."
        )


def quaternion_kinematics(qe, q_init=None, cfg: RodConfig = RodConfig(),
                          method: str = "refined", iters: int = 24,
                          refine_steps: int = 2, return_dd: bool = False):
    """Spectral solve of the quaternion kinematics along the rod.

    Returns ``(..., n-1, 4)`` quaternions at the unknown CGL points (point 0
    is the rod tip ``X = L``), matching ``integrateQuaternions()``
    (`main.cpp:91-118`) reshaped out of its component-major stacking.

    ``qe`` may be a dd pair from :func:`split_strain` (method='refined' only)
    to carry f64-grade inputs onto f32 hardware.
    """
    qe_arr = jnp.asarray(qe[0] if isinstance(qe, tuple) else qe)
    grid = cfg.grid
    if q_init is None:
        q_init = jnp.asarray(DEFAULT_Q_INIT, qe_arr.dtype)
    q_init = jnp.broadcast_to(
        jnp.asarray(q_init, qe_arr.dtype), qe_arr.shape[:-1] + (4,)
    )

    if method == "dense":
        m = _ode_blocks(curvature_at_points(cfg, qe_arr)[..., :3])
        return coll.solve_ivp_dense(grid, m, q_init)
    if method == "picard":
        m = _ode_blocks(curvature_at_points(cfg, qe_arr)[..., :3])
        # implicit-function-theorem custom JVP: Newton/gradient flows pay one
        # extra solve per tangent instead of differentiating the iteration
        rhs = coll.ivp_rhs(grid, q_init)
        return coll.solve_ivp_picard_implicit(grid, m, rhs, iters)
    if method == "refined":
        k_hi, k_lo = _curvature_dd(cfg, qe)
        # 6-DoF strains: only the curvature components drive the quaternion
        # ODE (gamma enters the position RHS, rod_shape below).
        m_hi, m_lo = _ode_blocks(k_hi[..., :3]), _ode_blocks(k_lo[..., :3])
        dn_in_hi, dn_in_lo = grid.dn_in_dd
        q0 = jnp.asarray(q_init, jnp.float32)
        rhs_hi, rhs_lo = dd.dd_scale(
            *dd.dd_mul_f32(
                jnp.asarray(dn_in_hi)[:, None], jnp.asarray(dn_in_lo)[:, None],
                q0[..., None, :],
            ),
            -1.0,
        )
        x_hi, x_lo = coll.solve_ivp_refined(
            grid, (m_hi, m_lo), (rhs_hi, rhs_lo),
            iters=iters, refine_steps=refine_steps,
        )
        if return_dd:
            return x_hi, x_lo
        return x_hi + x_lo
    raise ValueError(f"unknown method {method!r}")


def _tangent_dd(q_hi, q_lo):
    """Double-word rod tangent: first column of the unnormalized rotation
    (``main.cpp:130-136`` semantics), computed with error-free products."""
    comps = [(q_hi[..., i], q_lo[..., i]) for i in range(4)]
    (w_hi, w_lo), (x_hi, x_lo), (y_hi, y_lo), (z_hi, z_lo) = comps
    yy = dd.dd_mul(y_hi, y_lo, y_hi, y_lo)
    zz = dd.dd_mul(z_hi, z_lo, z_hi, z_lo)
    xy = dd.dd_mul(x_hi, x_lo, y_hi, y_lo)
    wz = dd.dd_mul(w_hi, w_lo, z_hi, z_lo)
    xz = dd.dd_mul(x_hi, x_lo, z_hi, z_lo)
    wy = dd.dd_mul(w_hi, w_lo, y_hi, y_lo)
    one = jnp.ones_like(w_hi)
    t0 = dd.dd_add_f32(*dd.dd_scale(*dd.dd_add(*yy, *zz), -2.0), one)
    t1 = dd.dd_scale(*dd.dd_add(*xy, *wz), 2.0)
    t2 = dd.dd_scale(*dd.dd_add(*xz, *dd.dd_neg(*wy)), 2.0)
    hi = jnp.stack([t0[0], t1[0], t2[0]], axis=-1)
    lo = jnp.stack([t0[1], t1[1], t2[1]], axis=-1)
    return hi, lo


def _rot_cols_dd(q_hi, q_lo):
    """Columns of the **unnormalized** rotation ``R(q)`` in double-word form.

    ``r_cols[j][i]`` is the dd pair ``R[i, j]`` — same Eigen-formula
    semantics as :func:`ops.lie.quat_to_rot` (`main.cpp:130-136`), computed
    with error-free products.  Shared by the dd tangent maps and the
    dd statics residual (``R^T m`` transports).
    """
    comps = [(q_hi[..., i], q_lo[..., i]) for i in range(4)]
    (w, x, y, z) = comps

    def m(a, b):
        return dd.dd_mul(a[0], a[1], b[0], b[1])

    xx, yy, zz = m(x, x), m(y, y), m(z, z)
    xy, xz, yz = m(x, y), m(x, z), m(y, z)
    wx, wy, wz = m(w, x), m(w, y), m(w, z)
    one = jnp.ones_like(q_hi[..., 0])

    def diag(a, b):  # 1 - 2(a + b)
        return dd.dd_add_f32(*dd.dd_scale(*dd.dd_add(*a, *b), -2.0), one)

    def off(a, b, sign):  # 2(a + sign*b)
        t = dd.dd_add(*a, *dd.dd_scale(*b, sign))
        return dd.dd_scale(*t, 2.0)

    return [
        # column 0 (= the Kirchhoff tangent), 1, 2 of the unnormalized R(q)
        (diag(yy, zz), off(xy, wz, 1.0), off(xz, wy, -1.0)),
        (off(xy, wz, -1.0), diag(xx, zz), off(yz, wx, 1.0)),
        (off(xz, wy, 1.0), off(yz, wx, -1.0), diag(xx, yy)),
    ]


def _rt_apply_dd(r_cols, vec):
    """``R^T v`` in dd: ``r_cols`` from :func:`_rot_cols_dd`, ``vec`` a
    length-3 list of dd pairs.  Shared by the single-rod and segmented dd
    statics residuals (body-frame transports)."""
    out = []
    for j in range(3):
        acc = dd.dd_mul(*r_cols[j][0], *vec[0])
        acc = dd.dd_add(*acc, *dd.dd_mul(*r_cols[j][1], *vec[1]))
        acc = dd.dd_add(*acc, *dd.dd_mul(*r_cols[j][2], *vec[2]))
        out.append(acc)
    return out


def _rotate_dd(q_hi, q_lo, vec):
    """``R(q) v`` in dd at a dd quaternion; ``vec`` a length-3 list of dd
    pairs (follower-load transport: body-frame force to world frame)."""
    rc = _rot_cols_dd(q_hi, q_lo)
    out = []
    for i in range(3):
        acc = dd.dd_mul(*rc[0][i], *vec[0])
        acc = dd.dd_add(*acc, *dd.dd_mul(*rc[1][i], *vec[1]))
        acc = dd.dd_add(*acc, *dd.dd_mul(*rc[2][i], *vec[2]))
        out.append(acc)
    return out


def _tangent_dd_6dof(q_hi, q_lo, g_hi, g_lo):
    """Double-word Reissner tangent ``t = R(q) (e1 + gamma)``.

    Same unnormalized-rotation semantics as :func:`_tangent_dd` (which is
    the ``gamma = 0`` special case, `main.cpp:130-136`), extended with the
    shear/extension columns of ``R`` — the capability the reference's dead
    ``ad()`` signals (`utilities.h:27-37`).  ``g``: dd pair ``(..., np, 3)``.
    """
    r_cols = _rot_cols_dd(q_hi, q_lo)

    def m(a, b):
        return dd.dd_mul(a[0], a[1], b[0], b[1])

    g = [(g_hi[..., a], g_lo[..., a]) for a in range(3)]
    rows_hi, rows_lo = [], []
    for i in range(3):
        # t_i = R[i,0] * (1 + g0) + R[i,1] * g1 + R[i,2] * g2
        acc = dd.dd_add(*r_cols[0][i], *m(r_cols[0][i], g[0]))
        acc = dd.dd_add(*acc, *m(r_cols[1][i], g[1]))
        acc = dd.dd_add(*acc, *m(r_cols[2][i], g[2]))
        rows_hi.append(acc[0])
        rows_lo.append(acc[1])
    return jnp.stack(rows_hi, axis=-1), jnp.stack(rows_lo, axis=-1)


@dataclass
class RodSolution:
    """Point-major rod state at the unknown CGL points (tip first).

    ``quaternions``: ``(..., n-1, 4)``; ``positions``: ``(..., n-1, 3)``.
    ``q_stack`` / ``r_stack`` give the reference's component-major flat
    layouts for parity with ``main.cpp`` stdout.

    For ``method='refined'`` the double-word pairs ``quaternions_dd`` /
    ``positions_dd`` are populated: a single f32 array can only represent
    values to ~3e-8 relative, so the ≤1e-8-grade result *is* the pair —
    materialize it with :meth:`quaternions_f64` / :meth:`positions_f64` on
    the host (or keep computing in dd on device).
    """

    quaternions: jnp.ndarray
    positions: jnp.ndarray
    quaternions_dd: tuple = None
    positions_dd: tuple = None

    def quaternions_f64(self):
        hi, lo = self.quaternions_dd
        return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)

    def positions_f64(self):
        hi, lo = self.positions_dd
        return np.asarray(hi, np.float64) + np.asarray(lo, np.float64)

    @property
    def q_stack(self):
        return coll.to_component_major(self.quaternions)

    @property
    def r_stack(self):
        return self.positions

    @property
    def tip_quaternion(self):
        return self.quaternions[..., 0, :]

    @property
    def tip_position(self):
        return self.positions[..., 0, :]


def rod_shape_refined_fused(qe, cfg: RodConfig = RodConfig(), iters: int = 20,
                            refine_steps: int = 2, tile: int = None,
                            precision: str = "high",
                            interpret: bool = False,
                            single_kernel: bool | None = None,
                            corr_iters: int | None = None,
                            check_validity: bool = True,
                            max_rho: float = 5.0) -> RodSolution:
    """Fastest accuracy-gated path: Pallas-fused f32 solves + double-word IR.

    Two implementations:

    * **single_kernel** (auto-selected for ``refine_steps=1``, na=3,
      n-1 <= 512): the ENTIRE solve — Picard, exact int8-plane (Ozaki)
      residual, correction, dd tangent, dd position — runs in ONE VMEM-
      resident Pallas kernel (ops/pallas/refined_kernel.py).  ~27M solves/s
      at ~5e-12 rel on v5e (n=16); grids with 32 < n-1 <= 512 take the WIDE
      layout with right-multiplied Ozaki planes (~1e-9 rel at n=64; the
      N=256 high-order config included).
    * staged: base + correction in the fused kernel
      (ops/pallas/rod_kernel.py), dd residual and position quadrature as
      XLA ops; supports any ``refine_steps``.

    Boundary conditions are the reference demo's (``q0 = (1,0,0,0)``,
    ``r0 = 0``, `main.cpp:106-154`).  ``qe`` may be a dd pair from
    :func:`split_strain` for f64-grade input.
    """
    from ..ops.pallas import rod_kernel as rk

    if check_validity:
        _check_rho(qe, cfg, max_rho, "rod_shape_refined_fused")
    if iters == "auto":
        # Base solve to ~1e-5 truncation (one refinement then reaches the
        # dd floor, err ~ base_err^2); corrections inherit the count.
        iters = auto_picard_iters(qe, cfg, tol=1e-5) or 20
        if corr_iters is None:
            corr_iters = iters
    if single_kernel is None:
        # Auto-select only when the single kernel can honor every request:
        # it performs exactly one refinement at 'high' matmul precision;
        # na in (3, 6) is covered by every layout tier (narrow, wide,
        # paired, multi-tile — the dd Reissner tangent is in-kernel).
        single_kernel = (refine_steps == 1 and precision == "high"
                         and cfg.na in (3, 6) and cfg.n - 1 <= 512)
    if single_kernel:
        if cfg.na not in (3, 6):
            raise ValueError("single_kernel supports na in (3, 6)")
        if refine_steps != 1:
            raise ValueError(
                "single_kernel performs exactly one refinement; use "
                "single_kernel=False for other refine_steps"
            )
        if precision != "high":
            raise ValueError(
                "single_kernel runs at 'high' (bf16x3) matmul precision; "
                "use single_kernel=False to select another precision"
            )
        from ..ops.pallas import refined_kernel as rfk

        qe_hi, qe_lo = _as_dd_input(qe)
        kw2 = {"interpret": interpret,
               "check_rho": max_rho if check_validity else None}
        if tile is not None:
            kw2["tile"] = tile
        if corr_iters is not None:
            kw2["corr_iters"] = corr_iters
        q_hi, q_lo, r_hi, r_lo = rfk.rod_shape_refined_kernel(
            qe_hi, qe_lo, cfg=cfg, iters=iters, **kw2
        )
        return RodSolution(
            quaternions=q_hi + q_lo,
            positions=r_hi + r_lo,
            quaternions_dd=(q_hi, q_lo),
            positions_dd=(r_hi, r_lo),
        )
    kw = {"interpret": interpret}
    if tile is not None:
        kw["tile"] = tile
    grid = cfg.grid
    qe_hi, _ = _as_dd_input(qe)

    k_dd = _curvature_dd(cfg, qe)
    dn_in_hi, dn_in_lo = grid.dn_in_dd
    q0 = jnp.asarray(DEFAULT_Q_INIT, jnp.float32)
    rhs_hi, rhs_lo = dd.dd_scale(
        *dd.dd_mul_f32(
            jnp.asarray(dn_in_hi)[:, None], jnp.asarray(dn_in_lo)[:, None],
            jnp.broadcast_to(q0, qe_hi.shape[:-1] + (1, 4)),
        ),
        -1.0,
    )
    # Base solve through the same general-rhs kernel as the corrections —
    # avoids rod_shape_fused's position stage, which this path recomputes
    # in double-word form anyway.
    x_hi = rk.picard_correction_fused(qe_hi, rhs_hi, cfg=cfg, iters=iters,
                                      precision=precision, **kw)
    x_lo = jnp.zeros_like(x_hi)

    kappa_dd = (k_dd[0][..., :3], k_dd[1][..., :3])
    for _ in range(refine_steps):
        r_hi, r_lo = coll.residual_quat_dd(grid, kappa_dd, x_hi, x_lo,
                                           rhs_hi, rhs_lo)
        delta = rk.picard_correction_fused(qe_hi, r_hi + r_lo, cfg=cfg,
                                           iters=iters, precision=precision,
                                           **kw)
        x_hi, x_lo = dd.dd_add(x_hi, x_lo, delta, jnp.zeros_like(delta))

    if cfg.na == 6:
        b_hi, b_lo = _tangent_dd_6dof(x_hi, x_lo,
                                      k_dd[0][..., 3:], k_dd[1][..., 3:])
    else:
        b_hi, b_lo = _tangent_dd(x_hi, x_lo)
    r_hi, r_lo = coll.quadrature_refined(grid, (b_hi, b_lo),
                                         refine_steps=max(1, refine_steps))
    return RodSolution(
        quaternions=x_hi + x_lo,
        positions=r_hi + r_lo,
        quaternions_dd=(x_hi, x_lo),
        positions_dd=(r_hi, r_lo),
    )


def rod_shape(qe, q_init=None, r_init=None, cfg: RodConfig = RodConfig(),
              method: str = "refined", iters: int = 24, refine_steps: int = 2,
              normalize_quaternions: bool = False) -> RodSolution:
    """Full rod kinematics: quaternion solve chained into position quadrature.

    ≙ ``integratePosition()`` (`main.cpp:145-176`) but computing the
    quaternion solve once (the reference runs it twice, `main.cpp:147`) and
    solving ``Dn_NN r = b - ivp`` instead of inverting (`main.cpp:159`).

    **6-DoF Reissner strains** (``cfg.na == 6``, methods 'picard'/'dense'):
    the strain field is ``(kappa, gamma)`` — curvature plus shear/extension,
    the extension the reference's dead ``ad()`` signals (`utilities.h:27-37`,
    SURVEY.md §2 #4).  The quaternion ODE uses ``kappa``; the centerline
    integrates ``r' = R(q) (e1 + gamma)`` instead of the Kirchhoff tangent.
    """
    qe_arr = jnp.asarray(qe[0] if isinstance(qe, tuple) else qe)
    grid = cfg.grid

    if method == "fused":
        # Pallas fast path (ops/pallas/rod_kernel.py); custom boundary
        # conditions route through the general-BC kernel variant.
        if normalize_quaternions:
            raise NotImplementedError(
                "method='fused' keeps the reference's unnormalized-"
                "quaternion semantics"
            )
        from ..ops.pallas import rod_kernel as rk

        if q_init is None and r_init is None:
            q, r = rk.rod_shape_fused(qe_arr, cfg=cfg, iters=iters)
        else:
            batch = qe_arr.shape[:-1]
            q0 = jnp.broadcast_to(
                jnp.asarray(DEFAULT_Q_INIT if q_init is None else q_init,
                            jnp.float32), batch + (4,)
            ).reshape(-1, 4)
            r0 = jnp.broadcast_to(
                jnp.asarray(DEFAULT_R_INIT if r_init is None else r_init,
                            jnp.float32), batch + (3,)
            ).reshape(-1, 3)
            q, r = rk.rod_shape_fused_bc(
                qe_arr.reshape(-1, qe_arr.shape[-1]), q0, r0, cfg=cfg,
                iters=iters,
            )
            q = q.reshape(batch + q.shape[1:])
            r = r.reshape(batch + r.shape[1:])
        return RodSolution(quaternions=q, positions=r)

    if r_init is None:
        r_init = jnp.zeros(3, qe_arr.dtype)
    r_init = jnp.asarray(r_init, qe_arr.dtype)

    if method == "refined":
        q_hi, q_lo = quaternion_kinematics(
            qe, q_init, cfg, method="refined", iters=iters,
            refine_steps=refine_steps, return_dd=True,
        )
        if normalize_quaternions:
            q = lie.quat_normalize(q_hi + q_lo)
            q_hi, q_lo = q, jnp.zeros_like(q)
        if cfg.na == 6:
            k_hi, k_lo = _curvature_dd(cfg, qe)
            b_hi, b_lo = _tangent_dd_6dof(q_hi, q_lo,
                                          k_hi[..., 3:], k_lo[..., 3:])
        else:
            b_hi, b_lo = _tangent_dd(q_hi, q_lo)
        dn_in_hi, dn_in_lo = grid.dn_in_dd
        ivp_hi, ivp_lo = dd.dd_mul_f32(
            jnp.asarray(dn_in_hi)[:, None], jnp.asarray(dn_in_lo)[:, None],
            jnp.asarray(r_init, jnp.float32)[..., None, :],
        )
        rhs = dd.dd_add(b_hi, b_lo, -ivp_hi, -ivp_lo)
        r_hi, r_lo = coll.quadrature_refined(grid, rhs, refine_steps=refine_steps)
        return RodSolution(
            quaternions=q_hi + q_lo,
            positions=r_hi + r_lo,
            quaternions_dd=(q_hi, q_lo),
            positions_dd=(r_hi, r_lo),
        )

    q = quaternion_kinematics(qe_arr, q_init, cfg, method=method, iters=iters)
    qq = lie.quat_normalize(q) if normalize_quaternions else q
    if cfg.na == 6:
        gamma = curvature_at_points(cfg, qe_arr)[..., 3:]
        e1 = jnp.asarray([1.0, 0.0, 0.0], qq.dtype)
        b = jnp.einsum("...ij,...j->...i", lie.quat_to_rot(qq), e1 + gamma)
    else:
        b = lie.quat_tangent(qq)
    rhs = coll.ivp_rhs(grid, jnp.broadcast_to(r_init, qe_arr.shape[:-1] + (3,)), g=b)
    if method == "dense":
        dn_nn = jnp.asarray(grid.dn_nn, qe_arr.dtype)
        r = jnp.linalg.solve(
            jnp.broadcast_to(dn_nn, rhs.shape[:-2] + dn_nn.shape), rhs
        )
    else:
        ginv = jnp.asarray(grid.ginv, qe_arr.dtype)
        r = coll._apply_grid_matmul(ginv, rhs)
    return RodSolution(quaternions=q, positions=r)
