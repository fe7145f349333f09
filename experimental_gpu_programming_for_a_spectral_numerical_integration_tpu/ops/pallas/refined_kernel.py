"""Fully-fused double-word-refined rod solve in ONE Pallas kernel.

The staged refined pipeline (models/rod.rod_shape_refined_fused) pays HBM
round trips and XLA-level double-word VPU work between its kernels: base
solve -> (unpack) -> dd residual -> (pack) -> correction -> dd tangent ->
quadrature.  This kernel keeps the ENTIRE accuracy-gated solve VMEM-resident:

    f32 Picard (bf16x3 matmuls)
      -> exact residual via int8-plane (Ozaki) MXU dots   [ops/ozaki.py math]
      -> f32 Picard correction
      -> double-word combine + tangent (VPU EFTs)
      -> double-word position quadrature via a second Ozaki apply

HBM sees ``qe`` in and four packed dd outputs.  The two Ozaki applications
are the key: the residual's point-axis contraction and the position
integration both need ~2^-45-exact contractions, impossible with f32 MXU
accumulators; int8 x int8 -> int32 accumulation is exact, and int32 level
sums (< 2^24 here) convert to f32 exactly.

Packing, precision emulation, and the A(K) action are shared with
``rod_kernel.py``.  Accuracy: ~1e-11 rel vs the f64 oracle with one
refinement (the IR contraction is (picard err)^2 ~ 1e-10); boundary
conditions are the reference demo's (q0 = (1,0,0,0), r0 = 0).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import rod as rod_model
from .. import ozaki
from . import rod_kernel as rk

__all__ = ["rod_shape_refined_kernel", "rod_shape_refined_kernel_bc"]

def _ozaki_apply(planes_ref, const_exp, x_hi, x_lo, x_exp, pair_budget=7):
    """dd-accurate ``A @ x`` from in-VMEM int8 planes of the constant.

    Reads the (KA, 128, 128) int8 ref into VMEM-resident values and reuses
    ozaki.matmul_dd — pure jnp, so it traces inside the kernel unchanged.
    """
    return ozaki.matmul_dd(planes_ref[:, :, :], const_exp, x_hi, x_lo,
                           x_exp, pair_budget=pair_budget)


def _dd_tangent_rows(dd, q_dd, gamma_half=None):
    """x2-scaled double-word tangent rows ``(t0, t1, t2)`` (dd pairs).

    ``q_dd``: four dd pairs ``(hi, lo)`` of the quaternion components (any
    layout — the algebra is elementwise, so the narrow/wide/paired kernels
    all share this).  ``gamma_half``: ``None`` for the Kirchhoff tangent
    ``2 R(q) e1`` (`/root/reference/main.cpp:130-136` semantics), or three
    dd pairs carrying the Reissner shear/extension ``gamma/2`` (the strain
    tables' folded 1/2 — rescaled x2 here) for ``2 R(q)(e1 + gamma)``, the
    6-DoF extension the reference's dead ``ad()`` signals
    (`utilities.h:27-37`).
    """
    (sw_h, sw_l), (sx_h, sx_l), (sy_h, sy_l), (sz_h, sz_l) = q_dd
    yy = dd.dd_mul(sy_h, sy_l, sy_h, sy_l)
    zz = dd.dd_mul(sz_h, sz_l, sz_h, sz_l)
    xy = dd.dd_mul(sx_h, sx_l, sy_h, sy_l)
    wz = dd.dd_mul(sw_h, sw_l, sz_h, sz_l)
    xz = dd.dd_mul(sx_h, sx_l, sz_h, sz_l)
    wy = dd.dd_mul(sw_h, sw_l, sy_h, sy_l)
    if gamma_half is None:
        one2 = jnp.full_like(sw_h, 2.0)
        t0 = dd.dd_add_f32(*dd.dd_scale(*dd.dd_add(*yy, *zz), -4.0), one2)
        t1 = dd.dd_scale(*dd.dd_add(*xy, *wz), 4.0)
        t2 = dd.dd_scale(*dd.dd_add(*xz, *dd.dd_neg(*wy)), 4.0)
        return t0, t1, t2
    xx = dd.dd_mul(sx_h, sx_l, sx_h, sx_l)
    yz = dd.dd_mul(sy_h, sy_l, sz_h, sz_l)
    wx = dd.dd_mul(sw_h, sw_l, sx_h, sx_l)
    g = [dd.dd_scale(gh, gl, 2.0) for gh, gl in gamma_half]
    e0 = dd.dd_add_f32(*g[0], jnp.ones_like(sw_h))

    def fma3(c0, v0, c1, v1, c2, v2):
        # sum of three dd products, dd-accurate
        acc = dd.dd_mul(*c0, *v0)
        acc = dd.dd_add(*acc, *dd.dd_mul(*c1, *v1))
        return dd.dd_add(*acc, *dd.dd_mul(*c2, *v2))

    one = jnp.ones_like(sw_h)
    a00 = dd.dd_add_f32(*dd.dd_scale(*dd.dd_add(*yy, *zz), -2.0), one)
    a01 = dd.dd_scale(*dd.dd_add(*xy, *dd.dd_neg(*wz)), 2.0)
    a02 = dd.dd_scale(*dd.dd_add(*xz, *wy), 2.0)
    a10 = dd.dd_scale(*dd.dd_add(*xy, *wz), 2.0)
    a11 = dd.dd_add_f32(*dd.dd_scale(*dd.dd_add(*xx, *zz), -2.0), one)
    a12 = dd.dd_scale(*dd.dd_add(*yz, *dd.dd_neg(*wx)), 2.0)
    a20 = dd.dd_scale(*dd.dd_add(*xz, *dd.dd_neg(*wy)), 2.0)
    a21 = dd.dd_scale(*dd.dd_add(*yz, *wx), 2.0)
    a22 = dd.dd_add_f32(*dd.dd_scale(*dd.dd_add(*xx, *yy), -2.0), one)
    t0 = dd.dd_scale(*fma3(a00, e0, a01, g[1], a02, g[2]), 2.0)
    t1 = dd.dd_scale(*fma3(a10, e0, a11, g[1], a12, g[2]), 2.0)
    t2 = dd.dd_scale(*fma3(a20, e0, a21, g[1], a22, g[2]), 2.0)
    return t0, t1, t2


def _kernel(qe_ref, w_ref, ptab_hi_ref, ptab_lo_ref, *rest,
            iters, corr_iters, ne, p_pad, rpc, wd_exp, wg_exp, rho2_limit,
            bc=False, na=3):
    from .. import doubledouble as dd

    if bc:
        # General-BC variant: per-rod dd ``q_init`` / ``r_init`` instead of
        # the precomputed demo-BC rhs — the accuracy-path analogue of
        # rod_kernel._kernel_bc, enabling multi-segment chains
        # (`/root/reference/main.cpp:106,154` BCs generalized).
        (din_hi_ref, din_lo_ref, gdin_hi_ref, gdin_lo_ref, q0_ref, r0_ref,
         wd_planes_ref, wg_planes_ref,
         q_hi_ref, q_lo_ref, r_hi_ref, r_lo_ref) = rest
    else:
        (g_rhs_ref, rhs_hi_ref, rhs_lo_ref, wd_planes_ref, wg_planes_ref,
         q_hi_ref, q_lo_ref, r_hi_ref, r_lo_ref) = rest

    bt = qe_ref.shape[1]
    half = bt // rpc

    mm = rk._make_mm("high")

    # Curvature in dd, EXACTLY: K/2 = (P_hi + P_lo) qe with the 1/2 folded
    # into the table.  ne=3 terms, so the contraction is done on the VPU
    # with error-free transformations (an MXU bf16x3 matmul would poison
    # the residual at ~2^-21).  Outer-product broadcasts: (p_pad,1)x(1,B_t).
    # qe_ref rows: [qe_hi (na*ne) ; qe_lo (na*ne)] — the lo rows carry
    # f64-grade strain input onto the chip (zeros for plain f32 input).
    p_hi = ptab_hi_ref[:, :]
    p_lo = ptab_lo_ref[:, :]
    nq = na * ne
    # For na=6 (Reissner) the first 3 components are curvature/2 (driving
    # A(K)); components 3..5 are shear/extension gamma/2 (driving the
    # 6-DoF tangent at stage 4, rescaled x2 there).
    k_hi, k_lo = [], []
    for a in range(na):
        acc_h = acc_l = None
        for e in range(ne):
            row_hi = qe_ref[a * ne + e:a * ne + e + 1, :]
            row_lo = qe_ref[nq + a * ne + e:nq + a * ne + e + 1, :]
            ph, pe = dd.two_prod(p_hi[:, e:e + 1], row_hi)
            pe = pe + p_lo[:, e:e + 1] * row_hi + p_hi[:, e:e + 1] * row_lo
            if acc_h is None:
                acc_h, acc_l = ph, pe
            else:
                acc_h, acc_l = dd.dd_add(acc_h, acc_l, ph, pe)
        k_hi.append(acc_h)
        k_lo.append(acc_l)
    kh = [[ki[:, h * half:(h + 1) * half] for ki in k_hi] for h in range(rpc)]
    kh_lo = [[ki[:, h * half:(h + 1) * half] for ki in k_lo]
             for h in range(rpc)]
    a_apply = rk._make_a_apply(kh, p_pad)

    w = w_ref[:, :]
    if bc:
        # rhs = -(dn_in (x) q0) built in-kernel, in dd (exact outer
        # products of the dd grid column with the dd junction state).
        din_h, din_l = din_hi_ref[:, :], din_lo_ref[:, :]   # (p_pad, 1)
        rb_hi, rb_lo = [], []
        for h in range(rpc):
            for c in range(4):
                row_h = q0_ref[c:c + 1, h * half:(h + 1) * half]
                row_l = q0_ref[4 + c:5 + c, h * half:(h + 1) * half]
                ph, pl = dd.dd_mul(din_h, din_l, row_h, row_l)
                rb_hi.append(-ph)
                rb_lo.append(-pl)
        rhs_hi = jnp.concatenate(rb_hi, axis=0)             # (128, half)
        rhs_lo = jnp.concatenate(rb_lo, axis=0)
        g_rhs = mm(w, rhs_hi)
    else:
        rhs_hi = rhs_hi_ref[:, :]                            # (128, 1)
        rhs_lo = rhs_lo_ref[:, :]
        g_rhs = g_rhs_ref[:, :]

    # --- stage 1: f32 Picard base solve ---
    s = jnp.broadcast_to(g_rhs, (4 * rpc * p_pad, half))
    for _ in range(iters):
        s = g_rhs + mm(w, a_apply(s))

    # Validity sentinel, per packed rod slot (cheap VPU reductions; the
    # valid-domain fast path is unchanged):
    # (a) rho = max|K| L/2 beyond the static limit — the f32 Picard
    #     transient (up to ~rho^rho/rho!) erases low-order bits even when
    #     the final iterate re-converges, so the result would be plausible-
    #     but-degraded;
    # (b) final state outside the exact residual's int8 fixed-point window
    #     |state| < 0.99 * 2^2 (ozaki.plane_decompose, x_exp=2), which
    #     would otherwise WRAP SILENTLY.
    # Offending slots are NaN-poisoned at the output stage below.
    slot_bad = []
    for h in range(rpc):
        bad = jnp.max(jnp.abs(s[h * 4 * p_pad:(h + 1) * 4 * p_pad, :]),
                      axis=0, keepdims=True) >= 3.96
        if rho2_limit is not None:
            k0, k1, k2 = kh[h][:3]                   # K/2 at the points
            ss = jnp.max(k0 * k0 + k1 * k1 + k2 * k2, axis=0, keepdims=True)
            bad = bad | (ss > rho2_limit)
        slot_bad.append(bad)

    # --- stage 2: exact residual r = rhs - D s + (1/2)A(K) s ---
    dn_s_hi, dn_s_lo = _ozaki_apply(wd_planes_ref, wd_exp, s, None, 2)
    # (1/2)A(K)s in dd: per-block EFT products (the 1/2 lives in kh already).
    ak_blocks_hi, ak_blocks_lo = [], []
    for h in range(rpc):
        k0h, k1h, k2h = kh[h][:3]
        k0l, k1l, k2l = kh_lo[h][:3]
        sw, sx, sy, sz = rk._component_slices(s, h, p_pad)

        def prod(khh, khl, sv):
            ph, pe = dd.two_prod(khh, sv)
            return ph, pe + khl * sv

        def comb(sign0, t0, sign1, t1, sign2, t2):
            h0, l0 = dd.dd_scale(*t0, sign0)
            h0, l0 = dd.dd_add(h0, l0, *dd.dd_scale(*t1, sign1))
            return dd.dd_add(h0, l0, *dd.dd_scale(*t2, sign2))

        rows = [
            comb(-1.0, prod(k0h, k0l, sx), -1.0, prod(k1h, k1l, sy),
                 -1.0, prod(k2h, k2l, sz)),
            comb(+1.0, prod(k0h, k0l, sw), +1.0, prod(k2h, k2l, sy),
                 -1.0, prod(k1h, k1l, sz)),
            comb(+1.0, prod(k1h, k1l, sw), -1.0, prod(k2h, k2l, sx),
                 +1.0, prod(k0h, k0l, sz)),
            comb(+1.0, prod(k2h, k2l, sw), +1.0, prod(k1h, k1l, sx),
                 -1.0, prod(k0h, k0l, sy)),
        ]
        ak_blocks_hi += [r[0] for r in rows]
        ak_blocks_lo += [r[1] for r in rows]
    ak_hi = jnp.concatenate(ak_blocks_hi, axis=0)
    ak_lo = jnp.concatenate(ak_blocks_lo, axis=0)

    r_hi, r_lo = dd.dd_add(rhs_hi, rhs_lo, -dn_s_hi, -dn_s_lo)
    r_hi, r_lo = dd.dd_add(r_hi, r_lo, ak_hi, ak_lo)

    # --- stage 3: f32 Picard correction, dd combine ---
    # W here is the FULL I (x) G~ (the 1/2 lives in the halved K table), so
    # the preconditioned rhs is W res directly.
    res = r_hi + r_lo
    g_res = mm(w, res)
    delta = g_res
    for _ in range(corr_iters):
        delta = g_res + mm(w, a_apply(delta))
    x_hi, x_lo = dd.two_sum(s, delta)

    # --- stage 4: dd tangent (x2, so I (x) G/2 integrates it) ---
    tb_hi, tb_lo = [], []
    for h in range(rpc):
        q_dd = list(zip(rk._component_slices(x_hi, h, p_pad),
                        rk._component_slices(x_lo, h, p_pad)))
        gamma_half = ([(kh[h][3 + j], kh_lo[h][3 + j]) for j in range(3)]
                      if na == 6 else None)
        t0, t1, t2 = _dd_tangent_rows(dd, q_dd, gamma_half)
        zero = jnp.zeros_like(t0[0])
        tb_hi += [t0[0], t1[0], t2[0], zero]
        tb_lo += [t0[1], t1[1], t2[1], zero]
    b_hi = jnp.concatenate(tb_hi, axis=0)
    b_lo = jnp.concatenate(tb_lo, axis=0)

    # --- stage 5: dd position via second Ozaki apply (W_G = I (x) G~/2) ---
    # W_G has exponent ~0 (|G/2| <= 0.5): terms below level 5 are under the
    # ~2^-45 target, so a tighter pair budget saves ~10 int8 dots.
    pos_hi, pos_lo = _ozaki_apply(wg_planes_ref, wg_exp, b_hi, b_lo, 3,
                                  pair_budget=5)
    if bc:
        # r_init enters OUTSIDE the int8 apply (|dn_in| ~ N^2/L would blow
        # the |b| < 2^3 window): G (dn_in (x) r0) = (G dn_in) (x) r0 with
        # the constant dd vector gdin = ginv @ dn_in — exact dd products.
        gd_h, gd_l = gdin_hi_ref[:, :], gdin_lo_ref[:, :]   # (p_pad, 1)
        eb_hi, eb_lo = [], []
        for h in range(rpc):
            for c in range(4):
                row_h = r0_ref[c:c + 1, h * half:(h + 1) * half]
                row_l = r0_ref[4 + c:5 + c, h * half:(h + 1) * half]
                ph, pl = dd.dd_mul(gd_h, gd_l, row_h, row_l)
                eb_hi.append(-ph)
                eb_lo.append(-pl)
        pos_hi, pos_lo = dd.dd_add(pos_hi, pos_lo,
                                   jnp.concatenate(eb_hi, axis=0),
                                   jnp.concatenate(eb_lo, axis=0))

    # Poison overflowed slots (both windows: |s| < 2^2 above, |b| < 2^3
    # here) so an out-of-domain input yields loud NaNs, never a wrap.
    for h in range(rpc):
        bad = slot_bad[h] | (
            jnp.max(jnp.abs(b_hi[h * 4 * p_pad:(h + 1) * 4 * p_pad, :]),
                    axis=0, keepdims=True) >= 7.92
        )
        nan = jnp.float32(np.nan)
        rows = slice(h * 4 * p_pad, (h + 1) * 4 * p_pad)
        q_hi_ref[rows, :] = jnp.where(bad, nan, x_hi[rows, :])
        q_lo_ref[rows, :] = jnp.where(bad, nan, x_lo[rows, :])
        r_hi_ref[rows, :] = jnp.where(bad, nan, pos_hi[rows, :])
        r_lo_ref[rows, :] = jnp.where(bad, nan, pos_lo[rows, :])


def _kernel_wide_refined(qe_ref, wt_ref, ptab_hi_ref, ptab_lo_ref, *rest,
                         iters, corr_iters, ne, wdt_exp, wgt_exp,
                         rho2_limit, bc=False, na=3):
    """WIDE-layout (32 < n-1 <= 512) fully-fused refined solve.

    Same five stages as :func:`_kernel`, transposed: points ride the 128
    LANES, 32 rods x 4 components fill the sublanes, every spectral
    operator applies FROM THE RIGHT (``s @ Op^T``) — so the exact Ozaki
    contractions use :func:`ozaki.matmul_dd_right` on transposed planes.
    Unlocks the single-kernel accuracy path for the N=64 statics grid and
    N=128-class high-order solves (ROADMAP r3).  ``bc=True`` takes per-rod
    double-word junction states instead of the demo boundary conditions
    (multi-segment accuracy chains with wide segment grids).  ``na=6``
    carries the Reissner shear/extension rows (components 3..5, gamma/2)
    into the stage-4 dd tangent.
    """
    from .. import doubledouble as dd

    if bc:
        (din_hi_ref, din_lo_ref, gdin_hi_ref, gdin_lo_ref, q0_ref, r0_ref,
         wdt_planes_ref, wgt_planes_ref,
         q_hi_ref, q_lo_ref, r_hi_ref, r_lo_ref) = rest
    else:
        (g_rhs_ref, rhs_hi_ref, rhs_lo_ref, wdt_planes_ref, wgt_planes_ref,
         q_hi_ref, q_lo_ref, r_hi_ref, r_lo_ref) = rest

    mm = rk._make_mm("high")

    # dd strains K/2 (the 1/2 folded into the transposed table): exact EFT
    # outer-product accumulation over the ne modes.  qe_ref columns:
    # [qe_hi (na*ne) ; qe_lo (na*ne)].
    p_hi = ptab_hi_ref[:, :]                      # (ne, p_pad)
    p_lo = ptab_lo_ref[:, :]
    nq = na * ne
    k_hi, k_lo = [], []
    for a in range(na):
        acc_h = acc_l = None
        for e in range(ne):
            col_hi = qe_ref[:, a * ne + e:a * ne + e + 1]        # (R, 1)
            col_lo = qe_ref[:, nq + a * ne + e:nq + a * ne + e + 1]
            row_hi = p_hi[e:e + 1, :]                            # (1, p_pad)
            row_lo = p_lo[e:e + 1, :]
            ph, pe = dd.two_prod(col_hi, row_hi)
            pe = pe + col_lo * row_hi + col_hi * row_lo
            if acc_h is None:
                acc_h, acc_l = ph, pe
            else:
                acc_h, acc_l = dd.dd_add(acc_h, acc_l, ph, pe)
        k_hi.append(acc_h)
        k_lo.append(acc_l)
    a_apply = rk._wide_a_apply(k_hi)

    wt = wt_ref[:, :]                             # (p_pad, p_pad) FULL G~^T
    if bc:
        # rhs = -(q0 (x) dn_in) built in-kernel, in dd (dn_in rides the
        # lanes; exact outer products with the dd junction quaternion).
        din_h, din_l = din_hi_ref[:, :], din_lo_ref[:, :]   # (1, p_pad)
        rb_hi, rb_lo = [], []
        for c in range(4):
            col_h = q0_ref[:, c:c + 1]                      # (R, 1)
            col_l = q0_ref[:, 4 + c:5 + c]
            ph, pl = dd.dd_mul(col_h, col_l, din_h, din_l)
            rb_hi.append(-ph)
            rb_lo.append(-pl)
        rhs_hi = jnp.concatenate(rb_hi, axis=0)             # (4R, p_pad)
        rhs_lo = jnp.concatenate(rb_lo, axis=0)
        g_rhs = mm(rhs_hi, wt)
    else:
        rhs_hi = rhs_hi_ref[:, :]
        rhs_lo = rhs_lo_ref[:, :]
        g_rhs = g_rhs_ref[:, :]                   # (4R, p_pad)

    # --- stage 1: f32 Picard base solve ---
    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)

    # Validity sentinel per rod (see _kernel): int8 window + rho bound.
    comp_abs = jnp.maximum(
        jnp.maximum(jnp.abs(rk._wide_comp(s, 0)), jnp.abs(rk._wide_comp(s, 1))),
        jnp.maximum(jnp.abs(rk._wide_comp(s, 2)), jnp.abs(rk._wide_comp(s, 3))),
    )                                              # (R, p_pad)
    bad = jnp.max(comp_abs, axis=1, keepdims=True) >= 3.96       # (R, 1)
    if rho2_limit is not None:
        k0, k1, k2 = k_hi[:3]
        ss = jnp.max(k0 * k0 + k1 * k1 + k2 * k2, axis=1, keepdims=True)
        bad = bad | (ss > rho2_limit)

    # --- stage 2: exact residual r = rhs - s D~^T + (1/2)A(K) s ---
    from .. import ozaki as _oz

    dn_s_hi, dn_s_lo = _oz.matmul_dd_right(s, None, 2,
                                           wdt_planes_ref[:, :, :], wdt_exp)
    sw, sx, sy, sz = (rk._wide_comp(s, c) for c in range(4))

    def prod(khh, khl, sv):
        ph, pe = dd.two_prod(khh, sv)
        return ph, pe + khl * sv

    def comb(sign0, t0, sign1, t1, sign2, t2):
        h0, l0 = dd.dd_scale(*t0, sign0)
        h0, l0 = dd.dd_add(h0, l0, *dd.dd_scale(*t1, sign1))
        return dd.dd_add(h0, l0, *dd.dd_scale(*t2, sign2))

    k0h, k1h, k2h = k_hi[:3]
    k0l, k1l, k2l = k_lo[:3]
    rows = [
        comb(-1.0, prod(k0h, k0l, sx), -1.0, prod(k1h, k1l, sy),
             -1.0, prod(k2h, k2l, sz)),
        comb(+1.0, prod(k0h, k0l, sw), +1.0, prod(k2h, k2l, sy),
             -1.0, prod(k1h, k1l, sz)),
        comb(+1.0, prod(k1h, k1l, sw), -1.0, prod(k2h, k2l, sx),
             +1.0, prod(k0h, k0l, sz)),
        comb(+1.0, prod(k2h, k2l, sw), +1.0, prod(k1h, k1l, sx),
             -1.0, prod(k0h, k0l, sy)),
    ]
    ak_hi = jnp.concatenate([r[0] for r in rows], axis=0)
    ak_lo = jnp.concatenate([r[1] for r in rows], axis=0)

    rr_hi, rr_lo = dd.dd_add(rhs_hi, rhs_lo, -dn_s_hi, -dn_s_lo)
    rr_hi, rr_lo = dd.dd_add(rr_hi, rr_lo, ak_hi, ak_lo)

    # --- stage 3: f32 Picard correction, dd combine ---
    res = rr_hi + rr_lo
    g_res = mm(res, wt)
    delta = g_res
    for _ in range(corr_iters):
        delta = g_res + mm(a_apply(delta), wt)
    x_hi, x_lo = dd.two_sum(s, delta)

    # --- stage 4: dd tangent (x2) ---
    q_dd = list(zip((rk._wide_comp(x_hi, c) for c in range(4)),
                    (rk._wide_comp(x_lo, c) for c in range(4))))
    gamma_half = ([(k_hi[3 + j], k_lo[3 + j]) for j in range(3)]
                  if na == 6 else None)
    t0, t1, t2 = _dd_tangent_rows(dd, q_dd, gamma_half)
    zero = jnp.zeros_like(t0[0])
    b_hi = jnp.concatenate([t0[0], t1[0], t2[0], zero], axis=0)
    b_lo = jnp.concatenate([t0[1], t1[1], t2[1], zero], axis=0)

    # --- stage 5: dd position via the second Ozaki apply ---
    pos_hi, pos_lo = _oz.matmul_dd_right(b_hi, b_lo, 3,
                                         wgt_planes_ref[:, :, :], wgt_exp,
                                         pair_budget=5)
    if bc:
        # r_init enters OUTSIDE the int8 apply (|dn_in| ~ N^2/L would blow
        # the fixed-point window): -(G dn_in) (x) r0, exact dd products.
        gd_h, gd_l = gdin_hi_ref[:, :], gdin_lo_ref[:, :]   # (1, p_pad)
        eb_hi, eb_lo = [], []
        for c in range(4):
            col_h = r0_ref[:, c:c + 1]
            col_l = r0_ref[:, 4 + c:5 + c]
            ph, pl = dd.dd_mul(col_h, col_l, gd_h, gd_l)
            eb_hi.append(-ph)
            eb_lo.append(-pl)
        pos_hi, pos_lo = dd.dd_add(pos_hi, pos_lo,
                                   jnp.concatenate(eb_hi, axis=0),
                                   jnp.concatenate(eb_lo, axis=0))

    # Poison out-of-domain rods (both fixed-point windows), per rod.
    b_abs = jnp.maximum(
        jnp.maximum(jnp.abs(rk._wide_comp(b_hi, 0)),
                    jnp.abs(rk._wide_comp(b_hi, 1))),
        jnp.abs(rk._wide_comp(b_hi, 2)),
    )
    bad = bad | (jnp.max(b_abs, axis=1, keepdims=True) >= 7.92)
    bad4 = jnp.concatenate([bad] * 4, axis=0)      # (4R, 1)
    nan = jnp.float32(np.nan)
    q_hi_ref[0, :, :] = jnp.where(bad4, nan, x_hi)
    q_lo_ref[0, :, :] = jnp.where(bad4, nan, x_lo)
    r_hi_ref[0, :, :] = jnp.where(bad4, nan, pos_hi)
    r_lo_ref[0, :, :] = jnp.where(bad4, nan, pos_lo)


@functools.lru_cache(maxsize=None)
def _wide_refined_constants(cfg: rod_model.RodConfig):
    grid = cfg.grid
    npts = grid.num_unknown
    p_pad = rk._wide_p_pad(npts)
    r_cnt = rk.WIDE_RODS

    g_pad = np.zeros((p_pad, p_pad))
    g_pad[:npts, :npts] = grid.ginv
    wt = g_pad.T.astype(np.float32)                # FULL G~^T

    ptab64 = np.zeros((cfg.ne, p_pad))
    ptab64[:, :npts] = 0.5 * cfg.basis_table.T     # 1/2 folded in
    ptab_hi = ptab64.astype(np.float32)
    ptab_lo = (ptab64 - ptab_hi.astype(np.float64)).astype(np.float32)

    # rhs = -(q0 (x) dn_in), demo BC q0 = (1,0,0,0): w-component rows only.
    rhs64 = np.zeros((4 * r_cnt, p_pad))
    rhs64[:r_cnt, :npts] = -grid.dn_in[None, :]
    rhs_hi = rhs64.astype(np.float32)
    rhs_lo = (rhs64 - rhs_hi.astype(np.float64)).astype(np.float32)
    g_rhs = (rhs64 @ g_pad.T).astype(np.float32)   # (I (x) G) rhs, wide

    d_pad = np.zeros((p_pad, p_pad))
    d_pad[:npts, :npts] = grid.dn_nn
    wdt_planes, wdt_exp = ozaki.plane_decompose_const(d_pad.T)
    wgt_planes, wgt_exp = ozaki.plane_decompose_const((0.5 * g_pad).T)
    return (wt, ptab_hi, ptab_lo, g_rhs, rhs_hi, rhs_lo,
            wdt_planes, int(wdt_exp), wgt_planes, int(wgt_exp))


def _rod_shape_refined_kernel_wide(qes, qes_lo, cfg, iters, corr_iters,
                                   interpret, check_rho):
    if rk._is_paired(cfg.grid.num_unknown):
        return _rod_shape_refined_kernel_pair(qes, qes_lo, cfg, iters,
                                              corr_iters, interpret,
                                              check_rho)
    qes, b, b_pad, npts = rk._prepare_wide(qes, cfg)
    if qes_lo is None:
        qes_lo = jnp.zeros_like(qes)
    else:
        qes_lo = jnp.asarray(qes_lo, jnp.float32)
        if qes_lo.shape[0] != b_pad:
            qes_lo = jnp.pad(qes_lo, ((0, b_pad - qes_lo.shape[0]), (0, 0)))
    qes = jnp.concatenate([qes, qes_lo], axis=1)   # (B_pad, 2*nq)
    nb = b_pad // rk.WIDE_RODS
    p_pad = rk._wide_p_pad(npts)
    nq = cfg.na * cfg.ne

    (wt, ptab_hi, ptab_lo, g_rhs, rhs_hi, rhs_lo,
     wdt_planes, wdt_exp, wgt_planes, wgt_exp) = _wide_refined_constants(cfg)

    kernel = functools.partial(
        _kernel_wide_refined, iters=iters, corr_iters=corr_iters, ne=cfg.ne,
        wdt_exp=wdt_exp, wgt_exp=wgt_exp,
        rho2_limit=(None if check_rho is None
                    else float((check_rho / cfg.length) ** 2)),
        na=cfg.na,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 4 * rk.WIDE_RODS, p_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, 4 * rk.WIDE_RODS, p_pad),
                                     jnp.float32)
    q_hi, q_lo, r_hi, r_lo = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((rk.WIDE_RODS, 2 * nq), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            const((p_pad, p_pad)),
            const((cfg.ne, p_pad)),
            const((cfg.ne, p_pad)),
            const((4 * rk.WIDE_RODS, p_pad)),
            const((4 * rk.WIDE_RODS, p_pad)),
            const((4 * rk.WIDE_RODS, p_pad)),
            const((wdt_planes.shape[0], p_pad, p_pad)),
            const((wgt_planes.shape[0], p_pad, p_pad)),
        ],
        out_specs=(out_spec,) * 4,
        out_shape=(out_shape,) * 4,
        interpret=interpret,
    )(qes, jnp.asarray(wt), jnp.asarray(ptab_hi), jnp.asarray(ptab_lo),
      jnp.asarray(g_rhs), jnp.asarray(rhs_hi), jnp.asarray(rhs_lo),
      jnp.asarray(wdt_planes), jnp.asarray(wgt_planes))

    up = lambda o, c: rk.unpack_state_wide(o, b, npts, c)
    return up(q_hi, 4), up(q_lo, 4), up(r_hi, 3), up(r_lo, 3)


@functools.lru_cache(maxsize=None)
def _wide_bc_constants(cfg: rod_model.RodConfig):
    """dd splits of the wide-layout BC rows: ``dn_in`` and ``G @ dn_in``
    as (1, p_pad) lane vectors."""
    from .. import doubledouble as dd

    grid = cfg.grid
    npts = grid.num_unknown
    p_pad = rk._wide_p_pad(npts)
    din64 = np.zeros((1, p_pad))
    din64[0, :npts] = grid.dn_in
    gdin64 = np.zeros((1, p_pad))
    gdin64[0, :npts] = grid.ginv @ grid.dn_in
    return dd.split_f64(din64) + dd.split_f64(gdin64)


def _rod_shape_refined_kernel_bc_wide(qes, q_init, r_init, qes_lo,
                                      q_init_lo, r_init_lo, cfg, iters,
                                      corr_iters, interpret, check_rho):
    if rk._is_paired(cfg.grid.num_unknown):
        return _rod_shape_refined_kernel_bc_pair(
            qes, q_init, r_init, qes_lo, q_init_lo, r_init_lo, cfg, iters,
            corr_iters, interpret, check_rho)
    qes, b, b_pad, npts = rk._prepare_wide(qes, cfg)
    if qes_lo is None:
        qes_lo = jnp.zeros_like(qes)
    else:
        qes_lo = jnp.asarray(qes_lo, jnp.float32)
        if qes_lo.shape[0] != b_pad:
            qes_lo = jnp.pad(qes_lo, ((0, b_pad - qes_lo.shape[0]), (0, 0)))
    qes = jnp.concatenate([qes, qes_lo], axis=1)
    nb = b_pad // rk.WIDE_RODS
    p_pad = rk._wide_p_pad(npts)
    nq = cfg.na * cfg.ne

    def pack_dd8(v_hi, v_lo):
        """(B, c<=4) dd pair -> (B_pad, 8): hi cols then lo cols."""
        v_hi = jnp.asarray(v_hi, jnp.float32)
        v_lo = (jnp.zeros_like(v_hi) if v_lo is None
                else jnp.asarray(v_lo, jnp.float32))
        out = []
        for v in (v_hi, v_lo):
            out.append(jnp.pad(
                v, ((0, b_pad - v.shape[0]), (0, 4 - v.shape[1]))))
        return jnp.concatenate(out, axis=1)

    q0 = pack_dd8(q_init, q_init_lo)                   # (B_pad, 8)
    r0 = pack_dd8(r_init, r_init_lo)

    (wt, ptab_hi, ptab_lo, _, _, _,
     wdt_planes, wdt_exp, wgt_planes, wgt_exp) = _wide_refined_constants(cfg)
    din_hi, din_lo, gdin_hi, gdin_lo = _wide_bc_constants(cfg)

    kernel = functools.partial(
        _kernel_wide_refined, iters=iters, corr_iters=corr_iters, ne=cfg.ne,
        wdt_exp=wdt_exp, wgt_exp=wgt_exp,
        rho2_limit=(None if check_rho is None
                    else float((check_rho / cfg.length) ** 2)),
        bc=True, na=cfg.na,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    rod_spec = lambda cols: pl.BlockSpec((rk.WIDE_RODS, cols),
                                         lambda i: (i, 0),
                                         memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 4 * rk.WIDE_RODS, p_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, 4 * rk.WIDE_RODS, p_pad),
                                     jnp.float32)
    q_hi, q_lo, r_hi, r_lo = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[
            rod_spec(2 * nq),
            const((p_pad, p_pad)),
            const((cfg.ne, p_pad)),
            const((cfg.ne, p_pad)),
            const((1, p_pad)),
            const((1, p_pad)),
            const((1, p_pad)),
            const((1, p_pad)),
            rod_spec(8),
            rod_spec(8),
            const((wdt_planes.shape[0], p_pad, p_pad)),
            const((wgt_planes.shape[0], p_pad, p_pad)),
        ],
        out_specs=(out_spec,) * 4,
        out_shape=(out_shape,) * 4,
        interpret=interpret,
    )(qes, jnp.asarray(wt), jnp.asarray(ptab_hi), jnp.asarray(ptab_lo),
      jnp.asarray(din_hi), jnp.asarray(din_lo),
      jnp.asarray(gdin_hi), jnp.asarray(gdin_lo), q0, r0,
      jnp.asarray(wdt_planes), jnp.asarray(wgt_planes))

    up = lambda o, c: rk.unpack_state_wide(o, b, npts, c)
    return up(q_hi, 4), up(q_lo, 4), up(r_hi, 3), up(r_lo, 3)


@functools.lru_cache(maxsize=None)
def _refined_constants(cfg: rod_model.RodConfig, p_pad: int, rpc: int):
    grid = cfg.grid
    npts = grid.num_unknown
    _, _, g_rhs = rk._constants(cfg, p_pad, rpc)

    # FULL W = I (x) G~ (no 1/2: the ODE's 1/2 is folded into the K table
    # instead, so a_apply(s) IS (1/2) A(K) s and every G application here
    # uses the plain integration operator).
    g_pad0 = np.zeros((p_pad, p_pad))
    g_pad0[:npts, :npts] = grid.ginv
    w = np.kron(np.eye(4 * rpc), g_pad0).astype(np.float32)

    # dd basis table split, with the 1/2 folded in.
    ptab64 = np.zeros((p_pad, cfg.ne))
    ptab64[:npts] = cfg.basis_table
    ptab64 *= 0.5
    ptab_hi = ptab64.astype(np.float32)
    ptab_lo = (ptab64 - ptab_hi.astype(np.float64)).astype(np.float32)

    # dd rhs = -(dn_in (x) q0) pattern.
    rhs64 = np.zeros((4 * rpc * p_pad, 1))
    for h in range(rpc):
        rhs64[h * 4 * p_pad:h * 4 * p_pad + npts, 0] = -grid.dn_in
    rhs_hi = rhs64.astype(np.float32)
    rhs_lo = (rhs64 - rhs_hi.astype(np.float64)).astype(np.float32)

    # int8 planes of W_D = I (x) D~  and  W_G = I (x) (G~/2), in f64.
    d_pad = np.zeros((p_pad, p_pad))
    d_pad[:npts, :npts] = grid.dn_nn
    wd = np.kron(np.eye(4 * rpc), d_pad)
    wd_planes, wd_exp = ozaki.plane_decompose_const(wd)

    g_pad = np.zeros((p_pad, p_pad))
    g_pad[:npts, :npts] = grid.ginv
    wg = np.kron(np.eye(4 * rpc), 0.5 * g_pad)
    wg_planes, wg_exp = ozaki.plane_decompose_const(wg)

    return (w, ptab_hi, ptab_lo, g_rhs, rhs_hi, rhs_lo,
            wd_planes, int(wd_exp), wg_planes, int(wg_exp))


@functools.lru_cache(maxsize=None)
def _bc_constants(cfg: rod_model.RodConfig, p_pad: int):
    """dd splits of the grid's known-endpoint column and its integrated
    image ``G @ dn_in`` (both (p_pad, 1) zero-padded)."""
    from .. import doubledouble as dd

    grid = cfg.grid
    npts = grid.num_unknown
    din64 = np.zeros((p_pad, 1))
    din64[:npts, 0] = grid.dn_in
    gdin64 = np.zeros((p_pad, 1))
    gdin64[:npts, 0] = grid.ginv @ grid.dn_in
    return dd.split_f64(din64) + dd.split_f64(gdin64)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "iters", "corr_iters", "tile", "interpret",
                     "check_rho"),
)
def rod_shape_refined_kernel_bc(qes, q_init, r_init, qes_lo=None,
                                q_init_lo=None, r_init_lo=None,
                                cfg: rod_model.RodConfig = rod_model.RodConfig(),
                                iters: int = 20, corr_iters: int = 20,
                                tile: int = rk.DEFAULT_TILE,
                                interpret: bool = False,
                                check_rho: float | None = 5.0):
    """Fully-fused refined solve with per-rod dd boundary conditions.

    ``qes (B, na*ne)``, ``q_init (B, 4)``, ``r_init (B, 3)`` (each with an
    optional ``_lo`` word carrying f64-grade junction state) ->
    ``(q_hi, q_lo, r_hi, r_lo)``.  This is the accuracy-path analogue of
    ``rod_kernel.rod_shape_fused_bc``: multi-segment rods chain through it
    without dropping to f32 at the junctions (models/segments.py,
    method='refined_fused').  ≙ `/root/reference/main.cpp:106,154` with the
    boundary values generalized.  Wide grids (32 < n-1 <= 512) route to the
    wide-layout variant.
    """
    if rk._is_wide(cfg.grid.num_unknown):
        return _rod_shape_refined_kernel_bc_wide(
            qes, q_init, r_init, qes_lo, q_init_lo, r_init_lo, cfg, iters,
            corr_iters, interpret, check_rho)
    if tile > 2048:
        raise ValueError("refined kernel: tile <= 2048 (VMEM limit)")
    qes, b, b_pad, npts, p_pad, rpc = rk._prepare(qes, cfg, tile)
    if qes_lo is None:
        qes_lo = jnp.zeros_like(qes)
    else:
        qes_lo = jnp.asarray(qes_lo, jnp.float32)
        if qes_lo.shape[0] != b_pad:
            qes_lo = jnp.pad(qes_lo, ((0, b_pad - qes_lo.shape[0]), (0, 0)))
    qes = jnp.concatenate([qes, qes_lo], axis=1)
    n_tiles = b_pad // tile
    half = tile // rpc

    def pack_dd(v_hi, v_lo, rows):
        """(B, c<=rows) dd pair -> (2*rows, B_pad): hi rows then lo rows."""
        v_hi = jnp.asarray(v_hi, jnp.float32)
        v_lo = (jnp.zeros_like(v_hi) if v_lo is None
                else jnp.asarray(v_lo, jnp.float32))
        out = []
        for v in (v_hi, v_lo):
            out.append(jnp.pad(
                v, ((0, b_pad - v.shape[0]), (0, rows - v.shape[1]))).T)
        return jnp.concatenate(out, axis=0)

    q0_t = pack_dd(q_init, q_init_lo, 4)                 # (8, B_pad)
    r0_t = pack_dd(r_init, r_init_lo, 4)

    (w, ptab_hi, ptab_lo, _, _, _,
     wd_planes, wd_exp, wg_planes, wg_exp) = _refined_constants(
        cfg, p_pad, rpc)
    din_hi, din_lo, gdin_hi, gdin_lo = _bc_constants(cfg, p_pad)

    kernel = functools.partial(
        _kernel, iters=iters, corr_iters=corr_iters, ne=cfg.ne,
        p_pad=p_pad, rpc=rpc, wd_exp=wd_exp, wg_exp=wg_exp,
        rho2_limit=(None if check_rho is None
                    else float((check_rho / cfg.length) ** 2)),
        bc=True, na=cfg.na,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((128, half), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((128, n_tiles * half), jnp.float32)
    q_hi, q_lo, r_hi, r_lo = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2 * cfg.na * cfg.ne, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const((128, 128)),
            const((p_pad, cfg.ne)),
            const((p_pad, cfg.ne)),
            const((p_pad, 1)),
            const((p_pad, 1)),
            const((p_pad, 1)),
            const((p_pad, 1)),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const((wd_planes.shape[0], 128, 128)),
            const((wg_planes.shape[0], 128, 128)),
        ],
        out_specs=(out_spec,) * 4,
        out_shape=(out_shape,) * 4,
        interpret=interpret,
    )(qes.T, jnp.asarray(w), jnp.asarray(ptab_hi), jnp.asarray(ptab_lo),
      jnp.asarray(din_hi), jnp.asarray(din_lo),
      jnp.asarray(gdin_hi), jnp.asarray(gdin_lo), q0_t, r0_t,
      jnp.asarray(wd_planes), jnp.asarray(wg_planes))

    up = lambda o, c: rk.unpack_state(o, b, npts, c, tile, p_pad, rpc)
    return up(q_hi, 4), up(q_lo, 4), up(r_hi, 3), up(r_lo, 3)


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "iters", "corr_iters", "tile", "interpret",
                     "check_rho"),
)
def rod_shape_refined_kernel(qes, qes_lo=None,
                             cfg: rod_model.RodConfig = rod_model.RodConfig(),
                             iters: int = 20, corr_iters: int = 20,
                             tile: int = rk.DEFAULT_TILE,
                             interpret: bool = False,
                             check_rho: float | None = 5.0):
    """Fully-fused refined solve.

    ``qes (B, na*ne)`` (+ optional low word ``qes_lo`` from
    ``rod.split_strain`` for f64-grade input) ->
    ``(q_hi, q_lo, r_hi, r_lo)`` each ``(B, n-1, dim)`` — double-word
    quaternions and positions, ~1e-11 relative vs the f64 reference.

    **Validity domain**: rho = max|K| L / 2 <~ 5 (i.e. |K| L <= 10) with the
    default iteration counts — beyond that the Picard series' transient
    growth both stalls convergence AND can exceed the int8 fixed-point
    window of the exact residual (|state| < 4).  Overflow is DETECTED
    in-kernel: affected rods come back as NaN, never a silent wrap; callers
    with concrete strains get a trace-time ValueError instead
    (``rod._check_rho``).  For stronger curvature increase
    ``iters``/``corr_iters``, use the staged path with more refinement
    steps, or split the rod into segments (models/segments.py); see
    diagnostics.picard_iterations_needed.
    """
    if rk._is_wide(cfg.grid.num_unknown):
        return _rod_shape_refined_kernel_wide(qes, qes_lo, cfg, iters,
                                              corr_iters, interpret,
                                              check_rho)
    if tile > 2048:
        raise ValueError(
            "refined kernel: tile <= 2048 (the dd state + int8 planes of a "
            "larger tile exceed the 16MB VMEM scoped-allocation limit)"
        )
    qes, b, b_pad, npts, p_pad, rpc = rk._prepare(qes, cfg, tile)
    if qes_lo is None:
        qes_lo = jnp.zeros_like(qes)
    else:
        qes_lo = jnp.asarray(qes_lo, jnp.float32)
        if qes_lo.shape[0] != b_pad:
            qes_lo = jnp.pad(qes_lo, ((0, b_pad - qes_lo.shape[0]), (0, 0)))
    qes = jnp.concatenate([qes, qes_lo], axis=1)   # (B_pad, 2*na*ne)
    n_tiles = b_pad // tile
    half = tile // rpc

    (w, ptab_hi, ptab_lo, g_rhs, rhs_hi, rhs_lo,
     wd_planes, wd_exp, wg_planes, wg_exp) = _refined_constants(
        cfg, p_pad, rpc)

    kernel = functools.partial(
        _kernel, iters=iters, corr_iters=corr_iters, ne=cfg.ne,
        p_pad=p_pad, rpc=rpc, wd_exp=wd_exp, wg_exp=wg_exp,
        # kh holds K/2, so rho = L * max|K/2|; compare squared magnitudes.
        rho2_limit=(None if check_rho is None
                    else float((check_rho / cfg.length) ** 2)),
        na=cfg.na,
    )
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((128, half), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((128, n_tiles * half), jnp.float32)
    q_hi, q_lo, r_hi, r_lo = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((2 * cfg.na * cfg.ne, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            const((128, 128)),
            const((p_pad, cfg.ne)),
            const((p_pad, cfg.ne)),
            const((128, 1)),
            const((128, 1)),
            const((128, 1)),
            const((wd_planes.shape[0], 128, 128)),
            const((wg_planes.shape[0], 128, 128)),
        ],
        out_specs=(out_spec,) * 4,
        out_shape=(out_shape,) * 4,
        interpret=interpret,
    )(qes.T, jnp.asarray(w), jnp.asarray(ptab_hi), jnp.asarray(ptab_lo),
      jnp.asarray(g_rhs), jnp.asarray(rhs_hi), jnp.asarray(rhs_lo),
      jnp.asarray(wd_planes), jnp.asarray(wg_planes))

    up = lambda o, c: rk.unpack_state(o, b, npts, c, tile, p_pad, rpc)
    return up(q_hi, 4), up(q_lo, 4), up(r_hi, 3), up(r_lo, 3)


# --- PAIRED-wide refined (32 < n-1 <= 64): two rods per 128 lanes ----------

def _kernel_pair_refined(qe_ref, wt_ref, pha_ref, pla_ref, phb_ref, plb_ref,
                         *rest, iters, corr_iters, ne, wdt_exp, wgt_exp,
                         rho2_limit, bc=False, na=3):
    """Paired-lane variant of :func:`_kernel_wide_refined`: rod A on lanes
    [0, 64), rod B on [64, 128), block-diagonal operators (incl. the int8
    planes) — 64 accuracy-grade rods per MXU pass.  The dd strain outer
    products stay exact because the two halves have disjoint lane support
    (each lane receives exactly one contribution).  ``na=6`` carries the
    Reissner gamma rows into the stage-4 dd tangent."""
    from .. import doubledouble as dd
    from .. import ozaki as _oz

    if bc:
        (din_a_hi_ref, din_a_lo_ref, din_b_hi_ref, din_b_lo_ref,
         gdin_a_hi_ref, gdin_a_lo_ref, gdin_b_hi_ref, gdin_b_lo_ref,
         q0_ref, r0_ref, wdt_planes_ref, wgt_planes_ref,
         q_hi_ref, q_lo_ref, r_hi_ref, r_lo_ref) = rest
    else:
        (g_rhs_ref, rhs_hi_ref, rhs_lo_ref, wdt_planes_ref, wgt_planes_ref,
         q_hi_ref, q_lo_ref, r_hi_ref, r_lo_ref) = rest

    mm = rk._make_mm("high")
    r_cnt = rk.WIDE_RODS
    half_lanes = rk.WIDE_PAIR_HALF
    nq = na * ne

    # dd strains K/2: per mode, EFT outer products per lane-half, exact sum.
    pha, pla = pha_ref[:, :], pla_ref[:, :]       # (ne, 128) A-half tables
    phb, plb = phb_ref[:, :], plb_ref[:, :]
    k_hi, k_lo = [], []
    for a in range(na):
        acc_h = acc_l = None
        for e in range(ne):
            ca_h = qe_ref[:, a * ne + e:a * ne + e + 1]
            ca_l = qe_ref[:, nq + a * ne + e:nq + a * ne + e + 1]
            cb_h = qe_ref[:, 2 * nq + a * ne + e:2 * nq + a * ne + e + 1]
            cb_l = qe_ref[:, 3 * nq + a * ne + e:3 * nq + a * ne + e + 1]
            pa_h, pa_e = dd.two_prod(ca_h, pha[e:e + 1, :])
            pa_e = pa_e + ca_l * pha[e:e + 1, :] + ca_h * pla[e:e + 1, :]
            pb_h, pb_e = dd.two_prod(cb_h, phb[e:e + 1, :])
            pb_e = pb_e + cb_l * phb[e:e + 1, :] + cb_h * plb[e:e + 1, :]
            ph = pa_h + pb_h          # disjoint lane support: exact
            pe = pa_e + pb_e
            if acc_h is None:
                acc_h, acc_l = ph, pe
            else:
                acc_h, acc_l = dd.dd_add(acc_h, acc_l, ph, pe)
        k_hi.append(acc_h)
        k_lo.append(acc_l)
    a_apply = rk._wide_a_apply(k_hi)

    wt = wt_ref[:, :]                 # (128, 128) block-diag FULL G~^T
    if bc:
        din = [(din_a_hi_ref[:, :], din_a_lo_ref[:, :]),
               (din_b_hi_ref[:, :], din_b_lo_ref[:, :])]
        rb_hi, rb_lo = [], []
        for c in range(4):
            ph = pl_ = None
            for hlf, off in ((0, 0), (1, 8)):
                col_h = q0_ref[:, off + c:off + c + 1]
                col_l = q0_ref[:, off + 4 + c:off + 5 + c]
                hh, ll = dd.dd_mul(col_h, col_l, *din[hlf])
                ph = hh if ph is None else ph + hh      # disjoint lanes
                pl_ = ll if pl_ is None else pl_ + ll
            rb_hi.append(-ph)
            rb_lo.append(-pl_)
        rhs_hi = jnp.concatenate(rb_hi, axis=0)
        rhs_lo = jnp.concatenate(rb_lo, axis=0)
        g_rhs = mm(rhs_hi, wt)
    else:
        rhs_hi = rhs_hi_ref[:, :]
        rhs_lo = rhs_lo_ref[:, :]
        g_rhs = g_rhs_ref[:, :]

    # stage 1: f32 Picard
    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)

    # Per-rod sentinel, PER LANE-HALF (rods A and B share sublanes).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 2 * half_lanes), 1)
    in_a = (lane < half_lanes).astype(jnp.float32)
    in_b = 1.0 - in_a

    def half_max(arr):
        return (jnp.max(arr * in_a, axis=1, keepdims=True),
                jnp.max(arr * in_b, axis=1, keepdims=True))

    comp_abs = jnp.maximum(
        jnp.maximum(jnp.abs(rk._wide_comp(s, 0)), jnp.abs(rk._wide_comp(s, 1))),
        jnp.maximum(jnp.abs(rk._wide_comp(s, 2)), jnp.abs(rk._wide_comp(s, 3))),
    )
    mx_a, mx_b = half_max(comp_abs)
    bad_a = mx_a >= 3.96
    bad_b = mx_b >= 3.96
    if rho2_limit is not None:
        k0, k1, k2 = k_hi[:3]
        ss = k0 * k0 + k1 * k1 + k2 * k2
        ss_a, ss_b = half_max(ss)
        bad_a = bad_a | (ss_a > rho2_limit)
        bad_b = bad_b | (ss_b > rho2_limit)

    # stage 2: exact residual (block-diag planes)
    dn_s_hi, dn_s_lo = _oz.matmul_dd_right(s, None, 2,
                                           wdt_planes_ref[:, :, :], wdt_exp)
    sw, sx, sy, sz = (rk._wide_comp(s, c) for c in range(4))

    def prod(khh, khl, sv):
        ph, pe = dd.two_prod(khh, sv)
        return ph, pe + khl * sv

    def comb(s0, t0, s1, t1, s2, t2):
        h0, l0 = dd.dd_scale(*t0, s0)
        h0, l0 = dd.dd_add(h0, l0, *dd.dd_scale(*t1, s1))
        return dd.dd_add(h0, l0, *dd.dd_scale(*t2, s2))

    k0h, k1h, k2h = k_hi[:3]
    k0l, k1l, k2l = k_lo[:3]
    rows = [
        comb(-1.0, prod(k0h, k0l, sx), -1.0, prod(k1h, k1l, sy),
             -1.0, prod(k2h, k2l, sz)),
        comb(+1.0, prod(k0h, k0l, sw), +1.0, prod(k2h, k2l, sy),
             -1.0, prod(k1h, k1l, sz)),
        comb(+1.0, prod(k1h, k1l, sw), -1.0, prod(k2h, k2l, sx),
             +1.0, prod(k0h, k0l, sz)),
        comb(+1.0, prod(k2h, k2l, sw), +1.0, prod(k1h, k1l, sx),
             -1.0, prod(k0h, k0l, sy)),
    ]
    ak_hi = jnp.concatenate([r[0] for r in rows], axis=0)
    ak_lo = jnp.concatenate([r[1] for r in rows], axis=0)
    rr_hi, rr_lo = dd.dd_add(rhs_hi, rhs_lo, -dn_s_hi, -dn_s_lo)
    rr_hi, rr_lo = dd.dd_add(rr_hi, rr_lo, ak_hi, ak_lo)

    # stage 3: correction + dd combine
    res = rr_hi + rr_lo
    g_res = mm(res, wt)
    delta = g_res
    for _ in range(corr_iters):
        delta = g_res + mm(a_apply(delta), wt)
    x_hi, x_lo = dd.two_sum(s, delta)

    # stage 4: dd tangent
    q_dd = list(zip((rk._wide_comp(x_hi, c) for c in range(4)),
                    (rk._wide_comp(x_lo, c) for c in range(4))))
    gamma_half = ([(k_hi[3 + j], k_lo[3 + j]) for j in range(3)]
                  if na == 6 else None)
    t0, t1, t2 = _dd_tangent_rows(dd, q_dd, gamma_half)
    zero = jnp.zeros_like(t0[0])
    b_hi = jnp.concatenate([t0[0], t1[0], t2[0], zero], axis=0)
    b_lo = jnp.concatenate([t0[1], t1[1], t2[1], zero], axis=0)

    # stage 5: dd position
    pos_hi, pos_lo = _oz.matmul_dd_right(b_hi, b_lo, 3,
                                         wgt_planes_ref[:, :, :], wgt_exp,
                                         pair_budget=5)
    if bc:
        gdin = [(gdin_a_hi_ref[:, :], gdin_a_lo_ref[:, :]),
                (gdin_b_hi_ref[:, :], gdin_b_lo_ref[:, :])]
        eb_hi, eb_lo = [], []
        for c in range(4):
            ph = pl_ = None
            for hlf, off in ((0, 0), (1, 8)):
                col_h = r0_ref[:, off + c:off + c + 1]
                col_l = r0_ref[:, off + 4 + c:off + 5 + c]
                hh, ll = dd.dd_mul(col_h, col_l, *gdin[hlf])
                ph = hh if ph is None else ph + hh
                pl_ = ll if pl_ is None else pl_ + ll
            eb_hi.append(-ph)
            eb_lo.append(-pl_)
        pos_hi, pos_lo = dd.dd_add(pos_hi, pos_lo,
                                   jnp.concatenate(eb_hi, axis=0),
                                   jnp.concatenate(eb_lo, axis=0))

    b_abs = jnp.maximum(
        jnp.maximum(jnp.abs(rk._wide_comp(b_hi, 0)),
                    jnp.abs(rk._wide_comp(b_hi, 1))),
        jnp.abs(rk._wide_comp(b_hi, 2)),
    )
    bb_a, bb_b = half_max(b_abs)
    bad_a = bad_a | (bb_a >= 7.92)
    bad_b = bad_b | (bb_b >= 7.92)
    bad = bad_a * in_a + bad_b * in_b              # (R, 128) lane mask
    bad4 = jnp.concatenate([bad] * 4, axis=0) > 0
    nan = jnp.float32(np.nan)
    q_hi_ref[0, :, :] = jnp.where(bad4, nan, x_hi)
    q_lo_ref[0, :, :] = jnp.where(bad4, nan, x_lo)
    r_hi_ref[0, :, :] = jnp.where(bad4, nan, pos_hi)
    r_lo_ref[0, :, :] = jnp.where(bad4, nan, pos_lo)


@functools.lru_cache(maxsize=None)
def _pair_refined_constants(cfg: rod_model.RodConfig):
    grid = cfg.grid
    npts = grid.num_unknown
    p_half = rk.WIDE_PAIR_HALF
    lanes = 2 * p_half
    r_cnt = rk.WIDE_RODS

    g_pad = np.zeros((p_half, p_half))
    g_pad[:npts, :npts] = grid.ginv
    wt = np.zeros((lanes, lanes))
    wt[:p_half, :p_half] = g_pad.T
    wt[p_half:, p_half:] = g_pad.T
    wt = wt.astype(np.float32)

    ptab64 = np.zeros((cfg.ne, lanes))
    ptab64[:, :npts] = 0.5 * cfg.basis_table.T
    pha = ptab64.astype(np.float32)
    pla = (ptab64 - pha.astype(np.float64)).astype(np.float32)
    ptab64b = np.zeros((cfg.ne, lanes))
    ptab64b[:, p_half:p_half + npts] = 0.5 * cfg.basis_table.T
    phb = ptab64b.astype(np.float32)
    plb = (ptab64b - phb.astype(np.float64)).astype(np.float32)

    rhs64 = np.zeros((4 * r_cnt, lanes))
    rhs64[:r_cnt, :npts] = -grid.dn_in[None, :]
    rhs64[:r_cnt, p_half:p_half + npts] = -grid.dn_in[None, :]
    rhs_hi = rhs64.astype(np.float32)
    rhs_lo = (rhs64 - rhs_hi.astype(np.float64)).astype(np.float32)
    wt64 = np.zeros((lanes, lanes))
    wt64[:p_half, :p_half] = g_pad.T
    wt64[p_half:, p_half:] = g_pad.T
    g_rhs = (rhs64 @ wt64).astype(np.float32)

    d_pad = np.zeros((p_half, p_half))
    d_pad[:npts, :npts] = grid.dn_nn
    wdt = np.zeros((lanes, lanes))
    wdt[:p_half, :p_half] = d_pad.T
    wdt[p_half:, p_half:] = d_pad.T
    wdt_planes, wdt_exp = ozaki.plane_decompose_const(wdt)
    wgt = 0.5 * wt64
    wgt_planes, wgt_exp = ozaki.plane_decompose_const(wgt)
    return (wt, pha, pla, phb, plb, g_rhs, rhs_hi, rhs_lo,
            wdt_planes, int(wdt_exp), wgt_planes, int(wgt_exp))


@functools.lru_cache(maxsize=None)
def _pair_bc_constants(cfg: rod_model.RodConfig):
    from .. import doubledouble as dd

    grid = cfg.grid
    npts = grid.num_unknown
    p_half = rk.WIDE_PAIR_HALF
    lanes = 2 * p_half

    def halves(vec):
        a = np.zeros((1, lanes))
        a[0, :npts] = vec
        b = np.zeros((1, lanes))
        b[0, p_half:p_half + npts] = vec
        return dd.split_f64(a) + dd.split_f64(b)

    return halves(grid.dn_in) + halves(grid.ginv @ grid.dn_in)


def _refined_pair_call(kernel, cfg, b_pad, qes2, extra_in, interpret):
    nb = b_pad // rk.WIDE_PAIR_RODS
    lanes = 2 * rk.WIDE_PAIR_HALF
    (wt, pha, pla, phb, plb, *_ ) = _pair_refined_constants(cfg)
    nq = cfg.na * cfg.ne
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((rk.WIDE_RODS, 4 * nq), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        const((lanes, lanes)),
        const((cfg.ne, lanes)),
        const((cfg.ne, lanes)),
        const((cfg.ne, lanes)),
        const((cfg.ne, lanes)),
    ] + [spec for spec, _ in extra_in]
    args = [qes2, jnp.asarray(wt), jnp.asarray(pha), jnp.asarray(pla),
            jnp.asarray(phb), jnp.asarray(plb)] + [a for _, a in extra_in]
    out_spec = pl.BlockSpec((1, 4 * rk.WIDE_RODS, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, 4 * rk.WIDE_RODS, lanes),
                                     jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(out_spec,) * 4,
        out_shape=(out_shape,) * 4,
        interpret=interpret,
    )(*args)


def _pair_dd_qes(qes, qes_lo, cfg):
    """dd strain input -> paired kernel layout ``(nb*32, 4 nq)``."""
    qes, b, b_pad, npts = rk._prepare_pair(qes, cfg)
    if qes_lo is None:
        qes_lo = jnp.zeros_like(qes)
    else:
        qes_lo = jnp.asarray(qes_lo, jnp.float32)
        if qes_lo.shape[0] != b_pad:
            qes_lo = jnp.pad(qes_lo, ((0, b_pad - qes_lo.shape[0]), (0, 0)))
    nb = b_pad // rk.WIDE_PAIR_RODS
    nq = cfg.na * cfg.ne
    qes2 = rk._pair_qes(jnp.concatenate([qes, qes_lo], axis=1), nb, 2 * nq)
    # _pair_qes gives [A_hi, A_lo, B_hi, B_lo] column order already (each
    # rod's 2nq block kept together).
    return qes2, b, b_pad, npts


def _rod_shape_refined_kernel_pair(qes, qes_lo, cfg, iters, corr_iters,
                                   interpret, check_rho):
    qes2, b, b_pad, npts = _pair_dd_qes(qes, qes_lo, cfg)
    (_, _, _, _, _, g_rhs, rhs_hi, rhs_lo,
     wdt_planes, wdt_exp, wgt_planes, wgt_exp) = _pair_refined_constants(cfg)
    kernel = functools.partial(
        _kernel_pair_refined, iters=iters, corr_iters=corr_iters, ne=cfg.ne,
        wdt_exp=wdt_exp, wgt_exp=wgt_exp,
        rho2_limit=(None if check_rho is None
                    else float((check_rho / cfg.length) ** 2)),
        na=cfg.na,
    )
    lanes = 2 * rk.WIDE_PAIR_HALF
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    q_hi, q_lo, r_hi, r_lo = _refined_pair_call(
        kernel, cfg, b_pad, qes2,
        extra_in=[
            (const((4 * rk.WIDE_RODS, lanes)), jnp.asarray(g_rhs)),
            (const((4 * rk.WIDE_RODS, lanes)), jnp.asarray(rhs_hi)),
            (const((4 * rk.WIDE_RODS, lanes)), jnp.asarray(rhs_lo)),
            (const((wdt_planes.shape[0], lanes, lanes)),
             jnp.asarray(wdt_planes)),
            (const((wgt_planes.shape[0], lanes, lanes)),
             jnp.asarray(wgt_planes)),
        ],
        interpret=interpret)
    up = lambda o, c: rk.unpack_state_pair(o, b, npts, c)
    return up(q_hi, 4), up(q_lo, 4), up(r_hi, 3), up(r_lo, 3)


def _rod_shape_refined_kernel_bc_pair(qes, q_init, r_init, qes_lo,
                                      q_init_lo, r_init_lo, cfg, iters,
                                      corr_iters, interpret, check_rho):
    qes2, b, b_pad, npts = _pair_dd_qes(qes, qes_lo, cfg)
    nb = b_pad // rk.WIDE_PAIR_RODS

    def pack_pair_dd8(v_hi, v_lo):
        v_hi = jnp.asarray(v_hi, jnp.float32)
        v_lo = (jnp.zeros_like(v_hi) if v_lo is None
                else jnp.asarray(v_lo, jnp.float32))
        out = []
        for v in (v_hi, v_lo):
            out.append(jnp.pad(
                v, ((0, b_pad - v.shape[0]), (0, 4 - v.shape[1]))))
        return rk._pair_qes(jnp.concatenate(out, axis=1), nb, 8)

    q0 = pack_pair_dd8(q_init, q_init_lo)             # (nb*32, 16)
    r0 = pack_pair_dd8(r_init, r_init_lo)
    (_, _, _, _, _, _, _, _,
     wdt_planes, wdt_exp, wgt_planes, wgt_exp) = _pair_refined_constants(cfg)
    bc_rows = _pair_bc_constants(cfg)
    kernel = functools.partial(
        _kernel_pair_refined, iters=iters, corr_iters=corr_iters, ne=cfg.ne,
        wdt_exp=wdt_exp, wgt_exp=wgt_exp,
        rho2_limit=(None if check_rho is None
                    else float((check_rho / cfg.length) ** 2)),
        bc=True, na=cfg.na,
    )
    lanes = 2 * rk.WIDE_PAIR_HALF
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    rod_spec = pl.BlockSpec((rk.WIDE_RODS, 16), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    q_hi, q_lo, r_hi, r_lo = _refined_pair_call(
        kernel, cfg, b_pad, qes2,
        extra_in=[(const((1, lanes)), jnp.asarray(row)) for row in bc_rows]
        + [
            (rod_spec, q0),
            (rod_spec, r0),
            (const((wdt_planes.shape[0], lanes, lanes)),
             jnp.asarray(wdt_planes)),
            (const((wgt_planes.shape[0], lanes, lanes)),
             jnp.asarray(wgt_planes)),
        ],
        interpret=interpret)
    up = lambda o, c: rk.unpack_state_pair(o, b, npts, c)
    return up(q_hi, 4), up(q_lo, 4), up(r_hi, 3), up(r_lo, 3)
