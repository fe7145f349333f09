"""Double-word ("double-double" style, here double-*float*) arithmetic.

The TPU v5e has no native float64 (SURVEY.md §7 "hard parts"): the MXU/VPU
work in bf16/f32.  The reference runs entirely in f64
(`/root/reference/main.cpp` — all ``double``), and the north-star accuracy
gate is ≤1e-8 relative L∞ against that f64 ground truth.  We close the gap
with **double-word f32 arithmetic**: every extended-precision value is an
unevaluated sum ``hi + lo`` of two f32s (~48-bit effective mantissa,
unit roundoff ≈ 2^-49 ≈ 1.8e-15), using the classic error-free
transformations:

* ``two_sum``   — Knuth's branch-free exact addition,
* ``two_prod``  — Dekker's product via 12/12-bit mantissa splitting
  (no FMA assumed; XLA preserves IEEE op ordering so the error-free
  transformations survive compilation).

These run on the VPU as plain elementwise ops and are used only on the
*cheap* side of the computation — residual evaluation for iterative
refinement of an f32 solve (see ``ops/collocation.py``) — so the MXU hot
path stays pure f32.

All functions broadcast over arbitrary batch shapes and are jit/vmap-safe.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "split_f64",
    "two_sum",
    "fast_two_sum",
    "two_prod",
    "dd_add",
    "dd_add_f32",
    "dd_neg",
    "dd_mul_f32",
    "dd_mul",
    "dd_scale",
    "dd_sum_tree",
    "dd_to_f32",
    "dd_abs_max",
    "dd_cross",
    "dd_weak_form",
]

# Dekker split constant for f32 (24-bit mantissa -> 12+12): 2^12 + 1.
_SPLIT = 4097.0


def split_f64(a: np.ndarray):
    """Host-side split of a float64 array into an (hi, lo) f32 pair.

    ``hi = f32(a)``, ``lo = f32(a - hi)``; ``hi + lo`` carries ~48 bits of
    the original mantissa.  Used at trace time to embed f64 constants
    (differentiation matrices, basis tables) into the f32 TPU program.
    """
    a = np.asarray(a, dtype=np.float64)
    hi = a.astype(np.float32)
    lo = (a - hi.astype(np.float64)).astype(np.float32)
    return hi, lo


def two_sum(a, b):
    """Error-free addition: returns (s, e) with s = fl(a+b), s+e = a+b."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def fast_two_sum(a, b):
    """Error-free addition assuming |a| >= |b| (Dekker)."""
    s = a + b
    e = b - (s - a)
    return s, e


def _split(a):
    c = a * _SPLIT
    hi = c - (c - a)
    return hi, a - hi


def two_prod(a, b):
    """Error-free product: returns (p, e) with p = fl(a*b), p+e = a*b."""
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dd_add(a_hi, a_lo, b_hi, b_lo):
    """Double-word + double-word (accurate variant, ~2 ulp)."""
    s, e = two_sum(a_hi, b_hi)
    e = e + (a_lo + b_lo)
    return fast_two_sum(s, e)


def dd_add_f32(a_hi, a_lo, b):
    """Double-word + single f32."""
    s, e = two_sum(a_hi, b)
    e = e + a_lo
    return fast_two_sum(s, e)


def dd_neg(a_hi, a_lo):
    return -a_hi, -a_lo


def dd_mul_f32(a_hi, a_lo, b):
    """Double-word * single f32."""
    p, e = two_prod(a_hi, b)
    e = e + a_lo * b
    return fast_two_sum(p, e)


def dd_mul(a_hi, a_lo, b_hi, b_lo):
    """Double-word * double-word."""
    p, e = two_prod(a_hi, b_hi)
    e = e + (a_hi * b_lo + a_lo * b_hi)
    return fast_two_sum(p, e)


def dd_scale(a_hi, a_lo, s: float):
    """Multiply by an exactly-representable scalar (e.g. +-0.5, -1)."""
    return a_hi * s, a_lo * s


def dd_sum_tree(hi_terms, lo_terms):
    """Compensated pairwise reduction of a python list of dd terms."""
    terms = list(zip(hi_terms, lo_terms))
    while len(terms) > 1:
        nxt = []
        for i in range(0, len(terms) - 1, 2):
            (ah, al), (bh, bl) = terms[i], terms[i + 1]
            nxt.append(dd_add(ah, al, bh, bl))
        if len(terms) % 2:
            nxt.append(terms[-1])
        terms = nxt
    return terms[0]


def dd_contract_axis(a_hi, a_lo, b_hi, b_lo, axis_len: int):
    """Sum_j dd(a[..., j]) * dd(b[..., j]) with compensated accumulation.

    ``a`` and ``b`` must already be broadcast so their trailing axis is the
    contraction axis of static length ``axis_len`` (small: grid or state
    dimension).  Unrolled at trace time — XLA fuses the whole reduction into
    one elementwise kernel.
    """
    prods_hi, prods_lo = [], []
    for j in range(axis_len):
        ph, plo = dd_mul(a_hi[..., j], a_lo[..., j], b_hi[..., j], b_lo[..., j])
        prods_hi.append(ph)
        prods_lo.append(plo)
    return dd_sum_tree(prods_hi, prods_lo)


def dd_to_f32(a_hi, a_lo):
    return a_hi + a_lo


def dd_abs_max(a_hi, a_lo):
    return jnp.max(jnp.abs(a_hi + a_lo))


def dd_cross(a, b):
    """Cross product of two dd 3-vectors (length-3 lists of (hi, lo)
    pairs) with error-free products — shared by the single-rod and
    segmented dd statics residuals (the moment-arm transports carry the
    worst O(1) cancellation in those paths)."""
    out = []
    for i, j in ((1, 2), (2, 0), (0, 1)):
        p1 = dd_mul(*a[i], *b[j])
        p2 = dd_mul(*a[j], *b[i])
        out.append(dd_add(*p1, *dd_neg(*p2)))
    return out


def dd_weak_form(wp_hi, wp_lo, mr, ne: int):
    """Weak-form contraction ``res[a*ne + e] = sum_j wp[j, e] mr_a[j]``.

    ``wp_hi/wp_lo``: (n, ne) host dd split of the weighted basis table;
    ``mr``: list over strain components of dd pairs with the grid point on
    the LAST axis.  Compensated tree reduction per mode; returns the f32
    sum ``hi + lo`` stacked on a new trailing axis (residual values near
    zero are fully representable — dd mattered for the cancellation).
    """
    n = wp_hi.shape[0]
    res = []
    for mh, ml in mr:
        for e in range(ne):
            hs, ls = [], []
            for j in range(n):
                ph, plo = dd_mul(jnp.asarray(wp_hi[j, e]),
                                 jnp.asarray(wp_lo[j, e]),
                                 mh[..., j], ml[..., j])
                hs.append(ph)
                ls.append(plo)
            th, tl = dd_sum_tree(hs, ls)
            res.append(th + tl)
    return jnp.stack(res, axis=-1)
