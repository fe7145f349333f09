"""Exact double-word matmuls via int8-plane (Ozaki-style) decomposition.

The TPU MXU accumulates f32 matmuls in f32 (rounding at 2^-24), which
makes double-word-accurate contractions impossible with float passes alone
(DESIGN.md §7).  The int8 path is different: int8 x int8 -> int32
accumulation is EXACT.  This module exploits that:

* a constant double-word matrix ``A`` is decomposed host-side into fixed-
  point planes ``A = sum_k 2^{eA - 7(k+1)} A_k`` with ``A_k`` int8 in
  [-64, 64] (:func:`plane_decompose_const`);
* a traced double-word operand ``x = x_hi + x_lo`` is decomposed on-device
  into planes the same way (:func:`plane_decompose`), the f32 remainder
  recurrence being exact (aligned subtractions);
* ``A @ x`` is evaluated as ``sum_{k+m<=S} 2^{...} (A_k @ X_m)`` — int8 MXU
  dots whose int32 partials are exact and small enough (< 2^24) to convert
  to f32 exactly — and recombined with double-word adds
  (:func:`matmul_dd`).

The result is an ``A @ x`` with ~2^-47-level absolute accuracy using only
MXU-friendly operations: the building block for exact residual evaluation
in iterative refinement without VPU-heavy error-free transformations.

Scaling note: operands must fit the fixed-point range ``|.| < 2^e``; plane
counts and the pair budget ``S`` set the accuracy floor (see
:func:`matmul_dd`).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "plane_decompose_const",
    "plane_decompose",
    "matmul_dd",
    "matmul_dd_right",
]

_BITS = 7
_BASE = float(2 ** _BITS)  # 128; plane payloads in [-64, 64]


def plane_decompose_const(a: np.ndarray, num_planes: int = 8):
    """Host-side exact fixed-point planes of an f64 matrix.

    Returns ``(planes int8 (num_planes, *a.shape), exponent e)`` with
    ``a = sum_k 2^{e} * planes[k] / 128^{k+1}`` up to ``2^{e-7*num_planes}``.
    """
    a = np.asarray(a, np.float64)
    e = int(np.ceil(np.log2(np.max(np.abs(a)) + 1e-300))) + 1
    r = a / (2.0 ** e)
    planes = []
    for _ in range(num_planes):
        p = np.round(r * _BASE)
        planes.append(p.astype(np.int8))
        r = r * _BASE - p
    assert np.max(np.abs(np.stack(planes))) <= 64
    return np.stack(planes), e


def plane_decompose(x, exponent: int, num_planes: int):
    """On-device fixed-point planes of a single f32 word.

    ``|x| < 0.99 * 2^exponent`` is required (values are NOT clamped — choose
    the exponent from a mathematical bound on the operand).  The remainder
    recurrence is exact: ``r*128`` is an exponent shift and ``r*128 - p``
    with ``p = round(r*128)`` is exact by Sterbenz's lemma.
    """
    r = x * jnp.float32(2.0 ** (-exponent))
    planes = []
    for _ in range(num_planes):
        p = jnp.round(r * _BASE)
        planes.append(p.astype(jnp.int8))
        r = r * _BASE - p
    return planes


def _accumulate_pairs(dot, ka, x_hi, x_lo, x_exp, const_exp, pair_budget,
                      lo_pair_budget):
    """Shared pair-accumulation core of the left/right dd matmuls.

    ``dot(k, xm) -> int32`` contracts constant plane ``k`` with operand
    plane ``xm``; everything else (plane decomposition, significance-sorted
    double-word recombination) is side-agnostic.
    """
    from . import doubledouble as dd

    terms = {}
    hi_planes = plane_decompose(x_hi, x_exp, 8)
    base = const_exp + x_exp
    for k in range(ka):
        for m in range(8):
            if k + m > pair_budget:
                continue
            key = base - _BITS * (k + m + 2)
            d = dot(k, hi_planes[m])
            terms[key] = d if key not in terms else terms[key] + d

    if x_lo is not None:
        lo_planes = plane_decompose(x_lo, x_exp - 24, 4)
        base_lo = const_exp + x_exp - 24
        for k in range(ka):
            for m in range(4):
                if k + m > lo_pair_budget:
                    continue
                key = base_lo - _BITS * (k + m + 2)
                d = dot(k, lo_planes[m])
                terms[key] = d if key not in terms else terms[key] + d

    # Output shape comes from the DOT result, not the operand: a
    # rectangular constant C (n, m) contracts (rows, n) -> (rows, m).
    out_shape = next(iter(terms.values())).shape
    out_hi = jnp.zeros(out_shape, jnp.float32)
    out_lo = jnp.zeros(out_shape, jnp.float32)
    for key in sorted(terms, reverse=True):  # largest significance first
        term = terms[key].astype(jnp.float32) * jnp.float32(2.0 ** key)
        out_hi, out_lo = dd.dd_add_f32(out_hi, out_lo, term)
    return out_hi, out_lo


def matmul_dd_right(x_hi, x_lo, x_exp: int, const_planes, const_exp: int,
                    pair_budget: int = 8, lo_pair_budget: int = 3):
    """``x @ C`` to double-word accuracy via exact int8 MXU dots.

    Right-multiplication sibling of :func:`matmul_dd` for layouts where the
    operand's CONTRACTION axis is the lane axis (the Pallas wide layout:
    points on lanes, so spectral operators apply from the right).
    ``const_planes (KC, n, m)`` decompose the constant ``C (n, m)``;
    ``x = x_hi + x_lo`` is ``(rows, n)`` with ``|x| < 0.99 * 2^x_exp``.
    Accuracy/budget semantics identical to :func:`matmul_dd`.
    """
    ka = const_planes.shape[0]
    const_planes = jnp.asarray(const_planes)

    def dot(k, xm):
        return jax.lax.dot_general(
            xm, const_planes[k],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    return _accumulate_pairs(dot, ka, x_hi, x_lo, x_exp, const_exp,
                             pair_budget, lo_pair_budget)


def matmul_dd(const_planes, const_exp: int, x_hi, x_lo, x_exp: int,
              pair_budget: int = 8, lo_pair_budget: int = 3):
    """``A @ x`` to double-word accuracy via exact int8 MXU dots.

    ``const_planes``: ``(KA, n, n)`` int8 from :func:`plane_decompose_const`;
    ``x = x_hi + x_lo``: dd pair ``(n, cols)`` with ``|x| < 0.99 2^x_exp``.
    The hi and lo words are decomposed SEPARATELY (their exponents are 24
    apart, which does not align with the 7-bit plane grid): 4 planes each,
    28 bits per word — enough to cover a 24-bit mantissa exactly.

    Pairs kept: hi-word ``k + m <= pair_budget`` (~26 dots at the default),
    lo-word ``k + m <= lo_pair_budget`` (~6 dots; the lo word starts 24 bits
    down so deep planes are below the target).  Dropped-tail error is
    ``O(2^{eA + eX - 7(pair_budget+2)})`` absolute.  int32 partials convert
    to f32 exactly (``n <= 128``: level sums < 2^24).  Returns a dd pair.
    """
    ka = const_planes.shape[0]
    const_planes = jnp.asarray(const_planes)

    def dot(k, xm):
        return jax.lax.dot_general(
            const_planes[k], xm,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    # 8 hi planes (56 bits below 2^x_exp) so even small-magnitude f32 values
    # keep their full mantissa within the fixed-point window.
    return _accumulate_pairs(dot, ka, x_hi, x_lo, x_exp, const_exp,
                             pair_budget, lo_pair_budget)
