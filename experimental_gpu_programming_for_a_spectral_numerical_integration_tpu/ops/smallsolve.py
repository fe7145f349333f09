"""Batched tiny dense solves, TPU-native.

``jnp.linalg.solve`` on a ``(B, n, n)`` batch with small ``n`` lowers to a
LAPACK-style batched LU custom call that serializes terribly on TPU
(measured 11.4 ms for ``(4096, 9, 9)`` on v5e — slower than the entire
fused Newton step it serves).  The statics solvers need exactly this shape:
one ``nq x nq`` Newton step per rod, ``nq = na*ne in {9, 18}``.

This module implements the TPU answer: **unrolled Gauss–Jordan elimination
with partial pivoting**, vectorized over the batch.  Every step is a
``(B, n, m)`` elementwise FMA plus an argmax/one-hot row swap — pure VPU
work with static shapes, no custom calls, fully fusable by XLA.  ``n`` is a
trace-time constant (like everything else in this framework, ≙ the
reference's template parameters), so the ``n``-step loop unrolls.

Measured (B=4096, n=9, v5e): ~0.20 ms vs 11.4 ms for ``jnp.linalg.solve``
— 57x.  Accuracy: partial pivoting keeps growth bounded; for the
well-conditioned Newton systems here the result matches LAPACK to f32
roundoff.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ["gauss_jordan_solve", "det_sign_logabs"]


def gauss_jordan_solve(a, b):
    """Solve ``a @ x = b`` for small static ``n``, batched over leading axes.

    ``a``: ``(..., n, n)``; ``b``: ``(..., n, m)`` (or ``(..., n)``).
    Partial pivoting via one-hot row swaps (no gathers/scatters — an
    ``argmax`` + two rank-1 corrections per step, exact no-ops when the
    pivot is already in place).
    """
    a = jnp.asarray(a)
    squeeze = False
    if b.ndim == a.ndim - 1:
        b = b[..., None]
        squeeze = True
    n = a.shape[-1]
    aug = jnp.concatenate([a, jnp.asarray(b, a.dtype)], axis=-1)
    idx = jnp.arange(n)

    for k in range(n):
        # --- partial pivot: largest |a[i, k]| over i >= k ---
        col = jnp.abs(aug[..., :, k])
        col = jnp.where(idx >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)                     # (...,)
        sel_p = (idx == p[..., None]).astype(aug.dtype)  # (..., n)
        row_p = jnp.einsum("...n,...nm->...m", sel_p, aug)
        row_k = aug[..., k, :]
        sel_k = (idx == k).astype(aug.dtype)
        aug = (aug
               + sel_k[..., :, None] * (row_p - row_k)[..., None, :]
               + sel_p[..., :, None] * (row_k - row_p)[..., None, :])

        # --- eliminate column k in every other row (Gauss-Jordan) ---
        piv_row = aug[..., k, :]                         # (..., n+m)
        inv_piv = 1.0 / piv_row[..., k]
        factor = aug[..., :, k] * inv_piv[..., None]     # (..., n)
        factor = factor * (1.0 - sel_k)                  # skip the pivot row
        aug = aug - factor[..., :, None] * piv_row[..., None, :]

    diag = jnp.einsum("...ii->...i", aug[..., :, :n])
    x = aug[..., :, n:] / diag[..., :, None]
    return x[..., 0] if squeeze else x


def det_sign_logabs(a):
    """``(sign(det a), log|det a|)`` for small static ``n``, batched.

    Same unrolled pivoted elimination as :func:`gauss_jordan_solve` (row
    combinations leave the determinant unchanged; each realized swap flips
    the sign), recording the pivots — the TPU-native replacement for
    ``jnp.linalg.slogdet``'s batched-LU custom call.  Used by the stability
    monitors of the batched Riks walker (``det(J)`` crossings flag folds
    and odd-multiplicity branch points on device).
    """
    a = jnp.asarray(a)
    n = a.shape[-1]
    idx = jnp.arange(n)
    sign = jnp.ones(a.shape[:-2], a.dtype)
    logabs = jnp.zeros(a.shape[:-2], a.dtype)

    for k in range(n):
        col = jnp.abs(a[..., :, k])
        col = jnp.where(idx >= k, col, -jnp.inf)
        p = jnp.argmax(col, axis=-1)
        sel_p = (idx == p[..., None]).astype(a.dtype)
        row_p = jnp.einsum("...n,...nm->...m", sel_p, a)
        row_k = a[..., k, :]
        sel_k = (idx == k).astype(a.dtype)
        a = (a
             + sel_k[..., :, None] * (row_p - row_k)[..., None, :]
             + sel_p[..., :, None] * (row_k - row_p)[..., None, :])
        sign = sign * jnp.where(p == k, 1.0, -1.0)

        piv = a[..., k, k]
        # Singular case: match slogdet's (0, -inf) instead of NaN-poisoning
        # the elimination (sign(0) = 0 propagates; log(0) = -inf; the
        # guarded reciprocal keeps the remaining rows finite).
        sign = sign * jnp.sign(piv)
        logabs = logabs + jnp.log(jnp.abs(piv))
        inv_piv = 1.0 / jnp.where(piv == 0, 1.0, piv)
        factor = a[..., :, k] * inv_piv[..., None]
        factor = factor * (1.0 - sel_k)
        a = a - factor[..., :, None] * a[..., k, :][..., None, :]
    return sign, logabs
