"""Strain-basis evaluation (reference L2 layer).

TPU-native re-design of ``Phi<na, ne>`` at
`/root/reference/include/utilities.h:49-67`:

* domain map ``x = (2 X - (end + begin)) / (end - begin)`` (`utilities.h:54`),
* **Legendre** polynomial modes ``P_0..P_{ne-1}`` via ``boost::math::legendre_p``
  (`utilities.h:59`) — reproduced here with the stable three-term Bonnet
  recurrence; the thesis' Chebyshev-``T_j`` alternative is provided too,
* block lift ``Phi = I_na ⊗ [P_0(x) .. P_{ne-1}(x)]`` (`utilities.h:63`), an
  ``na × (na·ne)`` matrix so that the strain field is ``xi_a(X) = Phi(X) @ qe``.

TPU-first design: the reference evaluates ``Phi`` point-by-point inside the
assembly loop (`main.cpp:69`).  Here the whole-grid basis table
``P[i, e] = P_e(x_i)`` is a trace-time float64 host constant
(:func:`basis_table`), so the per-rod strain evaluation collapses to one
small matmul ``K = qe_modes @ P^T`` that XLA fuses straight into the
downstream solve — no gather/scatter, no Kronecker product ever materialized.
"""

from __future__ import annotations

import functools

import numpy as np

__all__ = [
    "legendre_vals",
    "chebyshev_t_vals",
    "to_reference_domain",
    "basis_table",
    "phi_matrix",
    "strain_at_points",
]


def to_reference_domain(X, begin: float = 0.0, end: float = 1.0):
    """Map the rod-normalized coordinate to ``[-1, 1]`` (`utilities.h:54`)."""
    return (2.0 * X - (end + begin)) / (end - begin)


def legendre_vals(x, num_modes: int):
    """``P_0(x) .. P_{num_modes-1}(x)`` stacked on a trailing axis.

    Bonnet recurrence ``(n+1) P_{n+1} = (2n+1) x P_n - n P_{n-1}`` — the
    stable evaluation of what `utilities.h:59` obtains from Boost.
    Works for NumPy *and* traced jnp inputs.
    """
    x = np.asarray(x) if isinstance(x, (list, tuple, float, int)) else x
    vals = [x * 0 + 1.0]
    if num_modes > 1:
        vals.append(x * 1.0)
    for n in range(1, num_modes - 1):
        vals.append(((2 * n + 1) * x * vals[n] - n * vals[n - 1]) / (n + 1))
    return _stack_last(vals[:num_modes], x)


def chebyshev_t_vals(x, num_modes: int):
    """``T_0(x) .. T_{num_modes-1}(x)`` — the thesis' alternative basis."""
    x = np.asarray(x) if isinstance(x, (list, tuple, float, int)) else x
    vals = [x * 0 + 1.0]
    if num_modes > 1:
        vals.append(x * 1.0)
    for n in range(1, num_modes - 1):
        vals.append(2.0 * x * vals[n] - vals[n - 1])
    return _stack_last(vals[:num_modes], x)


def _stack_last(vals, like):
    if isinstance(like, np.ndarray) or np.isscalar(like):
        return np.stack([np.broadcast_to(v, np.shape(like)) for v in vals], axis=-1)
    import jax.numpy as jnp

    return jnp.stack([jnp.broadcast_to(v, jnp.shape(like)) for v in vals], axis=-1)


_BASES = {
    "legendre": legendre_vals,
    "chebyshev": chebyshev_t_vals,
}


@functools.lru_cache(maxsize=None)
def basis_table(
    points: tuple,
    num_modes: int,
    basis: str = "legendre",
    begin: float = 0.0,
    end: float = 1.0,
) -> np.ndarray:
    """Float64 host table ``P[i, e] = P_e(x_i)`` over a static grid.

    ``points`` is a tuple of grid coordinates in the rod-normalized domain
    (hashable so the table caches per grid).  This is the whole-grid
    vectorization of the reference's per-point ``Phi`` evaluations
    (`main.cpp:69` calling `utilities.h:50`).
    """
    x = to_reference_domain(np.asarray(points, dtype=np.float64), begin, end)
    table = np.asarray(_BASES[basis](x, num_modes), dtype=np.float64)
    table.setflags(write=False)  # cached, shared across configs
    return table


def phi_matrix(X, na: int, ne: int, basis: str = "legendre", begin: float = 0.0, end: float = 1.0):
    """The reference's ``Phi(X)``: ``I_na ⊗ P(x)^T``, shape ``(na, na*ne)``.

    Provided for API parity / testing against `utilities.h:49-67`; the hot
    path uses :func:`basis_table` + :func:`strain_at_points` instead of ever
    building this block matrix.
    """
    p = _BASES[basis](to_reference_domain(np.float64(X), begin, end), ne)
    out = np.zeros((na, na * ne), dtype=np.float64)
    for a in range(na):
        out[a, a * ne : (a + 1) * ne] = p
    return out


def strain_at_points(qe, table):
    """Evaluate the strain field on the whole grid in one contraction.

    ``qe``: ``(..., na*ne)`` modal coordinates (mode-major within each strain
    component, matching the reference's ``qe`` layout at `main.cpp:17,187`).
    ``table``: ``(num_points, ne)`` basis table from :func:`basis_table`.
    Returns ``(..., num_points, na)`` — the strain (curvature) ``K`` at every
    grid point, equal to the reference's per-point ``Phi(x_i) @ qe``.
    """
    import jax.numpy as jnp

    table = jnp.asarray(table, dtype=qe.dtype)
    ne = table.shape[-1]
    na = qe.shape[-1] // ne
    modes = qe.reshape(qe.shape[:-1] + (na, ne))
    # (..., na, ne) x (npts, ne) -> (..., npts, na)
    return jnp.einsum("...ae,pe->...pa", modes, table, precision="highest")
