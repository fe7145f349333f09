"""Magnetic actuation — the untethered continuum-robot loading layer.

The reference solves the forward kinematics of a strain-parameterized
Cosserat rod (`/root/reference/main.cpp:91-176`); the strain
parameterization of rod_modeling.pdf ch. 2 is also the standard model for
MAGNETIC soft continuum robots (catheters / guidewires with distributed
or discrete magnetization, steered by external coil fields).  This module
adds that actuation layer TPU-natively, on the Lagrangian assembly of
:mod:`.dynamics`, following the tendon pattern exactly: the loads are the
EXACT gradient of a potential evaluated spectrally on the full CGL grid,
entering :func:`.dynamics._mass_and_rhs` as one more ``(r, q)`` cotangent
on the shared load pullback.

**Variational model.**  A magnetization density ``m(X)`` (dipole moment
per unit arclength, BODY frame — it rotates with the rod's cross section)
in an applied field ``B(r)`` has potential energy

    U(qe; B) = - int_0^L  ( R(q(X)) m(X) ) . B( r(X) )  dX,

so the generalized force on the strain modes is ``-dU/dqe`` — the
distributed torque density ``m_world x B`` AND the gradient pulling force
``grad (m_world . B)`` in one AD gradient, no hand-derived load formulas.
The integral uses the same Clenshaw–Curtis weights as every other energy
in the assembly; differentiating through the unit-field rotation uses the
quaternion-vector form (CLAUDE.md AD-path rule).

**Field spec** (the runtime actuation control, threaded like ``tension``):

* a 3-vector ``B0`` — uniform field (Helmholtz coil pairs; torques only,
  zero net force on any magnet);
* a 2-tuple ``(B0, G)`` with ``G`` a 3x3 matrix ``G[i, j] = dB_i/dr_j`` —
  uniform field PLUS uniform gradient (Maxwell coils; adds the pulling
  force ``f = grad (m_world . B) = G^T m_world`` per unit length — equal
  to the textbook ``G m_world`` only when ``G`` is symmetric).  A
  physical magnetostatic gradient IS symmetric and traceless (curl-free,
  divergence-free field); this is NOT enforced — the energy model is
  exact for whatever linear field is supplied, with the force given by
  the transpose form above;
* in ``simulate`` / ``simulate_implicit``: a callable ``t -> either`` of
  the above — time-varying steering protocols (rotating fields, ramps).

Closed-form anchors (gated in ``tests/test_magnetics.py``):

* axially magnetized rod, small transverse field: constant distributed
  couple density ``c = m B`` gives the linear internal-moment profile
  ``kappa(X) = m B (L - X) / EI`` (exactly representable for ``ne >= 2``);
* strong transverse field: the tip tangent aligns with ``B``;
* anti-aligned axial field: MAGNETOELASTIC BUCKLING of the straight
  state at ``B* = pi^2 EI / (4 m L^2)`` — the Euler-column Rayleigh
  quotient with ``m B`` in place of the compressive load (the
  ``linearized_spectrum`` omega^2-crosses-zero criterion, gated);
* gradient-only field with a single ``dB_z/dx`` entry on an axial magnet
  loads the rod purely through the couple density ``m_world x B(r)``
  (the force ``G^T m_world`` vanishes for that non-symmetric ``G``),
  giving the linear-theory profile
  ``kappa_y(X) = -m g3 (L^2 - X^2) / (2 EI)`` and a tip deflection 5/3
  of the equivalent-magnitude body force — both gated.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from ..ops import lie

__all__ = [
    "Magnet",
    "magnetization_table",
    "parse_field",
    "field_at",
    "energy_from_state",
]


@dataclass(frozen=True)
class Magnet:
    """One magnetization distribution along the rod (body frame).

    Exactly one spec applies, checked in this order:

    * ``fn`` — a (module-level, hashable) callable mapping the normalized
      GLOBAL arclength array ``X (n,)`` (descending, tip→base — the CGL
      ordering of `chebyshev_differentiation.h:26`) to dipole densities
      ``(n, 3)`` in the body frame.  Use smooth profiles: the spectral
      quadrature converges slowly on discontinuous integrands (model a
      hard-edged discrete magnet with a ``tanh``-smoothed window, or put
      it on its own segment in the segmented config);
    * ``moment`` — constant body-frame dipole density (the uniformly
      magnetized rod; ``(m, 0, 0)`` = magnetized along the backbone).

    Several magnets on one config superpose linearly (their tables sum).
    Frozen/hashable so configs carrying magnets stay valid jit statics.
    """

    moment: tuple = (0.0, 0.0, 0.0)
    fn: Callable | None = None

    def table(self, xs: np.ndarray) -> np.ndarray:
        """(n, 3) body-frame dipole density at normalized arclengths."""
        if self.fn is not None:
            t = np.asarray(self.fn(np.asarray(xs, np.float64)), np.float64)
            if t.shape != (len(xs), 3):
                raise ValueError(
                    f"Magnet.fn returned {t.shape}, need ({len(xs)}, 3)")
            return t
        return np.broadcast_to(
            np.asarray(self.moment, np.float64), (len(xs), 3)).copy()


def magnetization_table(magnets: tuple, xs: np.ndarray) -> np.ndarray:
    """Summed (n, 3) body-frame dipole-density table of all magnets —
    magnetization superposes linearly, so ONE table serves the energy."""
    out = np.zeros((len(xs), 3))
    for m in magnets:
        out += m.table(xs)
    return out


def parse_field(b_field, dtype):
    """Normalize a field spec to ``(b0 (..., 3), g (3, 3) | None)``.

    A 2-element tuple/list is the ``(B0, G)`` uniform-plus-gradient form;
    anything else is a uniform field vector (possibly batched ``(..., 3)``).
    """
    if isinstance(b_field, (tuple, list)) and len(b_field) == 2:
        b0, g = b_field
        g = jnp.asarray(g, dtype)
        if g.shape[-2:] != (3, 3):
            raise ValueError(
                f"(B0, G) field spec needs a (..., 3, 3) gradient, got "
                f"{g.shape}")
        return jnp.asarray(b0, dtype), g
    return jnp.asarray(b_field, dtype), None


def field_at(b_field, t):
    """Evaluate a (possibly time-dependent) field protocol: ``None``
    passes through, a callable is traced at the scan-carried time ``t``
    (any jnp expression works — rotating fields, ramps, pulses), anything
    else is a constant spec for :func:`parse_field`."""
    if b_field is None:
        return None
    if callable(b_field):
        return b_field(t)
    return b_field


def energy_from_state(r, q, w_q, m_table, b0, g=None):
    """Magnetic potential ``U = -int (R m) . B(r) dX`` from the full-grid
    state — Clenshaw–Curtis quadrature, quaternion-vector rotation.

    ``r (..., n, 3)``, ``q (..., n, 4)``: the full-grid world state (tip
    first, base appended — :func:`.dynamics.DynamicsConfig.state_full`).
    ``b0 (..., 3)`` uniform field; ``g (..., 3, 3)`` optional gradient
    ``dB_i/dr_j``, giving ``B(r) = b0 + g r``.  Batched over leading axes.
    """
    m_world = lie.quat_rotate_normalized(q, m_table)        # (..., n, 3)
    b = b0[..., None, :]
    if g is not None:
        b = b + jnp.einsum("...ij,...nj->...ni", g, r)
    return -jnp.einsum("j,...jc,...jc->...", w_q, m_world, b,
                       precision="highest")
