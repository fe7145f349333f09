"""Lie-group / quaternion utilities (reference L2 layer).

TPU-native re-design of `/root/reference/include/utilities.h:16-37` plus the
quaternion-kinematics operators embedded in `/root/reference/main.cpp:36-39`
and the unnormalized quaternion→rotation used at `main.cpp:130-136`.

Everything here is pure ``jnp``, shape-polymorphic over leading batch axes,
and safe under ``jit`` / ``vmap`` / ``grad``.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "skew",
    "unskew",
    "ad",
    "Ad",
    "quat_skew",
    "quat_to_rot",
    "quat_to_rot_normalized",
    "quat_rotate_normalized",
    "quat_rotate_inv_normalized",
    "quat_tangent",
    "quat_multiply",
    "quat_conjugate",
    "quat_normalize",
]


def skew(v):
    """Hat map: ``(..., 3) -> (..., 3, 3)``.

    Mirrors ``skew()`` (`utilities.h:16-24`).
    """
    v = jnp.asarray(v)
    z = jnp.zeros_like(v[..., 0])
    rows = [
        jnp.stack([z, -v[..., 2], v[..., 1]], axis=-1),
        jnp.stack([v[..., 2], z, -v[..., 0]], axis=-1),
        jnp.stack([-v[..., 1], v[..., 0], z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def unskew(m):
    """Inverse hat map: ``(..., 3, 3) -> (..., 3)``."""
    m = jnp.asarray(m)
    return jnp.stack([m[..., 2, 1], m[..., 0, 2], m[..., 1, 0]], axis=-1)


def ad(strain):
    """se(3) adjoint of a 6-strain ``(k, gamma)``: ``[[k^, 0], [gamma^, k^]]``.

    Mirrors ``ad()`` (`utilities.h:27-37`) — dead code there, live here for
    the full 6-DoF Cosserat statics extension (``models/cosserat.py``).
    """
    strain = jnp.asarray(strain)
    k_hat = skew(strain[..., 0:3])
    g_hat = skew(strain[..., 3:6])
    zero = jnp.zeros_like(k_hat)
    top = jnp.concatenate([k_hat, zero], axis=-1)
    bot = jnp.concatenate([g_hat, k_hat], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def Ad(rot, pos):
    """SE(3) adjoint ``[[R, 0], [p^ R, R]]`` for wrench/twist transport."""
    rot = jnp.asarray(rot)
    pos = jnp.asarray(pos)
    zero = jnp.zeros_like(rot)
    top = jnp.concatenate([rot, zero], axis=-1)
    bot = jnp.concatenate([skew(pos) @ rot, rot], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def quat_skew(k):
    """The 4x4 operator ``A(K)`` of quaternion kinematics ``Q' = 1/2 A(K) Q``.

    ``(..., 3) -> (..., 4, 4)``, matching the block written at
    `/root/reference/main.cpp:72-75` (and eq. A.16 of
    ``materials/rod_modeling.pdf``)::

        [    0, -K0, -K1, -K2 ]
        [  K0,    0,  K2, -K1 ]
        [  K1, -K2,   0,  K0 ]
        [  K2,  K1, -K0,   0 ]
    """
    k = jnp.asarray(k)
    k0, k1, k2 = k[..., 0], k[..., 1], k[..., 2]
    z = jnp.zeros_like(k0)
    rows = [
        jnp.stack([z, -k0, -k1, -k2], axis=-1),
        jnp.stack([k0, z, k2, -k1], axis=-1),
        jnp.stack([k1, -k2, z, k0], axis=-1),
        jnp.stack([k2, k1, -k0, z], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_to_rot(q):
    """Quaternion ``(w, x, y, z)`` → rotation matrix, **without normalizing**.

    Faithful to Eigen's ``Quaterniond::toRotationMatrix()`` as invoked on
    un-normalized spectral output at `/root/reference/main.cpp:130-136`:
    the unit-norm formula applied verbatim, so a non-unit quaternion yields a
    (slightly) non-orthogonal matrix.  Use
    :func:`quat_to_rot_normalized` for the corrected variant.
    """
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    one = jnp.ones_like(w)
    rows = [
        jnp.stack([one - (tyy + tzz), txy - twz, txz + twy], axis=-1),
        jnp.stack([txy + twz, one - (txx + tzz), tyz - twx], axis=-1),
        jnp.stack([txz - twy, tyz + twx, one - (txx + tyy)], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def quat_to_rot_normalized(q):
    """Normalized quaternion → proper rotation matrix."""
    return quat_to_rot(quat_normalize(q))


def quat_rotate_normalized(q, v):
    """``R(q/|q|) @ v`` without materializing the 3x3 matrix.

    ``R v = v + (2/|q|^2) [ s (u x v) + u x (u x v) ]`` with ``q = (s, u)``.
    Vector form keeps AD tangents to a handful of ``(..., 3)`` temporaries
    — the 3x3 route generates an order of magnitude more intermediate
    traffic under ``jvp``/``vmap`` (measured on the statics Jacobian path).
    """
    s = q[..., :1]
    u = q[..., 1:]
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    uv = jnp.cross(u, v)
    return v + (2.0 / n2) * (s * uv + jnp.cross(u, uv))


def quat_rotate_inv_normalized(q, v):
    """``R(q/|q|)^T @ v`` (inverse rotation), vector form."""
    s = q[..., :1]
    u = q[..., 1:]
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    uv = jnp.cross(u, v)
    return v + (2.0 / n2) * (-s * uv + jnp.cross(u, uv))


def quat_tangent(q):
    """First column of :func:`quat_to_rot` — ``R(q) @ e1`` without the matmul.

    This is the rod-tangent RHS of the position solve
    (`/root/reference/main.cpp:136`): the Kirchhoff-rod material tangent
    ``e1 = (1,0,0)`` rotated into the world frame.  ``(..., 4) -> (..., 3)``.
    """
    q = jnp.asarray(q)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            1.0 - 2.0 * (y * y + z * z),
            2.0 * (x * y + w * z),
            2.0 * (x * z - w * y),
        ],
        axis=-1,
    )


def quat_multiply(a, b):
    """Hamilton product of ``(w, x, y, z)`` quaternions, batched."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q):
    q = jnp.asarray(q)
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q, eps: float = 0.0):
    q = jnp.asarray(q)
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True) + eps)
    return q / norm
