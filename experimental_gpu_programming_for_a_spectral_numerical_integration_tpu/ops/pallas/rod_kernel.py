"""Fused Pallas TPU kernel for the batched rod-kinematics solve.

The XLA-composed Picard path (ops/collocation.py) re-materializes the
``(B, n-1, 4)`` state in HBM on every one of its ~20 iterations, so at large
batch it is HBM-bandwidth-bound (~14.6M solves/s measured on v5e).  This
kernel fuses the ENTIRE per-rod pipeline —

    qe -> K = Phi qe -> Picard iterations of (I (x) Dn_NN - 1/2 A_hat) chi = rhs
       -> unnormalized tangent b(Q) -> position quadrature Dn_NN r = b - ivp

— into one ``pallas_call``: each batch tile's state lives in VMEM for the
whole solve; HBM sees only ``qe`` in and ``(Q, r)`` out.

Layout (the part that makes it fast):

* The per-rod state is 4 quaternion components x (n-1) points.  Points are
  padded to 16 and **two rods are stacked**, giving a 2x4x16 = 128-row
  column — exactly the MXU/VPU sublane width.  State tile:
  ``(128, B_t/2)`` with rods riding the lanes.
* The constant Picard preconditioner ``G = Dn_NN^{-1}`` (with the ODE's 1/2
  folded in) becomes ONE dense 128x128 weight ``W = I_8 (x) (G~/2)``
  (G~ = G zero-padded to 16): the whole iteration's linear part is a single
  fully-packed MXU matmul ``W @ t`` streaming ``B_t/2`` columns — ~88% MAC
  utilization vs ~1.4% for a naive (15,15) matmul.
* The per-point operator ``A(K)`` (`/root/reference/main.cpp:72-75`) is
  never materialized: its action is 12 VPU multiply-adds on aligned
  ``(16, B_t/2)`` sublane slices of the state — slicing at multiples of 16
  keeps every access tile-aligned.
* ``K`` comes straight off the input layout: ``qe`` arrives pre-transposed
  ``(9, B)`` so ``K_a = P~ @ qe_a`` is three tiny matmuls producing
  ``(16, B_t)`` in exactly the sublane-point/lane-rod orientation the
  elementwise stage needs.  No transposes anywhere in the kernel.

Precision: TPU MXU truncates f32 operands to bf16 per pass.  ``precision``
selects the pass count ('default' 1x / 'float32' 3x / 'highest' 6x).  The
Picard fixed point inherits the per-iteration matmul error, so 'float32'
(3-pass, ~2^-21 per product) is the default — it matches the XLA f32 path
to ~1e-6 while keeping the MXU cost at 3 streamed passes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import rod as rod_model

__all__ = ["rod_shape_fused", "picard_correction_fused", "DEFAULT_TILE"]

# Measured on v5e (B=131072): tile=2048 -> 59M solves/s ('high') / 46M
# ('highest'); tile=1024 hits a Mosaic pathology (~3 orders slower) and
# tile=4096 blows up compile time.  Keep 2048.
DEFAULT_TILE = 2048
_PTS_PAD = 16  # points padded to one sublane tile


def _make_mm(precision):
    """Matmul closure for the requested MXU pass count.

    'high' emulates the bf16x3 pass Mosaic lacks (it supports only DEFAULT
    1x bf16 and HIGHEST 6x) with error-split operands:
    ``a b ~ hi hi + hi lo + lo hi``.  Shared by both kernels.
    """
    f32 = jnp.float32
    dims = (((1,), (0,)), ((), ()))

    if precision == "high":
        def mm(a, b):
            a16 = a.astype(jnp.bfloat16)
            b16 = b.astype(jnp.bfloat16)
            a_err = (a - a16.astype(f32)).astype(jnp.bfloat16)
            b_err = (b - b16.astype(f32)).astype(jnp.bfloat16)

            def d(x, y):
                return jax.lax.dot_general(
                    x, y, dimension_numbers=dims,
                    preferred_element_type=f32,
                )

            return d(a16, b16) + d(a16, b_err) + d(a_err, b16)
    else:
        def mm(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=dims,
                preferred_element_type=f32, precision=precision,
            )
    return mm


def _curvature_halves(mm, qe_ref, ptab_ref, ne, half):
    """K_a = P~ @ qe_a, sliced per packed half.

    Three (16, ne) @ (ne, B_t) matmuls; the lane/sublane orientation matches
    the packed state directly.  Per packed half h (rows h*64 + c*16), rods
    are columns [h*half:(h+1)*half) of the K arrays.
    """
    p = ptab_ref[:, :]
    k = [mm(p, qe_ref[a * ne:(a + 1) * ne, :]) for a in range(3)]
    return [[ki[:, h * half:(h + 1) * half] for ki in k] for h in range(2)]


def _make_a_apply(kh):
    """``t = A(K) s`` on the packed state (128, half) — the quaternion-skew
    action (`/root/reference/main.cpp:72-75`) as 12 aligned VPU FMAs."""
    P = _PTS_PAD

    def a_apply(s):
        blocks = []
        for h in range(2):
            k0, k1, k2 = kh[h]
            o = h * 4 * P
            sw = s[o + 0 * P:o + 1 * P, :]
            sx = s[o + 1 * P:o + 2 * P, :]
            sy = s[o + 2 * P:o + 3 * P, :]
            sz = s[o + 3 * P:o + 4 * P, :]
            blocks += [
                -k0 * sx - k1 * sy - k2 * sz,
                k0 * sw + k2 * sy - k1 * sz,
                k1 * sw - k2 * sx + k0 * sz,
                k2 * sw + k1 * sx - k0 * sy,
            ]
        return jnp.concatenate(blocks, axis=0)

    return a_apply


def _kernel(qe_ref, w_ref, ptab_ref, g_rhs_ref, q_out_ref, r_out_ref, *,
            iters, ne, precision):
    bt = qe_ref.shape[1]          # rods per tile
    half = bt // 2                # columns of the packed state
    P = _PTS_PAD

    mm = _make_mm(precision)
    kh = _curvature_halves(mm, qe_ref, ptab_ref, ne, half)
    a_apply = _make_a_apply(kh)

    w = w_ref[:, :]               # (128, 128) = I8 (x) (G~ / 2)
    g_rhs = g_rhs_ref[:, :]       # (128, 1) broadcasts over lanes

    # Picard: s <- g_rhs + W t, W already carries the ODE's 1/2 and G.
    s = jnp.broadcast_to(g_rhs, (8 * P, half))
    for _ in range(iters):
        s = g_rhs + mm(w, a_apply(s))
    q_out_ref[:, :] = s

    # Position: tangent scaled by 2 so the same W (= I8 (x) G~/2) integrates
    # it; component block 3 is unused (zeros).
    blocks = []
    for h in range(2):
        o = h * 4 * P
        sw = s[o + 0 * P:o + 1 * P, :]
        sx = s[o + 1 * P:o + 2 * P, :]
        sy = s[o + 2 * P:o + 3 * P, :]
        sz = s[o + 3 * P:o + 4 * P, :]
        blocks += [
            2.0 - 4.0 * (sy * sy + sz * sz),
            4.0 * (sx * sy + sw * sz),
            4.0 * (sx * sz - sw * sy),
            jnp.zeros_like(sw),
        ]
    r_out_ref[:, :] = mm(w, jnp.concatenate(blocks, axis=0))


def _corr_kernel(qe_ref, w_ref, ptab_ref, rhs_ref, x_out_ref, *,
                 iters, ne, precision):
    """Correction solve: general packed rhs instead of the IVP vector.

    Solves ``(I (x) Dn_NN - 1/2 A_hat) x = rhs`` for iterative refinement:
    ``g_rhs = (I (x) G) rhs = W (2 rhs)`` (W carries G/2), then the same
    Picard loop as the main kernel.  Skips the position stage (corrections
    only feed the quaternion state)."""
    bt = qe_ref.shape[1]
    half = bt // 2

    mm = _make_mm(precision)
    kh = _curvature_halves(mm, qe_ref, ptab_ref, ne, half)
    a_apply = _make_a_apply(kh)
    w = w_ref[:, :]

    g_rhs = mm(w, 2.0 * rhs_ref[:, :])
    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(w, a_apply(s))
    x_out_ref[:, :] = s


def pack_state(x, tile: int = DEFAULT_TILE):
    """``(B, npts<=16, comp<=4) -> (128, B_pad/2)`` packed layout (inverse of
    the kernel's unpack); pads batch to ``tile`` and points/components to
    16/4.  Returns (packed, b_pad)."""
    b, npts, comp = x.shape
    P = _PTS_PAD
    b_pad = -(-b // tile) * tile
    x = jnp.pad(x, ((0, b_pad - b), (0, P - npts), (0, 4 - comp)))
    n_tiles = b_pad // tile
    half = tile // 2
    t = x.reshape(n_tiles, 2, half, P, 4)       # (tile, h, col, i, c)
    t = jnp.transpose(t, (1, 4, 3, 0, 2))       # (h, c, i, tile, col)
    return t.reshape(8 * P, n_tiles * half), b_pad


def unpack_state(packed, b: int, npts: int, comp: int, tile: int = DEFAULT_TILE):
    """Inverse of :func:`pack_state`."""
    P = _PTS_PAD
    cols = packed.shape[1]
    half = tile // 2
    n_tiles = cols // half
    t = packed.reshape(2, 4, P, n_tiles, half)
    t = jnp.transpose(t, (3, 0, 4, 2, 1)).reshape(n_tiles * tile, P, 4)
    return t[:b, :npts, :comp]


@functools.partial(
    jax.jit, static_argnames=("cfg", "iters", "tile", "precision", "interpret")
)
def picard_correction_fused(qes, rhs, cfg: rod_model.RodConfig = rod_model.RodConfig(),
                            iters: int = 20, tile: int = DEFAULT_TILE,
                            precision: str = "float32", interpret: bool = False):
    """Fused solve of ``(I (x) Dn_NN - 1/2 A_hat(qe)) x = rhs`` per rod.

    ``qes (B, na*ne)``, ``rhs (B, n-1, 4)`` -> ``x (B, n-1, 4)``.  Used as
    the inner solver of iterative refinement (the residual supplies rhs).
    """
    qes = jnp.asarray(qes, jnp.float32)
    rhs = jnp.asarray(rhs, jnp.float32)
    b = qes.shape[0]
    grid = cfg.grid
    npts = grid.num_unknown
    P = _PTS_PAD

    b_pad = -(-b // tile) * tile
    if b_pad != b:
        qes = jnp.pad(qes, ((0, b_pad - b), (0, 0)))
    n_tiles = b_pad // tile
    half = tile // 2

    rhs_packed, _ = pack_state(rhs, tile)
    w, ptab, _ = _constants(cfg, precision)
    prec = {"float32": "high", "high": "high",
            "default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    kernel = functools.partial(_corr_kernel, iters=iters, ne=cfg.ne,
                               precision=prec)
    x_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((cfg.na * cfg.ne, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * P, 8 * P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, cfg.ne), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * P, half), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8 * P, half), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8 * P, n_tiles * half), jnp.float32),
        interpret=interpret,
    )(qes.T, jnp.asarray(w), jnp.asarray(ptab), rhs_packed)
    return unpack_state(x_out, b, npts, 4, tile)


def _constants(cfg: rod_model.RodConfig, precision_tag):
    grid = cfg.grid
    npts = grid.num_unknown
    P = _PTS_PAD
    if npts > P:
        raise ValueError(
            f"fused kernel supports n-1 <= {P} points (got {npts}); "
            "use the XLA path for larger grids"
        )
    if cfg.na != 3:
        raise NotImplementedError(
            "fused kernels cover the Kirchhoff na=3 case; use the XLA "
            "picard/dense paths for 6-DoF strains"
        )
    g_pad = np.zeros((P, P), np.float64)
    g_pad[:npts, :npts] = grid.ginv
    w = np.kron(np.eye(8), 0.5 * g_pad).astype(np.float32)      # (128, 128)
    ptab = np.zeros((P, cfg.ne), np.float32)
    ptab[:npts] = cfg.basis_table.astype(np.float32)
    # g_rhs = (I (x) G)(-dn_in * q0), q0 = (1,0,0,0): only w-blocks non-zero.
    gvec = -(grid.ginv @ grid.dn_in)
    g_rhs = np.zeros((8 * P, 1), np.float32)
    for h in range(2):
        g_rhs[h * 4 * P:h * 4 * P + npts, 0] = gvec
    return w, ptab, g_rhs


@functools.partial(
    jax.jit, static_argnames=("cfg", "iters", "tile", "precision", "interpret")
)
def rod_shape_fused(qes, cfg: rod_model.RodConfig = rod_model.RodConfig(),
                    iters: int = 20, tile: int = DEFAULT_TILE,
                    precision: str = "float32", interpret: bool = False):
    """Batched fused rod solve: ``qes (B, na*ne) -> (Q (B, n-1, 4), r (B, n-1, 3))``.

    Semantics identical to ``rod_shape(..., method='picard')`` with
    ``q_init = (1,0,0,0)``, ``r_init = 0`` (the reference demo's boundary
    conditions, `main.cpp:106-154`); f32 storage, MXU pass count set by
    ``precision``.  ``B`` is padded to a multiple of ``tile`` internally.
    """
    qes = jnp.asarray(qes, jnp.float32)
    b = qes.shape[0]
    grid = cfg.grid
    npts = grid.num_unknown
    P = _PTS_PAD

    b_pad = -(-b // tile) * tile
    if b_pad != b:
        qes = jnp.pad(qes, ((0, b_pad - b), (0, 0)))
    n_tiles = b_pad // tile
    half = tile // 2

    w, ptab, g_rhs = _constants(cfg, precision)
    # TPU MXU pass count: 'default'=1x bf16, 'high'=3x emulated (f32-class
    # products), 'highest'=6x full f32.  'high' is the accuracy/speed spot.
    prec = {"float32": "high",
            "high": "high",
            "default": jax.lax.Precision.DEFAULT,
            "highest": jax.lax.Precision.HIGHEST}[precision]
    kernel = functools.partial(_kernel, iters=iters, ne=cfg.ne, precision=prec)
    q_out, r_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((cfg.na * cfg.ne, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * P, 8 * P), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, cfg.ne), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * P, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((8 * P, half), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8 * P, half), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((8 * P, n_tiles * half), jnp.float32),
            jax.ShapeDtypeStruct((8 * P, n_tiles * half), jnp.float32),
        ),
        interpret=interpret,
    )(qes.T, jnp.asarray(w), jnp.asarray(ptab), jnp.asarray(g_rhs))

    return (
        unpack_state(q_out, b, npts, 4, tile),
        unpack_state(r_out, b, npts, 3, tile),
    )
