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
  padded to ``p_pad`` in {8, 16, 32} and ``rpc = 128 / (4 p_pad)`` rods are
  stacked, giving a ``rpc x 4 x p_pad = 128``-row column — exactly the
  MXU/VPU sublane width (n=16 -> 2 rods/column; n<=9 -> 4; n<=33 -> 1).
* The constant Picard preconditioner ``G = Dn_NN^{-1}`` (with the ODE's 1/2
  folded in) becomes ONE dense 128x128 weight ``W = I_{4 rpc} (x) (G~/2)``
  (G~ = G zero-padded to p_pad): the whole iteration's linear part is a
  single fully-packed MXU matmul ``W @ t`` streaming ``B_t/rpc`` columns —
  ~88% MAC utilization vs ~1.4% for a naive (15,15) matmul.
* The per-point operator ``A(K)`` (`/root/reference/main.cpp:72-75`) is
  never materialized: its action is 12 VPU multiply-adds on aligned
  ``(p_pad, B_t/rpc)`` sublane slices of the state — slicing at multiples
  of p_pad (>= 8) keeps every access tile-aligned.
* ``K`` comes straight off the input layout: ``qe`` arrives pre-transposed
  ``(na*ne, B)`` so ``K_a = P~ @ qe_a`` is three tiny matmuls producing
  ``(p_pad, B_t)`` in exactly the sublane-point/lane-rod orientation the
  elementwise stage needs.  No transposes anywhere in the kernel.

Precision: TPU MXU truncates f32 operands to bf16 per pass.  ``precision``
selects the pass count ('default' 1x / 'high' 3x emulated / 'highest' 6x).
The Picard fixed point inherits the per-iteration matmul error, so 'high'
(3-pass, ~2^-21 per product) is the default — it matches the XLA f32 path
to ~1e-5 while keeping the MXU cost at 3 streamed passes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...models import rod as rod_model

__all__ = ["rod_shape_fused", "rod_shape_fused_bc", "picard_correction_fused",
           "DEFAULT_TILE"]

# Measured on v5e (B=131072, n=16): tile=2048 -> ~50-59M solves/s ('high'),
# tile=1024 within ~8%.  Benchmark note: warm up with a SCALAR fetch —
# block_until_ready does not reliably block through the axon tunnel, and a
# cold first timing loop absorbs compile time (this masqueraded as a
# "Mosaic pathology" in early measurements).
DEFAULT_TILE = 2048


WIDE_P_PAD = 128     # minimum lane width of the wide (large-grid) layout
WIDE_RODS = 32       # rods per 128-sublane block in the wide layout
WIDE_MAX_PTS = 512   # multi-lane-tile bound (VMEM: state + operators)


def _wide_p_pad(npts: int) -> int:
    """Lane width for the wide layout: n-1 rounded up to full 128-lane
    tiles (Mosaic handles multi-tile lane dimensions natively, so grids up
    to WIDE_MAX_PTS points ride the same kernels — this is what puts the
    N=256 high-order config on the fused path)."""
    return max(WIDE_P_PAD, -(-npts // 128) * 128)


def _packing(npts: int):
    """(p_pad, rods_per_column) filling the 128-sublane dimension."""
    for p_pad in (8, 16, 32):
        if npts <= p_pad:
            return p_pad, 128 // (4 * p_pad)
    raise ValueError(
        f"fused kernel packing supports n-1 <= 32 points (got {npts}; the "
        "wide layout extends to n-1 <= 512); use the XLA path beyond that"
    )


def _is_wide(npts: int) -> bool:
    """Large grids (32 < n-1 <= 512) take the WIDE layout: points ride the
    LANES (one or more 128-lane tiles) and 32 rods x 4 components fill the
    sublanes, so the Picard preconditioner applies from the right as
    ``s @ G~^T`` — dense MXU matmuls per iteration, no Kronecker packing
    needed.  This unlocks the fused N=64 statics grid and fused high-order
    solves up to the N=256..N=513 configs (VERDICT r1 missing #4 /
    ROADMAP goals)."""
    return 32 < npts <= WIDE_MAX_PTS


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


def _curvature_slices(mm, qe_ref, ptab_ref, ne, half, rpc, na: int = 3):
    """Strain components ``xi_a = P~ @ qe_a``, sliced per packed rod slot.

    ``na`` (p_pad, ne) @ (ne, B_t) matmuls; the lane/sublane orientation
    matches the packed state directly.  Slot h (rows h*4*p_pad + c*p_pad)
    holds rods at columns [h*half:(h+1)*half) of the strain arrays.  For
    6-DoF (Reissner) strains the first 3 components are curvature (driving
    ``A(K)``) and the last 3 shear/extension ``gamma`` (driving the
    tangent).
    """
    p = ptab_ref[:, :]
    k = [mm(p, qe_ref[a * ne:(a + 1) * ne, :]) for a in range(na)]
    return [[ki[:, h * half:(h + 1) * half] for ki in k] for h in range(rpc)]


def _component_slices(s, h, p_pad):
    o = h * 4 * p_pad
    return (
        s[o + 0 * p_pad:o + 1 * p_pad, :],
        s[o + 1 * p_pad:o + 2 * p_pad, :],
        s[o + 2 * p_pad:o + 3 * p_pad, :],
        s[o + 3 * p_pad:o + 4 * p_pad, :],
    )


def _make_a_apply(kh, p_pad):
    """``t = A(K) s`` on the packed state (128, half) — the quaternion-skew
    action (`/root/reference/main.cpp:72-75`) as 12 aligned VPU FMAs.
    Only the curvature components of each slot's strain list are read."""

    def a_apply(s):
        blocks = []
        for h, (k0, k1, k2) in enumerate([kk[:3] for kk in kh]):
            sw, sx, sy, sz = _component_slices(s, h, p_pad)
            blocks += [
                -k0 * sx - k1 * sy - k2 * sz,
                k0 * sw + k2 * sy - k1 * sz,
                k1 * sw - k2 * sx + k0 * sz,
                k2 * sw + k1 * sx - k0 * sy,
            ]
        return jnp.concatenate(blocks, axis=0)

    return a_apply


def _picard_loop(mm, w, g_rhs, a_apply, iters, shape=None):
    """``s = g_rhs + W A(K) s`` fixed point (shared by all kernel variants)."""
    s = g_rhs if shape is None else jnp.broadcast_to(g_rhs, shape)
    for _ in range(iters):
        s = g_rhs + mm(w, a_apply(s))
    return s


def _tangent_blocks(s, rpc, p_pad, kh=None):
    """Unnormalized rod tangent scaled x2 (so ``I (x) G~/2`` integrates it);
    component block 3 zero-padded.  (`main.cpp:130-136` semantics.)

    When the per-slot strain lists in ``kh`` carry 6 components, the last 3
    are the Reissner shear/extension ``gamma`` and the tangent becomes the
    full ``R(q) (e1 + gamma)`` (the reference's dead-``ad()`` extension,
    `utilities.h:27-37`); otherwise the Kirchhoff ``R(q) e1`` column.
    """
    six_dof = kh is not None and len(kh[0]) == 6
    blocks = []
    for h in range(rpc):
        sw, sx, sy, sz = _component_slices(s, h, p_pad)
        if not six_dof:
            blocks += [
                2.0 - 4.0 * (sy * sy + sz * sz),
                4.0 * (sx * sy + sw * sz),
                4.0 * (sx * sz - sw * sy),
                jnp.zeros_like(sw),
            ]
            continue
        g0, g1, g2 = kh[h][3], kh[h][4], kh[h][5]
        xx, yy, zz = sx * sx, sy * sy, sz * sz
        xy, xz, yz = sx * sy, sx * sz, sy * sz
        wx, wy, wz = sw * sx, sw * sy, sw * sz
        e0 = 1.0 + g0
        blocks += [
            2.0 * ((1.0 - 2.0 * (yy + zz)) * e0
                   + 2.0 * (xy - wz) * g1 + 2.0 * (xz + wy) * g2),
            2.0 * (2.0 * (xy + wz) * e0
                   + (1.0 - 2.0 * (xx + zz)) * g1 + 2.0 * (yz - wx) * g2),
            2.0 * (2.0 * (xz - wy) * e0
                   + 2.0 * (yz + wx) * g1 + (1.0 - 2.0 * (xx + yy)) * g2),
            jnp.zeros_like(sw),
        ]
    return jnp.concatenate(blocks, axis=0)


def _kernel(qe_ref, w_ref, ptab_ref, g_rhs_ref, q_out_ref, r_out_ref, *,
            iters, ne, precision, p_pad, rpc, na=3):
    bt = qe_ref.shape[1]          # rods per tile
    half = bt // rpc              # columns of the packed state

    mm = _make_mm(precision)
    kh = _curvature_slices(mm, qe_ref, ptab_ref, ne, half, rpc, na)
    a_apply = _make_a_apply(kh, p_pad)

    w = w_ref[:, :]               # (128, 128) = I_{4 rpc} (x) (G~ / 2)
    g_rhs = g_rhs_ref[:, :]       # (128, 1) broadcasts over lanes

    # Picard: s <- g_rhs + W t, W already carries the ODE's 1/2 and G.
    s = _picard_loop(mm, w, g_rhs, a_apply, iters,
                     shape=(4 * rpc * p_pad, half))
    q_out_ref[:, :] = s
    r_out_ref[:, :] = mm(w, _tangent_blocks(s, rpc, p_pad, kh))


def _kernel_bc(qe_ref, w_ref, ptab_ref, dn_in_ref, q0_ref, r0_ref,
               q_out_ref, r_out_ref, *, iters, ne, precision, p_pad, rpc,
               na=3):
    """General-boundary-condition variant: per-rod ``q_init`` / ``r_init``.

    ``q0_ref (4, B_t)``, ``r0_ref (4, B_t)`` (row 3 zero-padded) carry the
    junction state — this is what lets multi-segment rods chain through the
    fused path (models/segments.py, method='fused').  rhs blocks are built
    in-kernel as outer products ``-dn_in (x) q0``.
    """
    bt = qe_ref.shape[1]
    half = bt // rpc

    mm = _make_mm(precision)
    kh = _curvature_slices(mm, qe_ref, ptab_ref, ne, half, rpc, na)
    a_apply = _make_a_apply(kh, p_pad)
    w = w_ref[:, :]
    din = dn_in_ref[:, :]               # (p_pad, 1)

    def outer_rhs(vec_ref, scale):
        """blocks[-scale * dn_in * vec_c per rod slot] -> (128, half)."""
        blocks = []
        for h in range(rpc):
            for c in range(4):
                row = vec_ref[c:c + 1, h * half:(h + 1) * half]  # (1, half)
                blocks.append(scale * din * row)
        return jnp.concatenate(blocks, axis=0)

    # g_rhs = (I (x) G)(-dn_in (x) q0) = W (2 * rhs)   [W carries G/2]
    g_rhs = mm(w, outer_rhs(q0_ref, -2.0))
    s = _picard_loop(mm, w, g_rhs, a_apply, iters)
    q_out_ref[:, :] = s

    # position: r = G (b - dn_in (x) r0) = W (2b - 2 dn_in (x) r0)
    r_out_ref[:, :] = mm(w, _tangent_blocks(s, rpc, p_pad, kh)
                         + outer_rhs(r0_ref, -2.0))


def _corr_kernel(qe_ref, w_ref, ptab_ref, rhs_ref, x_out_ref, *,
                 iters, ne, precision, p_pad, rpc):
    """Correction solve: general packed rhs instead of the IVP vector.

    Solves ``(I (x) Dn_NN - 1/2 A_hat) x = rhs`` for iterative refinement:
    ``g_rhs = (I (x) G) rhs = W (2 rhs)`` (W carries G/2), then the same
    Picard loop as the main kernel.  Skips the position stage (corrections
    only feed the quaternion state)."""
    bt = qe_ref.shape[1]
    half = bt // rpc

    mm = _make_mm(precision)
    kh = _curvature_slices(mm, qe_ref, ptab_ref, ne, half, rpc)
    a_apply = _make_a_apply(kh, p_pad)
    w = w_ref[:, :]

    g_rhs = mm(w, 2.0 * rhs_ref[:, :])
    x_out_ref[:, :] = _picard_loop(mm, w, g_rhs, a_apply, iters)


def pack_state(x, tile: int = DEFAULT_TILE, p_pad: int = 16, rpc: int = 2):
    """``(B, npts<=p_pad, comp<=4) -> (128, B_pad/rpc)`` packed layout
    (inverse of :func:`unpack_state`); pads batch to ``tile`` and
    points/components to p_pad/4.  Returns (packed, b_pad)."""
    b, npts, comp = x.shape
    b_pad = -(-b // tile) * tile
    x = jnp.pad(x, ((0, b_pad - b), (0, p_pad - npts), (0, 4 - comp)))
    n_tiles = b_pad // tile
    half = tile // rpc
    t = x.reshape(n_tiles, rpc, half, p_pad, 4)   # (tile, h, col, i, c)
    t = jnp.transpose(t, (1, 4, 3, 0, 2))         # (h, c, i, tile, col)
    return t.reshape(4 * rpc * p_pad, n_tiles * half), b_pad


def unpack_state(packed, b: int, npts: int, comp: int,
                 tile: int = DEFAULT_TILE, p_pad: int = 16, rpc: int = 2):
    """Inverse of :func:`pack_state`."""
    cols = packed.shape[1]
    half = tile // rpc
    n_tiles = cols // half
    t = packed.reshape(rpc, 4, p_pad, n_tiles, half)
    t = jnp.transpose(t, (3, 0, 4, 2, 1)).reshape(n_tiles * tile, p_pad, 4)
    return t[:b, :npts, :comp]


def _constants(cfg: rod_model.RodConfig, p_pad: int, rpc: int):
    grid = cfg.grid
    npts = grid.num_unknown
    g_pad = np.zeros((p_pad, p_pad), np.float64)
    g_pad[:npts, :npts] = grid.ginv
    w = np.kron(np.eye(4 * rpc), 0.5 * g_pad).astype(np.float32)  # (128, 128)
    ptab = np.zeros((p_pad, cfg.ne), np.float32)
    ptab[:npts] = cfg.basis_table.astype(np.float32)
    # g_rhs = (I (x) G)(-dn_in * q0), q0 = (1,0,0,0): only w-blocks non-zero.
    gvec = -(grid.ginv @ grid.dn_in)
    g_rhs = np.zeros((4 * rpc * p_pad, 1), np.float32)
    for h in range(rpc):
        g_rhs[h * 4 * p_pad:h * 4 * p_pad + npts, 0] = gvec
    return w, ptab, g_rhs


_PRECISIONS = {
    "float32": "high",
    "high": "high",
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def _prepare(qes, cfg, tile):
    qes = jnp.asarray(qes, jnp.float32)
    b = qes.shape[0]
    if b == 0:
        raise ValueError(
            "fused kernels need a non-empty batch (got B=0); the XLA paths "
            "handle empty batches"
        )
    npts = cfg.grid.num_unknown
    p_pad, rpc = _packing(npts)
    if tile % rpc:
        raise ValueError(f"tile ({tile}) must be divisible by rpc ({rpc})")
    b_pad = -(-b // tile) * tile
    if b_pad != b:
        qes = jnp.pad(qes, ((0, b_pad - b), (0, 0)))
    return qes, b, b_pad, npts, p_pad, rpc


@functools.partial(
    jax.jit, static_argnames=("cfg", "iters", "tile", "precision", "interpret")
)
def rod_shape_fused(qes, cfg: rod_model.RodConfig = rod_model.RodConfig(),
                    iters: int = 20, tile: int = DEFAULT_TILE,
                    precision: str = "high", interpret: bool = False):
    """Batched fused rod solve: ``qes (B, na*ne) -> (Q (B, n-1, 4), r (B, n-1, 3))``.

    Semantics identical to ``rod_shape(..., method='picard')`` with
    ``q_init = (1,0,0,0)``, ``r_init = 0`` (the reference demo's boundary
    conditions, `main.cpp:106-154`); f32 storage, MXU pass count set by
    ``precision``.  ``B`` is padded to a multiple of ``tile`` internally.
    Grids with 32 < n-1 <= 512 points route to the WIDE layout
    (``tile`` is then ignored: 32-rod blocks).
    """
    if _is_wide(cfg.grid.num_unknown):
        return _rod_shape_fused_wide(qes, cfg, iters, precision, interpret)
    qes, b, b_pad, npts, p_pad, rpc = _prepare(qes, cfg, tile)
    n_tiles = b_pad // tile
    half = tile // rpc

    w, ptab, g_rhs = _constants(cfg, p_pad, rpc)
    kernel = functools.partial(
        _kernel, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision], p_pad=p_pad, rpc=rpc,
    )
    out_spec = pl.BlockSpec((128, half), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    q_out, r_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((cfg.na * cfg.ne, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, cfg.ne), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((128, n_tiles * half), jnp.float32),
            jax.ShapeDtypeStruct((128, n_tiles * half), jnp.float32),
        ),
        interpret=interpret,
    )(qes.T, jnp.asarray(w), jnp.asarray(ptab), jnp.asarray(g_rhs))

    return (
        unpack_state(q_out, b, npts, 4, tile, p_pad, rpc),
        unpack_state(r_out, b, npts, 3, tile, p_pad, rpc),
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "iters", "tile", "precision", "interpret")
)
def picard_correction_fused(qes, rhs, cfg: rod_model.RodConfig = rod_model.RodConfig(),
                            iters: int = 20, tile: int = DEFAULT_TILE,
                            precision: str = "high", interpret: bool = False):
    """Fused solve of ``(I (x) Dn_NN - 1/2 A_hat(qe)) x = rhs`` per rod.

    ``qes (B, na*ne)``, ``rhs (B, n-1, 4)`` -> ``x (B, n-1, 4)``.  Used as
    the inner solver of iterative refinement (the residual supplies rhs).
    """
    if _is_wide(cfg.grid.num_unknown):
        return _picard_correction_fused_wide(qes, rhs, cfg, iters, precision,
                                             interpret)
    rhs = jnp.asarray(rhs, jnp.float32)
    qes, b, b_pad, npts, p_pad, rpc = _prepare(qes, cfg, tile)
    n_tiles = b_pad // tile
    half = tile // rpc

    rhs_packed, _ = pack_state(rhs, tile, p_pad, rpc)
    w, ptab, _ = _constants(cfg, p_pad, rpc)
    kernel = functools.partial(
        _corr_kernel, iters=iters, ne=cfg.ne,
        precision=_PRECISIONS[precision], p_pad=p_pad, rpc=rpc,
    )
    x_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((cfg.na * cfg.ne, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, cfg.ne), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, half), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((128, half), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((128, n_tiles * half), jnp.float32),
        interpret=interpret,
    )(qes.T, jnp.asarray(w), jnp.asarray(ptab), rhs_packed)
    return unpack_state(x_out, b, npts, 4, tile, p_pad, rpc)


@functools.partial(
    jax.jit, static_argnames=("cfg", "iters", "tile", "precision", "interpret")
)
def rod_shape_fused_bc(qes, q_init, r_init,
                       cfg: rod_model.RodConfig = rod_model.RodConfig(),
                       iters: int = 20, tile: int = DEFAULT_TILE,
                       precision: str = "high", interpret: bool = False):
    """Fused rod solve with per-rod boundary conditions.

    ``qes (B, na*ne)``, ``q_init (B, 4)``, ``r_init (B, 3)`` ->
    ``(Q (B, n-1, 4), r (B, n-1, 3))``.  Same semantics as
    ``rod_shape(..., method='picard')`` with arbitrary initial states —
    the building block for fused multi-segment chains.
    """
    if _is_wide(cfg.grid.num_unknown):
        return _rod_shape_fused_bc_wide(qes, jnp.asarray(q_init, jnp.float32),
                                        jnp.asarray(r_init, jnp.float32),
                                        cfg, iters, precision, interpret)
    q_init = jnp.asarray(q_init, jnp.float32)
    r_init = jnp.asarray(r_init, jnp.float32)
    qes, b, b_pad, npts, p_pad, rpc = _prepare(qes, cfg, tile)
    n_tiles = b_pad // tile
    half = tile // rpc

    def pad_t(v, rows):
        v = jnp.pad(v, ((0, b_pad - v.shape[0]), (0, rows - v.shape[1])))
        return v.T                                     # (rows, B_pad)

    q0_t = pad_t(q_init, 4)
    r0_t = pad_t(r_init, 4)

    w, ptab, _ = _constants(cfg, p_pad, rpc)
    dn_in = np.zeros((p_pad, 1), np.float32)
    dn_in[:npts, 0] = cfg.grid.dn_in
    kernel = functools.partial(
        _kernel_bc, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision], p_pad=p_pad, rpc=rpc,
    )
    out_spec = pl.BlockSpec((128, half), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    q_out, r_out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((cfg.na * cfg.ne, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((128, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, cfg.ne), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_pad, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, tile), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((128, n_tiles * half), jnp.float32),
            jax.ShapeDtypeStruct((128, n_tiles * half), jnp.float32),
        ),
        interpret=interpret,
    )(qes.T, jnp.asarray(w), jnp.asarray(ptab), jnp.asarray(dn_in),
      q0_t, r0_t)

    return (
        unpack_state(q_out, b, npts, 4, tile, p_pad, rpc),
        unpack_state(r_out, b, npts, 3, tile, p_pad, rpc),
    )


# ---------------------------------------------------------------------------
# WIDE layout (32 < n-1 <= 512): points on lanes (one or more 128-lane
# tiles), (comp, rod) on sublanes.
# PAIRED sub-variant (n-1 <= 64): TWO rods share the 128 lanes (rod A on
# lanes [0, 64), rod B on [64, 128)) with block-diagonal spectral operators
# — 64 rods ride every 128x128 MXU pass instead of 32, doubling MAC
# utilization exactly where the plain wide layout wastes half its lanes
# (ROADMAP 'wide-layout MAC efficiency', realized as lane-folding).
# ---------------------------------------------------------------------------

WIDE_PAIR_HALF = 64      # lanes per rod in the paired layout
WIDE_PAIR_RODS = 2 * WIDE_RODS


def _is_paired(npts: int) -> bool:
    return 32 < npts <= WIDE_PAIR_HALF

def _wide_strains(mm, qe_ref, ptabT_ref, ne, na):
    """``xi_a = qe_a @ P~^T`` -> na arrays of (WIDE_RODS, WIDE_P_PAD).

    ``qe_ref`` arrives in NATURAL (rods, na*ne) orientation, so each strain
    component is one tiny (32, ne) @ (ne, 128) matmul — no transposes."""
    return [mm(qe_ref[:, a * ne:(a + 1) * ne], ptabT_ref[:, :])
            for a in range(na)]


def _wide_comp(s, c):
    return s[c * WIDE_RODS:(c + 1) * WIDE_RODS, :]


def _wide_a_apply(k):
    """``A(K) s`` on the wide state (128, p_pad): 12 VPU FMAs on the
    32-sublane component blocks (rows are comp-major: w, x, y, z)."""
    k0, k1, k2 = k[0], k[1], k[2]

    def a_apply(s):
        sw, sx, sy, sz = (_wide_comp(s, c) for c in range(4))
        return jnp.concatenate([
            -k0 * sx - k1 * sy - k2 * sz,
            k0 * sw + k2 * sy - k1 * sz,
            k1 * sw - k2 * sx + k0 * sz,
            k2 * sw + k1 * sx - k0 * sy,
        ], axis=0)

    return a_apply


def _wide_tangent(s, k, na):
    """x2-scaled tangent in the wide layout (cf. :func:`_tangent_blocks`)."""
    sw, sx, sy, sz = (_wide_comp(s, c) for c in range(4))
    zero = jnp.zeros_like(sw)
    if na != 6:
        return jnp.concatenate([
            2.0 - 4.0 * (sy * sy + sz * sz),
            4.0 * (sx * sy + sw * sz),
            4.0 * (sx * sz - sw * sy),
            zero,
        ], axis=0)
    g0, g1, g2 = k[3], k[4], k[5]
    xx, yy, zz = sx * sx, sy * sy, sz * sz
    xy, xz, yz = sx * sy, sx * sz, sy * sz
    wx, wy, wz = sw * sx, sw * sy, sw * sz
    e0 = 1.0 + g0
    return jnp.concatenate([
        2.0 * ((1.0 - 2.0 * (yy + zz)) * e0
               + 2.0 * (xy - wz) * g1 + 2.0 * (xz + wy) * g2),
        2.0 * (2.0 * (xy + wz) * e0
               + (1.0 - 2.0 * (xx + zz)) * g1 + 2.0 * (yz - wx) * g2),
        2.0 * (2.0 * (xz - wy) * e0
               + 2.0 * (yz + wx) * g1 + (1.0 - 2.0 * (xx + yy)) * g2),
        zero,
    ], axis=0)


def _kernel_wide(qe_ref, wt_ref, ptabT_ref, g_rhs_ref, q_out_ref, r_out_ref,
                 *, iters, ne, precision, na):
    mm = _make_mm(precision)
    k = _wide_strains(mm, qe_ref, ptabT_ref, ne, na)
    a_apply = _wide_a_apply(k)
    wt = wt_ref[:, :]                    # (p_pad, p_pad) = (G~/2)^T
    g_rhs = g_rhs_ref[:, :]              # (128, p_pad)

    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)
    q_out_ref[0, :, :] = s
    r_out_ref[0, :, :] = mm(_wide_tangent(s, k, na), wt)


def _kernel_wide_bc(qe_ref, wt_ref, ptabT_ref, din_ref, gdin_ref, q0_ref,
                    r0_ref, q_out_ref, r_out_ref, *,
                    iters, ne, precision, na):
    """Wide layout with per-rod boundary conditions: rhs rows are outer
    products ``-q0_c (x) dn_in`` (dn_in rides the lanes here)."""
    mm = _make_mm(precision)
    k = _wide_strains(mm, qe_ref, ptabT_ref, ne, na)
    a_apply = _wide_a_apply(k)
    wt = wt_ref[:, :]
    din = din_ref[:, :]                  # (1, p_pad)
    gdin = gdin_ref[:, :]                # (1, p_pad) = (G dn_in)^T

    def outer(vec_ref, row):
        return jnp.concatenate([
            -vec_ref[:, c:c + 1] * row for c in range(4)
        ], axis=0)                       # (128, p_pad)

    g_rhs = mm(outer(q0_ref, 2.0 * din), wt)   # (I x G)(-din (x) q0)
    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)
    q_out_ref[0, :, :] = s
    # r = G(b - din (x) r0) = b2 @ wt + (-(G din) (x) r0)
    r_out_ref[0, :, :] = mm(_wide_tangent(s, k, na), wt) + outer(r0_ref, gdin)


def _corr_kernel_wide(qe_ref, wt_ref, ptabT_ref, rhs_ref, x_out_ref, *,
                      iters, ne, precision, na):
    mm = _make_mm(precision)
    k = _wide_strains(mm, qe_ref, ptabT_ref, ne, na)
    a_apply = _wide_a_apply(k)
    wt = wt_ref[:, :]
    g_rhs = mm(2.0 * rhs_ref[0, :, :], wt)
    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)
    x_out_ref[0, :, :] = s


def pack_state_wide(x, p_pad: int | None = None):
    """``(B, npts, comp<=4) -> (n_blocks, 128, p_pad)`` wide packing."""
    b, npts, comp = x.shape
    if p_pad is None:
        p_pad = _wide_p_pad(npts)
    b_pad = -(-b // WIDE_RODS) * WIDE_RODS
    x = jnp.pad(x, ((0, b_pad - b), (0, p_pad - npts), (0, 4 - comp)))
    nb = b_pad // WIDE_RODS
    t = x.reshape(nb, WIDE_RODS, p_pad, 4)
    return jnp.transpose(t, (0, 3, 1, 2)).reshape(nb, 4 * WIDE_RODS, p_pad)


def unpack_state_wide(packed, b: int, npts: int, comp: int):
    """Inverse of :func:`pack_state_wide`."""
    nb, rows, p_pad = packed.shape
    t = packed.reshape(nb, 4, WIDE_RODS, p_pad)
    t = jnp.transpose(t, (0, 2, 3, 1)).reshape(nb * WIDE_RODS, p_pad, 4)
    return t[:b, :npts, :comp]


@functools.lru_cache(maxsize=None)
def _wide_constants(cfg: rod_model.RodConfig):
    grid = cfg.grid
    npts = grid.num_unknown
    p_pad = _wide_p_pad(npts)
    g_pad = np.zeros((p_pad, p_pad), np.float64)
    g_pad[:npts, :npts] = grid.ginv
    wt = (0.5 * g_pad).T.astype(np.float32)
    ptab_t = np.zeros((cfg.ne, p_pad), np.float32)
    ptab_t[:, :npts] = cfg.basis_table.astype(np.float32).T
    gvec = -(grid.ginv @ grid.dn_in)
    g_rhs = np.zeros((4 * WIDE_RODS, p_pad), np.float32)
    g_rhs[:WIDE_RODS, :npts] = gvec[None, :]
    din = np.zeros((1, p_pad), np.float32)
    din[0, :npts] = grid.dn_in
    gdin = np.zeros((1, p_pad), np.float32)
    gdin[0, :npts] = grid.ginv @ grid.dn_in   # `outer` carries the minus
    return wt, ptab_t, g_rhs, din, gdin


def _prepare_wide(qes, cfg):
    qes = jnp.asarray(qes, jnp.float32)
    b = qes.shape[0]
    if b == 0:
        raise ValueError("fused kernels need a non-empty batch (got B=0)")
    npts = cfg.grid.num_unknown
    b_pad = -(-b // WIDE_RODS) * WIDE_RODS
    if b_pad != b:
        qes = jnp.pad(qes, ((0, b_pad - b), (0, 0)))
    return qes, b, b_pad, npts


def _wide_call(kernel, cfg, b_pad, extra_in, n_out, interpret):
    """Shared pallas_call plumbing for the wide kernels."""
    nb = b_pad // WIDE_RODS
    p_pad = _wide_p_pad(cfg.grid.num_unknown)
    wt, ptab_t, g_rhs, din, gdin = _wide_constants(cfg)
    nq = cfg.na * cfg.ne
    in_specs = [
        pl.BlockSpec((WIDE_RODS, nq), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((p_pad, p_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cfg.ne, p_pad), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [spec for spec, _ in extra_in]
    args = [jnp.asarray(wt), jnp.asarray(ptab_t)] + [a for _, a in extra_in]
    out_spec = pl.BlockSpec((1, 4 * WIDE_RODS, p_pad), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, 4 * WIDE_RODS, p_pad), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(out_spec,) * n_out if n_out > 1 else out_spec,
        out_shape=(out_shape,) * n_out if n_out > 1 else out_shape,
        interpret=interpret,
    ), args


def _rod_shape_fused_wide(qes, cfg, iters, precision, interpret):
    if _is_paired(cfg.grid.num_unknown):
        return _rod_shape_fused_pair(qes, cfg, iters, precision, interpret)
    qes, b, b_pad, npts = _prepare_wide(qes, cfg)
    p_pad = _wide_p_pad(npts)
    _, _, g_rhs, _, _ = _wide_constants(cfg)
    kernel = functools.partial(
        _kernel_wide, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision],
    )
    call, args = _wide_call(
        kernel, cfg, b_pad,
        extra_in=[(pl.BlockSpec((4 * WIDE_RODS, p_pad), lambda i: (0, 0),
                                memory_space=pltpu.VMEM),
                   jnp.asarray(g_rhs))],
        n_out=2, interpret=interpret)
    q_out, r_out = call(qes, *args)
    return (unpack_state_wide(q_out, b, npts, 4),
            unpack_state_wide(r_out, b, npts, 3))


def _rod_shape_fused_bc_wide(qes, q_init, r_init, cfg, iters, precision,
                             interpret):
    if _is_paired(cfg.grid.num_unknown):
        return _rod_shape_fused_bc_pair(qes, q_init, r_init, cfg, iters,
                                        precision, interpret)
    qes, b, b_pad, npts = _prepare_wide(qes, cfg)
    p_pad = _wide_p_pad(npts)
    _, _, _, din, gdin = _wide_constants(cfg)

    def pad4(v):
        v = jnp.asarray(v, jnp.float32)
        return jnp.pad(v, ((0, b_pad - v.shape[0]), (0, 4 - v.shape[1])))

    kernel = functools.partial(
        _kernel_wide_bc, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision],
    )
    rod_spec = lambda cols: pl.BlockSpec((WIDE_RODS, cols), lambda i: (i, 0),
                                         memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, p_pad), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    call, args = _wide_call(
        kernel, cfg, b_pad,
        extra_in=[(row_spec, jnp.asarray(din)),
                  (row_spec, jnp.asarray(gdin)),
                  (rod_spec(4), pad4(q_init)),
                  (rod_spec(4), pad4(r_init))],
        n_out=2, interpret=interpret)
    q_out, r_out = call(qes, *args)
    return (unpack_state_wide(q_out, b, npts, 4),
            unpack_state_wide(r_out, b, npts, 3))


def _picard_correction_fused_wide(qes, rhs, cfg, iters, precision, interpret):
    if _is_paired(cfg.grid.num_unknown):
        return _picard_correction_fused_pair(qes, rhs, cfg, iters, precision,
                                             interpret)
    qes, b, b_pad, npts = _prepare_wide(qes, cfg)
    p_pad = _wide_p_pad(npts)
    rhs_packed = pack_state_wide(jnp.asarray(rhs, jnp.float32))
    kernel = functools.partial(
        _corr_kernel_wide, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision],
    )
    call, args = _wide_call(
        kernel, cfg, b_pad,
        extra_in=[(pl.BlockSpec((1, 4 * WIDE_RODS, p_pad),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), rhs_packed)],
        n_out=1, interpret=interpret)
    x_out = call(qes, *args)
    return unpack_state_wide(x_out, b, npts, 4)


# --- paired-wide implementation -------------------------------------------

def _pair_strains(mm, qe_ref, ptab_a_ref, ptab_b_ref, ne, na):
    """Strains in the paired layout: rod A's modes hit the lanes-[0,64)
    half of the transposed table, rod B's the [64,128) half — the lane
    split makes each ``k_a`` a sum of two disjoint-support matmuls.

    ``qe_ref (32, 2 nq)``: columns ``[qe_A (nq) ; qe_B (nq)]``.
    """
    nq = na * ne
    out = []
    for a in range(na):
        ka = mm(qe_ref[:, a * ne:(a + 1) * ne], ptab_a_ref[:, :])
        kb = mm(qe_ref[:, nq + a * ne:nq + (a + 1) * ne], ptab_b_ref[:, :])
        out.append(ka + kb)
    return out


def _kernel_pair(qe_ref, wt_ref, ptab_a_ref, ptab_b_ref, g_rhs_ref,
                 q_out_ref, r_out_ref, *, iters, ne, precision, na):
    mm = _make_mm(precision)
    k = _pair_strains(mm, qe_ref, ptab_a_ref, ptab_b_ref, ne, na)
    a_apply = _wide_a_apply(k)
    wt = wt_ref[:, :]                 # (128, 128) block-diag (G~/2)^T x2
    g_rhs = g_rhs_ref[:, :]

    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)
    q_out_ref[0, :, :] = s
    r_out_ref[0, :, :] = mm(_wide_tangent(s, k, na), wt)


def _kernel_pair_bc(qe_ref, wt_ref, ptab_a_ref, ptab_b_ref, din_a_ref,
                    din_b_ref, gdin_a_ref, gdin_b_ref, q0_ref, r0_ref,
                    q_out_ref, r_out_ref, *, iters, ne, precision, na):
    """Paired layout with per-rod boundary conditions: rhs rows are the sum
    of the two half-lane outer products (disjoint support)."""
    mm = _make_mm(precision)
    k = _pair_strains(mm, qe_ref, ptab_a_ref, ptab_b_ref, ne, na)
    a_apply = _wide_a_apply(k)
    wt = wt_ref[:, :]
    din_a, din_b = din_a_ref[:, :], din_b_ref[:, :]       # (1, 128) halves
    gdin_a, gdin_b = gdin_a_ref[:, :], gdin_b_ref[:, :]

    def outer(vec_ref, row_a, row_b, scale):
        # vec_ref (32, 8): [vec_A (4) ; vec_B (4)]
        return jnp.concatenate([
            scale * (vec_ref[:, c:c + 1] * row_a
                     + vec_ref[:, 4 + c:5 + c] * row_b)
            for c in range(4)
        ], axis=0)                                        # (128, 128)

    g_rhs = mm(outer(q0_ref, din_a, din_b, -2.0), wt)
    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)
    q_out_ref[0, :, :] = s
    r_out_ref[0, :, :] = (mm(_wide_tangent(s, k, na), wt)
                          + outer(r0_ref, gdin_a, gdin_b, -1.0))


def _corr_kernel_pair(qe_ref, wt_ref, ptab_a_ref, ptab_b_ref, rhs_ref,
                      x_out_ref, *, iters, ne, precision, na):
    mm = _make_mm(precision)
    k = _pair_strains(mm, qe_ref, ptab_a_ref, ptab_b_ref, ne, na)
    a_apply = _wide_a_apply(k)
    wt = wt_ref[:, :]
    g_rhs = mm(2.0 * rhs_ref[0, :, :], wt)
    s = g_rhs
    for _ in range(iters):
        s = g_rhs + mm(a_apply(s), wt)
    x_out_ref[0, :, :] = s


def pack_state_pair(x, p_half: int = WIDE_PAIR_HALF):
    """``(B, npts, comp<=4) -> (nb, 128, 128)`` paired packing: rod ``i``
    of a 64-rod block sits at sublane ``comp*32 + i%32``, lanes
    ``(i//32)*64 + point``."""
    b, npts, comp = x.shape
    b_pad = -(-b // WIDE_PAIR_RODS) * WIDE_PAIR_RODS
    x = jnp.pad(x, ((0, b_pad - b), (0, p_half - npts), (0, 4 - comp)))
    nb = b_pad // WIDE_PAIR_RODS
    t = x.reshape(nb, 2, WIDE_RODS, p_half, 4)
    t = jnp.transpose(t, (0, 4, 2, 1, 3))    # (nb, comp, rod32, half, pt)
    return t.reshape(nb, 4 * WIDE_RODS, 2 * p_half)


def unpack_state_pair(packed, b: int, npts: int, comp: int,
                      p_half: int = WIDE_PAIR_HALF):
    """Inverse of :func:`pack_state_pair`."""
    nb = packed.shape[0]
    t = packed.reshape(nb, 4, WIDE_RODS, 2, p_half)
    t = jnp.transpose(t, (0, 3, 2, 4, 1))    # (nb, half, rod32, pt, comp)
    t = t.reshape(nb * WIDE_PAIR_RODS, p_half, 4)
    return t[:b, :npts, :comp]


def _pair_qes(qes, nb, nq):
    """``(nb*64, cols) -> (nb*32, 2*cols)``: rod r's columns beside rod
    (r+32)'s."""
    cols = qes.shape[1]
    t = qes.reshape(nb, 2, WIDE_RODS, cols)
    t = jnp.transpose(t, (0, 2, 1, 3))
    return t.reshape(nb * WIDE_RODS, 2 * cols)


@functools.lru_cache(maxsize=None)
def _pair_constants(cfg: rod_model.RodConfig):
    grid = cfg.grid
    npts = grid.num_unknown
    p_half = WIDE_PAIR_HALF
    g_pad = np.zeros((p_half, p_half))
    g_pad[:npts, :npts] = grid.ginv
    half_wt = (0.5 * g_pad).T
    wt = np.zeros((2 * p_half, 2 * p_half))
    wt[:p_half, :p_half] = half_wt
    wt[p_half:, p_half:] = half_wt
    wt = wt.astype(np.float32)

    ptab_a = np.zeros((cfg.ne, 2 * p_half), np.float32)
    ptab_a[:, :npts] = cfg.basis_table.astype(np.float32).T
    ptab_b = np.zeros((cfg.ne, 2 * p_half), np.float32)
    ptab_b[:, p_half:p_half + npts] = cfg.basis_table.astype(np.float32).T

    gvec = -(grid.ginv @ grid.dn_in)
    g_rhs = np.zeros((4 * WIDE_RODS, 2 * p_half), np.float32)
    g_rhs[:WIDE_RODS, :npts] = gvec[None, :]
    g_rhs[:WIDE_RODS, p_half:p_half + npts] = gvec[None, :]

    def halves(vec):
        a = np.zeros((1, 2 * p_half), np.float32)
        a[0, :npts] = vec
        bb = np.zeros((1, 2 * p_half), np.float32)
        bb[0, p_half:p_half + npts] = vec
        return a, bb

    din_a, din_b = halves(grid.dn_in)
    gdin_a, gdin_b = halves(grid.ginv @ grid.dn_in)
    return wt, ptab_a, ptab_b, g_rhs, din_a, din_b, gdin_a, gdin_b


def _prepare_pair(qes, cfg):
    qes = jnp.asarray(qes, jnp.float32)
    b = qes.shape[0]
    if b == 0:
        raise ValueError("fused kernels need a non-empty batch (got B=0)")
    npts = cfg.grid.num_unknown
    b_pad = -(-b // WIDE_PAIR_RODS) * WIDE_PAIR_RODS
    if b_pad != b:
        qes = jnp.pad(qes, ((0, b_pad - b), (0, 0)))
    return qes, b, b_pad, npts


def _pair_call(kernel, cfg, b_pad, extra_in, n_out, interpret):
    nb = b_pad // WIDE_PAIR_RODS
    lanes = 2 * WIDE_PAIR_HALF
    wt, ptab_a, ptab_b, *_ = _pair_constants(cfg)
    nq = cfg.na * cfg.ne
    in_specs = [
        pl.BlockSpec((WIDE_RODS, 2 * nq), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((lanes, lanes), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cfg.ne, lanes), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((cfg.ne, lanes), lambda i: (0, 0),
                     memory_space=pltpu.VMEM),
    ] + [spec for spec, _ in extra_in]
    args = [jnp.asarray(wt), jnp.asarray(ptab_a), jnp.asarray(ptab_b)] + \
        [a for _, a in extra_in]
    out_spec = pl.BlockSpec((1, 4 * WIDE_RODS, lanes), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((nb, 4 * WIDE_RODS, lanes), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=in_specs,
        out_specs=(out_spec,) * n_out if n_out > 1 else out_spec,
        out_shape=(out_shape,) * n_out if n_out > 1 else out_shape,
        interpret=interpret,
    ), args


def _rod_shape_fused_pair(qes, cfg, iters, precision, interpret):
    qes, b, b_pad, npts = _prepare_pair(qes, cfg)
    nb = b_pad // WIDE_PAIR_RODS
    nq = cfg.na * cfg.ne
    qes2 = _pair_qes(qes, nb, nq)
    _, _, _, g_rhs, *_ = _pair_constants(cfg)
    kernel = functools.partial(
        _kernel_pair, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision],
    )
    call, args = _pair_call(
        kernel, cfg, b_pad,
        extra_in=[(pl.BlockSpec((4 * WIDE_RODS, 2 * WIDE_PAIR_HALF),
                                lambda i: (0, 0), memory_space=pltpu.VMEM),
                   jnp.asarray(g_rhs))],
        n_out=2, interpret=interpret)
    q_out, r_out = call(qes2, *args)
    return (unpack_state_pair(q_out, b, npts, 4),
            unpack_state_pair(r_out, b, npts, 3))


def _rod_shape_fused_bc_pair(qes, q_init, r_init, cfg, iters, precision,
                             interpret):
    qes, b, b_pad, npts = _prepare_pair(qes, cfg)
    nb = b_pad // WIDE_PAIR_RODS
    nq = cfg.na * cfg.ne
    qes2 = _pair_qes(qes, nb, nq)
    _, _, _, _, din_a, din_b, gdin_a, gdin_b = _pair_constants(cfg)

    def pair4(v):
        v = jnp.asarray(v, jnp.float32)
        v = jnp.pad(v, ((0, b_pad - v.shape[0]), (0, 4 - v.shape[1])))
        return _pair_qes(v, nb, 4)                  # (nb*32, 8)

    kernel = functools.partial(
        _kernel_pair_bc, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision],
    )
    row_spec = pl.BlockSpec((1, 2 * WIDE_PAIR_HALF), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    rod_spec = pl.BlockSpec((WIDE_RODS, 8), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    call, args = _pair_call(
        kernel, cfg, b_pad,
        extra_in=[(row_spec, jnp.asarray(din_a)),
                  (row_spec, jnp.asarray(din_b)),
                  (row_spec, jnp.asarray(gdin_a)),
                  (row_spec, jnp.asarray(gdin_b)),
                  (rod_spec, pair4(q_init)),
                  (rod_spec, pair4(r_init))],
        n_out=2, interpret=interpret)
    q_out, r_out = call(qes2, *args)
    return (unpack_state_pair(q_out, b, npts, 4),
            unpack_state_pair(r_out, b, npts, 3))


def _picard_correction_fused_pair(qes, rhs, cfg, iters, precision, interpret):
    qes, b, b_pad, npts = _prepare_pair(qes, cfg)
    nb = b_pad // WIDE_PAIR_RODS
    nq = cfg.na * cfg.ne
    qes2 = _pair_qes(qes, nb, nq)
    rhs_packed = pack_state_pair(jnp.asarray(rhs, jnp.float32))
    kernel = functools.partial(
        _corr_kernel_pair, iters=iters, ne=cfg.ne, na=cfg.na,
        precision=_PRECISIONS[precision],
    )
    call, args = _pair_call(
        kernel, cfg, b_pad,
        extra_in=[(pl.BlockSpec((1, 4 * WIDE_RODS, 2 * WIDE_PAIR_HALF),
                                lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM), rhs_packed)],
        n_out=1, interpret=interpret)
    x_out = call(qes2, *args)
    return unpack_state_pair(x_out, b, npts, 4)
