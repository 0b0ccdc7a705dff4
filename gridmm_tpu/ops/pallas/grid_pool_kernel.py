"""Pallas TPU kernel: fused segment-softmax grid pooling.

The production inference path for the grid scatter-pool (ops/grid_pool.py).
Per (batch, chunk) grid cell the kernel streams a chunk of projected point
features through VMEM, builds the cell-assignment one-hot on the fly, and
accumulates both the softmax numerator (a (CELLS, chunk) x (chunk, D) matmul on
the MXU) and the denominator — the (B, N, CELLS) probability tensor that the
XLA formulation materializes in HBM never exists.

Numerical contract is identical to ops/grid_pool.grid_scatter_pool: softmax of
`weights` within each cell (stabilized by a per-cell max computed outside; it
is a tiny scatter-max over <=197 segments), weighted sum of features, empty
cells -> 0 with a False mask. Invalid points carry cell id -1 and never match
the one-hot, so they vanish without explicit masking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CELL_PAD = 256   # 196 cells padded to a lane-friendly 256
DENOM_LANES = 128


def _pool_kernel(cells_ref, w_ref, cmax_ref, g_ref, pooled_ref, denom_ref):
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _init():
        pooled_ref[:] = jnp.zeros_like(pooled_ref)
        denom_ref[:] = jnp.zeros_like(denom_ref)

    cells = cells_ref[:]            # (1, C) int32
    w = w_ref[:]                    # (1, C) f32
    cmax = cmax_ref[:]              # (1, CELL_PAD) f32

    c = cells.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (CELL_PAD, c), 0)
    onehot = (cells == row_ids).astype(jnp.float32)   # (CELL_PAD, C)

    # per-point gathered cell max via one-hot matvec (invalid points get 0,
    # harmless: their one-hot row mask kills them below)
    gm = jnp.dot(cmax, onehot, preferred_element_type=jnp.float32)  # (1, C)
    e = jnp.exp(w - gm)                                             # (1, C)
    p = onehot * e                                                  # (CELL_PAD, C)

    g = g_ref[:]
    if g.dtype == jnp.bfloat16:
        # bf16 buffer -> bf16 MXU matmul (4x the f32 issue rate) with f32
        # accumulation; precision follows what the buffer already stores
        p = p.astype(jnp.bfloat16)
    else:
        g = g.astype(jnp.float32)
    pooled_ref[:] += jnp.dot(p, g, preferred_element_type=jnp.float32)
    denom_ref[:] += jnp.dot(
        p, jnp.ones((c, DENOM_LANES), p.dtype),
        preferred_element_type=jnp.float32)


def _prep_inputs(point_fts, cell_ids, weights, num_cells, chunk):
    """Shared host-side staging: chunked views + per-cell max."""
    b, n, d = point_fts.shape
    assert n % chunk == 0, f"N={n} must be a multiple of chunk={chunk}"
    nc = n // chunk

    valid = cell_ids >= 0
    w = jnp.where(valid, weights.astype(jnp.float32), -1e30)
    seg = jnp.where(valid, cell_ids, num_cells).astype(jnp.int32)
    # per-cell max as a fused masked reduce — XLA's scatter-max lowering
    # serializes and costs ~18 ms on a (8, 8820) buffer (see grid_pool.py)
    match = seg[:, None, :] == jnp.arange(CELL_PAD)[None, :, None]
    cmax = jnp.max(jnp.where(match, w[:, None, :], -1e30), axis=-1)
    # guard: empty cells keep -1e30; exp(w - gm) for their (nonexistent)
    # points never evaluates. Replace -1e30 with 0 to keep the matvec sane.
    cmax = jnp.where(cmax <= -1e29, 0.0, cmax)

    cells2 = cell_ids.reshape(b, nc, 1, chunk)
    w2 = jnp.where(valid, weights, -jnp.inf).reshape(b, nc, 1, chunk)
    # -inf would poison exp(w - gm); invalid points get excluded by the
    # one-hot (cell -1 matches no row), so any finite filler works:
    w2 = jnp.where(jnp.isfinite(w2), w2, 0.0)
    return cells2, w2, cmax.reshape(b, 1, CELL_PAD), nc


@functools.partial(jax.jit,
                   static_argnames=("num_cells", "chunk", "interpret"))
def pallas_grid_pool_raw(
    point_fts: jnp.ndarray,   # (B, N, D) f32 projected features
    cell_ids: jnp.ndarray,    # (B, N) int32, -1 invalid
    weights: jnp.ndarray,     # (B, N) f32 relevance logits
    num_cells: int = 196,
    chunk: int = 512,
    interpret: bool = False,
):
    """Forward kernel returning (pooled, cell_mask, denom_padded).

    denom_padded (B, CELL_PAD) is the per-cell softmax denominator — the
    backward kernels consume it, so the fwd residuals avoid a recompute."""
    b, n, d = point_fts.shape
    cells2, w2, cmax, nc = _prep_inputs(point_fts, cell_ids, weights,
                                        num_cells, chunk)

    pooled, denom = pl.pallas_call(
        _pool_kernel,
        grid=(b, nc),
        in_specs=[
            # None dims are squeezed: refs arrive as (1, C) / (CELL_PAD,) etc.
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, CELL_PAD), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, chunk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, CELL_PAD, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, CELL_PAD, DENOM_LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, CELL_PAD, d), jnp.float32),
            jax.ShapeDtypeStruct((b, CELL_PAD, DENOM_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(cells2, w2, cmax, point_fts.reshape(b, nc, chunk, d))

    denom_pad = denom[:, :, 0]
    denom = denom_pad[:, :num_cells]
    pooled = pooled[:, :num_cells]
    cell_mask = denom > 0
    pooled = jnp.where(cell_mask[..., None],
                       pooled / jnp.where(cell_mask, denom, 1.0)[..., None],
                       0.0)
    return pooled, cell_mask, denom_pad


def pallas_grid_pool(point_fts, cell_ids, weights, num_cells: int = 196,
                     chunk: int = 512, interpret: bool = False):
    """Drop-in replacement for grid_scatter_pool (forward)."""
    pooled, cell_mask, _ = pallas_grid_pool_raw(
        point_fts, cell_ids, weights, num_cells, chunk, interpret)
    return pooled, cell_mask


# --------------------------------------------------------------- backward
# For cell c with normalized in-cell softmax p_i = e_i / denom_c:
#   pooled_c = sum_i p_i g_i
#   dg_i = p_i * G_{c(i)}                      (G = cotangent of pooled)
#   dw_i = p_i * (s_i - S_{c(i)}),  s_i = <g_i, G_{c(i)}>,  S_c = sum p_j s_j
# Pass 1 streams g + G and emits dg, s, and the per-cell S accumulator;
# pass 2 (which needs the COMPLETE S) emits dw. Both build the chunk one-hot
# on the fly exactly like the forward — the (B, N, C) probability tensor the
# XLA VJP materializes in HBM never exists.


def _pool_bwd1_kernel(cells_ref, w_ref, cmax_ref, denom_ref, g_ref, cot_ref,
                      dg_ref, s_ref, S_ref):
    nc = pl.program_id(1)

    @pl.when(nc == 0)
    def _init():
        S_ref[:] = jnp.zeros_like(S_ref)

    cells = cells_ref[:]            # (1, C) int32
    w = w_ref[:]                    # (1, C) f32
    c = cells.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (CELL_PAD, c), 0)
    onehot = (cells == row_ids).astype(jnp.float32)   # (CELL_PAD, C)

    gm = jnp.dot(cmax_ref[:], onehot, preferred_element_type=jnp.float32)
    dn = jnp.dot(denom_ref[:], onehot, preferred_element_type=jnp.float32)
    e = jnp.exp(w - gm)
    p = jnp.where(dn > 0, e / jnp.where(dn > 0, dn, 1.0), 0.0)  # (1, C)

    g = g_ref[:].astype(jnp.float32)          # (C, D)
    cot = cot_ref[:].astype(jnp.float32)      # (CELL_PAD, D)
    # per-point gathered cotangent: (C, CELL_PAD) @ (CELL_PAD, D)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (c, CELL_PAD), 1)
    onehot_t = (cells.reshape(c, 1) == col_ids).astype(jnp.float32)
    gg = jnp.dot(onehot_t, cot, preferred_element_type=jnp.float32)  # (C, D)

    dg_ref[:] = p.reshape(c, 1) * gg
    s = jnp.sum(g * gg, axis=1).reshape(1, c)                        # (1, C)
    s_ref[:] = s
    S_ref[:] += jnp.dot(onehot * (p * s), jnp.ones((c, DENOM_LANES),
                                                   jnp.float32),
                        preferred_element_type=jnp.float32)


def _pool_bwd2_kernel(cells_ref, w_ref, cmax_ref, denom_ref, S_ref, s_ref,
                      dw_ref):
    cells = cells_ref[:]
    w = w_ref[:]
    c = cells.shape[1]
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (CELL_PAD, c), 0)
    onehot = (cells == row_ids).astype(jnp.float32)

    gm = jnp.dot(cmax_ref[:], onehot, preferred_element_type=jnp.float32)
    dn = jnp.dot(denom_ref[:], onehot, preferred_element_type=jnp.float32)
    sg = jnp.dot(S_ref[:], onehot, preferred_element_type=jnp.float32)
    e = jnp.exp(w - gm)
    p = jnp.where(dn > 0, e / jnp.where(dn > 0, dn, 1.0), 0.0)
    dw_ref[:] = p * (s_ref[:] - sg)


@functools.partial(jax.jit,
                   static_argnames=("num_cells", "chunk", "interpret"))
def pallas_grid_pool_bwd(
    point_fts: jnp.ndarray,   # (B, N, D) residual
    cell_ids: jnp.ndarray,    # (B, N) residual
    weights: jnp.ndarray,     # (B, N) residual
    denom_pad: jnp.ndarray,   # (B, CELL_PAD) residual from the forward
    cot: jnp.ndarray,         # (B, num_cells, D) pooled cotangent
    num_cells: int = 196,
    chunk: int = 512,
    interpret: bool = False,
):
    """Gradients (d point_fts, d weights) of pallas_grid_pool."""
    b, n, d = point_fts.shape
    cells2, w2, cmax, nc = _prep_inputs(point_fts, cell_ids, weights,
                                        num_cells, chunk)
    # the kernels use NORMALIZED p = e/denom, so pooled_c = sum p_i g_i and
    # the raw cotangent feeds straight in (the /denom of the forward lives
    # inside p); the trash rows [num_cells, CELL_PAD) stay zero
    cot_pad = jnp.pad(cot.astype(jnp.float32),
                      ((0, 0), (0, CELL_PAD - num_cells), (0, 0)))

    denom3 = denom_pad.reshape(b, 1, CELL_PAD).astype(jnp.float32)
    g3 = point_fts.reshape(b, nc, chunk, d)

    dg, s, S_acc = pl.pallas_call(
        _pool_bwd1_kernel,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, CELL_PAD), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, CELL_PAD), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, chunk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, CELL_PAD, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, chunk, d), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, CELL_PAD, DENOM_LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, nc, chunk, d), jnp.float32),
            jax.ShapeDtypeStruct((b, nc, 1, chunk), jnp.float32),
            jax.ShapeDtypeStruct((b, CELL_PAD, DENOM_LANES), jnp.float32),
        ],
        interpret=interpret,
    )(cells2, w2, cmax, denom3, g3, cot_pad)

    S = S_acc[:, :, 0].reshape(b, 1, CELL_PAD)
    dw = pl.pallas_call(
        _pool_bwd2_kernel,
        grid=(b, nc),
        in_specs=[
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, CELL_PAD), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, CELL_PAD), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, 1, CELL_PAD), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((None, None, 1, chunk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((b, nc, 1, chunk), jnp.float32)],
        interpret=interpret,
    )(cells2, w2, cmax, denom3, S, s)[0]

    return dg.reshape(b, n, d), dw.reshape(b, n)
