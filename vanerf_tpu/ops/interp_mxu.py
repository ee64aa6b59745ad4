"""MXU bilinear interpolation for small feature maps.

TPU gathers are ROW-COUNT bound (~200M rows/s: a 262k-row gather costs
~1.3-1.9 ms at any width 4..256 channels — docs/perf.md), so bilinearly
sampling a SMALL map (<= 64x64) through the gather unit pays the same
as a large one even though its whole table fits in VMEM many times
over.  This kernel replaces gather+lerp for such maps with an on-chip
weighted one-hot contraction: per (point-tile x 128-column chunk) it
builds the bilinear tensor-product hat weights

    w[i, j] = max(0, 1 - |fx_i - x_j|) * max(0, 1 - |fy_i - y_j|)

directly in VMEM (no HBM one-hot — the XLA one-hot matmul alternative
measured 2.7 ms because it materializes the (N, HW) matrix in HBM) and
contracts them against the VMEM-resident table on the MXU.  Column
chunks no point of a tile touches are skipped via compacted per-tile
chunk lists (same scheme as the culled KNN kernel,
ops/knn_pallas.py::_knn_cull_lists); ray/sample-coherent point tiles
project into a handful of map rows, so most chunks skip.

Semantics match ``ops/grid_sample.grid_sample_2d`` (torch
``F.grid_sample`` bilinear/border/align_corners=True): border padding
and align_corners are handled by clipping the float pixel coords before
the kernel, after which the hat product IS the bilinear weight.  The
only numeric difference is summation order/precision: the four
w*corner products accumulate in f32 on the MXU instead of the XLA
path's dtype-matched lerp — equal to dtype rounding (tested).

Inference path only: the kernel has no VJP (training keeps the XLA
gather whose scatter-transpose participates in XLA's joint fwd/bwd
schedule — see docs/perf.md on why custom-vjp boundaries lose there).

Reference parity target: ``feat_sample`` (ref ``src/utils.py:136-151``)
on the pixel-aligned encoder maps (ref ``src/model.py:823-830``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# granularity swept on v5e-1 (docs/perf.md): 512/256 best of
# {256,512,1024,2048} x {128,256,512} on the production patch
TILE_N = 512
COL_CHUNK = 256
# largest table the kernel accepts: build cost of the hat weights grows
# with HW (the gather it replaces is flat in HW), so above ~64x64 the
# VPU weight build costs more than the gather row rate.
MAX_ROWS = 4096


def interp_mxu_viable(H: int, W: int) -> bool:
    """Whether the kernel supports (and should be expected to beat the
    gather for) an (H, W) map: small, power-of-two width, chunk-aligned,
    and one bilinear footprint never spans more than two column chunks
    (W + 1 < COL_CHUNK, so marking the c00/c11 corner chunks covers all
    four corners)."""
    return (H * W <= MAX_ROWS and H * W % COL_CHUNK == 0
            and W & (W - 1) == 0 and W + 1 < COL_CHUNK
            and H * W // COL_CHUNK <= 127)


def _kernel(list_ref, fxy_ref, tbl_ref, out_ref, *, width, log2w, ch,
            tile_n, chunk):
    fx = jnp.transpose(fxy_ref[0:1, :], (1, 0))          # (tile_n, 1)
    fy = jnp.transpose(fxy_ref[1:2, :], (1, 0))
    n = list_ref[0, 127]

    def body(j, acc):
        c = list_ref[0, j]
        col = (c * chunk
               + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1))
        jx = jnp.bitwise_and(col, width - 1).astype(jnp.float32)
        jy = jnp.right_shift(col, log2w).astype(jnp.float32)
        hx = jnp.maximum(0.0, 1.0 - jnp.abs(fx - jx))
        hy = jnp.maximum(0.0, 1.0 - jnp.abs(fy - jy))
        w = (hx * hy).astype(tbl_ref.dtype)              # (tile_n, chunk)
        blk = tbl_ref[pl.ds(c * chunk, chunk), :]
        return acc + jnp.dot(w, blk,
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n, body, jnp.zeros((tile_n, ch), jnp.float32), unroll=False)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mxu_grid_sample(feat: jnp.ndarray, uv: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """Bilinear-sample a small channels-last map on the MXU.

    Drop-in for ``grid_sample_2d`` when :func:`interp_mxu_viable`:

    Args:
      feat: (H, W, C) feature map, H*W <= 4096, W a power of two.
      uv:   (N, 2) in [-1, 1] (x, y), align_corners/border semantics.
    Returns:
      (N, C) samples in feat.dtype.
    """
    import os
    H, W, C = feat.shape
    assert interp_mxu_viable(H, W), (H, W)
    N = uv.shape[0]
    log2w = W.bit_length() - 1
    # sweepable granularity (trace-time): larger tiles amortize per-tile
    # fixed cost, larger chunks amortize loop overhead but visit more
    # unneeded columns.
    tile_n = int(os.environ.get("VANERF_MXU_TILE_N", str(TILE_N)))
    chunk = int(os.environ.get("VANERF_MXU_CHUNK", str(COL_CHUNK)))
    assert H * W % chunk == 0 and W + 1 < chunk and chunk % 128 == 0

    x = jnp.clip((uv[:, 0].astype(jnp.float32) + 1.0) * 0.5 * (W - 1.0),
                 0.0, W - 1.0)
    y = jnp.clip((uv[:, 1].astype(jnp.float32) + 1.0) * 0.5 * (H - 1.0),
                 0.0, H - 1.0)

    pad_n = (-N) % tile_n
    fxy = jnp.pad(jnp.stack([x, y], 0), ((0, 0), (0, pad_n)))  # (2, Np)
    n_pad = N + pad_n
    n_tiles = n_pad // tile_n
    hw = H * W
    n_chunks = hw // chunk

    # compacted per-tile chunk lists: the bilinear footprint of point i
    # spans flat indices [c00, c00+W+1] with W+1 < COL_CHUNK, so the c00
    # and c11 corner chunks cover every corner.  Padded points land in
    # chunk 0 of their (all-padding) tiles.
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    c00 = y0 * W + x0
    c11 = (jnp.minimum(y0 + 1, H - 1) * W
           + jnp.minimum(x0 + 1, W - 1))
    log2chunk = chunk.bit_length() - 1
    iota_c = jnp.arange(n_chunks, dtype=jnp.int32)
    need = jnp.zeros((n_tiles, n_chunks), bool)
    for cid in (c00 >> log2chunk, c11 >> log2chunk):
        ct = jnp.pad(cid, (0, pad_n)).reshape(n_tiles, tile_n)
        need = need | (ct[:, :, None] == iota_c[None, None]).any(1)
    clist = jnp.sort(jnp.where(need, iota_c[None], n_chunks), axis=1)
    lst = jnp.zeros((n_tiles, 128), jnp.int32)
    lst = lst.at[:, :n_chunks].set(clist)
    lst = lst.at[:, 127].set(need.sum(1).astype(jnp.int32))

    out = pl.pallas_call(
        functools.partial(_kernel, width=W, log2w=log2w, ch=C,
                          tile_n=tile_n, chunk=chunk),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((2, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hw, C), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), feat.dtype),
        interpret=interpret,
    )(lst.reshape(1, -1), fxy, feat.reshape(hw, C))
    return out[:N]


def interp_sample_nhwc(feat: jnp.ndarray, uv: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """Batched :func:`mxu_grid_sample`: (B, H, W, C) x (B, N, 2) -> (B, N, C)."""
    return jax.vmap(
        functools.partial(mxu_grid_sample, interpret=interpret))(feat, uv)


# ---------------------------------------------------------------------------
# exact one-hot row gather (the KNN vertex-table lookup)
# ---------------------------------------------------------------------------


def row_gather_viable(V: int) -> bool:
    """Whether the one-hot MXU row gather supports a V-row table."""
    vp = -(-V // COL_CHUNK) * COL_CHUNK
    return V <= MAX_ROWS and vp // COL_CHUNK <= 127


def _rg_kernel(list_ref, idx_ref, tbl_ref, out_ref, *, ch, tile_n, chunk):
    idx = jnp.transpose(idx_ref[0:1, :], (1, 0))         # (tile_n, 1)
    n = list_ref[0, 127]

    def body(j, acc):
        c = list_ref[0, j]
        col = (c * chunk
               + jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1))
        w = (col == idx).astype(tbl_ref.dtype)           # exact one-hot
        blk = tbl_ref[pl.ds(c * chunk, chunk), :]
        return acc + jnp.dot(w, blk,
                             preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(
        0, n, body, jnp.zeros((tile_n, ch), jnp.float32), unroll=False)
    out_ref[:] = acc.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def mxu_row_gather(table: jnp.ndarray, idx: jnp.ndarray,
                   interpret: bool = False) -> jnp.ndarray:
    """table (V, C)[idx (N,)] -> (N, C) as a VMEM one-hot MXU contraction.

    BITWISE-identical to the native gather (each output row is one table
    row times 1.0, accumulated in f32 and cast back): the nearest-vertex
    table lookup pays the same ~1.9 ms gather row-rate floor as the big
    maps, while the whole table (<= 4096 x C) sits in VMEM.  Spatially
    coherent point tiles hit few 128-row chunks (MANO's vertex order is
    anatomically coherent), so the compacted chunk lists skip most of the
    one-hot build.  Inference only (no VJP).
    """
    V, C = table.shape
    assert row_gather_viable(V), V
    N = idx.shape[0]
    import os
    tile_n = int(os.environ.get("VANERF_MXU_TILE_N", str(TILE_N)))
    chunk = int(os.environ.get("VANERF_MXU_CHUNK", str(COL_CHUNK)))

    pad_v = (-V) % chunk
    tbl = jnp.pad(table, ((0, pad_v), (0, 0)))
    n_chunks = tbl.shape[0] // chunk
    assert n_chunks <= 127

    pad_n = (-N) % tile_n
    idx_p = jnp.pad(idx.astype(jnp.int32), (0, pad_n))   # (Np,)
    n_pad = N + pad_n
    n_tiles = n_pad // tile_n

    log2chunk = chunk.bit_length() - 1
    iota_c = jnp.arange(n_chunks, dtype=jnp.int32)
    ct = (idx_p >> log2chunk).reshape(n_tiles, tile_n)
    need = (ct[:, :, None] == iota_c[None, None]).any(1)
    clist = jnp.sort(jnp.where(need, iota_c[None], n_chunks), axis=1)
    lst = jnp.zeros((n_tiles, 128), jnp.int32)
    lst = lst.at[:, :n_chunks].set(clist)
    lst = lst.at[:, 127].set(need.sum(1).astype(jnp.int32))

    out = pl.pallas_call(
        functools.partial(_rg_kernel, ch=C, tile_n=tile_n, chunk=chunk),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, tile_n), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(tbl.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_n, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), table.dtype),
        interpret=interpret,
    )(lst.reshape(1, -1), idx_p.reshape(1, -1), tbl)
    return out[:N]
