"""Pallas TPU kernel for exact nearest-vertex search.

Difference-form distances (the expanded matmul form flips argmins in low
precision — see ops/knn.py) over a (point-tile x vertex-chunk) sweep with a
running argmin.  The whole vertex set (2x779 x 3 floats) lives in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 256
VERT_CHUNK = 128  # granularity; the wrapper uses one chunk when V fits


def _kernel(pts_ref, verts_ref, idx_ref, d2_ref, *, n_chunks, chunk):
    p = pts_ref[:]
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    best = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    bidx = jnp.zeros((TILE_P, 1), jnp.int32)
    for c in range(n_chunks):
        sl = pl.ds(c * chunk, chunk)
        vx = verts_ref[0:1, sl]
        vy = verts_ref[1:2, sl]
        vz = verts_ref[2:3, sl]
        dx = px - vx
        dy = py - vy
        dz = pz - vz
        d2 = dx * dx + dy * dy + dz * dz            # (TILE_P, CHUNK)
        cmin = jnp.min(d2, axis=1, keepdims=True)
        carg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None] \
            + c * chunk
        better = cmin < best
        best = jnp.where(better, cmin, best)
        bidx = jnp.where(better, carg, bidx)
    idx_ref[:] = bidx
    d2_ref[:] = best


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_vertex_d2_pallas(query: jnp.ndarray, verts: jnp.ndarray,
                             interpret: bool = False):
    """(N, 3) queries x (V, 3) verts -> exact argmin indices + squared dists.

    The squared distance doubles as a certified upper bound on the
    point-to-MESH squared distance (every vertex lies on the mesh), which
    the culled mesh-query kernel uses for branch-and-bound face skipping.

    Returns:
      idx (N,) int32, d2 (N,) float32.
    """
    N = query.shape[0]
    V = verts.shape[0]
    pad_p = (-N) % TILE_P
    pad_v = (-V) % VERT_CHUNK
    pts = jnp.pad(query.astype(jnp.float32), ((0, pad_p), (0, 0)))
    vt = jnp.pad(verts.astype(jnp.float32).T, ((0, 0), (0, pad_v)),
                 constant_values=1e9)
    v_pad = vt.shape[1]
    chunk = v_pad if v_pad <= 2048 else 1024
    if v_pad % chunk:
        extra = chunk - (v_pad % chunk)
        vt = jnp.pad(vt, ((0, 0), (0, extra)), constant_values=1e9)
        v_pad = vt.shape[1]
    n_chunks = v_pad // chunk

    idx, d2 = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, chunk=chunk),
        grid=(pts.shape[0] // TILE_P,),
        in_specs=[
            pl.BlockSpec((TILE_P, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vt.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.int32),
                   jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32)],
        interpret=interpret,
    )(pts, vt)
    return idx[:N, 0], d2[:N, 0]


@jax.jit
def nearest_vertex_pallas(query: jnp.ndarray,
                          verts: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) queries x (V, 3) verts -> (N,) int32 exact argmin indices."""
    return nearest_vertex_d2_pallas(query, verts)[0]


# ---------------------------------------------------------------------------
# transposed-I/O variant: points ride the 128-lane axis end to end
# ---------------------------------------------------------------------------
#
# A (N, 3) f32 array tiles as T(8,128) on TPU — the 3-wide minor dim pads
# to 128 lanes, a 42x HBM blowup, and the (N, 1) outputs pad the same way;
# the producer/consumer fusions around each kernel call then move ~134 MB
# where ~1-3 MB suffice.  The _T variants take (3, N) coordinates and
# return (N,) packed outputs; per-tile boundary transposes inside the
# kernel (a few vregs each) keep the pairwise math identical to the
# untransposed kernel, so results are bit-identical.


def _kernel_T(pts_ref, verts_ref, idx_ref, d2_ref, *, n_chunks, chunk):
    p = jnp.transpose(pts_ref[:], (1, 0))       # (3, TILE_P) -> (TILE_P, 3)
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    best = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    bidx = jnp.zeros((TILE_P, 1), jnp.int32)
    for c in range(n_chunks):
        sl = pl.ds(c * chunk, chunk)
        vx = verts_ref[0:1, sl]
        vy = verts_ref[1:2, sl]
        vz = verts_ref[2:3, sl]
        dx = px - vx
        dy = py - vy
        dz = pz - vz
        d2 = dx * dx + dy * dy + dz * dz            # (TILE_P, CHUNK)
        cmin = jnp.min(d2, axis=1, keepdims=True)
        carg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None] \
            + c * chunk
        better = cmin < best
        best = jnp.where(better, cmin, best)
        bidx = jnp.where(better, carg, bidx)
    idx_ref[:] = jnp.transpose(bidx, (1, 0))        # (1, TILE_P)
    d2_ref[:] = jnp.transpose(best, (1, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_vertex_d2_pallas_T(query_T: jnp.ndarray, verts: jnp.ndarray,
                               interpret: bool = False):
    """(3, N) queries x (V, 3) verts -> exact argmin indices + squared dists.

    Bit-identical to :func:`nearest_vertex_d2_pallas` (same arithmetic
    order); only the HBM layouts differ — packed (3, N) input, packed (N,)
    outputs.

    Returns:
      idx (N,) int32, d2 (N,) float32.
    """
    N = query_T.shape[1]
    V = verts.shape[0]
    pad_p = (-N) % TILE_P
    pad_v = (-V) % VERT_CHUNK
    pts = jnp.pad(query_T.astype(jnp.float32), ((0, 0), (0, pad_p)))
    vt = jnp.pad(verts.astype(jnp.float32).T, ((0, 0), (0, pad_v)),
                 constant_values=1e9)
    v_pad = vt.shape[1]
    chunk = v_pad if v_pad <= 2048 else 1024
    if v_pad % chunk:
        extra = chunk - (v_pad % chunk)
        vt = jnp.pad(vt, ((0, 0), (0, extra)), constant_values=1e9)
        v_pad = vt.shape[1]
    n_chunks = v_pad // chunk

    np_ = pts.shape[1]
    idx, d2 = pl.pallas_call(
        functools.partial(_kernel_T, n_chunks=n_chunks, chunk=chunk),
        grid=(np_ // TILE_P,),
        in_specs=[
            pl.BlockSpec((3, TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, vt.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[pl.BlockSpec((1, TILE_P), lambda i: (0, i),
                                memory_space=pltpu.VMEM)] * 2,
        out_shape=[jax.ShapeDtypeStruct((1, np_), jnp.int32),
                   jax.ShapeDtypeStruct((1, np_), jnp.float32)],
        interpret=interpret,
    )(pts, vt)
    return idx[0, :N], d2[0, :N]
