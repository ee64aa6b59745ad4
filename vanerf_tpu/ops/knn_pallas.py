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


# ---------------------------------------------------------------------------
# landmark-culled variant: branch-and-bound over 128-vertex chunks
# ---------------------------------------------------------------------------
#
# The brute kernels sweep every (point, vertex) pair (~816M/patch).  MANO's
# vertex order is anatomically coherent, so 128-vertex chunks have tight
# AABBs; a tile whose points sit near one hand never needs the other
# hand's chunks.  Per (256-point tile x chunk):
#   ub_t  = min_c (farthest-corner-of-tile-box -> chunk center + chunk
#           radius)^2  — a certified upper bound on EVERY tile point's
#           nearest-vertex d2;
#   lb_tc = AABB-AABB squared gap — a lower bound on d(p, chunk)^2.
# Chunks with lb > ub are skipped via compacted per-tile chunk lists
# (dynamic-trip-count fori_loop; a pl.when per skipped slot costs ~0.4 us
# — see ops/mesh_query_pallas.py).  The per-chunk arithmetic and the
# strict-< running argmin are unchanged, and the tolerance keeps any
# chunk that could contain the minimum, so idx/d2 are bit-identical to
# the brute kernels.  Cull effectiveness depends on point-tile locality:
# best with 2-D pixel blocking (VANERF_BLOCK_2D), weaker on pixel-major
# sample order (a tile spans two full ray segments).


def _knn_cull_lists(tmin, tmax, verts_pad_T, chunk):
    """Compacted visited-chunk lists for the culled KNN kernels.

    Args:
      tmin/tmax: (T, 3) per-tile point AABBs.
      verts_pad_T: (3, Vp) edge-replicated padded vertices.
      chunk: vertex chunk width.
    Returns:
      (1, T*128) int32 SMEM rows: slots [0, n) ascending visited-chunk
      ids, slot 127 = n.
    """
    C = verts_pad_T.shape[1] // chunk
    vch = verts_pad_T.reshape(3, C, chunk)
    cmin = jnp.transpose(vch.min(2), (1, 0))                  # (C, 3)
    cmax = jnp.transpose(vch.max(2), (1, 0))
    ccen = 0.5 * (cmin + cmax)
    crad = 0.5 * jnp.sqrt(((cmax - cmin) ** 2).sum(-1))       # (C,)

    # ub: for any p in the tile box and any chunk c, the nearest vertex is
    # within d(p, ccen_c) + crad_c <= far(t, c) + crad_c.
    far = jnp.maximum(jnp.abs(ccen[None] - tmin[:, None]),
                      jnp.abs(ccen[None] - tmax[:, None]))    # (T, C, 3)
    fard = jnp.sqrt((far * far).sum(-1)) + crad[None]
    ub_t = jnp.min(fard, axis=1) ** 2                         # (T,)

    gap = jnp.maximum(0.0, jnp.maximum(cmin[None] - tmax[:, None],
                                       tmin[:, None] - cmax[None]))
    lb = (gap * gap).sum(-1)                                  # (T, C)
    need = lb <= ub_t[:, None] * (1.0 + 1e-5) + 1e-12

    T = need.shape[0]
    iota = jnp.arange(C, dtype=jnp.int32)[None]
    clist = jnp.sort(jnp.where(need, iota, C), axis=1)        # (T, C)
    maskf = jnp.zeros((T, 128), jnp.int32)
    maskf = maskf.at[:, :C].set(clist)
    maskf = maskf.at[:, 127].set(need.sum(1).astype(jnp.int32))
    return maskf.reshape(1, -1)


def _chunk_step(px, py, pz, verts_ref, c, chunk, best, bidx):
    """One vertex-chunk running-argmin step (identical math to _kernel)."""
    sl = pl.ds(c * chunk, chunk)
    vx = verts_ref[0:1, sl]
    vy = verts_ref[1:2, sl]
    vz = verts_ref[2:3, sl]
    dx = px - vx
    dy = py - vy
    dz = pz - vz
    d2 = dx * dx + dy * dy + dz * dz
    cmin = jnp.min(d2, axis=1, keepdims=True)
    carg = jnp.argmin(d2, axis=1).astype(jnp.int32)[:, None] + c * chunk
    better = cmin < best
    return jnp.where(better, cmin, best), jnp.where(better, carg, bidx)


def _kernel_culled(mask_ref, pts_ref, verts_ref, idx_ref, d2_ref, *,
                   chunk, transposed):
    p = pts_ref[:]
    if transposed:
        p = jnp.transpose(p, (1, 0))          # (3, TILE_P) -> (TILE_P, 3)
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    n = mask_ref[0, 127]

    def body(j, carry):
        best, bidx = carry
        return _chunk_step(px, py, pz, verts_ref, mask_ref[0, j], chunk,
                           best, bidx)

    best, bidx = jax.lax.fori_loop(
        0, n, body,
        (jnp.full((TILE_P, 1), jnp.inf, jnp.float32),
         jnp.zeros((TILE_P, 1), jnp.int32)), unroll=False)
    if transposed:
        idx_ref[:] = jnp.transpose(bidx, (1, 0))
        d2_ref[:] = jnp.transpose(best, (1, 0))
    else:
        idx_ref[:] = bidx
        d2_ref[:] = best


def _culled_common(pts, verts, transposed, interpret):
    """Shared pad/cull/pallas_call tail of the culled entry points."""
    chunk = VERT_CHUNK
    V = verts.shape[0]
    pad_v = (-V) % chunk
    # edge-replicated padding keeps chunk AABBs tight; duplicates have
    # higher indices than the original so the strict-< / first-occurrence
    # argmin never selects them
    vt = jnp.pad(verts.astype(jnp.float32).T, ((0, 0), (0, pad_v)),
                 mode="edge")
    np_ = pts.shape[1] if transposed else pts.shape[0]
    T = np_ // TILE_P
    if transposed:
        ptile = pts.reshape(3, T, TILE_P)
        tmin = jnp.transpose(ptile.min(2), (1, 0))
        tmax = jnp.transpose(ptile.max(2), (1, 0))
    else:
        ptile = pts.reshape(T, TILE_P, 3)
        tmin = ptile.min(1)
        tmax = ptile.max(1)
    maskf = _knn_cull_lists(tmin, tmax, vt, chunk)

    if transposed:
        pts_spec = pl.BlockSpec((3, TILE_P), lambda i: (0, i),
                                memory_space=pltpu.VMEM)
        out_specs = [pl.BlockSpec((1, TILE_P), lambda i: (0, i),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [jax.ShapeDtypeStruct((1, np_), jnp.int32),
                     jax.ShapeDtypeStruct((1, np_), jnp.float32)]
    else:
        pts_spec = pl.BlockSpec((TILE_P, 3), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
        out_specs = [pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)] * 2
        out_shape = [jax.ShapeDtypeStruct((np_, 1), jnp.int32),
                     jax.ShapeDtypeStruct((np_, 1), jnp.float32)]

    kernel = functools.partial(_kernel_culled, chunk=chunk,
                               transposed=transposed)
    return pl.pallas_call(
        kernel, grid=(T,),
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pts_spec,
            pl.BlockSpec((3, vt.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
    )(maskf, pts, vt)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_vertex_d2_pallas_culled(query: jnp.ndarray, verts: jnp.ndarray,
                                    interpret: bool = False):
    """Culled :func:`nearest_vertex_d2_pallas` — bit-identical idx/d2."""
    N = query.shape[0]
    pad_p = (-N) % TILE_P
    pts = jnp.pad(query.astype(jnp.float32), ((0, pad_p), (0, 0)),
                  mode="edge")
    idx, d2 = _culled_common(pts, verts, transposed=False,
                             interpret=interpret)
    return idx[:N, 0], d2[:N, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_vertex_d2_pallas_T_culled(query_T: jnp.ndarray,
                                      verts: jnp.ndarray,
                                      interpret: bool = False):
    """Culled :func:`nearest_vertex_d2_pallas_T` — bit-identical idx/d2."""
    N = query_T.shape[1]
    pad_p = (-N) % TILE_P
    pts = jnp.pad(query_T.astype(jnp.float32), ((0, 0), (0, pad_p)),
                  mode="edge")
    idx, d2 = _culled_common(pts, verts, transposed=True,
                             interpret=interpret)
    return idx[0, :N], d2[0, :N]


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
