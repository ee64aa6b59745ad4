"""Cluster-accelerated point->mesh query (Pallas TPU).

The brute-force kernel touches every (point, face) pair.  This version cuts
the pair count with the classic two-level structure (Barill et al., Fast
Winding Numbers, adapted to fixed shapes for the TPU):

  * faces are Morton-sorted and grouped into contiguous clusters of 128;
  * query points are Morton-sorted so each 128-point kernel tile is
    spatially tight;
  * per tile, the K nearest clusters (by tile-centroid distance, scalar-
    prefetched) get EXACT treatment: point-triangle distance + solid-angle
    winding over their faces (a dynamic 128-aligned VMEM slice);
  * all other clusters contribute winding through their dipole
    approximation A_c . (c_c - p) / (4 pi |c_c - p|^3), computed densely
    and corrected by subtracting the near clusters' dipoles.

Exactness: distance is exact whenever the true closest face lies in a near
cluster — guaranteed for points near the surface (their tile's nearest
clusters are the surrounding geometry); points far from ALL clusters can
overestimate distance, where the sigmoid-beta density is already ~0.
Winding error is the far-field dipole truncation, O((r_c/d)^3) per cluster,
orders of magnitude below the 0.5 inside/outside threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mesh_query_pallas import _atan2, _distance_chunk

TILE_P = 512
CLUSTER = 128          # faces per cluster (lane-aligned dynamic slices)
FOUR_PI = 12.566370614359172


def _morton3(q: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) int coords in [0, 1024) -> interleaved 30-bit Morton codes."""
    def spread(x):
        x = x.astype(jnp.uint32)
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x
    return (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
            | (spread(q[:, 2]) << 2)).astype(jnp.uint32)


def _quantize(p, lo, hi):
    t = (p - lo) / jnp.maximum(hi - lo, 1e-9)
    return jnp.clip(t * 1023.0, 0, 1023).astype(jnp.int32)


def _kernel(near_ref, pts_ref, tri_ref, dip_ref, d2_ref, idx_ref, wind_ref,
            *, k_near):
    i = pl.program_id(0)
    p = pts_ref[:]
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    d2_best = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    idx_best = jnp.zeros((TILE_P, 1), jnp.int32)

    # far-field: dipole winding over ALL clusters (dense, cheap)
    ax_ = dip_ref[0:1, :]     # dipole area-normal A
    ay_ = dip_ref[1:2, :]
    az_ = dip_ref[2:3, :]
    cx_ = dip_ref[3:4, :]     # dipole center c
    cy_ = dip_ref[4:5, :]
    cz_ = dip_ref[5:6, :]

    rx = cx_ - px
    ry = cy_ - py
    rz = cz_ - pz
    r2 = rx * rx + ry * ry + rz * rz
    inv_r3 = jax.lax.rsqrt(jnp.maximum(r2, 1e-12)) / jnp.maximum(r2, 1e-12)
    dip_all = (ax_ * rx + ay_ * ry + az_ * rz) * inv_r3 / FOUR_PI

    # mask out the near clusters (they get exact treatment below); lane-dim
    # dynamic slices must be 128-aligned on TPU, so select by iota compare.
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (1, dip_all.shape[1]), 1)
    far_mask = jnp.ones((1, dip_all.shape[1]), jnp.float32)
    for k in range(k_near):
        far_mask = jnp.where(c_iota == near_ref[i, k], 0.0, far_mask)
    wind = jnp.sum(dip_all * far_mask, axis=1, keepdims=True)

    # near clusters: exact distance + exact solid-angle winding, minus the
    # double-counted dipole
    for k in range(k_near):
        c = near_ref[i, k]
        sl = pl.ds(c * CLUSTER, CLUSTER)
        tax = tri_ref[0:1, sl]
        tay = tri_ref[1:2, sl]
        taz = tri_ref[2:3, sl]
        tbx = tri_ref[3:4, sl]
        tby = tri_ref[4:5, sl]
        tbz = tri_ref[5:6, sl]
        tcx = tri_ref[6:7, sl]
        tcy = tri_ref[7:8, sl]
        tcz = tri_ref[8:9, sl]

        d2_new, idx_new = _distance_chunk(
            px, py, pz, tax, tay, taz, tbx, tby, tbz, tcx, tcy, tcz,
            d2_best, idx_best, 0)
        # remap chunk-local argmin to global (sorted) face id
        idx_best = jnp.where(d2_new < d2_best,
                             (idx_new % CLUSTER) + c * CLUSTER, idx_best)
        d2_best = jnp.minimum(d2_new, d2_best)

        # exact solid angles for this cluster
        r1x, r1y, r1z = tax - px, tay - py, taz - pz
        r2x, r2y, r2z = tbx - px, tby - py, tbz - pz
        r3x, r3y, r3z = tcx - px, tcy - py, tcz - pz
        n1 = jnp.sqrt(r1x * r1x + r1y * r1y + r1z * r1z)
        n2 = jnp.sqrt(r2x * r2x + r2y * r2y + r2z * r2z)
        n3 = jnp.sqrt(r3x * r3x + r3y * r3y + r3z * r3z)
        crx = r2y * r3z - r2z * r3y
        cry = r2z * r3x - r2x * r3z
        crz = r2x * r3y - r2y * r3x
        num = r1x * crx + r1y * cry + r1z * crz
        den = (n1 * n2 * n3
               + (r1x * r2x + r1y * r2y + r1z * r2z) * n3
               + (r1x * r3x + r1y * r3y + r1z * r3z) * n2
               + (r2x * r3x + r2y * r3y + r2z * r3z) * n1)
        omega = 2.0 * _atan2(num, den)
        wind = wind + jnp.sum(omega, axis=1, keepdims=True) / FOUR_PI

    d2_ref[:] = d2_best
    idx_ref[:] = idx_best
    wind_ref[:] = wind


@functools.partial(jax.jit, static_argnames=("k_near",))
def point_mesh_query_cluster(points: jnp.ndarray, triangles: jnp.ndarray,
                             k_near: int = 6):
    """Cluster-accelerated exact-near / dipole-far mesh query.

    Args:
      points: (N, 3); triangles: (F, 3, 3).
    Returns:
      sq_dist (N,), face_idx (N,) int32 (original face ids), winding (N,).
    """
    N = points.shape[0]
    F = triangles.shape[0]
    pts32 = points.astype(jnp.float32)
    tri32 = triangles.astype(jnp.float32)

    lo = pts32.min(0)
    hi = pts32.max(0)

    # ---- sort faces into Morton clusters --------------------------------
    cent = tri32.mean(1)                                  # (F, 3)
    fcode = _morton3(_quantize(cent, lo, hi))
    forder = jnp.argsort(fcode)
    tri_s = tri32[forder]
    pad_f = (-F) % CLUSTER
    tri_pad = jnp.pad(tri_s, ((0, pad_f), (0, 0), (0, 0)),
                      constant_values=1e9)
    n_clusters = tri_pad.shape[0] // CLUSTER

    # per-cluster dipole: A = sum of signed area normals, c = area-weighted
    # centroid (padding faces are degenerate -> zero area, no effect)
    e1 = tri_pad[:, 1] - tri_pad[:, 0]
    e2 = tri_pad[:, 2] - tri_pad[:, 0]
    an = 0.5 * jnp.cross(e1, e2)                          # (F_pad, 3)
    area = jnp.linalg.norm(an, axis=-1, keepdims=True)
    fc = tri_pad.mean(1)
    fc = jnp.where(area > 1e8, 0.0, fc)                   # guard padding
    an_c = an.reshape(n_clusters, CLUSTER, 3).sum(1)      # (C, 3)
    w = area.reshape(n_clusters, CLUSTER, 1)
    w = jnp.where(w > 1e8, 0.0, w)
    cc = (fc.reshape(n_clusters, CLUSTER, 3) * w).sum(1) \
        / jnp.maximum(w.sum(1), 1e-12)
    dip = jnp.concatenate([an_c.T, cc.T], 0)              # (6, C)
    pad_c = (-n_clusters) % 128
    dip = jnp.pad(dip, ((0, 0), (0, pad_c)))
    # padded clusters: A=0 -> zero dipole; keep center far away
    if pad_c:
        dip = dip.at[3:, n_clusters:].set(1e9)

    # ---- sort points into Morton tiles ----------------------------------
    pcode = _morton3(_quantize(pts32, lo, hi))
    porder = jnp.argsort(pcode)
    pts_s = pts32[porder]
    pad_p = (-N) % TILE_P
    pts_pad = jnp.pad(pts_s, ((0, pad_p), (0, 0)))
    n_tiles = pts_pad.shape[0] // TILE_P

    # ---- near clusters per tile ------------------------------------------
    tc = pts_pad.reshape(n_tiles, TILE_P, 3).mean(1)      # (T, 3)
    d_tc = jnp.sum((tc[:, None] - cc[None]) ** 2, -1)     # (T, C)
    k = min(k_near, n_clusters)
    _, near_idx = jax.lax.top_k(-d_tc, k)                 # (T, k)
    near_idx = near_idx.astype(jnp.int32)

    tri_packed = tri_pad.reshape(-1, 9).T                 # (9, F_pad)

    kernel = functools.partial(_kernel, k_near=k)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((TILE_P, 3), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_packed.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((6, dip.shape[1]), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_P, 1), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM)] * 3,
    )
    d2, idx, wind = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((pts_pad.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((pts_pad.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((pts_pad.shape[0], 1), jnp.float32),
        ],
    )(near_idx, pts_pad, tri_packed, dip)

    d2 = d2[:N, 0]
    idx = idx[:N, 0]
    wind = wind[:N, 0]

    # unsort back to input order; remap sorted face ids to originals
    inv = jnp.zeros_like(porder).at[porder].set(jnp.arange(N))
    forder_pad = jnp.pad(forder, (0, pad_f), constant_values=0)
    return d2[inv], forder_pad[idx[inv]].astype(jnp.int32), wind[inv]
