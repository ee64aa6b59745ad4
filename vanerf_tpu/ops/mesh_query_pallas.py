"""Pallas TPU kernel for the fused point->mesh query.

One pass over (point-tile x face-chunk) computes, per query point:
  * exact point-triangle squared distance with running min + argmin,
  * the winding-number solid-angle accumulation,
fused so every face is read from VMEM once per point tile (the faces array —
~3.1k faces x 9 floats ~ 112 KB — fits VMEM whole, so the kernel is pure
VPU compute with zero HBM re-reads).

This replaces the XLA `lax.map` path in :mod:`vanerf_tpu.ops.mesh_query`
on TPU; both produce identical results (tested in interpret mode) and the
dispatcher picks per-platform.

Padding: faces are padded to a multiple of the chunk with degenerate
triangles at +1e9 — they never win the argmin and contribute exactly zero
solid angle (all three corners coincide -> numerator 0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 128          # points per grid step
FACE_CHUNK = 512      # faces per inner iteration

_PI = 3.14159265358979


def _atan2(y, x):
    """Branchless atan2 via odd-polynomial atan on [0, 1] (Mosaic has no
    atan2 primitive).  Max abs error ~1e-5 rad — far below what the
    winding-number threshold (0.5) needs."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    hi = jnp.maximum(ax, ay)
    lo = jnp.minimum(ax, ay)
    t = lo / jnp.maximum(hi, 1e-30)
    s = t * t
    # minimax poly for atan(t), t in [0, 1]
    r = t * (0.99997726 + s * (-0.33262347 + s * (0.19354346 + s * (
        -0.11643287 + s * (0.05265332 + s * (-0.01172120))))))
    r = jnp.where(ay > ax, 0.5 * _PI - r, r)
    r = jnp.where(x < 0, _PI - r, r)
    r = jnp.where(y < 0, -r, r)
    return jnp.where((ax == 0) & (ay == 0), 0.0, r)


def _kernel(pts_ref, tri_ref, d2_ref, idx_ref, wind_ref, *, n_chunks,
            with_winding):
    p = pts_ref[:]                                    # (TILE_P, 3)
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    big = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    d2_best = big
    idx_best = jnp.zeros((TILE_P, 1), jnp.int32)
    wind = jnp.zeros((TILE_P, 1), jnp.float32)

    for c in range(n_chunks):
        sl = pl.ds(c * FACE_CHUNK, FACE_CHUNK)
        ax = tri_ref[0:1, sl]                         # (1, CHUNK)
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        bx = tri_ref[3:4, sl]
        by = tri_ref[4:5, sl]
        bz = tri_ref[5:6, sl]
        cx = tri_ref[6:7, sl]
        cy = tri_ref[7:8, sl]
        cz = tri_ref[8:9, sl]

        # edge/point vectors, broadcast (TILE_P, CHUNK)
        abx, aby, abz = bx - ax, by - ay, bz - az
        acx, acy, acz = cx - ax, cy - ay, cz - az
        apx, apy, apz = px - ax, py - ay, pz - az

        d1 = abx * apx + aby * apy + abz * apz
        d2_ = acx * apx + acy * apy + acz * apz
        bpx, bpy, bpz = px - bx, py - by, pz - bz
        d3 = abx * bpx + aby * bpy + abz * bpz
        d4 = acx * bpx + acy * bpy + acz * bpz
        cpx, cpy, cpz = px - cx, py - cy, pz - cz
        d5 = abx * cpx + aby * cpy + abz * cpz
        d6 = acx * cpx + acy * cpy + acz * cpz

        va = d3 * d6 - d5 * d4
        vb = d5 * d2_ - d1 * d6
        vc = d1 * d4 - d3 * d2_

        denom = va + vb + vc
        denom = jnp.where(denom == 0, 1.0, denom)
        v_f = vb / denom
        w_f = vc / denom

        in_a = (d1 <= 0) & (d2_ <= 0)
        in_b = (d3 >= 0) & (d4 <= d3)
        in_c = (d6 >= 0) & (d5 <= d6)
        in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
        in_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
        in_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

        eps = 1e-20
        t_ab = d1 / jnp.maximum(d1 - d3, eps)
        t_ac = d2_ / jnp.maximum(d2_ - d6, eps)
        t_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps)

        qx = ax + v_f * abx + w_f * acx
        qy = ay + v_f * aby + w_f * acy
        qz = az + v_f * abz + w_f * acz
        qx = jnp.where(in_bc, bx + t_bc * (cx - bx), qx)
        qy = jnp.where(in_bc, by + t_bc * (cy - by), qy)
        qz = jnp.where(in_bc, bz + t_bc * (cz - bz), qz)
        qx = jnp.where(in_ac, ax + t_ac * acx, qx)
        qy = jnp.where(in_ac, ay + t_ac * acy, qy)
        qz = jnp.where(in_ac, az + t_ac * acz, qz)
        qx = jnp.where(in_ab, ax + t_ab * abx, qx)
        qy = jnp.where(in_ab, ay + t_ab * aby, qy)
        qz = jnp.where(in_ab, az + t_ab * abz, qz)
        qx = jnp.where(in_c, cx, qx)
        qy = jnp.where(in_c, cy, qy)
        qz = jnp.where(in_c, cz, qz)
        qx = jnp.where(in_a, ax, qx)
        qy = jnp.where(in_a, ay, qy)
        qz = jnp.where(in_a, az, qz)
        qx = jnp.where(in_b, bx, qx)
        qy = jnp.where(in_b, by, qy)
        qz = jnp.where(in_b, bz, qz)

        dx, dy, dz = px - qx, py - qy, pz - qz
        d2c = dx * dx + dy * dy + dz * dz             # (TILE_P, CHUNK)

        cmin = jnp.min(d2c, axis=1, keepdims=True)
        carg = jnp.argmin(d2c, axis=1).astype(jnp.int32)[:, None] \
            + c * FACE_CHUNK
        better = cmin < d2_best
        d2_best = jnp.where(better, cmin, d2_best)
        idx_best = jnp.where(better, carg, idx_best)

        if with_winding:
            r1x, r1y, r1z = ax - px, ay - py, az - pz
            r2x, r2y, r2z = bx - px, by - py, bz - pz
            r3x, r3y, r3z = cx - px, cy - py, cz - pz
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
            wind = wind + jnp.sum(omega, axis=1, keepdims=True)

    d2_ref[:] = d2_best
    idx_ref[:] = idx_best
    wind_ref[:] = wind / (4.0 * jnp.pi)


@functools.partial(jax.jit, static_argnames=("with_winding", "interpret"))
def point_mesh_query_pallas(points: jnp.ndarray, triangles: jnp.ndarray,
                            with_winding: bool = True,
                            interpret: bool = False):
    """Fused exact distance + argmin + winding, Pallas TPU kernel.

    Args:
      points: (N, 3) float32; triangles: (F, 3, 3) float32.
    Returns:
      sq_dist (N,), face_idx (N,) int32, winding (N,).
    """
    N = points.shape[0]
    F = triangles.shape[0]
    pad_p = (-N) % TILE_P
    pad_f = (-F) % FACE_CHUNK

    pts = jnp.pad(points.astype(jnp.float32), ((0, pad_p), (0, 0)))
    # (9, F_pad) transposed corner layout; degenerate far-away padding
    tri = triangles.astype(jnp.float32).reshape(F, 9).T
    tri = jnp.pad(tri, ((0, 0), (0, pad_f)), constant_values=1e9)
    n_chunks = tri.shape[1] // FACE_CHUNK
    grid = (pts.shape[0] // TILE_P,)

    kernel = functools.partial(_kernel, n_chunks=n_chunks,
                               with_winding=with_winding)
    d2, idx, wind = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_P, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
        ],
        interpret=interpret,
    )(pts, tri)
    return d2[:N, 0], idx[:N, 0], wind[:N, 0]
