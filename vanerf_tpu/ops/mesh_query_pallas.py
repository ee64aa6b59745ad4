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
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# tunable granularity (import-time env knobs for perf sweeps)
TILE_P = int(os.environ.get("VANERF_MESH_TILE_P", "128"))
FACE_CHUNK = 512      # faces per inner iteration (brute kernels)

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


# fixed generic ray direction for crossing-number winding (irrational-ish
# components make exact edge/vertex grazes measure-zero)
_RAY_D = (0.5773502691896258, 0.7071067811865476, 0.40824829046386296)


def _kernel_ray(pts_ref, tri_ref, wtri_ref, d2_ref, idx_ref, wind_ref, *,
                n_chunks):
    """Distance (as in _kernel) + winding via signed ray crossings.

    The winding number equals the sum of signed intersections of ANY fixed
    ray with the mesh (degree of the Gauss map) — exact for watertight
    meshes, including interpenetrating components, with zero
    transcendentals.  Per-face constants (d x e2, e1, e2, det) are
    precomputed on the host side of the call.
    """
    p = pts_ref[:]
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    d2_best = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    idx_best = jnp.zeros((TILE_P, 1), jnp.int32)
    wind = jnp.zeros((TILE_P, 1), jnp.float32)

    for c in range(n_chunks):
        sl = pl.ds(c * FACE_CHUNK, FACE_CHUNK)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        bx = tri_ref[3:4, sl]
        by = tri_ref[4:5, sl]
        bz = tri_ref[5:6, sl]
        cx = tri_ref[6:7, sl]
        cy = tri_ref[7:8, sl]
        cz = tri_ref[8:9, sl]

        d2_best, idx_best = _distance_chunk(
            px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz,
            d2_best, idx_best, c * FACE_CHUNK)

        # Moller-Trumbore with per-face precomputes, division-free
        pvx = wtri_ref[0:1, sl]
        pvy = wtri_ref[1:2, sl]
        pvz = wtri_ref[2:3, sl]
        e1x = wtri_ref[3:4, sl]
        e1y = wtri_ref[4:5, sl]
        e1z = wtri_ref[5:6, sl]
        e2x = wtri_ref[6:7, sl]
        e2y = wtri_ref[7:8, sl]
        e2z = wtri_ref[8:9, sl]
        det = wtri_ref[9:10, sl]

        qx = px - ax
        qy = py - ay
        qz = pz - az
        u_num = qx * pvx + qy * pvy + qz * pvz
        qvx = qy * e1z - qz * e1y
        qvy = qz * e1x - qx * e1z
        qvz = qx * e1y - qy * e1x
        v_num = _RAY_D[0] * qvx + _RAY_D[1] * qvy + _RAY_D[2] * qvz
        t_num = e2x * qvx + e2y * qvy + e2z * qvz

        hit = ((u_num * det >= 0) & (v_num * det >= 0)
               & ((u_num + v_num - det) * det <= 0) & (t_num * det > 0))
        # det = -d.(e1 x e2): an EXIT crossing (outward normal aligned with
        # the ray) has det < 0, so winding = -sum(sign(det) * hit).
        sign = jnp.where(det > 0, -1.0, 1.0)
        wind = wind + jnp.sum(jnp.where(hit, sign, 0.0), axis=1,
                              keepdims=True)

    d2_ref[:] = d2_best
    idx_ref[:] = idx_best
    wind_ref[:] = wind


def _distance_chunk(px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz,
                    d2_best, idx_best, base):
    """Exact point-triangle squared-distance chunk with running min."""
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
    d2c = dx * dx + dy * dy + dz * dz

    cmin = jnp.min(d2c, axis=1, keepdims=True)
    carg = jnp.argmin(d2c, axis=1).astype(jnp.int32)[:, None] + base
    better = cmin < d2_best
    return (jnp.where(better, cmin, d2_best),
            jnp.where(better, carg, idx_best))


def _kernel_vis(pts_ref, tri_ref, vis_ref, d2_ref, idx_ref, wind_ref,
                qvis_ref, *, n_chunks):
    """Distance + winding + in-kernel visibility interpolation.

    The reference interpolates per-vertex visibility onto each query's
    closest face with plane-projection barycentrics
    (mesh_util.py:516-522).  Ericson's va/vb/vc (already computed in the
    distance test) ARE those barycentrics up to normalization, so the
    interpolation costs a few extra VPU ops per pair here instead of
    three ~2 ms 262k-row gathers afterwards.
    """
    p = pts_ref[:]
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    d2_best = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    idx_best = jnp.zeros((TILE_P, 1), jnp.int32)
    qvis_best = jnp.zeros((TILE_P, 1), jnp.float32)
    wind = jnp.zeros((TILE_P, 1), jnp.float32)

    for c in range(n_chunks):
        sl = pl.ds(c * FACE_CHUNK, FACE_CHUNK)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        bx = tri_ref[3:4, sl]
        by = tri_ref[4:5, sl]
        bz = tri_ref[5:6, sl]
        cx = tri_ref[6:7, sl]
        cy = tri_ref[7:8, sl]
        cz = tri_ref[8:9, sl]
        visa = vis_ref[0:1, sl]
        visb = vis_ref[1:2, sl]
        visc = vis_ref[2:3, sl]

        d2_new, idx_new, qv_sel = _distance_chunk_vis(
            px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz,
            visa, visb, visc, d2_best, idx_best, c * FACE_CHUNK)
        better = d2_new < d2_best
        qvis_best = jnp.where(better, qv_sel, qvis_best)
        d2_best = d2_new
        idx_best = idx_new

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
        wind = wind + jnp.sum(2.0 * _atan2(num, den), axis=1, keepdims=True)

    d2_ref[:] = d2_best
    idx_ref[:] = idx_best
    wind_ref[:] = wind / (4.0 * jnp.pi)
    qvis_ref[:] = qvis_best


def _distance_chunk_vis(px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz,
                        visa, visb, visc, d2_best, idx_best, base):
    """_distance_chunk + plane-projection barycentric visibility of the
    chunk-argmin face, selected without cross-lane gathers."""
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
    # plane-projection barycentric visibility (unclamped, like the
    # reference's Heidrich projection)
    qv = (1.0 - v_f - w_f) * visa + v_f * visb + w_f * visc

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
    d2c = dx * dx + dy * dy + dz * dz

    cmin = jnp.min(d2c, axis=1, keepdims=True)
    carg_local = jnp.argmin(d2c, axis=1).astype(jnp.int32)[:, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, d2c.shape, 1)
    qv_sel = jnp.sum(jnp.where(lane == carg_local, qv, 0.0), axis=1,
                     keepdims=True)
    better = cmin < d2_best
    return (jnp.where(better, cmin, d2_best),
            jnp.where(better, carg_local + base, idx_best),
            qv_sel)


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

        d2_best, idx_best = _distance_chunk(
            px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz,
            d2_best, idx_best, c * FACE_CHUNK)

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


@functools.partial(jax.jit,
                   static_argnames=("with_winding", "interpret", "mode"))
def point_mesh_query_pallas(points: jnp.ndarray, triangles: jnp.ndarray,
                            with_winding: bool = True,
                            interpret: bool = False,
                            mode: str = "solid_angle"):
    """Fused exact distance + argmin + winding, Pallas TPU kernel.

    Args:
      points: (N, 3) float32; triangles: (F, 3, 3) float32.
      mode: winding method — 'ray' (signed crossings of a fixed generic
        ray; no transcendentals, default) or 'solid_angle' (Van Oosterom
        atan2 sum; the slower reference formulation).
    Returns:
      sq_dist (N,), face_idx (N,) int32, winding (N,).
    """
    N = points.shape[0]
    F = triangles.shape[0]
    pad_p = (-N) % TILE_P
    pad_f = (-F) % FACE_CHUNK

    pts = jnp.pad(points.astype(jnp.float32), ((0, pad_p), (0, 0)))
    # (9, F_pad) transposed corner layout; degenerate far-away padding
    tri_f = triangles.astype(jnp.float32)
    tri = tri_f.reshape(F, 9).T
    tri = jnp.pad(tri, ((0, 0), (0, pad_f)), constant_values=1e9)
    n_chunks = tri.shape[1] // FACE_CHUNK
    grid = (pts.shape[0] // TILE_P,)

    def pspec(n_rows):
        return pl.BlockSpec((n_rows, tri.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    out_specs = [pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 3
    out_shape = [
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.int32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
    ]
    pts_spec = pl.BlockSpec((TILE_P, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    if mode == "ray" and with_winding:
        # per-face Moller-Trumbore constants for the fixed ray
        d = jnp.asarray(_RAY_D, jnp.float32)
        e1 = tri_f[:, 1] - tri_f[:, 0]
        e2 = tri_f[:, 2] - tri_f[:, 0]
        pv = jnp.cross(jnp.broadcast_to(d, e2.shape), e2)
        det = jnp.sum(e1 * pv, axis=-1)
        wtri = jnp.concatenate(
            [pv.T, e1.T, e2.T, det[None]], 0)           # (10, F)
        # padded faces: det = 0 -> zero contribution
        wtri = jnp.pad(wtri, ((0, 0), (0, pad_f)))
        kernel = functools.partial(_kernel_ray, n_chunks=n_chunks)
        d2, idx, wind = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pts_spec, pspec(9), pspec(10)],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(pts, tri, wtri)
    else:
        kernel = functools.partial(_kernel, n_chunks=n_chunks,
                                   with_winding=with_winding)
        d2, idx, wind = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pts_spec, pspec(9)],
            out_specs=out_specs, out_shape=out_shape,
            interpret=interpret,
        )(pts, tri)
    return d2[:N, 0], idx[:N, 0], wind[:N, 0]


@functools.partial(jax.jit, static_argnames=("interpret", "mode"))
def point_mesh_query_vis_pallas(points: jnp.ndarray, triangles: jnp.ndarray,
                                face_vis: jnp.ndarray,
                                interpret: bool = False,
                                mode: str = "solid_angle"):
    """Fused distance + argmin + winding + interpolated visibility.

    Args:
      points: (N, 3); triangles: (F, 3, 3);
      face_vis: (F, 3) per-corner visibility values.
    Returns:
      sq_dist (N,), face_idx (N,) int32, winding (N,), query_vis (N,).
    """
    N = points.shape[0]
    F = triangles.shape[0]
    pad_p = (-N) % TILE_P
    pad_f = (-F) % FACE_CHUNK

    pts = jnp.pad(points.astype(jnp.float32), ((0, pad_p), (0, 0)))
    tri = triangles.astype(jnp.float32).reshape(F, 9).T
    tri = jnp.pad(tri, ((0, 0), (0, pad_f)), constant_values=1e9)
    vis = jnp.pad(face_vis.astype(jnp.float32).T, ((0, 0), (0, pad_f)))
    n_chunks = tri.shape[1] // FACE_CHUNK
    grid = (pts.shape[0] // TILE_P,)

    out_specs = [pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 4
    out_shape = [
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.int32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
    ]
    pts_spec = pl.BlockSpec((TILE_P, 3), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def fspec(rows):
        return pl.BlockSpec((rows, tri.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    if mode == "ray":
        wtri = _ray_constants(triangles.astype(jnp.float32), pad_f)
        kernel = functools.partial(_kernel_vis_ray, n_chunks=n_chunks)
        d2, idx, wind, qvis = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pts_spec, fspec(9), fspec(3), fspec(10)],
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        )(pts, tri, vis, wtri)
    else:
        kernel = functools.partial(_kernel_vis, n_chunks=n_chunks)
        d2, idx, wind, qvis = pl.pallas_call(
            kernel, grid=grid,
            in_specs=[pts_spec, fspec(9), fspec(3)],
            out_specs=out_specs, out_shape=out_shape, interpret=interpret,
        )(pts, tri, vis)
    return d2[:N, 0], idx[:N, 0], wind[:N, 0], qvis[:N, 0]


def _kernel_vis_ray(pts_ref, tri_ref, vis_ref, wtri_ref, d2_ref, idx_ref,
                    wind_ref, qvis_ref, *, n_chunks):
    """_kernel_vis with signed-ray-crossing winding (no sqrt/atan2)."""
    p = pts_ref[:]
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]

    d2_best = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    idx_best = jnp.zeros((TILE_P, 1), jnp.int32)
    qvis_best = jnp.zeros((TILE_P, 1), jnp.float32)
    wind = jnp.zeros((TILE_P, 1), jnp.float32)

    for c in range(n_chunks):
        sl = pl.ds(c * FACE_CHUNK, FACE_CHUNK)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        bx = tri_ref[3:4, sl]
        by = tri_ref[4:5, sl]
        bz = tri_ref[5:6, sl]
        cx = tri_ref[6:7, sl]
        cy = tri_ref[7:8, sl]
        cz = tri_ref[8:9, sl]
        visa = vis_ref[0:1, sl]
        visb = vis_ref[1:2, sl]
        visc = vis_ref[2:3, sl]

        d2_new, idx_new, qv_sel = _distance_chunk_vis(
            px, py, pz, ax, ay, az, bx, by, bz, cx, cy, cz,
            visa, visb, visc, d2_best, idx_best, c * FACE_CHUNK)
        better = d2_new < d2_best
        qvis_best = jnp.where(better, qv_sel, qvis_best)
        d2_best = d2_new
        idx_best = idx_new

        pvx = wtri_ref[0:1, sl]
        pvy = wtri_ref[1:2, sl]
        pvz = wtri_ref[2:3, sl]
        e1x = wtri_ref[3:4, sl]
        e1y = wtri_ref[4:5, sl]
        e1z = wtri_ref[5:6, sl]
        e2x = wtri_ref[6:7, sl]
        e2y = wtri_ref[7:8, sl]
        e2z = wtri_ref[8:9, sl]
        det = wtri_ref[9:10, sl]

        qx = px - ax
        qy = py - ay
        qz = pz - az
        u_num = qx * pvx + qy * pvy + qz * pvz
        qvx = qy * e1z - qz * e1y
        qvy = qz * e1x - qx * e1z
        qvz = qx * e1y - qy * e1x
        v_num = _RAY_D[0] * qvx + _RAY_D[1] * qvy + _RAY_D[2] * qvz
        t_num = e2x * qvx + e2y * qvy + e2z * qvz

        hit = ((u_num * det >= 0) & (v_num * det >= 0)
               & ((u_num + v_num - det) * det <= 0) & (t_num * det > 0))
        sign = jnp.where(det > 0, -1.0, 1.0)
        wind = wind + jnp.sum(jnp.where(hit, sign, 0.0), axis=1,
                              keepdims=True)

    d2_ref[:] = d2_best
    idx_ref[:] = idx_best
    wind_ref[:] = wind
    qvis_ref[:] = qvis_best


def _ray_constants(tri_f: jnp.ndarray, pad_f: int) -> jnp.ndarray:
    """Per-face Moller-Trumbore constants for the fixed winding ray."""
    F = tri_f.shape[0]
    d = jnp.asarray(_RAY_D, jnp.float32)
    e1 = tri_f[:, 1] - tri_f[:, 0]
    e2 = tri_f[:, 2] - tri_f[:, 0]
    pv = jnp.cross(jnp.broadcast_to(d, e2.shape), e2)
    det = jnp.sum(e1 * pv, axis=-1)
    wtri = jnp.concatenate([pv.T, e1.T, e2.T, det[None]], 0)   # (10, F)
    return jnp.pad(wtri, ((0, 0), (0, pad_f)))


# ---------------------------------------------------------------------------
# branch-and-bound culled variant
# ---------------------------------------------------------------------------
#
# Exact results with most (point-tile x face-chunk) pairs skipped:
#   * distance: a chunk is skipped when the AABB-AABB squared distance
#     between the tile's bbox and the chunk's bbox exceeds the tile's
#     certified upper bound (max over points of the nearest-VERTEX squared
#     distance — every vertex lies on the mesh, so it bounds the face
#     distance).  Any face that could win the argmin survives, so the
#     argmin face / winding / visibility choices match the brute kernel
#     exactly; distances agree up to fp rounding (the culled path's
#     _distance_chunk_vis_fast uses a different closed-form evaluation
#     order, so d2 is NOT bitwise-reproducible across the two kernels).
#   * winding (ray crossings): a chunk is skipped when the fixed ray swept
#     from the tile bbox provably misses the chunk bbox (conservative SAT:
#     per-axis half-space tests + the three d x e_k cross axes).  Skipped
#     chunks contribute zero crossings for every point in the tile, so the
#     winding sum is exact.
#
# Effectiveness depends on the CALLER passing spatially coherent point
# order (e.g. ray-block x sample-block tiles); correctness does not.

CULL_CHUNK = int(os.environ.get("VANERF_CULL_CHUNK", "128"))


def _ray_constants_folded(tri_f: jnp.ndarray, pad_f: int) -> jnp.ndarray:
    """Per-face crossing-test constants with the cross products folded in:
    rows = [pv = d x e2 (3), w2 = e1 x d (3), n = e1 x e2 (3), det (1)].

    Padding rows are zero: det = 0 makes padded faces contribute nothing.
    """
    d = jnp.asarray(_RAY_D, jnp.float32)
    e1 = tri_f[:, 1] - tri_f[:, 0]
    e2 = tri_f[:, 2] - tri_f[:, 0]
    pv = jnp.cross(jnp.broadcast_to(d, e2.shape), e2)
    w2 = jnp.cross(e1, jnp.broadcast_to(d, e1.shape))
    n = jnp.cross(e1, e2)
    det = jnp.sum(e1 * pv, axis=-1)
    wtri = jnp.concatenate([pv.T, w2.T, n.T, det[None]], 0)   # (10, F)
    return jnp.pad(wtri, ((0, 0), (0, pad_f)))


def _distance_chunk_vis_fast(px, py, pz, pp, ax, ay, az, bx, by, bz,
                             cx, cy, cz, visa, visb, visc,
                             d2_best, idx_best, base):
    """Reformulated exact point-triangle distance + visibility chunk.

    Same region classification as Ericson (`_distance_chunk_vis`), but the
    per-region distances use closed forms that are mathematically identical
    in-region — d1 - d3 = |ab|^2, (d4-d3)+(d5-d6) = |bc|^2, so the clamped
    edge parameter equals the unconstrained minimizer and
    d_edge = |ap|^2 - (ap.e)^2/|e|^2 exactly; the face distance is the
    plane distance (n.ap)^2/|n|^2.  This removes the closest-point
    reconstruction and 4 of 5 divides (~1.5x fewer VPU ops per pair);
    results differ from the reference chunk only in fp rounding.

    Expects `pp = |p|^2` per point; per-face scalars are derived at
    (1, CHUNK) row cost.
    """
    abx, aby, abz = bx - ax, by - ay, bz - az
    acx, acy, acz = cx - ax, cy - ay, cz - az
    bcx, bcy, bcz = cx - bx, cy - by, cz - bz

    # per-face scalar rows (cheap: (1, CHUNK))
    c_ab_a = abx * ax + aby * ay + abz * az
    c_ac_a = acx * ax + acy * ay + acz * az
    c_ab_b = abx * bx + aby * by + abz * bz
    c_ac_b = acx * bx + acy * by + acz * bz
    c_ab_c = abx * cx + aby * cy + abz * cz
    c_ac_c = acx * cx + acy * cy + acz * cz
    aa = ax * ax + ay * ay + az * az
    bb = bx * bx + by * by + bz * bz
    cc = cx * cx + cy * cy + cz * cz
    abab = abx * abx + aby * aby + abz * abz
    acac = acx * acx + acy * acy + acz * acz
    bcbc = bcx * bcx + bcy * bcy + bcz * bcz
    inv_abab = jnp.where(abab > 0, 1.0 / jnp.maximum(abab, 1e-30), 0.0)
    inv_acac = jnp.where(acac > 0, 1.0 / jnp.maximum(acac, 1e-30), 0.0)
    inv_bcbc = jnp.where(bcbc > 0, 1.0 / jnp.maximum(bcbc, 1e-30), 0.0)
    b_bc = bx * bcx + by * bcy + bz * bcz
    nx = aby * acz - abz * acy
    ny = abz * acx - abx * acz
    nz = abx * acy - aby * acx
    nn = nx * nx + ny * ny + nz * nz
    inv_nn = jnp.where(nn > 0, 1.0 / jnp.maximum(nn, 1e-30), 0.0)
    an = nx * ax + ny * ay + nz * az
    face_pen = jnp.where(nn > 0, 0.0, jnp.float32(1e30))
    dba = visb - visa
    dca = visc - visa

    # per-pair
    pab = px * abx + py * aby + pz * abz
    pac = px * acx + py * acy + pz * acz
    pa = px * ax + py * ay + pz * az
    pn = px * nx + py * ny + pz * nz

    d1 = pab - c_ab_a
    d2_ = pac - c_ac_a
    d3 = pab - c_ab_b
    d4 = pac - c_ac_b
    d5 = pab - c_ab_c
    d6 = pac - c_ac_c

    va = d3 * d6 - d5 * d4
    vb = d5 * d2_ - d1 * d6
    vc = d1 * d4 - d3 * d2_

    da2 = pp - 2.0 * pa + aa
    db2 = pp - 2.0 * (pa + pab) + bb
    dc2 = pp - 2.0 * (pa + pac) + cc
    d_ab = da2 - d1 * d1 * inv_abab
    d_ac = da2 - d2_ * d2_ * inv_acac
    bpbc = (pac - pab) - b_bc
    d_bc = db2 - bpbc * bpbc * inv_bcbc
    fn = pn - an
    d_f = fn * fn * inv_nn + face_pen

    in_a = (d1 <= 0) & (d2_ <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_ac = (vb <= 0) & (d2_ >= 0) & (d6 <= 0)
    in_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    d2c = d_f
    d2c = jnp.where(in_bc, d_bc, d2c)
    d2c = jnp.where(in_ac, d_ac, d2c)
    d2c = jnp.where(in_ab, d_ab, d2c)
    d2c = jnp.where(in_c, dc2, d2c)
    d2c = jnp.where(in_a, da2, d2c)
    d2c = jnp.where(in_b, db2, d2c)
    d2c = jnp.maximum(d2c, 0.0)

    denom = va + vb + vc
    rden = 1.0 / jnp.where(denom == 0, 1.0, denom)
    v_f = vb * rden
    w_f = vc * rden
    qv = visa + v_f * dba + w_f * dca

    cmin = jnp.min(d2c, axis=1, keepdims=True)
    carg_local = jnp.argmin(d2c, axis=1).astype(jnp.int32)[:, None]
    lane = jax.lax.broadcasted_iota(jnp.int32, d2c.shape, 1)
    qv_sel = jnp.sum(jnp.where(lane == carg_local, qv, 0.0), axis=1,
                     keepdims=True)
    better = cmin < d2_best
    return (jnp.where(better, cmin, d2_best),
            jnp.where(better, carg_local + base, idx_best),
            qv_sel)


def _kernel_vis_ray_culled(mask_ref, lb_ref, pts_ref, tri_ref, vis_ref,
                           wtri_ref, d2_ref, idx_ref, wind_ref, qvis_ref, *,
                           n_chunks, early_exit):
    p = pts_ref[:]
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]
    pp = px * px + py * py + pz * pz

    d2_ref[:] = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    idx_ref[:] = jnp.zeros((TILE_P, 1), jnp.int32)
    qvis_ref[:] = jnp.zeros((TILE_P, 1), jnp.float32)
    wind_ref[:] = jnp.zeros((TILE_P, 1), jnp.float32)

    # Compacted visited-chunk lists (see the host wrapper): iterate exactly
    # the chunks this tile needs via dynamic slices.  A per-chunk scalar
    # branch (`pl.when` over a bit mask) costs ~0.4 us per (tile, chunk)
    # slot even when skipped — at 2k tiles x 20+ chunks that dwarfs the
    # skipped work, and it gets *worse* with finer chunks; dynamic
    # trip-count loops over the compacted lists pay only for visits.
    # With early_exit the list is ordered by ASCENDING AABB lower bound
    # (lb_ref) and the loop stops once the next chunk's lower bound
    # exceeds the tile's running max best distance — exact: lb > d2_best_p
    # for every point p in the tile.  The host-side cull uses the LOOSE
    # nearest-vertex bound; after the nearest chunks are processed the
    # running bound collapses to the true distance, pruning the long tail
    # that hard patches otherwise visit.  Chunk visit ORDER changes, so
    # argmin face ids may differ on exact distance ties (documented
    # argmin-tie freedom); min/d2 itself is order-independent.
    n_d = mask_ref[0, 126]
    n_w = mask_ref[0, 125]

    def _dist_chunk(j):
        c = mask_ref[0, j]
        sl = pl.ds(c * CULL_CHUNK, CULL_CHUNK)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        bx = tri_ref[3:4, sl]
        by = tri_ref[4:5, sl]
        bz = tri_ref[5:6, sl]
        cx = tri_ref[6:7, sl]
        cy = tri_ref[7:8, sl]
        cz = tri_ref[8:9, sl]
        visa = vis_ref[0:1, sl]
        visb = vis_ref[1:2, sl]
        visc = vis_ref[2:3, sl]
        d2_old = d2_ref[:]
        d2_new, idx_new, qv_sel = _distance_chunk_vis_fast(
            px, py, pz, pp, ax, ay, az, bx, by, bz, cx, cy, cz,
            visa, visb, visc, d2_old, idx_ref[:], c * CULL_CHUNK)
        better = d2_new < d2_old
        qvis_ref[:] = jnp.where(better, qv_sel, qvis_ref[:])
        d2_ref[:] = d2_new
        idx_ref[:] = idx_new

    if early_exit:
        def _cond(state):
            j, ub_run = state
            return (j < n_d) & (lb_ref[0, j] <= ub_run)

        def _body(state):
            j, _ = state
            _dist_chunk(j)
            return j + 1, jnp.max(d2_ref[:])

        jax.lax.while_loop(_cond, _body, (0, jnp.float32(jnp.inf)))
    else:
        def _dist(j, carry):
            _dist_chunk(j)
            return carry

        jax.lax.fori_loop(0, n_d, _dist, 0, unroll=False)

    def _wind(j, carry):
        c = mask_ref[0, 64 + j]
        sl = pl.ds(c * CULL_CHUNK, CULL_CHUNK)
        # Crossing test with fully constant-folded per-face rows:
        #   u = q.pv (pv = d x e2), v = q.w2 (w2 = e1 x d),
        #   t = q.n  (n = e1 x e2), q = p - a
        # — no per-pair cross product.  The per-tile scalar s = +-1
        # selects the ray direction +-d: flipping d negates u, v and
        # det, which leaves every det-product unchanged except
        # t*det (and the crossing sign), so -d crossings are the
        # t*det < 0 half-line of the SAME arithmetic.
        s = 1.0 - 2.0 * (mask_ref[0, 127]).astype(jnp.float32)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        pvx = wtri_ref[0:1, sl]
        pvy = wtri_ref[1:2, sl]
        pvz = wtri_ref[2:3, sl]
        w2x = wtri_ref[3:4, sl]
        w2y = wtri_ref[4:5, sl]
        w2z = wtri_ref[5:6, sl]
        nx = wtri_ref[6:7, sl]
        ny = wtri_ref[7:8, sl]
        nz = wtri_ref[8:9, sl]
        det = wtri_ref[9:10, sl]

        qx = px - ax
        qy = py - ay
        qz = pz - az
        u_num = qx * pvx + qy * pvy + qz * pvz
        v_num = qx * w2x + qy * w2y + qz * w2z
        t_num = qx * nx + qy * ny + qz * nz

        hitp = ((u_num * det >= 0) & (v_num * det >= 0)
                & ((u_num + v_num - det) * det <= 0)
                & (s * (t_num * det) > 0))
        sign = jnp.where(det > 0, -s, s)
        wind_ref[:] = wind_ref[:] + jnp.sum(
            jnp.where(hitp, sign, 0.0), axis=1, keepdims=True)
        return carry

    jax.lax.fori_loop(0, n_w, _wind, 0, unroll=False)


def _cull_masks(pts_pad: jnp.ndarray, ub_pad: jnp.ndarray,
                tri_pad_T: jnp.ndarray) -> jnp.ndarray:
    """Per-(tile, chunk) skip bits: bit0 = distance needed, bit1 = winding.

    Args:
      pts_pad: (Np, 3) padded points (edge-replicated padding).
      ub_pad:  (Np,) certified squared-distance upper bounds (pad with 0).
      tri_pad_T: (9, Fp) padded corner layout (padding corners at -1e9).
    Returns:
      (T, C) int32 bit mask, (T,) ray-flip flags, (T, C) f32 distance
      lower bounds (the AABB-AABB gap; drives the in-kernel early exit).
    """
    T = pts_pad.shape[0] // TILE_P
    ptile = pts_pad.reshape(T, TILE_P, 3)
    tmin = ptile.min(1)
    tmax = ptile.max(1)                                       # (T, 3)
    ub_t = ub_pad.reshape(T, TILE_P).max(1)                   # (T,)
    return _cull_masks_from_boxes(tmin, tmax, ub_t, tri_pad_T)


def _cull_masks_from_boxes(tmin, tmax, ub_t, tri_pad_T):
    """Shared tail of :func:`_cull_masks` given per-tile boxes/bounds."""
    C = tri_pad_T.shape[1] // CULL_CHUNK

    corners = tri_pad_T.T.reshape(C, CULL_CHUNK, 3, 3)
    cmin = corners.min((1, 2))                                # (C, 3)
    cmax = corners.max((1, 2))

    # --- distance: AABB-AABB squared distance lower bound ---
    gap = jnp.maximum(0.0, jnp.maximum(cmin[None] - tmax[:, None],
                                       tmin[:, None] - cmax[None]))
    lb = (gap * gap).sum(-1)                                  # (T, C)
    need_d = lb <= ub_t[:, None] * (1.0 + 1e-5) + 1e-12

    # --- winding: does the ray (direction +-_RAY_D) swept from the tile
    # bbox reach the chunk bbox?  Conservative SAT: per-axis half-space
    # tests + the ray axis + the 3 cross axes d x e_k (perpendicular to d,
    # so the sweep leaves their projections unchanged).  Each tile then
    # picks whichever direction leaves fewer chunks (crossings along -d
    # cost nothing extra in the kernel). ---
    tcen = 0.5 * (tmin + tmax)
    text = 0.5 * (tmax - tmin)
    ccen = 0.5 * (cmin + cmax)
    cext = 0.5 * (cmax - cmin)

    def wind_mask(d):
        half = jnp.where(d[None, None] > 0,
                         cmax[None] >= tmin[:, None],
                         cmin[None] <= tmax[:, None]).all(-1)  # (T, C)
        along = ((ccen @ d)[None] + (cext @ jnp.abs(d))[None]
                 >= (tcen @ d)[:, None] - (text @ jnp.abs(d))[:, None])
        axes = jnp.stack([
            jnp.stack([jnp.float32(0.0), d[2], -d[1]]),
            jnp.stack([-d[2], jnp.float32(0.0), d[0]]),
            jnp.stack([d[1], -d[0], jnp.float32(0.0)])], 0)   # (3, 3)
        tproj = tcen @ axes.T                                 # (T, 3)
        trad = text @ jnp.abs(axes).T
        cproj = ccen @ axes.T                                 # (C, 3)
        crad = cext @ jnp.abs(axes).T
        cross_ok = (jnp.abs(tproj[:, None] - cproj[None])
                    <= trad[:, None] + crad[None] + 1e-7).all(-1)
        return half & along & cross_ok

    d = jnp.asarray(_RAY_D, jnp.float32)
    w_pos = wind_mask(d)
    w_neg = wind_mask(-d)
    use_neg = w_neg.sum(-1) < w_pos.sum(-1)                   # (T,)
    need_w = jnp.where(use_neg[:, None], w_neg, w_pos)

    mask = need_d.astype(jnp.int32) | (need_w.astype(jnp.int32) << 1)
    return mask, use_neg.astype(jnp.int32), lb


def _cull_lists(mask, use_neg, lb, n_chunks, far_t):
    """Compacted per-tile chunk lists in a (1, 128)-shaped SMEM block per
    tile: slots [0, n_d) = visited distance-chunk ids, slots
    [64, 64+n_w) = visited winding-chunk ids, slot 126 = n_d, 125 = n_w,
    127 = the tile's ray-direction flag.  The kernels loop with dynamic
    trip counts over exactly these lists.

    With the early-exit loop (``VANERF_CULL_EARLY``, measured LOSER —
    opt-in) the distance list is ordered by ASCENDING AABB lower bound
    and those bounds ship in a parallel (1, 128)-blocked f32 SMEM list,
    so the kernel can stop once the next chunk's bound exceeds the
    tile's running max best distance (exact; only argmin tie-breaking
    can differ from index order).  Measured on v5e-1 (2026-08-20):
    12.46M vs 12.80M ray-samples/s bench — the nearest-vertex host cull
    is already near-optimal for exact queries (the true best distance
    exceeds the nearest-vertex bound by at most the face covering
    radius, so the refined bound prunes almost nothing), and the
    while-loop's per-iteration scalar cond + tile max-reduce serialize
    the chunk pipeline.  Default off; the ascending-index fori_loop
    preserves the dense-mask loop's tie-breaking bit-for-bit.

    Returns (maskf (1, T*128) int32, lbf (1, T*64) f32, early bool).
    """
    early = os.environ.get("VANERF_CULL_EARLY", "0") not in ("", "0")
    assert n_chunks <= 61, "face count beyond the 128-slot list layout"
    T = mask.shape[0]
    iota = jnp.arange(n_chunks, dtype=jnp.int32)[None]
    need_d = (mask & 1).astype(bool)
    need_w = (mask & 2).astype(bool)
    if far_t is not None:
        need_d &= ~far_t[:, None]
    # sort pushes the non-visited sentinel past the count
    if early:
        lb_key = jnp.where(need_d, lb, jnp.inf)
        order = jnp.argsort(lb_key, axis=1)
        dlist = jnp.where(
            jnp.take_along_axis(need_d, order, 1),
            jnp.take_along_axis(
                jnp.broadcast_to(iota, need_d.shape), order, 1),
            n_chunks).astype(jnp.int32)
        dlb = jnp.sort(lb_key, axis=1)                        # (T, C)
        # 128-wide per-tile block: Mosaic SMEM blocks need a 128-divisible
        # (or full-array) minor dim; slots [n_chunks, 128) stay +inf
        lbf = jnp.full((T, 128), jnp.inf, jnp.float32)
        lbf = lbf.at[:, :n_chunks].set(dlb)
        lbf = lbf.reshape(1, -1)                              # (1, T*128)
    else:
        dlist = jnp.sort(jnp.where(need_d, iota, n_chunks), axis=1)
        lbf = jnp.zeros((T, 128), jnp.float32).reshape(1, -1)
    wlist = jnp.sort(jnp.where(need_w, iota, n_chunks), axis=1)
    maskf = jnp.zeros((T, 128), jnp.int32)
    maskf = maskf.at[:, :n_chunks].set(dlist)
    maskf = maskf.at[:, 64:64 + n_chunks].set(wlist)
    maskf = maskf.at[:, 126].set(need_d.sum(1).astype(jnp.int32))
    maskf = maskf.at[:, 125].set(need_w.sum(1).astype(jnp.int32))
    maskf = maskf.at[:, 127].set(use_neg)
    return maskf.reshape(1, -1), lbf, early


def prepare_mesh_ray(triangles: jnp.ndarray, face_vis: jnp.ndarray):
    """Precompute the culled kernel's per-face arrays (transposed corner
    layout, visibility rows, folded crossing constants).

    Hoist this out of per-pass calls: the (9, F) concats/pads are
    layout-hostile (~1 ms each) and identical for every pass over the
    same mesh.
    """
    F = triangles.shape[0]
    pad_f = (-F) % CULL_CHUNK
    tri = triangles.astype(jnp.float32).reshape(F, 9).T
    # -1e9 padding: the padded chunk sits far below everything (distance-
    # culled, behind the all-positive winding ray) and is degenerate
    # (det = 0, vertex-region distance ~1e18) even when not culled.
    tri = jnp.pad(tri, ((0, 0), (0, pad_f)), constant_values=-1e9)
    vis = jnp.pad(face_vis.astype(jnp.float32).T, ((0, 0), (0, pad_f)))
    wtri = _ray_constants_folded(triangles.astype(jnp.float32), pad_f)
    return {"tri9": tri, "vis3": vis, "wtri": wtri}


@functools.partial(jax.jit, static_argnames=("interpret",))
def point_mesh_query_vis_culled(points: jnp.ndarray, triangles: jnp.ndarray,
                                face_vis: jnp.ndarray, ub_d2: jnp.ndarray,
                                interpret: bool = False, prep=None,
                                far_t=None):
    """Culled fused distance + argmin + ray winding + visibility.

    Given a valid upper bound: exact same argmin face / winding /
    visibility as ``point_mesh_query_vis_pallas(..., mode='ray')``;
    distances equal up to fp rounding (different evaluation order in
    ``_distance_chunk_vis_fast``) — do not rely on bitwise d2
    reproducibility across the two kernels.

    Args:
      points: (N, 3); triangles: (F, 3, 3); face_vis: (F, 3);
      ub_d2: (N,) upper bound on the squared point-to-mesh distance
        (e.g. the nearest-vertex squared distance).
      prep: optional output of :func:`prepare_mesh_ray` for these
        triangles/face_vis (skips rebuilding the per-face arrays).
      far_t: optional (N // TILE_P,) bool — the far-field tier (see
        ``cal_vis_sdf_prepared``): tiles marked far visit NO distance
        chunks; their d2 is substituted with ``ub_d2`` (the nearest-
        vertex bound) and their query_vis is 0 (callers supply the
        nearest-vertex visibility instead).  Winding stays exact.
        Requires N % TILE_P == 0.
    Returns:
      sq_dist (N,), face_idx (N,) int32, winding (N,), query_vis (N,).
    """
    N = points.shape[0]
    pad_p = (-N) % TILE_P
    assert far_t is None or pad_p == 0, "far tier needs N % TILE_P == 0"

    pts = jnp.pad(points.astype(jnp.float32), ((0, pad_p), (0, 0)),
                  mode="edge")
    ub = jnp.pad(ub_d2.astype(jnp.float32), (0, pad_p))
    if prep is None:
        prep = prepare_mesh_ray(triangles, face_vis)
    tri, vis, wtri = prep["tri9"], prep["vis3"], prep["wtri"]
    n_chunks = tri.shape[1] // CULL_CHUNK
    grid = (pts.shape[0] // TILE_P,)

    mask, use_neg, lb = _cull_masks(pts, ub, tri)             # (T,C) x2,(T,)
    maskf, lbf, early = _cull_lists(mask, use_neg, lb, n_chunks, far_t)

    out_specs = [pl.BlockSpec((TILE_P, 1), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)] * 4
    out_shape = [
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.int32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
        jax.ShapeDtypeStruct((pts.shape[0], 1), jnp.float32),
    ]

    def fspec(rows):
        return pl.BlockSpec((rows, tri.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_vis_ray_culled, n_chunks=n_chunks,
                               early_exit=early)
    d2, idx, wind, qvis = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((TILE_P, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            fspec(9), fspec(3), fspec(10)],
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
    )(maskf, lbf, pts, tri, vis, wtri)
    d2o = d2[:N, 0]
    if far_t is not None:
        # far tiles visited no distance chunks (d2 = inf): substitute the
        # certified nearest-vertex bound
        d2o = jnp.where(jnp.repeat(far_t, TILE_P), ub[:N], d2o)
    return d2o, idx[:N, 0], wind[:N, 0], qvis[:N, 0]


# ---------------------------------------------------------------------------
# transposed-I/O culled variant: points ride the 128-lane axis end to end
# ---------------------------------------------------------------------------
#
# A (N, 3) f32 array tiles as T(8,128) on TPU — the 3-wide minor dim pads
# to 128 lanes (42x HBM blowup), and each (N, 1) output pads the same way
# (128x); the producer/consumer fusions around the kernel then move
# ~134 MB per tensor where 1-3 MB suffice.  This variant takes (3, N)
# points and writes (1, N) packed outputs; boundary transposes inside the
# kernel (a few vregs per tile) feed the UNCHANGED chunk math, so results
# are bit-identical to ``point_mesh_query_vis_culled``.


def _kernel_vis_ray_culled_T(mask_ref, lb_ref, pts_ref, tri_ref, vis_ref,
                             wtri_ref, d2_ref, idx_ref, wind_ref, qvis_ref,
                             *, n_chunks, early_exit):
    p = jnp.transpose(pts_ref[:], (1, 0))     # (3, TILE_P) -> (TILE_P, 3)
    px = p[:, 0:1]
    py = p[:, 1:2]
    pz = p[:, 2:3]
    pp = px * px + py * py + pz * pz

    # running state as fori_loop carries (registers), transposed into the
    # (1, TILE_P) output rows once at the end
    d2_0 = jnp.full((TILE_P, 1), jnp.inf, jnp.float32)
    idx_0 = jnp.zeros((TILE_P, 1), jnp.int32)
    qvis_0 = jnp.zeros((TILE_P, 1), jnp.float32)
    wind_0 = jnp.zeros((TILE_P, 1), jnp.float32)

    n_d = mask_ref[0, 126]
    n_w = mask_ref[0, 125]

    def _dist_chunk(j, d2_old, idx_old, qv_old):
        c = mask_ref[0, j]
        sl = pl.ds(c * CULL_CHUNK, CULL_CHUNK)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        bx = tri_ref[3:4, sl]
        by = tri_ref[4:5, sl]
        bz = tri_ref[5:6, sl]
        cx = tri_ref[6:7, sl]
        cy = tri_ref[7:8, sl]
        cz = tri_ref[8:9, sl]
        visa = vis_ref[0:1, sl]
        visb = vis_ref[1:2, sl]
        visc = vis_ref[2:3, sl]
        d2_new, idx_new, qv_sel = _distance_chunk_vis_fast(
            px, py, pz, pp, ax, ay, az, bx, by, bz, cx, cy, cz,
            visa, visb, visc, d2_old, idx_old, c * CULL_CHUNK)
        better = d2_new < d2_old
        return (d2_new, idx_new, jnp.where(better, qv_sel, qv_old))

    if early_exit:
        def _cond(state):
            j, ub_run, _c = state
            return (j < n_d) & (lb_ref[0, j] <= ub_run)

        def _body(state):
            j, _, carry = state
            new = _dist_chunk(j, *carry)
            return j + 1, jnp.max(new[0]), new

        _, _, (d2_f, idx_f, qvis_f) = jax.lax.while_loop(
            _cond, _body, (0, jnp.float32(jnp.inf), (d2_0, idx_0, qvis_0)))
    else:
        def _dist(j, carry):
            return _dist_chunk(j, *carry)

        d2_f, idx_f, qvis_f = jax.lax.fori_loop(
            0, n_d, _dist, (d2_0, idx_0, qvis_0), unroll=False)

    def _wind(j, wind_c):
        c = mask_ref[0, 64 + j]
        sl = pl.ds(c * CULL_CHUNK, CULL_CHUNK)
        # same constant-folded crossing test as _kernel_vis_ray_culled
        s = 1.0 - 2.0 * (mask_ref[0, 127]).astype(jnp.float32)
        ax = tri_ref[0:1, sl]
        ay = tri_ref[1:2, sl]
        az = tri_ref[2:3, sl]
        pvx = wtri_ref[0:1, sl]
        pvy = wtri_ref[1:2, sl]
        pvz = wtri_ref[2:3, sl]
        w2x = wtri_ref[3:4, sl]
        w2y = wtri_ref[4:5, sl]
        w2z = wtri_ref[5:6, sl]
        nx = wtri_ref[6:7, sl]
        ny = wtri_ref[7:8, sl]
        nz = wtri_ref[8:9, sl]
        det = wtri_ref[9:10, sl]

        qx = px - ax
        qy = py - ay
        qz = pz - az
        u_num = qx * pvx + qy * pvy + qz * pvz
        v_num = qx * w2x + qy * w2y + qz * w2z
        t_num = qx * nx + qy * ny + qz * nz

        hitp = ((u_num * det >= 0) & (v_num * det >= 0)
                & ((u_num + v_num - det) * det <= 0)
                & (s * (t_num * det) > 0))
        sign = jnp.where(det > 0, -s, s)
        return wind_c + jnp.sum(jnp.where(hitp, sign, 0.0), axis=1,
                                keepdims=True)

    wind_f = jax.lax.fori_loop(0, n_w, _wind, wind_0, unroll=False)

    d2_ref[:] = jnp.transpose(d2_f, (1, 0))
    idx_ref[:] = jnp.transpose(idx_f, (1, 0))
    qvis_ref[:] = jnp.transpose(qvis_f, (1, 0))
    wind_ref[:] = jnp.transpose(wind_f, (1, 0))


@functools.partial(jax.jit, static_argnames=("interpret",))
def point_mesh_query_vis_culled_T(points_T: jnp.ndarray,
                                  triangles: jnp.ndarray,
                                  face_vis: jnp.ndarray, ub_d2: jnp.ndarray,
                                  interpret: bool = False, prep=None,
                                  far_t=None):
    """Transposed-I/O :func:`point_mesh_query_vis_culled` (bit-identical).

    Args:
      points_T: (3, N) query coordinates (packed TPU layout);
      triangles/face_vis/ub_d2/prep/far_t: as the untransposed kernel.
    Returns:
      sq_dist (N,), face_idx (N,) int32, winding (N,), query_vis (N,).
    """
    N = points_T.shape[1]
    pad_p = (-N) % TILE_P
    assert far_t is None or pad_p == 0, "far tier needs N % TILE_P == 0"

    pts = jnp.pad(points_T.astype(jnp.float32), ((0, 0), (0, pad_p)),
                  mode="edge")
    ub = jnp.pad(ub_d2.astype(jnp.float32), (0, pad_p))
    if prep is None:
        prep = prepare_mesh_ray(triangles, face_vis)
    tri, vis, wtri = prep["tri9"], prep["vis3"], prep["wtri"]
    n_chunks = tri.shape[1] // CULL_CHUNK
    np_ = pts.shape[1]
    grid = (np_ // TILE_P,)

    # tile boxes straight from the packed (3, Np) layout — transposing back
    # to (Np, 3) here would re-materialize the padded layout this variant
    # exists to avoid
    T = np_ // TILE_P
    ptile = pts.reshape(3, T, TILE_P)
    tmin = jnp.transpose(ptile.min(2), (1, 0))                # (T, 3)
    tmax = jnp.transpose(ptile.max(2), (1, 0))
    ub_t = ub.reshape(T, TILE_P).max(1)
    mask, use_neg, lb = _cull_masks_from_boxes(tmin, tmax, ub_t, tri)
    maskf, lbf, early = _cull_lists(mask, use_neg, lb, n_chunks, far_t)

    out_specs = [pl.BlockSpec((1, TILE_P), lambda i: (0, i),
                              memory_space=pltpu.VMEM)] * 4
    out_shape = [
        jax.ShapeDtypeStruct((1, np_), jnp.float32),
        jax.ShapeDtypeStruct((1, np_), jnp.int32),
        jax.ShapeDtypeStruct((1, np_), jnp.float32),
        jax.ShapeDtypeStruct((1, np_), jnp.float32),
    ]

    def fspec(rows):
        return pl.BlockSpec((rows, tri.shape[1]), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(_kernel_vis_ray_culled_T, n_chunks=n_chunks,
                               early_exit=early)
    d2, idx, wind, qvis = pl.pallas_call(
        kernel, grid=grid,
        in_specs=[
            pl.BlockSpec((1, 128), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 128), lambda i: (0, i),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((3, TILE_P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            fspec(9), fspec(3), fspec(10)],
        out_specs=out_specs, out_shape=out_shape, interpret=interpret,
    )(maskf, lbf, pts, tri, vis, wtri)
    d2o = d2[0, :N]
    if far_t is not None:
        d2o = jnp.where(jnp.repeat(far_t, TILE_P), ub[:N], d2o)
    return d2o, idx[0, :N], wind[0, :N], qvis[0, :N]
