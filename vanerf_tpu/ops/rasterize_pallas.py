"""Pallas TPU kernel for z-buffer rasterization.

Pixel-tile x face-chunk edge-function test with a running (z-min, face)
reduction — same kernel shape as the mesh-query kernel, so faces live in
VMEM for the whole pass.  The winning face's barycentrics are recomputed
afterwards in plain XLA (one face per pixel — negligible).

No atomics: the per-pixel argmin over faces IS the depth test, which is why
a brute-force data-parallel rasterizer maps so cleanly onto the VPU while
GPU rasterizers need z-buffer atomics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_PX = 256
FACE_CHUNK = 512


def _kernel(tri_ref, face_ref, z_ref, *, n_chunks, W):
    i = pl.program_id(0)
    flat = i * TILE_PX + jax.lax.broadcasted_iota(
        jnp.int32, (TILE_PX, 1), 0)
    px = (flat % W).astype(jnp.float32)
    py = (flat // W).astype(jnp.float32)

    zbest = jnp.full((TILE_PX, 1), jnp.inf, jnp.float32)
    fbest = jnp.full((TILE_PX, 1), -1, jnp.int32)

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

        area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)   # (1, CHUNK)
        w0 = (cx - bx) * (py - by) - (cy - by) * (px - bx)     # (TILE, CHUNK)
        w1 = (ax - cx) * (py - cy) - (ay - cy) * (px - cx)
        w2 = (bx - ax) * (py - ay) - (by - ay) * (px - ax)
        denom = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        b0 = w0 / denom
        b1 = w1 / denom
        b2 = w2 / denom
        inside = ((b0 >= 0) & (b1 >= 0) & (b2 >= 0)
                  & (jnp.abs(area) >= 1e-12))
        zi = b0 * az + b1 * bz + b2 * cz
        zi = jnp.where(inside, zi, jnp.inf)

        cmin = jnp.min(zi, axis=1, keepdims=True)
        carg = jnp.argmin(zi, axis=1).astype(jnp.int32)[:, None] \
            + c * FACE_CHUNK
        better = cmin < zbest
        zbest = jnp.where(better, cmin, zbest)
        fbest = jnp.where(better, carg, fbest)

    face_ref[:] = fbest
    z_ref[:] = zbest


@functools.partial(jax.jit, static_argnames=("H", "W", "interpret"))
def rasterize_zbuffer_pallas(verts_xy: jnp.ndarray, verts_z: jnp.ndarray,
                             faces: jnp.ndarray, H: int, W: int,
                             interpret: bool = False):
    """Pallas z-buffer rasterization; same contract as
    :func:`vanerf_tpu.ops.rasterize.rasterize_zbuffer`.

    Returns pix_to_face (H*W,) int32 (-1 bg), bary (H*W, 3), zbuf (H*W,).
    """
    F = faces.shape[0]
    tri = verts_xy[faces]                             # (F, 3, 2)
    tz = verts_z.reshape(-1)[faces]                   # (F, 3)
    packed = jnp.stack([
        tri[:, 0, 0], tri[:, 0, 1], tz[:, 0],
        tri[:, 1, 0], tri[:, 1, 1], tz[:, 1],
        tri[:, 2, 0], tri[:, 2, 1], tz[:, 2]], 0)     # (9, F)
    pad_f = (-F) % FACE_CHUNK
    packed = jnp.pad(packed, ((0, 0), (0, pad_f)), constant_values=-1e9)

    n = H * W
    pad_p = (-n) % TILE_PX
    n_pad = n + pad_p
    n_chunks = packed.shape[1] // FACE_CHUNK

    kernel = functools.partial(_kernel, n_chunks=n_chunks, W=W)
    face, zbuf = pl.pallas_call(
        kernel,
        grid=(n_pad // TILE_PX,),
        in_specs=[pl.BlockSpec((9, packed.shape[1]), lambda i: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((TILE_PX, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_PX, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
        ],
        interpret=interpret,
    )(packed)
    face = face[:n, 0]
    zbuf = zbuf[:n, 0]

    # barycentrics of the winning face only (XLA, one face per pixel)
    safe = jnp.maximum(face, 0)
    t = tri[safe]                                     # (HW, 3, 2)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=verts_xy.dtype),
                          jnp.arange(W, dtype=verts_xy.dtype), indexing="ij")
    p = jnp.stack([xs.reshape(-1), ys.reshape(-1)], -1)

    def edge(o, d, q):
        return ((q[..., 0] - o[..., 0]) * (d[..., 1] - o[..., 1])
                - (q[..., 1] - o[..., 1]) * (d[..., 0] - o[..., 0]))

    a, b, c = t[:, 0], t[:, 1], t[:, 2]
    area = edge(a, b, c)
    denom = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    bary = jnp.stack([edge(b, c, p) / denom, edge(c, a, p) / denom,
                      edge(a, b, p) / denom], -1)
    hit = face >= 0
    bary = jnp.where(hit[:, None], bary, 0.0)
    zbuf = jnp.where(hit, zbuf, jnp.inf)
    return face, bary, zbuf
