"""Voxel grid ops: vertex-feature scatter + trilinear volume sampling.

TPU-native replacement for the reference's spconv sparse tensors
(``src/networks.py:396-533``): hand meshes occupy small grids (bbox/5mm,
32-aligned, <= ~128^3), so a dense NDHWC volume + XLA scatter/gather beats
sparse gather-scatter kernels on TPU and keeps shapes static.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def scatter_to_grid(feat: jnp.ndarray, coord: jnp.ndarray,
                    grid_shape) -> jnp.ndarray:
    """Scatter per-vertex features into a dense (D, H, W, C) volume.

    Args:
      feat: (V, C); coord: (V, 3) int32 [d, h, w] voxel indices.
      grid_shape: static (D, H, W).
    Returns:
      (D, H, W, C) with colliding vertices averaged.
    """
    D, H, W = grid_shape
    c = jnp.clip(coord, 0, jnp.asarray([D - 1, H - 1, W - 1]))
    flat = (c[:, 0] * H + c[:, 1]) * W + c[:, 2]
    vol = jnp.zeros((D * H * W, feat.shape[-1]), feat.dtype)
    cnt = jnp.zeros((D * H * W, 1), feat.dtype)
    vol = vol.at[flat].add(feat)
    cnt = cnt.at[flat].add(1.0)
    vol = vol / jnp.maximum(cnt, 1.0)
    return vol.reshape(D, H, W, -1)


def grid_sample_3d(vol: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sampling of a (D, H, W, C) volume at normalized points.

    Args:
      vol: (D, H, W, C).
      pts: (N, 3) in [-1, 1], ordered (w, h, d) like torch grid_sample's
        (x, y, z) convention (networks.py:496-527), zeros padding,
        align_corners=True.
    Returns:
      (N, C).
    """
    D, H, W, C = vol.shape
    x = (pts[:, 0] + 1.0) * 0.5 * (W - 1.0)
    y = (pts[:, 1] + 1.0) * 0.5 * (H - 1.0)
    z = (pts[:, 2] + 1.0) * 0.5 * (D - 1.0)

    def axis(v, n):
        v0 = jnp.floor(v)
        w1 = v - v0
        i0 = jnp.clip(v0, 0, n - 1).astype(jnp.int32)
        i1 = jnp.clip(v0 + 1, 0, n - 1).astype(jnp.int32)
        inb = (v >= -0.5) & (v <= n - 0.5)
        return i0, i1, w1, inb

    x0, x1, wx, bx = axis(x, W)
    y0, y1, wy, by = axis(y, H)
    z0, z1, wz, bz = axis(z, D)
    inb = (bx & by & bz)[:, None].astype(vol.dtype)

    flat = vol.reshape(-1, C)

    def g(zi, yi, xi):
        return jnp.take(flat, (zi * H + yi) * W + xi, axis=0)

    wx = wx[:, None]
    wy = wy[:, None]
    wz = wz[:, None]
    c00 = g(z0, y0, x0) * (1 - wx) + g(z0, y0, x1) * wx
    c01 = g(z0, y1, x0) * (1 - wx) + g(z0, y1, x1) * wx
    c10 = g(z1, y0, x0) * (1 - wx) + g(z1, y0, x1) * wx
    c11 = g(z1, y1, x0) * (1 - wx) + g(z1, y1, x1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return (c0 * (1 - wz) + c1 * wz) * inb


def world_to_grid_coords(pts: jnp.ndarray, bounds: jnp.ndarray,
                         out_sh) -> jnp.ndarray:
    """World points -> [-1, 1] (w, h, d)-ordered grid coords
    (networks.py:396-407 ``get_grid_coords``), voxel size 5mm."""
    dhw = pts[..., ::-1]                                  # xyz -> zyx
    min_dhw = bounds[0, ::-1]
    dhw = (dhw - min_dhw) / 0.005
    out = jnp.asarray(out_sh, pts.dtype)
    dhw = dhw / out * 2.0 - 1.0
    return dhw[..., ::-1]                                 # back to whd order
