"""Bilinear feature sampling (the hot gather primitive).

TPU-native replacement for ``F.grid_sample`` as used by the reference's
``feat_sample`` (``src/utils.py:136-151``): mode='bilinear',
padding_mode='border', align_corners=True.

Implemented as gather + lerp in pure XLA.  The four corner gathers lower to
`dynamic-gather`s that XLA fuses with the lerp arithmetic; on TPU this beats
any scalar loop and keeps static shapes.  Channels-last layout internally so
the gathered innermost dim is the (large) channel dim, which vectorizes on
the 128-lane VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pack_corners(feat: jnp.ndarray) -> jnp.ndarray:
    """Pack a map's 2x2 neighborhoods into channels: (H, W, 4C).

    packed[y, x] = [f(y,x), f(y,x+1), f(y+1,x), f(y+1,x+1)] with edge
    replication — so one row gather at (y0, x0) fetches all four bilinear
    corners.  TPU gathers are row-count bound (a 262k-row gather costs the
    same at 4 or 73 channels), so 4 corner gathers collapse into 1 for free;
    the pack itself is a cheap fused map-sized copy that XLA CSEs across the
    coarse and fine passes.
    """
    sx = jnp.concatenate([feat[:, 1:], feat[:, -1:]], axis=1)
    sy = jnp.concatenate([feat[1:], feat[-1:]], axis=0)
    sxy = jnp.concatenate([sx[1:], sx[-1:]], axis=0)
    return jnp.concatenate([feat, sx, sy, sxy], axis=-1)


def grid_sample_2d(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample a channels-last feature map at normalized coords `uv`.

    Args:
      feat: (H, W, C) feature map (channels-last, the TPU-native layout).
      uv:   (N, 2) in [-1, 1]; uv[...,0] is x (width), uv[...,1] is y.
    Returns:
      (N, C) sampled features (border padding, align_corners=True).
    """
    H, W, C = feat.shape
    x = (uv[:, 0] + 1.0) * 0.5 * (W - 1.0)
    y = (uv[:, 1] + 1.0) * 0.5 * (H - 1.0)
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)

    x0 = jnp.clip(jnp.floor(x), 0, W - 1)
    y0 = jnp.clip(jnp.floor(y), 0, H - 1)
    wx = x - x0
    wy = y - y0

    packed = pack_corners(feat).reshape(H * W, 4 * C)
    idx = y0.astype(jnp.int32) * W + x0.astype(jnp.int32)
    # idx is in-bounds by construction (x0/y0 clipped above); the promise
    # removes jnp.take's out-of-bounds fill select — a full-row
    # (N, 4C) select fusion worth ~0.4 ms per 262k-row gather on v5e.
    from .onehot_gather import onehot_scatter_enabled, take_rows
    if onehot_scatter_enabled(H * W, idx.shape[0]):
        # same forward gather; the table-grad scatter-add of the backward
        # pass runs as an MXU one-hot matmul (see ops/onehot_gather.py).
        # Callers must NOT vmap into this branch — feat_sample_nhwc
        # unrolls the batch dim instead.
        g = take_rows(packed, idx)                          # (N, 4C)
    else:
        g = packed.at[idx].get(mode="promise_in_bounds")    # (N, 4C)
    f00, f01, f10, f11 = g[:, :C], g[:, C:2 * C], g[:, 2 * C:3 * C], g[:, 3 * C:]
    # keep the lerp in the map's dtype: with bf16 feature maps the gather
    # and arithmetic stay bf16 (half the HBM traffic) instead of promoting
    # to the f32 coordinate dtype.
    wx = wx[:, None].astype(feat.dtype)
    wy = wy[:, None].astype(feat.dtype)
    top = f00 * (1 - wx) + f01 * wx
    bot = f10 * (1 - wx) + f11 * wx
    return top * (1 - wy) + bot * wy


def feat_sample_nhwc(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear sampling on channels-last maps (internal layout).

    Args:
      feat: (B, H, W, C)
      uv:   (B, N, 2) in [-1, 1]
    Returns:
      (B, N, C)
    """
    from .onehot_gather import onehot_scatter_enabled
    B, H, W, _ = feat.shape
    if onehot_scatter_enabled(H * W, uv.shape[1]):
        # Unroll the (small, static) batch dim: the one-hot scatter VJP
        # kernel accumulates across its own grid and must not be vmapped.
        return jnp.stack([grid_sample_2d(feat[b], uv[b]) for b in range(B)])
    return jax.vmap(grid_sample_2d)(feat, uv)


def feat_sample(feat: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Batched bilinear sampling, signature-parity with ``utils.py:136``.

    Args:
      feat: (B, C, H, W)
      uv:   (B, N, 2) in [-1, 1]
    Returns:
      (B, N, C)
    """
    return feat_sample_nhwc(jnp.transpose(feat, (0, 2, 3, 1)), uv)
