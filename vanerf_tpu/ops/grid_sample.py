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


# ---------------------------------------------------------------------------
# two-resolution fused sampling: one row gather serves two maps
# ---------------------------------------------------------------------------
#
# TPU gathers are row-count bound (docs/perf.md), so sampling a COARSE
# map (e.g. the 64^2 feat_tex) costs a full 262k-row gather even though
# its table is tiny.  When a FINE map (e.g. the 128^2 geo half map) is
# sampled at the same query points, the coarse gather can ride the fine
# one: each fine row (y0, x0) additionally stores the coarse map's 3x3
# neighborhood anchored at base = floor((y0, x0) * r), r = (Hc-1)/(Hf-1).
# Because r <= 1, the coarse bilinear cell of any query that lands in
# fine cell (y0, x0) starts at base + {0, 1} per axis, so the four
# coarse corners are always inside that 3x3 block — two 2-way selects
# per axis recover them exactly.  Values match the standalone
# grid_sample_2d on the coarse map bit-for-bit in f32 except when a
# query sits within ~1 ulp of a coarse cell boundary (the independently
# rounded coarse coordinate may pick the neighboring corner set there;
# the affected corner's weight is ~0, so the value error is ~1 ulp).


def _coarse_base(fine_idx: jnp.ndarray, n_fine: int, n_coarse: int):
    """floor(fine_idx * r) with the EXACT arithmetic used at pack time
    (same f32 expression -> bitwise-identical rounding)."""
    r = jnp.float32((n_coarse - 1.0) / (n_fine - 1.0))
    return jnp.floor(fine_idx.astype(jnp.float32) * r)


def pack_two_res(fine: jnp.ndarray, coarse: jnp.ndarray) -> jnp.ndarray:
    """(Hf, Wf, 4*Cf + 9*Cc) fused table: fine 2x2 corner pack + the
    coarse 3x3 neighborhood at each fine row's anchor (edge-replicated).
    A cheap map-sized build that XLA CSEs across render passes."""
    Hf, Wf, _ = fine.shape
    Hc, Wc, _ = coarse.shape
    fine_p = pack_corners(fine)
    by = _coarse_base(jnp.arange(Hf), Hf, Hc).astype(jnp.int32)   # (Hf,)
    bx = _coarse_base(jnp.arange(Wf), Wf, Wc).astype(jnp.int32)
    blocks = []
    for a in range(3):
        ya = jnp.clip(by + a, 0, Hc - 1)
        rows_a = jnp.take(coarse, ya, axis=0)                 # (Hf, Wc, Cc)
        for b in range(3):
            xb = jnp.clip(bx + b, 0, Wc - 1)
            blocks.append(jnp.take(rows_a, xb, axis=1))       # (Hf, Wf, Cc)
    return jnp.concatenate([fine_p] + blocks, axis=-1)


def grid_sample_two_res(fine: jnp.ndarray, coarse: jnp.ndarray,
                        uv: jnp.ndarray):
    """Bilinear-sample a fine and a coarse map with ONE row gather.

    Args:
      fine:   (Hf, Wf, Cf) channels-last map.
      coarse: (Hc, Wc, Cc) with Hc <= Hf and Wc <= Wf.
      uv: (N, 2) in [-1, 1] (same convention as :func:`grid_sample_2d`).
    Returns:
      (fine_xy (N, Cf), coarse_xy (N, Cc)) — each equal to
      ``grid_sample_2d(map, uv)`` (see the ulp note above).
    """
    Hf, Wf, Cf = fine.shape
    Hc, Wc, Cc = coarse.shape
    # degenerate 1-wide/1-tall fine maps make _coarse_base divide by zero,
    # and a coarse/fine dtype mismatch would silently promote through the
    # packed concatenate, changing fine-path rounding vs grid_sample_2d.
    assert Hf > 1 and Wf > 1, (Hf, Wf)
    if coarse.dtype != fine.dtype:
        coarse = coarse.astype(fine.dtype)

    x = jnp.clip((uv[:, 0] + 1.0) * 0.5 * (Wf - 1.0), 0.0, Wf - 1.0)
    y = jnp.clip((uv[:, 1] + 1.0) * 0.5 * (Hf - 1.0), 0.0, Hf - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, Wf - 1)
    y0 = jnp.clip(jnp.floor(y), 0, Hf - 1)
    wx = x - x0
    wy = y - y0

    table = pack_two_res(fine, coarse).reshape(Hf * Wf, 4 * Cf + 9 * Cc)
    idx = y0.astype(jnp.int32) * Wf + x0.astype(jnp.int32)
    g = table.at[idx].get(mode="promise_in_bounds")

    dt = fine.dtype
    f00, f01 = g[:, :Cf], g[:, Cf:2 * Cf]
    f10, f11 = g[:, 2 * Cf:3 * Cf], g[:, 3 * Cf:4 * Cf]
    wxf = wx[:, None].astype(dt)
    wyf = wy[:, None].astype(dt)
    fine_xy = ((f00 * (1 - wxf) + f01 * wxf) * (1 - wyf)
               + (f10 * (1 - wxf) + f11 * wxf) * wyf)

    # coarse corner coordinates, rounded exactly like grid_sample_2d
    xc = jnp.clip((uv[:, 0] + 1.0) * 0.5 * (Wc - 1.0), 0.0, Wc - 1.0)
    yc = jnp.clip((uv[:, 1] + 1.0) * 0.5 * (Hc - 1.0), 0.0, Hc - 1.0)
    xc0 = jnp.clip(jnp.floor(xc), 0, Wc - 1)
    yc0 = jnp.clip(jnp.floor(yc), 0, Hc - 1)
    wxc = (xc - xc0)[:, None].astype(dt)
    wyc = (yc - yc0)[:, None].astype(dt)

    # INVARIANT: xc0 - floor(x0 * r) is in {0, 1} for r <= 1 because both
    # sides use the same f32 rounding expression (_coarse_base); the clip
    # only guards the impossible diff-of-2 case, where it would pick a
    # wrong corner whose bilinear weight is O(1) — hence the assert-grade
    # comment rather than silent tolerance.  No production shape
    # (r = 63/127, 1) can violate it (tested exhaustively per row in
    # tests/test_ops_core.py two-res coverage).
    dx = jnp.clip(xc0 - _coarse_base(x0, Wf, Wc), 0.0, 1.0) > 0.5
    dy = jnp.clip(yc0 - _coarse_base(y0, Hf, Hc), 0.0, 1.0) > 0.5
    dxn = dx[:, None]
    dyn = dy[:, None]

    def blk(a, b):
        o = 4 * Cf + (a * 3 + b) * Cc
        return g[:, o:o + Cc]

    # rows a = dy + {0, 1}, then columns b = dx + {0, 1}: 2-way selects
    c00 = jnp.where(dxn, jnp.where(dyn, blk(1, 1), blk(0, 1)),
                    jnp.where(dyn, blk(1, 0), blk(0, 0)))
    c01 = jnp.where(dxn, jnp.where(dyn, blk(1, 2), blk(0, 2)),
                    jnp.where(dyn, blk(1, 1), blk(0, 1)))
    c10 = jnp.where(dxn, jnp.where(dyn, blk(2, 1), blk(1, 1)),
                    jnp.where(dyn, blk(2, 0), blk(1, 0)))
    c11 = jnp.where(dxn, jnp.where(dyn, blk(2, 2), blk(1, 2)),
                    jnp.where(dyn, blk(2, 1), blk(1, 1)))
    coarse_xy = ((c00 * (1 - wxc) + c01 * wxc) * (1 - wyc)
                 + (c10 * (1 - wxc) + c11 * wxc) * wyc)
    return fine_xy, coarse_xy


def feat_sample_two_res_nhwc(fine: jnp.ndarray, coarse: jnp.ndarray,
                             uv: jnp.ndarray):
    """Batched :func:`grid_sample_two_res`.

    Args:
      fine: (B, Hf, Wf, Cf); coarse: (B, Hc, Wc, Cc); uv: (B, N, 2).
    Returns:
      (B, N, Cf), (B, N, Cc)
    """
    # Unroll the (small, static) batch dim like feat_sample_nhwc's onehot
    # branch: batched (vmapped) row gathers lower to a slower TPU path
    # than B independent gathers (tools/gather_width_probe.py).
    B = fine.shape[0]
    outs = [grid_sample_two_res(fine[b], coarse[b], uv[b]) for b in range(B)]
    return (jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]))
