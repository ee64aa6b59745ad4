"""Convolutional encoders in Flax (channels-last / NHWC — the TPU layout).

Capability parity targets (architectures re-designed, not translated):
  * ``ConvBlock``       — reference ``src/utils.py:549-607``
  * ``HourGlass``       — reference ``src/utils.py:393-442``
  * ``HGFilter``        — reference ``HGFilterV2`` ``src/utils.py:455-547``
  * ``ResBlkEncoder``   — reference ``src/utils.py:331-391``

Norms: 'group' -> GroupNorm(min(32, C)); 'instance' -> per-sample,
per-channel norm without affine (torch InstanceNorm2d default).  BatchNorm is
intentionally not offered: cross-replica BN is the one thing the reference
needs SyncBatchNorm for (``model.py:637``); GroupNorm is batch-independent so
the data-parallel path needs no stat synchronization at all (the shipped
configs already run the geo encoder with GroupNorm).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def group_norm(ch: int):
    return nn.GroupNorm(num_groups=min(32, ch), epsilon=1e-5)


def instance_norm():
    # InstanceNorm = GroupNorm with one channel per group, no affine.
    return nn.GroupNorm(group_size=1, num_groups=None, epsilon=1e-5,
                        use_bias=False, use_scale=False)


def get_norm(norm: str, ch: int):
    if norm == "group":
        return group_norm(ch)
    if norm == "instance":
        return instance_norm()
    if norm in (None, "none"):
        return lambda x: x
    raise NotImplementedError(f"norm {norm}")


def avg_pool2(x):
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def rep_pad(x, p: int):
    """Replication padding on H, W of an NHWC tensor."""
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="edge")


def _cubic_kernel(s, a=-0.75):
    s = abs(s)
    if s <= 1:
        return (a + 2) * s ** 3 - (a + 3) * s ** 2 + 1
    if s < 2:
        return a * s ** 3 - 5 * a * s ** 2 + 8 * a * s - 4 * a
    return 0.0


import functools


@functools.lru_cache(maxsize=32)
def _bicubic_matrix_np(n_in: int, n_out: int):
    """(n_out, n_in) align-corners cubic interpolation matrix (torch
    ``interpolate(mode='bicubic', align_corners=True)`` semantics, kernel
    a=-0.75, replicate borders).  Static — the upsample becomes two small
    matmuls on the MXU instead of a gather."""
    import numpy as _np
    m = _np.zeros((n_out, n_in), _np.float32)
    scale = (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    for o in range(n_out):
        x = o * scale
        x0 = int(_np.floor(x))
        for k in range(-1, 3):
            idx = min(max(x0 + k, 0), n_in - 1)
            m[o, idx] += _cubic_kernel(x - (x0 + k))
    return m  # numpy — converted at the call site (cache must not hold tracers)


def upsample2_bicubic(x):
    """2x bicubic upsampling with align_corners=True (torch parity for
    ``thf.interpolate(..., mode='bicubic', align_corners=True)`` in the
    reference HourGlass, utils.py:436).  Matches torch's 1D kernel exactly;
    torch's 2D CPU kernel deviates from the exact separable form by ~0.3%
    — this implementation is the mathematically-exact one."""
    B, H, W, C = x.shape
    mh = jnp.asarray(_bicubic_matrix_np(H, 2 * H))
    mw = jnp.asarray(_bicubic_matrix_np(W, 2 * W))
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


class ConvBlock(nn.Module):
    """Pre-activation multi-scale residual block (utils.py:549-607)."""
    in_ch: int
    out_ch: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        c2, c4 = self.out_ch // 2, self.out_ch // 4

        def conv3(ch):
            return nn.Conv(ch, (3, 3), padding=1, use_bias=False)

        out1 = conv3(c2)(nn.relu(get_norm(self.norm, self.in_ch)(x)))
        out2 = conv3(c4)(nn.relu(get_norm(self.norm, c2)(out1)))
        out3 = conv3(c4)(nn.relu(get_norm(self.norm, c4)(out2)))
        out = jnp.concatenate([out1, out2, out3], -1)

        if self.in_ch != self.out_ch:
            res = nn.Conv(self.out_ch, (1, 1), use_bias=False)(
                nn.relu(get_norm(self.norm, self.in_ch)(x)))
        else:
            res = x
        return out + res


class HourGlass(nn.Module):
    """Recursive encoder-decoder at constant width (utils.py:393-442)."""
    depth: int
    features: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        def level(lv, inp):
            up1 = ConvBlock(self.features, self.features, self.norm,
                            name=f"b1_{lv}")(inp)
            low1 = ConvBlock(self.features, self.features, self.norm,
                             name=f"b2_{lv}")(avg_pool2(inp))
            if lv > 1:
                low2 = level(lv - 1, low1)
            else:
                low2 = ConvBlock(self.features, self.features, self.norm,
                                 name=f"b2_plus_{lv}")(low1)
            low3 = ConvBlock(self.features, self.features, self.norm,
                             name=f"b3_{lv}")(low2)
            return up1 + upsample2_bicubic(low3)

        return level(self.depth, x)


def conv_transpose_torch(x, out_ch: int, name: str, use_bias: bool = True):
    """stride-2 k=3 transposed conv with torch alignment
    (ConvTranspose2d(k=3, s=2, p=1, output_padding=1) -> exactly 2x size;
    explicit ((1,2),(1,2)) padding + transpose_kernel so reference weights
    convert verbatim)."""
    return nn.ConvTranspose(
        out_ch, (3, 3), strides=(2, 2), padding=((1, 2), (1, 2)),
        transpose_kernel=True, use_bias=use_bias, name=name)(x)


class DeconvReLUGroup(nn.Module):
    """stride-2 transposed conv + GroupNorm + ReLU (utils.py:444-453)."""
    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = conv_transpose_torch(x, self.out_ch, "deconv", use_bias=False)
        return nn.relu(group_norm(self.out_ch)(x))


class HGFilter(nn.Module):
    """Stacked-hourglass geometry encoder (HGFilterV2, utils.py:455-547).

    Returns [coarse (B, H/8, W/8, out_ch), fine (B, H, W, out_ch_hd)] for a
    (B, H, W, 3) input in [-1, 1].
    """
    n_stack: int = 1
    n_downsample: int = 4
    out_ch: int = 64
    out_ch_hd: int = 8
    norm: str = "group"
    hd: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, name="conv1")(x)
        x = nn.relu(group_norm(64)(x))
        x = ConvBlock(64, 128, self.norm, name="conv2")(x)

        x_hd = DeconvReLUGroup(32, name="unpack1")(x)
        x_hd = nn.Conv(self.out_ch_hd, (5, 5), padding=2, name="conv_out")(x_hd)

        if not self.hd:
            x = avg_pool2(x)
        x = ConvBlock(128, 128, self.norm, name="conv3")(x)
        x = ConvBlock(128, 256, self.norm, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.n_stack):
            hg = HourGlass(self.n_downsample, 256, self.norm,
                           name=f"m{i}")(previous)
            ll = ConvBlock(256, 256, self.norm, name=f"top_m_{i}")(hg)
            ll = nn.Conv(256, (1, 1), name=f"conv_last{i}")(ll)
            ll = nn.relu(group_norm(256)(ll))
            tmp_out = nn.Conv(self.out_ch, (1, 1), name=f"l{i}")(ll)
            outputs.append(tmp_out)
            if i < self.n_stack - 1:
                ll2 = nn.Conv(256, (1, 1), name=f"bl{i}")(ll)
                tmp_out_ = nn.Conv(256, (1, 1), name=f"al{i}")(tmp_out)
                previous = previous + ll2 + tmp_out_

        return [outputs[-1], x_hd]


class ResBlk(nn.Module):
    """Residual block with replication padding (utils.py:331-346)."""
    ch: int
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding="VALID")(rep_pad(x, 1))
        h = nn.relu(get_norm(self.norm, self.ch)(h))
        h = nn.Conv(self.ch, (3, 3), padding="VALID")(rep_pad(h, 1))
        h = get_norm(self.norm, self.ch)(h)
        return x + h


class ResBlkEncoder(nn.Module):
    """Texture encoder: conv down -> res blocks -> deconv up
    (utils.py:348-377).  With the shipped config (n_downsample=3,
    n_upsample=2) a (B, H, W, 3) input yields (B, H/2, W/2, out_ch)."""
    in_ch: int = 3
    out_ch: int = 8
    ngf: int = 16
    n_downsample: int = 3
    n_blocks: int = 4
    n_upsample: int = 3
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.ngf, (7, 7), padding="VALID")(rep_pad(x, 3))
        x = nn.relu(get_norm(self.norm, self.ngf)(x))

        for i in range(self.n_downsample):
            ch = self.ngf * (2 ** (i + 1))
            x = nn.Conv(ch, (3, 3), strides=(2, 2), padding=1)(x)
            x = nn.relu(get_norm(self.norm, ch)(x))

        mult = 2 ** self.n_downsample
        for _ in range(self.n_blocks):
            x = ResBlk(self.ngf * mult, self.norm)(x)

        for i in range(self.n_upsample):
            mult = 2 ** (self.n_downsample - i)
            ch = (self.ngf * mult) // 2
            x = conv_transpose_torch(x, ch, f"up{i}")
            x = nn.relu(get_norm(self.norm, ch)(x))

        if self.n_upsample > 0:
            mult = 2 ** (self.n_downsample - self.n_upsample + 1)
            x = nn.Conv(self.out_ch, (7, 7), padding="VALID")(rep_pad(x, 3))
        return x
