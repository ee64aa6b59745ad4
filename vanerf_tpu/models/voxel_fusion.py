"""Dense-voxel fusion variants (the `sp_conv: true` config path).

Parity targets: ``GeoVisFusion_spconv`` / ``TexVisFusion_spconv`` /
``SparseConvNet`` (reference ``src/networks.py:108-217, 295-533``).  The
reference scatters per-vertex features into a 5 mm voxel grid and runs a
4-stage spconv U-net, sampling each scale at the query points.  Hand grids
are tiny (<= ~128^3 after 32-alignment), so the TPU-native design is a
DENSE NDHWC volume + strided 3D convs: XLA maps them straight onto the MXU,
no gather-scatter kernels, fully static shapes.  BatchNorm1d is replaced by
GroupNorm (batch-independent; consistent with the no-SyncBN design).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.grid_sample import feat_sample_nhwc
from ..ops.knn import knn_gather_1
from ..ops.voxel import grid_sample_3d, scatter_to_grid, world_to_grid_coords
from .fusion import Conv1dLN, FuseMLP, GlobalCtxConv


def _gn(ch):
    groups = max(g for g in range(1, min(8, ch) + 1) if ch % g == 0)
    return nn.GroupNorm(num_groups=groups, epsilon=1e-3)


class _ConvBlock3D(nn.Module):
    out_ch: int
    n_convs: int = 2
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        for i in range(self.n_convs):
            s = self.stride if i == 0 else 1
            k = 3
            x = nn.Conv(self.out_ch, (k, k, k), strides=(s, s, s),
                        padding=1, use_bias=False)(x)
            x = nn.relu(_gn(self.out_ch)(x))
        return x


class VoxelConvNet(nn.Module):
    """4-scale voxel feature pyramid sampled at query points
    (SparseConvNet parity, networks.py:478-533: conv/down x4, features
    gathered at scales 1-4 and concatenated -> 2*f_in + 2*f_up channels)."""
    f_in: int = 16
    f_up: int = 32

    @nn.compact
    def __call__(self, vol, grid_coords):
        """
        Args:
          vol: (D, H, W, f_in) scattered vertex features.
          grid_coords: (N, 3) in [-1, 1] (w, h, d order).
        Returns:
          (N, 2*f_in + 2*f_up) multi-scale features.
        """
        x = _ConvBlock3D(self.f_in, 2, name="conv0")(vol[None])
        x = _ConvBlock3D(self.f_in, 1, stride=2, name="down0")(x)

        x = _ConvBlock3D(self.f_in, 2, name="conv1")(x)
        f1 = grid_sample_3d(x[0], grid_coords)
        x = _ConvBlock3D(self.f_in, 1, stride=2, name="down1")(x)

        x = _ConvBlock3D(self.f_in, 3, name="conv2")(x)
        f2 = grid_sample_3d(x[0], grid_coords)
        x = _ConvBlock3D(self.f_up, 1, stride=2, name="down2")(x)

        x = _ConvBlock3D(self.f_up, 3, name="conv3")(x)
        f3 = grid_sample_3d(x[0], grid_coords)
        x = _ConvBlock3D(self.f_up, 1, stride=2, name="down3")(x)

        x = _ConvBlock3D(self.f_up, 3, name="conv4")(x)
        f4 = grid_sample_3d(x[0], grid_coords)
        return jnp.concatenate([f1, f2, f3, f4], -1)


class LinearGate(nn.Module):
    """Dense -> LayerNorm -> ReLU -> Dense -> sigmoid (networks.py:112-126)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.relu(x)
        return nn.sigmoid(nn.Dense(self.out)(x))


class LinearFuse(nn.Module):
    """Dense -> LayerNorm -> ReLU -> Dense (networks.py:128-133)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden)(x)
        x = nn.LayerNorm(epsilon=1e-6)(x)
        x = nn.relu(x)
        return nn.Dense(self.out)(x)


class GeoVisFusionSP(nn.Module):
    """Geometry fusion with the voxel branch (networks.py:169-217).

    Gates are the product of a feature gate and a visibility gate.
    """
    num_v: int = 779
    grid_shape: Sequence[int] = (64, 64, 64)

    @nn.compact
    def __call__(self, vert_xy, fg, feat_sampled, vert, v, vert_vis,
                 query_vis, query_sdf, bounds):
        B = vert_xy.shape[0]
        grid_coords = jax.vmap(
            lambda p, b: world_to_grid_coords(p, b, self.grid_shape[::-1]))(
            v, bounds)
        vcoords = jax.vmap(
            lambda p, b: ((p[..., ::-1] - b[0, ::-1]) / 0.005))(vert, bounds)
        vcoords = jnp.round(vcoords).astype(jnp.int32)

        outs = []
        specs = [
            # (compress, f_in, f_up, at_hidden, fuse_hidden, out)
            (True, 16, 32, 10, 64, 64),
            (False, 8, 16, 10, 8, 8),
        ]
        for si, (compress, f_in, f_up, at_h, fu_h, out_ch) in \
                enumerate(specs):
            vert_feat = feat_sample_nhwc(fg[si], vert_xy)
            if compress:
                vert_feat = LinearFuse(32, 16, name=f"compress{si}")(
                    vert_feat)
            vol = jax.vmap(
                lambda f, c: scatter_to_grid(f, c, self.grid_shape))(
                vert_feat, vcoords)
            net = VoxelConvNet(f_in=f_in, f_up=f_up, name=f"xyzc{si}")
            xyzc = jax.vmap(lambda vo, gc: net(vo, gc))(vol, grid_coords)

            f_knn, f_knn_toh, vis_th, vis_toh = knn_gather_1(
                v, vert, vert_feat, vert_vis, self.num_v,
                weight_by_vis=False)
            fused = jnp.concatenate(
                [feat_sampled[si], f_knn, f_knn_toh, xyzc, query_sdf], -1)
            vis_ctx = jnp.concatenate([query_vis, vis_th, vis_toh], -1)
            gate = (LinearGate(at_h, 5, name=f"at{si}")(fused)
                    * LinearGate(10, 5, name=f"vis_at{si}")(vis_ctx))
            ated = jnp.concatenate(
                [feat_sampled[si] * gate[..., 0:1],
                 f_knn * gate[..., 1:2], f_knn_toh * gate[..., 2:3],
                 xyzc * gate[..., 3:4], query_sdf * gate[..., 4:5],
                 vis_ctx], -1)
            outs.append(LinearFuse(fu_h, out_ch, name=f"ated{si}")(ated))
        return outs


class TexVisFusionSP(nn.Module):
    """Texture fusion with the voxel branch (networks.py:357-394)."""
    num_v: int = 779
    grid_shape: Sequence[int] = (64, 64, 64)
    q_feat_in: int = 96
    q_feat_out: int = 40

    @nn.compact
    def __call__(self, vert_xy, ft1, ft_xy, vert, v, vert_vis, query_vis,
                 img_xy, img_fmap, latent_fused, bounds):
        vert_feat = feat_sample_nhwc(ft1, vert_xy)
        vert_img = feat_sample_nhwc(img_fmap, vert_xy)
        vert_feat = jnp.concatenate([vert_img, vert_feat], -1)     # 11

        gf_tex = GlobalCtxConv(name="fconv3")(ft1)
        gf_img = GlobalCtxConv(name="fconv4")(img_fmap)
        gf = jnp.concatenate([gf_img, gf_tex], -1)
        gf = Conv1dLN(self.num_v, 18, name="gt0")(gf)
        gf = Conv1dLN(self.num_v * 2, 18, name="gt1")(gf)
        vert_feat = jnp.concatenate([vert_feat, gf], -1)           # 29

        grid_coords = jax.vmap(
            lambda p, b: world_to_grid_coords(p, b, self.grid_shape[::-1]))(
            v, bounds)
        vcoords = jax.vmap(
            lambda p, b: ((p[..., ::-1] - b[0, ::-1]) / 0.005))(vert, bounds)
        vcoords = jnp.round(vcoords).astype(jnp.int32)
        vol = jax.vmap(
            lambda f, c: scatter_to_grid(f, c, self.grid_shape))(
            vert_feat, vcoords)
        net = VoxelConvNet(f_in=29, f_up=32, name="xyzc")
        xyzc = jax.vmap(lambda vo, gc: net(vo, gc))(vol, grid_coords)  # 122

        f_knn, f_knn_toh, vis_th, vis_toh = knn_gather_1(
            v, vert, vert_feat, vert_vis, self.num_v, weight_by_vis=False)
        knn_gf, knn_toh_gf = f_knn[..., 11:], f_knn_toh[..., 11:]
        knn_f, knn_toh_f = f_knn[..., :11], f_knn_toh[..., :11]
        query_feat = jnp.concatenate([img_xy, ft_xy], -1)          # 11

        y = jnp.concatenate(
            [query_feat, knn_f, knn_toh_f, knn_gf, knn_toh_gf, xyzc,
             latent_fused], -1)                                    # 215
        vis_ctx = jnp.concatenate([query_vis, vis_th, vis_toh], -1)
        gate = (LinearGate(self.q_feat_in, 7, name="at")(y)
                * LinearGate(10, 7, name="vis_at")(vis_ctx))
        y_ated = jnp.concatenate(
            [query_feat * gate[..., 0:1], knn_f * gate[..., 1:2],
             knn_toh_f * gate[..., 2:3], knn_gf * gate[..., 3:4],
             knn_toh_gf * gate[..., 4:5], xyzc * gate[..., 5:6],
             latent_fused * gate[..., 6:7], vis_ctx], -1)          # 218
        return LinearFuse(self.q_feat_in, self.q_feat_out,
                          name="fuse")(y_ated)
