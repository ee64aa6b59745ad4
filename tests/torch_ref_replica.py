"""Torch mini-replica of the reference VANeRF module tree, used ONLY to
validate the checkpoint converter without the released ``model.ckpt``
(which needs egress to download).

The replica reproduces the reference's module/attribute structure so its
``state_dict()`` has EXACTLY the key names and tensor shapes of the
reference Lightning checkpoint:

  * generator under ``model.*``      (ref ``src/model.py:604-667``)
  * discriminator under ``discriminator.*`` (ref ``src/networks.py:535-569``)

Sub-structures follow, with the defining reference lines:
  HGFilterV2/HourGlass/ConvBlock/DeconvReLUGroup  utils.py:393-607
  ResBlkEncoder/ResBlk                            utils.py:331-391
  MLPUNetFusion/MLPUNet/MLP/Linear                utils.py:609-852
  GeoVisFusion                                    networks.py:43-106
  TexVisFusion                                    networks.py:219-293
  IBRRenderingHead                                model.py:1572-1636
  Discriminator_vis                               networks.py:535-569
  VGGLoss/Vgg19 (structural stand-in: torchvision absent) utils.py:882-937
  SpatialEncoder (buffer only)                    spatial.py:4-17

Forward passes are implemented for the pure-tensor modules so converted
flax params can be checked layerwise against torch outputs (pytorch3d's
``knn_points`` is replaced by a brute-force cdist argmin; same K=1 result).

This is a test fixture: weights are random, never trained, never shipped.
"""

from __future__ import annotations

import torch
import torch.nn as nn
import torch.nn.functional as F

NUM_V = 779


# ---------------------------------------------------------------------------
# encoder blocks (utils.py:393-607)
# ---------------------------------------------------------------------------

def _gn(ch):
    return nn.GroupNorm(min(32, ch), ch)


class ConvBlockT(nn.Module):
    def __init__(self, in_planes, out_planes):
        super().__init__()
        self.bn1 = _gn(in_planes)
        self.bn2 = _gn(out_planes // 2)
        self.bn3 = _gn(out_planes // 4)
        self.bn4 = _gn(in_planes)      # created unconditionally in the ref
        if in_planes != out_planes:
            self.downsample = nn.Sequential(
                self.bn4, nn.ReLU(True),
                nn.Conv2d(in_planes, out_planes, 1, bias=False))
        else:
            self.downsample = None
        self.conv1 = nn.Conv2d(in_planes, out_planes // 2, 3, padding=1,
                               bias=False)
        self.conv2 = nn.Conv2d(out_planes // 2, out_planes // 4, 3,
                               padding=1, bias=False)
        self.conv3 = nn.Conv2d(out_planes // 4, out_planes // 4, 3,
                               padding=1, bias=False)

    def forward(self, x):
        res = x
        o1 = self.conv1(F.relu(self.bn1(x)))
        o2 = self.conv2(F.relu(self.bn2(o1)))
        o3 = self.conv3(F.relu(self.bn3(o2)))
        out = torch.cat((o1, o2, o3), 1)
        if self.downsample is not None:
            res = self.downsample(res)
        return out + res


class HourGlassT(nn.Module):
    def __init__(self, depth, feats):
        super().__init__()
        self.depth = depth
        for lv in range(depth, 0, -1):
            self.add_module(f"b1_{lv}", ConvBlockT(feats, feats))
            self.add_module(f"b2_{lv}", ConvBlockT(feats, feats))
            if lv == 1:
                self.add_module(f"b2_plus_{lv}", ConvBlockT(feats, feats))
            self.add_module(f"b3_{lv}", ConvBlockT(feats, feats))

    def _fwd(self, lv, inp):
        up1 = self._modules[f"b1_{lv}"](inp)
        low1 = self._modules[f"b2_{lv}"](F.avg_pool2d(inp, 2, stride=2))
        if lv > 1:
            low2 = self._fwd(lv - 1, low1)
        else:
            low2 = self._modules[f"b2_plus_{lv}"](low1)
        low3 = self._modules[f"b3_{lv}"](low2)
        up2 = F.interpolate(low3, scale_factor=2, mode="bicubic",
                            align_corners=True)
        return up1 + up2

    def forward(self, x):
        return self._fwd(self.depth, x)


class DeconvReLUGroupT(nn.Module):
    def __init__(self, in_ch, out_ch, bias=False):
        super().__init__()
        self.conv = nn.ConvTranspose2d(in_ch, out_ch, 3, stride=2,
                                       padding=1, output_padding=1,
                                       bias=bias)
        self.norm = nn.GroupNorm(min(32, out_ch), out_ch)

    def forward(self, x):
        return F.relu(self.norm(self.conv(x)))


class HGFilterV2T(nn.Module):
    def __init__(self, out_ch=64, n_stack=1, n_downsample=4, out_ch_hd=8):
        super().__init__()
        self.n_stack = n_stack
        self.unpack1 = DeconvReLUGroupT(128, 32)
        self.conv_out = nn.Conv2d(32, out_ch_hd, 5, padding=2)
        self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3)
        self.bn1 = nn.GroupNorm(32, 64)
        self.conv2 = ConvBlockT(64, 128)
        self.conv3 = ConvBlockT(128, 128)
        self.conv4 = ConvBlockT(128, 256)
        for i in range(n_stack):
            self.add_module(f"m{i}", HourGlassT(n_downsample, 256))
            self.add_module(f"top_m_{i}", ConvBlockT(256, 256))
            self.add_module(f"conv_last{i}", nn.Conv2d(256, 256, 1))
            self.add_module(f"bn_end{i}", nn.GroupNorm(32, 256))
            self.add_module(f"l{i}", nn.Conv2d(256, out_ch, 1))
            if i < n_stack - 1:
                self.add_module(f"bl{i}", nn.Conv2d(256, 256, 1))
                self.add_module(f"al{i}", nn.Conv2d(out_ch, 256, 1))

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x = self.conv2(x)
        x_hd = self.conv_out(self.unpack1(x))
        x = F.avg_pool2d(x, 2, stride=2)
        x = self.conv4(self.conv3(x))
        prev = x
        outs = []
        for i in range(self.n_stack):
            hg = self._modules[f"m{i}"](prev)
            ll = self._modules[f"top_m_{i}"](hg)
            ll = F.relu(self._modules[f"bn_end{i}"](
                self._modules[f"conv_last{i}"](ll)), True)
            tmp = self._modules[f"l{i}"](ll)
            outs.append(tmp)
            if i < self.n_stack - 1:
                prev = prev + self._modules[f"bl{i}"](ll) + \
                    self._modules[f"al{i}"](tmp)
        return [outs[-1], x_hd]


class ResBlkT(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.layers = nn.Sequential(
            nn.ReplicationPad2d(1), nn.Conv2d(ch, ch, 3),
            nn.InstanceNorm2d(ch), nn.ReLU(True),
            nn.ReplicationPad2d(1), nn.Conv2d(ch, ch, 3),
            nn.InstanceNorm2d(ch))

    def forward(self, x):
        return x + self.layers(x)


class ResBlkEncoderT(nn.Module):
    def __init__(self, in_ch=3, out_ch=8, ngf=64, n_downsample=3,
                 n_blocks=4, n_upsample=2):
        super().__init__()
        nl = nn.ReLU(True)
        layers = [nn.ReplicationPad2d(3), nn.Conv2d(in_ch, ngf, 7),
                  nn.InstanceNorm2d(ngf), nl]
        for i in range(n_downsample):
            m = 2 ** i
            layers += [nn.Conv2d(ngf * m, ngf * m * 2, 3, stride=2,
                                 padding=1), nn.InstanceNorm2d(ngf * m * 2),
                       nl]
        m = 2 ** n_downsample
        layers += [ResBlkT(ngf * m) for _ in range(n_blocks)]
        for i in range(n_upsample):
            m = 2 ** (n_downsample - i)
            layers += [nn.ConvTranspose2d(ngf * m, ngf * m // 2, 3,
                                          stride=2, padding=1,
                                          output_padding=1),
                       nn.InstanceNorm2d(ngf * m // 2), nl]
        layers += [nn.ReplicationPad2d(3),
                   nn.Conv2d(ngf * m // 2, out_ch, 7)]
        self.layers = nn.Sequential(*layers)

    def forward(self, x):
        return self.layers(x)


# ---------------------------------------------------------------------------
# MLP stacks (utils.py:609-852)
# ---------------------------------------------------------------------------

SOFTPLUS = nn.Softplus(beta=100, threshold=20)


class LinearT(nn.Module):
    def __init__(self, n_in, n_out, nonlin, wn):
        super().__init__()
        lin = nn.Linear(n_in, n_out)
        self.linear = nn.utils.weight_norm(lin) if wn else lin
        self.nonlin = nonlin

    def forward(self, x):
        x = self.linear(x)
        return self.nonlin(x) if self.nonlin is not None else x


class MLPT(nn.Module):
    def __init__(self, n_dims, skip_layers=()):
        super().__init__()
        self.skip_layers = list(skip_layers)
        self.layers = nn.ModuleList()
        for i in range(len(n_dims) - 1):
            _in = n_dims[i] + (n_dims[0] if i in self.skip_layers else 0)
            last = i == len(n_dims) - 2
            self.layers.append(LinearT(_in, n_dims[i + 1],
                                       None if last else SOFTPLUS,
                                       not last))

    def forward(self, x):
        x0 = x
        for i, l in enumerate(self.layers):
            if i in self.skip_layers:
                x = torch.cat([x, x0], -1)
            x = l(x)
        return x


class MLPUNetT(nn.Module):
    def __init__(self, n_dims, skip_dims, skip_layers):
        super().__init__()
        self.skip_layers = list(skip_layers)
        self.skip_dict = {j: i for i, j in enumerate(skip_layers)}
        self.layers = nn.ModuleList()
        for i in range(len(n_dims) - 1):
            in_ch = n_dims[i] + (skip_dims[self.skip_dict[i]]
                                 if i in self.skip_dict else 0)
            last = i == len(n_dims) - 2
            self.layers.append(LinearT(in_ch, n_dims[i + 1],
                                       None if last else SOFTPLUS,
                                       not last))

    def forward(self, x, f):
        for i, l in enumerate(self.layers):
            if i in self.skip_dict:
                x1 = f[self.skip_dict[i]]
                x = x1 if x is None else torch.cat([x, x1], -1)
            x = l(x)
        return x


class MLPUNetFusionT(nn.Module):
    def __init__(self, n_dims1, n_dims2, skip_dims, skip_layers,
                 pool_types=("mean", "var")):
        super().__init__()
        self.pool_types = list(pool_types)
        self.layers1 = MLPUNetT(n_dims1, skip_dims, skip_layers)
        self.layers2 = MLPT(n_dims2)

    def forward(self, x, f, a, w=None):
        x_view = self.layers1(x, f)
        a_sum = a.sum(1)
        if w is None:
            w = a / (a_sum[:, None] + 1e-6)
        mean = (w * x_view).sum(1)
        pooled = [mean] if "mean" in self.pool_types else []
        if "var" in self.pool_types:
            pooled.append((w * (x_view - mean[:, None]) ** 2).sum(1))
        x_pool = torch.cat(pooled, -1)
        return self.layers2(x_pool), a_sum > 0, x_view, x_pool


# ---------------------------------------------------------------------------
# fusion nets (networks.py:43-106, 219-293)
# ---------------------------------------------------------------------------

def feat_sample_t(feat, uv):
    """grid_sample border/align_corners (utils.py:136-151)."""
    return F.grid_sample(feat, uv[:, :, None], mode="bilinear",
                         padding_mode="border",
                         align_corners=True)[..., 0].permute(0, 2, 1)


def knn_vis_t(query, vert, vert_feat, vert_vis):
    """KNN_vis (networks.py:27-33) with brute-force K=1 (no pytorch3d)."""
    d = torch.cdist(query, vert)
    idx = d.argmin(-1)                                      # (B, N)
    assert query.shape[0] == 1, "replica supports B=1 like the ref indexing"
    i = idx[0]
    f = vert_feat[:, i] * vert_vis[:, i]
    f_toh = torch.cat([vert_feat[:, NUM_V:], vert_feat[:, :NUM_V]], 1)
    v_toh = torch.cat([vert_vis[:, NUM_V:], vert_vis[:, :NUM_V]], 1)
    f_t = f_toh[:, i] * v_toh[:, i]
    return f, f_t, vert_vis[:, i], v_toh[:, i]


class GeoVisFusionT(nn.Module):
    def __init__(self):
        super().__init__()
        self.fconv_at = nn.Sequential(
            nn.Conv1d(196, 10, 1, bias=False), nn.ReLU(True),
            nn.Conv1d(10, 3, 1, bias=False), nn.Sigmoid())
        self.fconv_ated = nn.Sequential(
            nn.Conv1d(196, 64, 1, bias=False), nn.ReLU(True),
            nn.Conv1d(64, 64, 1, bias=False))
        self.fconv_at1 = nn.Sequential(
            nn.Conv1d(28, 10, 1, bias=False), nn.ReLU(True),
            nn.Conv1d(10, 3, 1, bias=False), nn.Sigmoid())
        self.fconv_ated1 = nn.Sequential(
            nn.Conv1d(28, 8, 1, bias=False), nn.ReLU(True),
            nn.Conv1d(8, 8, 1, bias=False))

    def forward(self, vert_xy, fg, feat_sampled, vert, v, vert_vis,
                query_vis, query_sdf):
        outs = []
        for si, (at, ated) in enumerate([(self.fconv_at, self.fconv_ated),
                                         (self.fconv_at1,
                                          self.fconv_ated1)]):
            vert_feat = feat_sample_t(fg[si], vert_xy)
            knn, knn_toh, vis, vis_toh = knn_vis_t(v, vert, vert_feat,
                                                   vert_vis)
            fs = feat_sampled[si]
            ctx = torch.cat([query_sdf, query_vis, vis, vis_toh], 2)
            ff = torch.cat([fs, knn, knn_toh, ctx], 2)
            gate = at(ff.permute(0, 2, 1)).permute(0, 2, 1)
            ff = torch.cat([fs * gate[..., 0:1], knn * gate[..., 1:2],
                            knn_toh * gate[..., 2:3], ctx], 2)
            outs.append(ated(ff.permute(0, 2, 1)).permute(0, 2, 1))
        return outs


class TexVisFusionT(nn.Module):
    def __init__(self, q_feat_in=96, q_feat_out=40, if_ch3=8, hw3=64,
                 hw4=256):
        super().__init__()
        self.fconv = nn.Sequential(
            nn.Conv1d(q_feat_in, q_feat_in, 1, bias=False), nn.ReLU(True),
            nn.Conv1d(q_feat_in, q_feat_out, 1, bias=False))
        self.fconv_at = nn.Sequential(
            nn.Conv1d(q_feat_in, q_feat_in, 1, bias=False), nn.ReLU(True),
            nn.Conv1d(q_feat_in, 6, 1, bias=False), nn.Sigmoid())
        self.fconv_gt = nn.Sequential(
            nn.Conv1d(42, NUM_V, 3, padding=1, bias=False),
            nn.LayerNorm(18, 1e-6), nn.ReLU(True),
            nn.Conv1d(NUM_V, NUM_V * 2, 3, padding=1, bias=False),
            nn.LayerNorm(18, 1e-6), nn.ReLU(True))
        self.fconv3 = nn.Sequential(
            nn.Conv2d(if_ch3, 21, 3, padding=1, bias=False),
            nn.LayerNorm([hw3, hw3], 1e-6), nn.ReLU(True),
            nn.Conv2d(21, 42, 3, padding=1, bias=False),
            nn.LayerNorm([hw3, hw3], 1e-6), nn.ReLU(True),
            nn.AdaptiveAvgPool2d(3))
        self.fconv4 = nn.Sequential(
            nn.Conv2d(3, 21, 3, padding=1, bias=False),
            nn.LayerNorm([hw4, hw4], 1e-6), nn.ReLU(True),
            nn.Conv2d(21, 42, 3, padding=1, bias=False),
            nn.LayerNorm([hw4, hw4], 1e-6), nn.ReLU(True),
            nn.AdaptiveAvgPool2d(3))

    def forward(self, vert_xy, ft1, ft_xy, vert, v, vert_vis, query_vis,
                img_xy, img_fmap, latent_fused):
        vert_feat = feat_sample_t(ft1, vert_xy)
        vert_img = feat_sample_t(img_fmap, vert_xy)
        vert_feat = torch.cat([vert_img, vert_feat], 2)
        gf = self.fconv3(ft1).flatten(2)
        gf_img = self.fconv4(img_fmap).flatten(2)
        gf = torch.cat([gf_img, gf], -1)
        gf_vert = self.fconv_gt(gf)
        vert_feat = torch.cat([vert_feat, gf_vert], 2)
        knn, knn_toh, vis, vis_toh = knn_vis_t(v, vert, vert_feat, vert_vis)
        knn_gf, knn_toh_gf = knn[..., 11:], knn_toh[..., 11:]
        knn, knn_toh = knn[..., :11], knn_toh[..., :11]
        qf = torch.cat([img_xy, ft_xy], 2)
        y = torch.cat([qf, knn, knn_toh, knn_gf, knn_toh_gf, latent_fused,
                       query_vis, vis, vis_toh], 2)
        gate = self.fconv_at(y.permute(0, 2, 1)).permute(0, 2, 1)
        y = torch.cat([qf * gate[..., 0:1], knn * gate[..., 1:2],
                       knn_toh * gate[..., 2:3], knn_gf * gate[..., 3:4],
                       knn_toh_gf * gate[..., 4:5],
                       latent_fused * gate[..., 5:6],
                       query_vis, vis, vis_toh], 2)
        return self.fconv(y.permute(0, 2, 1)).permute(0, 2, 1)


# ---------------------------------------------------------------------------
# IBR head (model.py:1572-1636) + discriminator (networks.py:535-569)
# ---------------------------------------------------------------------------

class IBRRenderingHeadT(nn.Module):
    def __init__(self, in_channels=37):
        super().__init__()
        self.ani_al = nn.Parameter(torch.tensor(0.2))
        self.ray_encoder = nn.Sequential(
            nn.Linear(4, 16), nn.ELU(True),
            nn.Linear(16, in_channels + 3), nn.ELU(True))
        self.base_layer = nn.Sequential(
            nn.Linear((in_channels + 3) * 3, 64), nn.ELU(True),
            nn.Linear(64, 32), nn.ELU(True))
        self.vis_layer1 = nn.Sequential(
            nn.Linear(32, 32), nn.ELU(True), nn.Linear(32, 33), nn.ELU(True))
        self.vis_layer2 = nn.Sequential(
            nn.Linear(32, 32), nn.ELU(True), nn.Linear(32, 1), nn.Sigmoid())
        self.out_layer = nn.Sequential(
            nn.Linear(32 + 1 + 4, 16), nn.ELU(True), nn.Linear(16, 8),
            nn.ELU(True), nn.Linear(8, 1))

    def forward(self, rgb_feats, ray_diffs, proj_mask):
        V = rgb_feats.shape[2]
        dir_feat = self.ray_encoder(ray_diffs)
        src_rgb = rgb_feats[..., :3]
        rgb_feats = torch.cat(
            (rgb_feats[..., :dir_feat.shape[-1]] + dir_feat,
             rgb_feats[..., dir_feat.shape[-1]:]), -1)
        dot = ray_diffs[..., 3:]
        e = torch.exp(torch.abs(self.ani_al) * (dot - 1))
        w = (e - e.min(2, keepdim=True)[0]) * proj_mask
        w = w / (w.sum(2, keepdim=True) + 1e-8)
        mean = (rgb_feats * w).sum(2, keepdim=True)
        var = (w * (rgb_feats - mean) ** 2).sum(2, keepdim=True)
        fused = torch.cat([mean, var], -1)
        x = self.base_layer(torch.cat(
            [fused.expand(-1, -1, V, -1), rgb_feats], -1))
        pv = self.vis_layer1(x * w)
        res, vis = pv[..., :-1], pv[..., -1:]
        x = x + res
        vis = self.vis_layer2(x * torch.sigmoid(vis) * proj_mask) * proj_mask
        o = self.out_layer(torch.cat([x, vis, ray_diffs], -1))
        o = o.masked_fill(proj_mask == 0, -1e4)
        return (src_rgb * torch.softmax(o, 2)).sum(2)


class DiscriminatorVisT(nn.Module):
    def __init__(self):
        super().__init__()
        self.fconv3 = nn.Sequential(
            nn.Conv2d(12, 10, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(10, 10, 3, padding=1), nn.ReLU(True),
            nn.AdaptiveAvgPool2d(1))
        self.fconv4 = nn.Sequential(
            nn.Conv2d(12, 20, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(20, 20, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(20, 12, 3, padding=1))
        self.fconv2 = nn.Sequential(
            nn.Conv2d(24, 30, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(30, 20, 3, padding=1), nn.ReLU(True),
            nn.Conv2d(20, 1, 3, padding=1), nn.Sigmoid())
        self.linear = nn.Sequential(
            nn.Linear(10, 3), nn.ReLU(True), nn.Linear(3, 1), nn.Sigmoid())

    def forward(self, input_img, input_densepose, tar_densepose, pred):
        img = torch.cat([input_img, input_densepose, tar_densepose, pred], 1)
        gf = self.fconv3(img).squeeze(3).squeeze(2)
        iv = self.fconv4(img)
        iv = self.fconv2(torch.cat([img, iv], 1))
        return self.linear(gf), iv


# ---------------------------------------------------------------------------
# VGG19 structural stand-in (utils.py:882-917; torchvision absent here, so
# the slices hold randomly-initialized convs at the torchvision feature
# indices — key names and shapes match, values don't matter for key tests)
# ---------------------------------------------------------------------------

_VGG_CONVS = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
              10: (128, 256), 12: (256, 256), 14: (256, 256),
              16: (256, 256), 19: (256, 512)}


class Vgg19T(nn.Module):
    def __init__(self):
        super().__init__()
        ranges = [("slice1", 0, 2), ("slice2", 2, 7), ("slice3", 7, 12),
                  ("slice4", 12, 21)]
        for name, lo, hi in ranges:
            s = nn.Sequential()
            for i in range(lo, hi):
                if i in _VGG_CONVS:
                    cin, cout = _VGG_CONVS[i]
                    s.add_module(str(i), nn.Conv2d(cin, cout, 3, padding=1))
                elif i in (4, 9, 18):
                    s.add_module(str(i), nn.MaxPool2d(2))
                else:
                    s.add_module(str(i), nn.ReLU(True))
            self.add_module(name, s)


class VGGLossT(nn.Module):
    def __init__(self):
        super().__init__()
        self.vgg_net = Vgg19T()


class SpatialEncoderT(nn.Module):
    def __init__(self):
        super().__init__()
        self.register_buffer("center", torch.zeros(3))


# ---------------------------------------------------------------------------
# full generator + Lightning-level replica
# ---------------------------------------------------------------------------

class VANeRFT(nn.Module):
    """Attribute-for-attribute structure of ref model.py:604-667."""

    def __init__(self, cfg):
        super().__init__()
        m = cfg["models"]["VANeRF"]
        self.sigmoid_beta = nn.Parameter(0.1 * torch.ones(1))
        self.geo_vis_fusion = GeoVisFusionT()
        self.tex_vis_fusion = TexVisFusionT()
        sp_dim = (1 + 2 * m["sp_args"]["sp_level"]) * m["sp_args"]["n_kpt"]
        n_dims1 = list(m["mlp_geo_args"]["n_dims1"])
        n_dims1[0] = sp_dim
        self.mlp_geo = MLPUNetFusionT(
            n_dims1, m["mlp_geo_args"]["n_dims2"],
            m["mlp_geo_args"]["skip_dims"], m["mlp_geo_args"]["skip_layers"],
            m["mlp_geo_args"]["pool_types"])
        self.mlp_tex = IBRRenderingHeadT()
        self.geo_encoder = HGFilterV2T(
            out_ch=m["geo_args"]["out_ch"],
            n_stack=m["geo_args"]["n_stack"],
            n_downsample=m["geo_args"]["n_downsample"])
        self.sp_encoder = SpatialEncoderT()
        self.sp_encoder_r = SpatialEncoderT()
        self.sp_encoder_l = SpatialEncoderT()
        self.ibr_compress_gfeat = nn.Linear(
            m["mlp_tex_args"]["gcompress"]["in_ch"],
            m["mlp_tex_args"]["gcompress"]["out_ch"])
        self.tex_encoder = ResBlkEncoderT(
            out_ch=m["tex_args"]["out_ch"], ngf=m["tex_args"]["ngf"],
            n_downsample=m["tex_args"]["n_downsample"],
            n_blocks=m["tex_args"]["n_blocks"],
            n_upsample=m["tex_args"]["n_upsample"])
        self.vgg_loss = VGGLossT()


class LightningReplicaT(nn.Module):
    """state_dict layout of the reference VANeRFLightningModule
    (model.py:42-59): generator under `model.`, discriminator under
    `discriminator.`."""

    def __init__(self, cfg):
        super().__init__()
        self.model = VANeRFT(cfg)
        self.discriminator = DiscriminatorVisT()
