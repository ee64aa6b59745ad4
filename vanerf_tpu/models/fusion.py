"""Visibility-gated feature fusion for the geometry and texture branches.

Parity targets: ``GeoVisFusion`` (reference ``src/networks.py:43-106``) and
``TexVisFusion`` (``src/networks.py:219-293``).  The reference's 1x1 Conv1d
stacks are Dense layers here (identical math, MXU-shaped); the KNN vertex
lookups use :func:`vanerf_tpu.ops.knn.knn_gather_1` instead of pytorch3d's
CUDA ``knn_points``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.grid_sample import feat_sample_nhwc
from ..ops.knn import knn_gather_1


class VDense(nn.Module):
    """nn.Dense that accepts a LIST of inputs as a virtual concat:
    `concat(parts) @ W == sum_i parts_i @ W_i`.  Skips materializing the
    wide per-point concats (~0.4 ms each at 262k rows) while keeping the
    exact param tree of nn.Dense (kernel/bias names and shapes)."""
    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, parts):
        if not isinstance(parts, (list, tuple)):
            parts = (parts,)
        in_f = sum(p.shape[-1] for p in parts)
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (in_f, self.features))
        dt = parts[0].dtype
        k = kernel.astype(dt)
        out = None
        o = 0
        for p in parts:
            c = p @ k[o:o + p.shape[-1]]
            o += p.shape[-1]
            out = c if out is None else out + c
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,))
            out = out + b.astype(dt)
        return out


class GateMLP(nn.Module):
    """Dense -> ReLU -> Dense -> sigmoid gate (no bias), matching the
    reference's 1x1-conv attention stacks (networks.py:47-52).  The first
    layer takes a list of parts (virtual concat)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = VDense(self.hidden, use_bias=False, name="Dense_0")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, use_bias=False, dtype=x.dtype,
                     name="Dense_1")(x)
        return nn.sigmoid(x)


class FuseMLP(nn.Module):
    """Dense -> ReLU -> Dense (no bias) (networks.py:54-58).  The first
    layer takes a list of parts (virtual concat)."""
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x):
        x = VDense(self.hidden, use_bias=False, name="Dense_0")(x)
        x = nn.relu(x)
        return nn.Dense(self.out, use_bias=False, dtype=x.dtype,
                        name="Dense_1")(x)


class GeoVisFusion(nn.Module):
    """Fuse pixel-aligned, same-hand KNN and other-hand KNN geometry features,
    gated by visibility/SDF context, at two feature scales
    (networks.py:75-106).

    Channel bookkeeping (coarse scale): 64*3 image/vertex feats + sdf + 3 vis
    flags = 196 -> 3 gates -> regated 196 -> 64.  Fine scale: 8*3 + 4 = 28 ->
    3 gates -> 28 -> 8.
    """
    num_v: int = 779

    def vertex_table(self, fg, vert_xy):
        """Per-vertex feature table: both feature scales sampled at the
        projected vertices (B, V2, 64+8).  Exposed so the caller can fold
        this into ONE shared KNN gather with the texture branch."""
        return jnp.concatenate(
            [feat_sample_nhwc(fg[0], vert_xy),
             feat_sample_nhwc(fg[1], vert_xy)], -1)

    @nn.compact
    def __call__(self, vert_xy, fg, feat_sampled, vert, v, vert_vis,
                 query_vis, query_sdf, nn_idx=None, knn=None):
        """
        Args:
          vert_xy: (B, V2, 2) vertex NDC coords in the source view.
          fg: [coarse (B,h,w,64), fine (B,H,W,8)] geometry feature maps.
          feat_sampled: [(B, N, 64), (B, N, 8)] pixel-aligned query features.
          vert: (B, V2, 3) world vertices; v: (B, N, 3) query points.
          vert_vis: (B, V2, 1); query_vis: (B, N, 1); query_sdf: (B, N, 1).
          knn: optional precomputed (f_knn, f_knn_toh, vis, vis_toh) from a
            shared gather of this module's :meth:`vertex_table`.
        Returns:
          [(B, N, 64), (B, N, 8)] fused features.
        """
        c0 = fg[0].shape[-1]
        if knn is None:
            # sample both scales at the vertices and run ONE fused KNN
            # gather (the 262k-row gathers dominate; 2 gathers, not 8).
            vert_feat = self.vertex_table(fg, vert_xy)
            f_knn_all, f_knn_toh_all, vis_th, vis_toh = knn_gather_1(
                v, vert, vert_feat, vert_vis, self.num_v, nn_idx=nn_idx)
        else:
            f_knn_all, f_knn_toh_all, vis_th, vis_toh = knn
        per_scale = [(f_knn_all[..., :c0], f_knn_toh_all[..., :c0]),
                     (f_knn_all[..., c0:], f_knn_toh_all[..., c0:])]

        outs = []
        for si, (hidden_at, out_ch) in enumerate([(10, 64), (10, 8)]):
            f_knn, f_knn_toh = per_scale[si]
            ctx = jnp.concatenate(
                [query_sdf, query_vis, vis_th, vis_toh], -1)
            # parts lists = virtual concats into the first Dense
            gate = GateMLP(hidden_at, 3, name=f"at{si}")(
                [feat_sampled[si], f_knn, f_knn_toh, ctx])
            regated = [feat_sampled[si] * gate[..., 0:1],
                       f_knn * gate[..., 1:2],
                       f_knn_toh * gate[..., 2:3], ctx]
            outs.append(FuseMLP(out_ch, out_ch, name=f"ated{si}")(regated))
        return outs


class Conv1dLN(nn.Module):
    """Conv over the last ("length") axis with LayerNorm on that axis,
    replicating the reference's fconv_gt stack (networks.py:237-244)."""
    out_ch: int
    length: int

    @nn.compact
    def __call__(self, x):
        # x: (B, C, L) -> conv along L with kernel 3.
        x = jnp.swapaxes(x, -1, -2)                    # (B, L, C)
        x = nn.Conv(self.out_ch, (3,), padding=1, use_bias=False)(x)
        x = jnp.swapaxes(x, -1, -2)                    # (B, out_ch, L)
        x = nn.LayerNorm(epsilon=1e-6)(x)              # over L (size `length`)
        return nn.relu(x)


def adaptive_avg_pool(x: jnp.ndarray, out: int) -> jnp.ndarray:
    """torch AdaptiveAvgPool2d semantics (floor/ceil bin edges) on NHWC."""
    B, H, W, C = x.shape
    rows = []
    for i in range(out):
        h0, h1 = (i * H) // out, -((-(i + 1) * H) // out)
        cols = []
        for j in range(out):
            w0, w1 = (j * W) // out, -((-(j + 1) * W) // out)
            cols.append(x[:, h0:h1, w0:w1].mean(axis=(1, 2)))
        rows.append(jnp.stack(cols, 1))
    return jnp.stack(rows, 1)                          # (B, out, out, C)


class GlobalCtxConv(nn.Module):
    """3x3 convs + LayerNorm(H,W) + adaptive 3x3 average pool
    (networks.py:246-264).  Produces a (B, 42, 9) global context."""
    mid: int = 21
    out: int = 42

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, C)
        x = nn.Conv(self.mid, (3, 3), padding=1, use_bias=False)(x)
        x = nn.relu(self._ln_hw(x, "ln0"))
        x = nn.Conv(self.out, (3, 3), padding=1, use_bias=False)(x)
        x = nn.relu(self._ln_hw(x, "ln1"))
        x = adaptive_avg_pool(x, 3)                    # (B, 3, 3, C)
        B, _, _, C = x.shape
        return x.reshape(B, 9, C).swapaxes(1, 2)       # (B, C, 9)

    def _ln_hw(self, h, name):
        # torch LayerNorm([H, W], eps=1e-6): normalize over (H, W) per
        # (B, C) slice, elementwise (H, W) affine (networks.py:248-263
        # hard-codes [64,64]/[256,256]); the affine shape follows the
        # actual map so converted reference weights load losslessly.
        m = h.mean(axis=(1, 2), keepdims=True)
        var = ((h - m) ** 2).mean(axis=(1, 2), keepdims=True)
        hw = (h.shape[1], h.shape[2], 1)
        g = self.param(f"{name}_scale", nn.initializers.ones, hw)
        b = self.param(f"{name}_bias", nn.initializers.zeros, hw)
        return (h - m) / jnp.sqrt(var + 1e-6) * g[None] + b[None]


class TexVisFusion(nn.Module):
    """Visibility-gated texture feature fusion (networks.py:268-293).

    Channel bookkeeping: query_feat 11 (img 3 + tex 8), knn 11, knn_toh 11,
    global-vertex 18, global-vertex_toh 18, latent 24, vis 3 -> 96 in;
    6 gates; output 40 (q_feat_out = 16+24).
    """
    num_v: int = 779
    q_feat_in: int = 96
    q_feat_out: int = 40

    def setup(self):
        # attribute names keep the param-tree names of the old compact
        # layout (fconv3/fconv4/gt0/gt1/at/fuse)
        self.fconv3 = GlobalCtxConv()
        self.fconv4 = GlobalCtxConv()
        self.gt0 = Conv1dLN(self.num_v, 18)
        self.gt1 = Conv1dLN(self.num_v * 2, 18)
        self.at = GateMLP(self.q_feat_in, 6)
        self.fuse = FuseMLP(self.q_feat_in, self.q_feat_out)

    def vertex_table(self, ft1, img_fmap, vert_xy):
        """Per-vertex table: source RGB + tex feats at projected vertices
        plus the broadcast global-context features (B, V2, 11+18).
        Exposed for the shared KNN gather with the geometry branch (the
        GlobalCtxConv / Conv1dLN parameters live here)."""
        vert_feat = feat_sample_nhwc(ft1, vert_xy)              # (B, V2, 8)
        vert_img = feat_sample_nhwc(img_fmap, vert_xy)          # (B, V2, 3)
        vert_feat = jnp.concatenate([vert_img, vert_feat], -1)  # 11

        gf_tex = self.fconv3(ft1)                               # (B, 42, 9)
        gf_img = self.fconv4(img_fmap)                          # (B, 42, 9)
        gf = jnp.concatenate([gf_img, gf_tex], -1)              # (B, 42, 18)
        gf = self.gt0(gf)                                       # (B, V, 18)
        gf = self.gt1(gf)                                       # (B, 2V, 18)
        # the global-ctx branch runs in f32 (per-frame, tiny); cast so the
        # hot per-point KNN gather stays in the compute dtype
        gf = gf.astype(vert_feat.dtype)
        return jnp.concatenate([vert_feat, gf], -1)             # (B, V2, 29)

    def __call__(self, vert_xy, ft1, ft_xy, vert, v, vert_vis, query_vis,
                 img_xy, img_fmap, latent_fused, nn_idx=None, knn=None):
        """
        Args:
          vert_xy: (B, V2, 2) vertex NDC coords; ft1: (B, h, w, 8) tex map;
          ft_xy: (B, N, 8) tex feats at queries; vert/v as in GeoVisFusion;
          img_xy: (B, N, 3) source RGB at queries;
          img_fmap: (B, H, W, 3) source image; latent_fused: (B, N, 24).
          knn: optional precomputed (f_knn, f_knn_toh, vis, vis_toh) from a
            shared gather of this module's :meth:`vertex_table`.
        Returns:
          (B, N, 40) per-view IBR feature.
        """
        if knn is None:
            vert_feat = self.vertex_table(ft1, img_fmap, vert_xy)
            f_knn, f_knn_toh, vis_th, vis_toh = knn_gather_1(
                v, vert, vert_feat, vert_vis, self.num_v, nn_idx=nn_idx)
        else:
            f_knn, f_knn_toh, vis_th, vis_toh = knn
        knn_gf, knn_toh_gf = f_knn[..., 11:], f_knn_toh[..., 11:]
        knn_f, knn_toh_f = f_knn[..., :11], f_knn_toh[..., :11]

        query_feat = jnp.concatenate([img_xy, ft_xy], -1)       # (B, N, 11)
        vis_ctx = jnp.concatenate([query_vis, vis_th, vis_toh], -1)
        # parts lists = virtual concats into the first Dense (96 ch)
        gate = self.at([query_feat, knn_f, knn_toh_f, knn_gf, knn_toh_gf,
                        latent_fused, vis_ctx])
        y_ated = [query_feat * gate[..., 0:1], knn_f * gate[..., 1:2],
                  knn_toh_f * gate[..., 2:3], knn_gf * gate[..., 3:4],
                  knn_toh_gf * gate[..., 4:5], latent_fused * gate[..., 5:6],
                  vis_ctx]
        return self.fuse(y_ated)
