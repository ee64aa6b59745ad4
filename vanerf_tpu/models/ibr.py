"""IBRNet-style color head: learned per-view visibility + softmax blending.

Parity target: ``IBRRenderingHead`` (reference ``src/model.py:1572-1636``).
Operates on (rays, samples, views, feat) tensors; every Dense is a fused MXU
matmul over the flattened leading axes.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def fused_mean_variance(x, w):
    """Weighted mean/var over the view axis (utils.py:153-157)."""
    mean = jnp.sum(x * w, axis=2, keepdims=True)
    var = jnp.sum(w * (x - mean) ** 2, axis=2, keepdims=True)
    return mean, var


class IBRRenderingHead(nn.Module):
    in_channels: int = 37          # 32 + 5 (reference default)
    in_feat_ch: int = 32           # accepted for config parity (unused)
    n_samples: int = 64            # accepted for config parity (unused)

    @nn.compact
    def __call__(self, rgb_feats, ray_diffs, proj_mask):
        """Blend source-view colors into a per-sample color.

        Args:
          rgb_feats: (R, S, V, C) colors+features per view (C >= 3, rgb first).
          ray_diffs: (R, S, V, 4) ray-direction difference encoding.
          proj_mask: (R, S, V, 1) projection validity.
        Returns:
          (R, S, 3) blended color.
        """
        V = rgb_feats.shape[2]
        ch = self.in_channels + 3
        dt = rgb_feats.dtype

        ani_al = self.param("ani_al", nn.initializers.constant(0.2), ())

        dir_feat = nn.Dense(16, name="ray0", dtype=dt)(ray_diffs)
        dir_feat = nn.elu(dir_feat)
        dir_feat = nn.Dense(ch, name="ray1", dtype=dt)(dir_feat)
        dir_feat = nn.elu(dir_feat)

        src_rgb = rgb_feats[..., :3]
        rgb_feats = jnp.concatenate(
            [rgb_feats[..., :ch] + dir_feat, rgb_feats[..., ch:]], -1)

        # anisotropy weights in f32 (exp + tiny-eps normalization), cast after
        dot_prod = ray_diffs[..., 3:4].astype(jnp.float32)
        exp_dot = jnp.exp(jnp.abs(ani_al) * (dot_prod - 1.0))
        weight = (exp_dot - jnp.min(exp_dot, axis=2, keepdims=True)) \
            * proj_mask.astype(jnp.float32)
        weight = weight / (jnp.sum(weight, axis=2, keepdims=True) + 1e-8)
        weight = weight.astype(dt)

        mean, var = fused_mean_variance(rgb_feats, weight)
        fused = jnp.concatenate([mean, var], -1)            # (R, S, 1, 2ch)
        x = jnp.concatenate(
            [jnp.broadcast_to(fused, fused.shape[:2] + (V, fused.shape[-1])),
             rgb_feats], -1)
        x = nn.elu(nn.Dense(64, name="base0", dtype=dt)(x))
        x = nn.elu(nn.Dense(32, name="base1", dtype=dt)(x))

        pv = nn.elu(nn.Dense(32, name="vis1a", dtype=dt)(x * weight))
        pv = nn.elu(nn.Dense(33, name="vis1b", dtype=dt)(pv))
        res, vis = pv[..., :-1], pv[..., -1:]
        x = x + res
        vis_in = x * nn.sigmoid(vis) * proj_mask
        vis = nn.sigmoid(nn.Dense(1, name="vis2b", dtype=dt)(
            nn.elu(nn.Dense(32, name="vis2a", dtype=dt)(vis_in)))) * proj_mask

        o = jnp.concatenate([x, vis, ray_diffs], -1)
        o = nn.elu(nn.Dense(16, name="out0", dtype=dt)(o))
        o = nn.elu(nn.Dense(8, name="out1", dtype=dt)(o))
        o = nn.Dense(1, name="out2", dtype=dt)(o)
        # the softmax blend runs in f32 (masked -1e4 logits underflow in bf16)
        o = jnp.where(proj_mask == 0, -1e4, o.astype(jnp.float32))
        blend = jax_softmax_views(o).astype(dt)
        return jnp.sum(src_rgb * blend, axis=2)


def jax_softmax_views(x):
    return nn.softmax(x, axis=2)
