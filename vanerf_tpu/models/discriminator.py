"""Visibility-aware GAN discriminator + GAN losses.

Parity target: ``Discriminator_vis`` and ``d_logistic_loss`` /
``d_r1_loss`` / ``g_nonsaturating_loss`` (reference
``src/networks.py:535-601``).  Channels-last; the R1 gradient penalty is
taken with `jax.grad` through the discriminator apply (no autograd graphs —
just a nested vjp under the same jit).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class DiscriminatorVis(nn.Module):
    """Global real/fake score + per-pixel visibility prediction.

    Input: (B, H, W, 12) = concat(input_img 3, input_densepose 3,
    tar_densepose 3, pred 3).
    Returns: gan_pred (B, 1) in (0,1), vis_map (B, H, W, 1) in (0,1).
    """

    @nn.compact
    def __call__(self, input_img, input_densepose, tar_densepose, pred):
        img = jnp.concatenate(
            [input_img, input_densepose, tar_densepose, pred], -1)  # 12ch

        # global head (fconv3 + linear, networks.py:539-545, 564-569)
        g = nn.relu(nn.Conv(10, (3, 3), padding=1, name="g0")(img))
        g = nn.relu(nn.Conv(10, (3, 3), padding=1, name="g1")(g))
        g = g.mean(axis=(1, 2))                                    # (B, 10)
        gan = nn.relu(nn.Dense(3, name="gl0")(g))
        gan = nn.sigmoid(nn.Dense(1, name="gl1")(gan))

        # per-pixel visibility head (fconv4 -> concat -> fconv2)
        v = nn.relu(nn.Conv(20, (3, 3), padding=1, name="v0")(img))
        v = nn.relu(nn.Conv(20, (3, 3), padding=1, name="v1")(v))
        v = nn.Conv(12, (3, 3), padding=1, name="v2")(v)
        vc = jnp.concatenate([img, v], -1)                         # 24ch
        v = nn.relu(nn.Conv(30, (3, 3), padding=1, name="p0")(vc))
        v = nn.relu(nn.Conv(20, (3, 3), padding=1, name="p1")(v))
        v = nn.sigmoid(nn.Conv(1, (3, 3), padding=1, name="p2")(v))
        return gan, v


def d_logistic_loss(real_pred, fake_pred):
    """softplus(-real) + softplus(fake) (networks.py:584-588)."""
    return (jax.nn.softplus(-real_pred).mean()
            + jax.nn.softplus(fake_pred).mean())


def g_nonsaturating_loss(fake_pred):
    """softplus(-fake) (networks.py:599-601)."""
    return jax.nn.softplus(-fake_pred).mean()


def d_r1_loss(disc_apply, params, input_img, input_densepose, tar_densepose,
              real_img):
    """R1 gradient penalty: ||d D(real)/d real||^2 (networks.py:591-597)."""
    def score(x):
        pred, _ = disc_apply(params, input_img, input_densepose,
                             tar_densepose, x)
        return pred.sum()

    grad = jax.grad(score)(real_img)
    return (grad ** 2).reshape(grad.shape[0], -1).sum(1).mean()


def bce_loss(pred, target, eps: float = 1e-7):
    """Elementwise binary cross entropy on probabilities (torch nn.BCELoss
    semantics used at ``model.py:399-402``)."""
    p = jnp.clip(pred, eps, 1.0 - eps)
    return -(target * jnp.log(p) + (1.0 - target) * jnp.log(1.0 - p))
