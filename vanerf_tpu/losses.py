"""Losses: pixel losses, VGG perceptual loss, SSIM — pure JAX.

Parity targets: ``pix_loss``/``compute_error_nerf``/``compute_error``
(reference ``src/utils.py:159-328``) and ``VGGLoss`` (``utils.py:882-937``).

VGG19 weights: torchvision's pretrained download is unavailable in a
zero-egress build environment, so the perceptual network is a faithful VGG19
feature stack whose weights load from ``VANERF_VGG19_NPZ`` (convert once with
``tools/convert_vgg.py``) and otherwise fall back to a fixed-seed random
init — random deep features are still a useful perceptual metric
(random-weight perceptual losses are a known baseline) and keep the loss
total well-defined.  The flag is recorded so eval reports are explicit about
which variant ran.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------------------
# pixel losses (utils.py:293-328)
# --------------------------------------------------------------------------


def pix_loss(src: jnp.ndarray, tar: jnp.ndarray,
             w_losses: Dict[str, float]) -> Dict[str, jnp.ndarray]:
    """Weighted pixel losses on (B, H, W, C) images."""
    losses = {}
    for k, v in w_losses.items():
        if v <= 0.0:
            continue
        if k == "l1":
            losses[k] = v * jnp.abs(src - tar).mean()
        elif k == "l2":
            losses[k] = v * ((src - tar) ** 2).mean()
        elif k == "lp":
            losses[k] = v * ((jnp.abs(src - tar) + 1e-4) ** 0.4).mean()
        elif k == "ssim":
            losses[k] = v * (1.0 - ssim(src, tar).mean())
        elif "l1top" in k or "l2top" in k:
            ratio = float(k[5:]) / 100.0
            d = jnp.abs(src - tar) if "l1" in k else (src - tar) ** 2
            d = d.sum(-1).reshape(src.shape[0], -1)
            kk = max(int(d.shape[1] * ratio), 1)
            top = jax.lax.top_k(d, kk)[0]
            losses[k] = v * top.mean()
    return losses


# --------------------------------------------------------------------------
# SSIM (replaces kornia.metrics.ssim / skimage structural_similarity)
# --------------------------------------------------------------------------

def _avg_filter(img, win: int):
    # depthwise box filter on (B, H, W, C)
    k = jnp.ones((win, win, 1, 1), img.dtype) / (win * win)
    C = img.shape[-1]
    k = jnp.tile(k, (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        img, k, (1, 1), "VALID", feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def ssim(img0: jnp.ndarray, img1: jnp.ndarray, win: int = 7,
         max_val: float = 1.0) -> jnp.ndarray:
    """Per-pixel SSIM map with a box window (kornia-style defaults).

    Args:
      img0/img1: (B, H, W, C) in [0, max_val].
    Returns:
      (B, H', W', C) SSIM map (valid region).
    """
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    mu0 = _avg_filter(img0, win)
    mu1 = _avg_filter(img1, win)
    mu00, mu11, mu01 = mu0 * mu0, mu1 * mu1, mu0 * mu1
    s00 = _avg_filter(img0 * img0, win) - mu00
    s11 = _avg_filter(img1 * img1, win) - mu11
    s01 = _avg_filter(img0 * img1, win) - mu01
    num = (2 * mu01 + c1) * (2 * s01 + c2)
    den = (mu00 + mu11 + c1) * (s00 + s11 + c2)
    return num / den


def psnr(img0: jnp.ndarray, img1: jnp.ndarray,
         max_val: float = 1.0) -> jnp.ndarray:
    """PSNR over the full tensor (evaluator.py:15-19)."""
    mse = jnp.mean((img0 - img1) ** 2)
    return -10.0 * jnp.log(mse / (max_val ** 2)) / jnp.log(10.0)


# --------------------------------------------------------------------------
# VGG19 perceptual loss
# --------------------------------------------------------------------------

_VGG_SLICES = (  # conv layer channel plan up to relu4_1 (utils.py:895-902)
    (64, 64),            # slice1: conv1_1 (+relu)  [torch features 0..1]
    (128, 128),          # slice2: conv1_2, pool, conv2_1   [2..6]
    (256,),              # slice3: conv2_2, pool, conv3_1   [7..11]
    (256, 256, 512),     # slice4: conv3_2..relu(conv4_1)   [12..20]
)


class Vgg19Features(nn.Module):
    """VGG19 feature slices matching the reference's 4-slice split."""

    @nn.compact
    def __call__(self, x):
        outs = []
        # torch feature indices: convs at 0,2,5,7,10,12,14,16,19; pools 4,9,18
        def conv(ch, name):
            return nn.Conv(ch, (3, 3), padding=1, name=name)

        def pool(h):
            return nn.max_pool(h, (2, 2), strides=(2, 2))

        h = nn.relu(conv(64, "conv1_1")(x))
        outs.append(h)                       # relu1_1  (slice1)
        h = nn.relu(conv(64, "conv1_2")(h))
        h = pool(h)
        h = nn.relu(conv(128, "conv2_1")(h))
        outs.append(h)                       # relu2_1  (slice2)
        h = nn.relu(conv(128, "conv2_2")(h))
        h = pool(h)
        h = nn.relu(conv(256, "conv3_1")(h))
        outs.append(h)                       # relu3_1  (slice3)
        h = nn.relu(conv(256, "conv3_2")(h))
        h = nn.relu(conv(256, "conv3_3")(h))
        h = nn.relu(conv(256, "conv3_4")(h))
        h = pool(h)
        h = nn.relu(conv(512, "conv4_1")(h))
        outs.append(h)                       # relu4_1  (slice4 ends at
        return outs                          # torch features idx 20)


_IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGGLoss:
    """4-slice VGG19 L1 feature-matching loss (utils.py:917-937)."""

    weights = (1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

    def __init__(self, params=None, dummy_hw: int = 64):
        self.net = Vgg19Features()
        self.pretrained = False
        if params is None:
            path = os.environ.get("VANERF_VGG19_NPZ", "")
            if path and os.path.exists(path):
                params = self._load_npz(path)
                self.pretrained = True
            else:
                import logging
                # surface this loudly: with random features the training
                # objective differs from the reference's pretrained VGG
                # (lambda_vgg=1); convert once with tools/convert_vgg.py
                # and set VANERF_VGG19_NPZ when egress exists.
                logging.getLogger("vanerf_tpu").warning(
                    "VGGLoss: vgg_random_init=true (no VANERF_VGG19_NPZ; "
                    "fixed-seed random VGG features stand in for the "
                    "pretrained torchvision weights)")
                params = self.net.init(
                    jax.random.PRNGKey(19),
                    jnp.zeros((1, dummy_hw, dummy_hw, 3)))
        self.params = params

    def _load_npz(self, path):
        raw = dict(np.load(path))
        params = {"params": {}}
        for k, v in raw.items():
            layer, kind = k.rsplit(".", 1)
            params["params"].setdefault(layer, {})[kind] = jnp.asarray(v)
        return params

    def __call__(self, x, y):
        """L1 distance between feature slices of (B, H, W, 3) images."""
        x = (x - _IMAGENET_MEAN) / _IMAGENET_STD
        y = (y - _IMAGENET_MEAN) / _IMAGENET_STD
        fx = self.net.apply(self.params, x)
        fy = self.net.apply(self.params, y)
        loss = 0.0
        for w, a, b in zip(self.weights, fx, fy):
            loss = loss + w * jnp.abs(a - jax.lax.stop_gradient(b)).mean()
        return loss


# --------------------------------------------------------------------------
# total generator reconstruction error (utils.py:219-291)
# --------------------------------------------------------------------------

def compute_error_nerf(out_nerf: Dict[str, jnp.ndarray], lambdas: Dict,
                       vggloss: Optional[VGGLoss]) -> Dict[str, jnp.ndarray]:
    err = {}
    l_l1_c = lambdas.get("lambda_l1_c", 10.0)
    l_aux = lambdas.get("lambda_aux", 1.0)
    l_mloss = lambdas.get("lambda_mloss", 0.0)
    pix_weights = {"l1": lambdas.get("lambda_l1", 10.0),
                   "l2": lambdas.get("lambda_l2", 0.0),
                   "lp": lambdas.get("lambda_lp", 0.0),
                   "ssim": lambdas.get("lambda_ssim", 0.0)}

    loss_pix_c = 0.0
    if "tex_cal" in out_nerf and l_l1_c > 0.0:
        loss_pix_c += pix_loss(out_nerf["tex_cal"], out_nerf["tar_img"],
                               {"l1": l_l1_c})["l1"]
    if "tex_aux_cal" in out_nerf and l_l1_c > 0.0 and l_aux > 0.0:
        loss_pix_c += l_aux * pix_loss(
            out_nerf["tex_aux_cal"], out_nerf["tar_img"], {"l1": l_l1_c})["l1"]
    if not isinstance(loss_pix_c, float):
        err["e_pix_c"] = loss_pix_c

    if "tex_cal_fine" in out_nerf:
        for k, v in pix_loss(out_nerf["tex_cal_fine"], out_nerf["tar_img"],
                             pix_weights).items():
            err[f"e_pix_{k}"] = v

    if l_mloss > 0.0 and "alpha" in out_nerf and "tar_alpha" in out_nerf:
        ta = out_nerf["tar_alpha"].reshape(out_nerf["alpha"].shape)
        err["mask_loss_c"] = l_mloss * jnp.mean(
            (jnp.clip(out_nerf["alpha"], -0.001, 1.0) - ta) ** 2)
    if l_mloss > 0.0 and "alpha_fine" in out_nerf and "tar_alpha" in out_nerf:
        ta = out_nerf["tar_alpha"].reshape(out_nerf["alpha_fine"].shape)
        err["mask_loss_f"] = l_mloss * jnp.mean(
            (jnp.clip(out_nerf["alpha_fine"], -0.001, 1.0) - ta) ** 2)

    if vggloss is not None:
        l_vgg = lambdas.get("lambda_vgg", 1.0)
        loss_vgg = 0.0
        if "tex_cal" in out_nerf:
            loss_vgg += l_vgg * vggloss(out_nerf["tex_cal"],
                                        out_nerf["tar_img"])
        if "tex_cal_fine" in out_nerf:
            loss_vgg += l_vgg * vggloss(out_nerf["tex_cal_fine"],
                                        out_nerf["tar_img"])
        if not isinstance(loss_vgg, float):
            err["e_vgg"] = loss_vgg
    return err


def compute_error(out_nerf: Dict[str, jnp.ndarray], lambdas: Dict,
                  vggloss: Optional[VGGLoss]):
    """Total loss + error dict (utils.py:159-178)."""
    err = compute_error_nerf(out_nerf, lambdas, vggloss)
    loss = 0.0
    for v in err.values():
        loss = loss + v
    err["e_all"] = loss
    return loss, err
