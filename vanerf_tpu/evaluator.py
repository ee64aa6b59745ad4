"""Evaluation metrics: MSE / PSNR / SSIM (+ LPIPS when weights available).

Parity target: ``Evaluator`` (reference ``src/evaluator.py:7-114``): PSNR on
the full image, SSIM on the mask-at-box bounding-rect crop, per-image
pred/gt/input PNG dumps.  All metrics are JAX/numpy (no skimage/lpips/cv2
dependencies); LPIPS needs converted AlexNet weights (``VANERF_LPIPS_NPZ``)
and reports NaN otherwise — the report says which.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp
from PIL import Image

from .losses import ssim as ssim_map


def bounding_rect(mask: np.ndarray):
    """(x, y, w, h) of the tight bounding box of a binary mask
    (cv2.boundingRect replacement)."""
    ys, xs = np.where(mask > 0)
    if len(xs) == 0:
        return 0, 0, mask.shape[1], mask.shape[0]
    x, y = xs.min(), ys.min()
    return int(x), int(y), int(xs.max() - x + 1), int(ys.max() - y + 1)


def compute_psnr(img_pred: np.ndarray, img_gt: np.ndarray) -> float:
    """-10 log10(mse) (evaluator.py:15-19)."""
    mse = np.mean((img_pred - img_gt) ** 2)
    return float(-10.0 * np.log(mse) / np.log(10.0))


def compute_ssim_crop(img_pred: np.ndarray, img_gt: np.ndarray,
                      mask_at_box: np.ndarray) -> float:
    """Mean SSIM over the mask bounding-rect crop (evaluator.py:21-45).

    Uses a 7x7 box window (skimage default for multichannel float images).
    """
    x, y, w, h = bounding_rect(mask_at_box)
    p = img_pred[y:y + h, x:x + w]
    g = img_gt[y:y + h, x:x + w]
    if min(p.shape[:2]) < 7:
        return float("nan")
    s = ssim_map(jnp.asarray(p)[None], jnp.asarray(g)[None], win=7)
    return float(np.asarray(s).mean())


class Evaluator:
    """Accumulates per-frame scores and dumps pred/gt/input images."""

    def __init__(self, result_dir: Optional[str] = None):
        self.result_dir = result_dir
        self.lpips_fn = _try_load_lpips()

    def compute_score(self, rgb_pred: np.ndarray, rgb_gt: np.ndarray,
                      input_imgs: Optional[np.ndarray] = None,
                      mask_at_box: Optional[np.ndarray] = None,
                      human_idx: str = "0", frame_index: str = "0",
                      view_index: str = "0") -> Dict[str, float]:
        """All images are float (H, W, 3) in [0, 1], channels-last."""
        rgb_pred = np.asarray(rgb_pred)
        rgb_gt = np.asarray(rgb_gt)
        if mask_at_box is None:
            mask_at_box = np.ones(rgb_pred.shape[:2], np.uint8)
        mask_at_box = np.asarray(mask_at_box).squeeze()

        if self.result_dir is not None:
            self._save_images(rgb_pred, rgb_gt, input_imgs, mask_at_box,
                              human_idx, frame_index, view_index)

        mse = float(np.mean((rgb_pred - rgb_gt) ** 2))
        out = {
            "mse": mse,
            "psnr": compute_psnr(rgb_pred, rgb_gt),
            "ssim": compute_ssim_crop(rgb_pred, rgb_gt, mask_at_box),
        }
        if self.lpips_fn is not None and (
                min(bounding_rect(mask_at_box)[2:]) >= 32):
            x, y, w, h = bounding_rect(mask_at_box)
            # PNG round-trip semantics: the reference computes LPIPS on
            # crops saved to PNG and reloaded (src/evaluator.py:47-64), so
            # quantize to uint8 first — keeps the reported number
            # bit-comparable with the reference's definition.
            p8 = _png_roundtrip(rgb_pred[y:y + h, x:x + w])
            g8 = _png_roundtrip(rgb_gt[y:y + h, x:x + w])
            out["lpips"] = float(self.lpips_fn(p8, g8))
        else:
            # no weights, or crop < 32px: AlexNet's stride-4 conv + two
            # 3x3/2 pools leave a 0-size map below ~32px (the reference's
            # torch lpips errors there; its 256^2 mask crops never are)
            out["lpips"] = float("nan")
        return out

    def _save_images(self, pred, gt, inputs, mask_at_box, human_idx,
                     frame_index, view_index):
        human_dir = os.path.join(self.result_dir, str(human_idx))
        x, y, w, h = bounding_rect(mask_at_box)
        for sub, img in [("pred", pred[y:y + h, x:x + w]),
                         ("gt", gt[y:y + h, x:x + w])]:
            d = os.path.join(human_dir, sub)
            os.makedirs(d, exist_ok=True)
            suffix = "_gt" if sub == "gt" else ""
            Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(d, f"frame{frame_index}_view{view_index}"
                             f"{suffix}.png"))
        if inputs is not None:
            d = os.path.join(human_dir, "input")
            os.makedirs(d, exist_ok=True)
            for vi in range(inputs.shape[0]):
                crop = inputs[vi][y:y + h, x:x + w]
                Image.fromarray(
                    (np.clip(crop, 0, 1) * 255).astype(np.uint8)).save(
                    os.path.join(
                        d, f"frame{frame_index}_t_0_view_{view_index}.png"))


def _png_roundtrip(img: np.ndarray) -> np.ndarray:
    """uint8-quantize a float [0,1] image exactly as a PNG save+reload
    would (reference src/evaluator.py:47-64 computes LPIPS on reloaded
    PNG crops; PNG is lossless, so the only effect is the uint8 cast)."""
    return (np.clip(img, 0, 1) * 255).astype(np.uint8).astype(np.float32) / 255.0


def _try_load_lpips():
    """LPIPS-Alex from converted weights; None if unavailable."""
    path = os.environ.get("VANERF_LPIPS_NPZ", "")
    if not path or not os.path.exists(path):
        return None
    from .lpips import LPIPS
    return LPIPS(path)
