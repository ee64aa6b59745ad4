"""LPIPS (AlexNet backbone) in JAX — eval-only perceptual metric.

Parity target: ``lpips.LPIPS(net='alex')`` as used by the reference
evaluator (``src/evaluator.py:11,47-64``).  Weights must be converted once
from the torch `lpips` package with ``tools/convert_lpips.py`` into an npz
(backbone convs + linear calibration heads); at eval time set
``VANERF_LPIPS_NPZ`` to that file.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

# AlexNet feature extractor: (out_ch, kernel, stride, pad) per conv
_ALEX = [(64, 11, 4, 2), (192, 5, 1, 2), (384, 3, 1, 1),
         (256, 3, 1, 1), (256, 3, 1, 1)]
_POOL_AFTER = {0, 1}          # maxpool after convs 0 and 1 (and before 2)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, npz_path: str):
        raw = dict(np.load(npz_path))
        self.conv_w = [jnp.asarray(raw[f"conv{i}.weight"]) for i in range(5)]
        self.conv_b = [jnp.asarray(raw[f"conv{i}.bias"]) for i in range(5)]
        self.lin_w = [jnp.asarray(raw[f"lin{i}.weight"]) for i in range(5)]

    def _features(self, x):
        """x: (1, H, W, 3) scaled to [-1, 1]."""
        x = (x - _SHIFT) / _SCALE
        feats = []
        for i, (ch, k, s, p) in enumerate(_ALEX):
            w = self.conv_w[i]           # (out, in, k, k) torch layout
            w = jnp.transpose(w, (2, 3, 1, 0))
            x = jax.lax.conv_general_dilated(
                x, w, (s, s), [(p, p), (p, p)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = x + self.conv_b[i]
            x = jax.nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = -jax.lax.reduce_window(
                    -x, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 2, 2, 1),
                    "VALID")
        return feats

    def __call__(self, img0: np.ndarray, img1: np.ndarray) -> float:
        """img*: (H, W, 3) in [0, 1]."""
        a = jnp.asarray(img0)[None] * 2.0 - 1.0
        b = jnp.asarray(img1)[None] * 2.0 - 1.0
        fa = self._features(a)
        fb = self._features(b)
        total = 0.0
        for i, (x, y) in enumerate(zip(fa, fb)):
            xn = x / (jnp.linalg.norm(x, axis=-1, keepdims=True) + 1e-10)
            yn = y / (jnp.linalg.norm(y, axis=-1, keepdims=True) + 1e-10)
            d = (xn - yn) ** 2                        # (1, H, W, C)
            w = self.lin_w[i].reshape(1, 1, 1, -1)    # 1x1 conv weights
            total = total + (d * w).sum(-1).mean()
        return float(total)
