"""Densepose vertex-color table (the reference's ``v_color.pkl``).

The reference renders densepose images — model inputs feeding the
discriminator and the dataset tensors — from a shipped 778x3
dense-coordinate table (``data_process/dataset_process.py:54`` /
``src/render_vis.py:101-105``), seal-expanded to 779 rows per hand with
``cat(dense, dense[-1], dense, dense[-1])``.  Procedural colors would be a
model-input-level parity break, so the real table is vendored here as a
data asset (``assets/v_color.npz``, converted from the reference's pickle).

Synthetic fixtures keep their procedural colors (``data/synthetic.py``);
real MANO meshes must use :func:`densepose_colors`.
"""

from __future__ import annotations

import functools
import os.path as osp

import numpy as np

_ASSET = osp.join(osp.dirname(__file__), "assets", "v_color.npz")


@functools.lru_cache(maxsize=1)
def dense_coor_table() -> np.ndarray:
    """The seal-expanded (1558, 3) float32 table.

    Row layout matches the reference's module-scope expansion
    (``src/render_vis.py:105``): [dense(778), dense[-1], dense(778),
    dense[-1]] — the per-hand seal vertex (index 778) reuses the last
    dense coordinate's color.
    """
    dense = np.load(_ASSET)["v_color"].astype(np.float32)   # (778, 3)
    return np.concatenate([dense, dense[-1:], dense, dense[-1:]], axis=0)


def densepose_colors(n_verts: int) -> np.ndarray:
    """Per-vertex densepose colors for a sealed MANO mesh.

    Args:
      n_verts: 779 (one sealed hand) or 1558 (two sealed hands) — the
        reference switches on ``verts.shape[0] > 800``
        (``dataset_process.py:76-79``).
    Returns:
      (n_verts, 3) float32 colors in [0, 1].
    """
    table = dense_coor_table()
    if n_verts > 800:
        assert n_verts == table.shape[0], n_verts
        return table
    assert n_verts == 779, n_verts
    return table[:779]
