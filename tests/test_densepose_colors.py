"""Vendored densepose color table (reference ``v_color.pkl``) tests.

Densepose images are model inputs (discriminator channels, dataset
tensors), so the preprocessor must use the reference's shipped 778x3
dense-coordinate table with its 779-seal expansion
(``src/render_vis.py:101-105``) — not procedural colors.
"""

import os.path as osp
import pickle

import numpy as np
import pytest

from vanerf_tpu.data.densepose import dense_coor_table, densepose_colors

REF_PKL = "/root/reference/processed_dataset/v_color.pkl"


def test_table_matches_reference_asset():
    """The vendored npz must be byte-identical to the reference pickle."""
    if not osp.exists(REF_PKL):
        pytest.skip("reference asset not present")
    with open(REF_PKL, "rb") as f:
        ref = np.asarray(pickle.load(f), np.float32)
    table = dense_coor_table()
    assert table.shape == (1558, 3)
    np.testing.assert_array_equal(table[:778], ref)


def test_seal_expansion_layout():
    """cat(dense, dense[-1], dense, dense[-1]) — ref render_vis.py:105."""
    t = dense_coor_table()
    np.testing.assert_array_equal(t[778], t[777])      # right-hand seal
    np.testing.assert_array_equal(t[1557], t[1556])    # left-hand seal
    np.testing.assert_array_equal(t[779:1557], t[:778])
    assert t.dtype == np.float32
    assert 0.0 <= t.min() and t.max() <= 1.0


def test_densepose_colors_hand_switch():
    """verts > 800 -> full 1558 table; else first 779 rows
    (ref dataset_process.py:76-79)."""
    np.testing.assert_array_equal(densepose_colors(1558), dense_coor_table())
    np.testing.assert_array_equal(densepose_colors(779),
                                  dense_coor_table()[:779])
    with pytest.raises(AssertionError):
        densepose_colors(778)


def test_preprocessor_renders_reference_table_colors():
    """render_mask_densepose output == numpy re-render from the reference
    table (fails if procedural colors sneak back in)."""
    import sys
    sys.path.insert(0, "/root/repo")
    try:
        from data_process.dataset_process import render_mask_densepose
    finally:
        sys.path.remove("/root/repo")
    import jax.numpy as jnp
    from vanerf_tpu.ops.rasterize import rasterize_zbuffer

    # tiny "two-hand" mesh: 1558 verts, a handful of front-facing tris
    rs = np.random.RandomState(0)
    verts = np.zeros((1558, 3), np.float32)
    verts[:, 2] = 1.0
    tri_ids = rs.choice(1558, size=(8, 3), replace=False).astype(np.int32)
    verts[tri_ids.ravel(), :2] = rs.uniform(-0.08, 0.08,
                                            (24, 2)).astype(np.float32)
    faces = tri_ids
    H = W = 32
    K = np.array([[120.0, 0, W / 2], [0, 120.0, H / 2], [0, 0, 1]],
                 np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)

    mask, dp = render_mask_densepose(verts, faces, K, R, t, H, W)
    assert (mask > 0).any()

    # independent numpy recomposition from the rasterizer outputs + the
    # REFERENCE table
    cam = verts @ R.T + t
    z = cam[:, 2]
    xy = np.stack([cam[:, 0] / z * K[0, 0] + K[0, 2],
                   cam[:, 1] / z * K[1, 1] + K[1, 2]], -1)
    face, bary, _ = rasterize_zbuffer(
        jnp.asarray(xy.astype(np.float32)),
        jnp.asarray(z.astype(np.float32)), jnp.asarray(faces), H, W)
    face = np.asarray(face)
    bary = np.asarray(bary)
    tric = dense_coor_table()[faces]
    exp = (tric[np.maximum(face, 0)] * bary[..., None]).sum(1)
    exp = (exp * (face >= 0)[:, None] * 255).astype(np.uint8)
    np.testing.assert_array_equal(dp, exp.reshape(H, W, 3))
