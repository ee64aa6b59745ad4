"""Tests for voxel ops, the sp_conv fusion branch, and mesh utilities."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

# dense-3D-conv branch compiles are minutes-slow on CPU
pytestmark = pytest.mark.slow

from vanerf_tpu.ops.voxel import (scatter_to_grid, grid_sample_3d,
                                  world_to_grid_coords)
from vanerf_tpu.mano.mesh import edge_subdivide, face_vertices, vertex_normals
from oracles import make_icosphere


def test_scatter_and_sample_roundtrip(rng):
    feat = rng.normal(size=(5, 4)).astype(np.float32)
    coord = np.array([[1, 2, 3], [0, 0, 0], [7, 7, 7], [1, 2, 3], [4, 5, 6]],
                     np.int32)
    vol = scatter_to_grid(jnp.asarray(feat), jnp.asarray(coord), (8, 8, 8))
    assert vol.shape == (8, 8, 8, 4)
    # colliding vertices averaged
    np.testing.assert_allclose(np.asarray(vol)[1, 2, 3],
                               (feat[0] + feat[3]) / 2, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(vol)[4, 5, 6], feat[4], rtol=1e-5)

    # sample exactly at voxel centers (align_corners=True mapping)
    def to_norm(c, n=8):
        return 2.0 * c / (n - 1.0) - 1.0
    pts = np.stack([to_norm(coord[:, 2]), to_norm(coord[:, 1]),
                    to_norm(coord[:, 0])], -1).astype(np.float32)
    got = np.asarray(grid_sample_3d(vol, jnp.asarray(pts)))
    np.testing.assert_allclose(got[4], feat[4], rtol=1e-4)


def test_grid_sample_3d_out_of_bounds_zero():
    vol = jnp.ones((4, 4, 4, 2))
    pts = jnp.asarray([[2.5, 0.0, 0.0], [-2.5, 0.0, 0.0]])
    out = np.asarray(grid_sample_3d(vol, pts))
    np.testing.assert_allclose(out, 0.0)


def test_world_to_grid_coords_center():
    bounds = jnp.asarray([[0.0, 0.0, 0.0], [0.32, 0.32, 0.32]])
    out_sh = (64, 64, 64)
    pts = jnp.asarray([[0.16, 0.16, 0.16]])
    g = np.asarray(world_to_grid_coords(pts, bounds, out_sh))
    np.testing.assert_allclose(g, 0.0, atol=1e-5)


def test_edge_subdivide_counts():
    verts, faces = make_icosphere(subdiv=0)
    v2, f2, edges = edge_subdivide(verts, faces)
    # icosahedron: 12 verts, 20 faces, 30 edges
    assert edges.shape == (30, 2)
    assert v2.shape == (12 + 30, 3)
    assert f2.shape == (80, 3)
    # midpoints actually lie between their edge endpoints
    np.testing.assert_allclose(
        v2[12:], 0.5 * (verts[edges[:, 0]] + verts[edges[:, 1]]), rtol=1e-6)


def test_vertex_normals_sphere_point_outward():
    verts, faces = make_icosphere(subdiv=2)
    n = np.asarray(vertex_normals(jnp.asarray(verts), jnp.asarray(faces)))
    cos = (n * verts / np.linalg.norm(verts, axis=1, keepdims=True)).sum(1)
    assert cos.min() > 0.9


def test_face_vertices_gather():
    verts, faces = make_icosphere(subdiv=0)
    fv = np.asarray(face_vertices(jnp.asarray(verts), jnp.asarray(faces)))
    np.testing.assert_allclose(fv, verts[faces])


def test_sp_conv_model_forward_tiny():
    from vanerf_tpu import config as vconfig
    from vanerf_tpu.models import VANeRF

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["sp_conv"] = True
    m["geo_args"]["n_downsample"] = 2
    model = VANeRF.from_config(cfg, num_v=10)
    model = model.clone(voxel_grid=(32, 32, 32))

    B, V2, H, W = 1, 20, 32, 32
    n = 8
    key = jax.random.PRNGKey(0)
    im = jnp.ones((B, H, W, 3)) * 0.5
    fg = jnp.ones((B, H, W, 1))
    pts = jax.random.normal(key, (B, n, 3)) * 0.05
    view = jnp.ones((B, n, 3)) / np.sqrt(3)
    K = jnp.eye(4).at[0, 0].set(100.0).at[1, 1].set(100.0) \
        .at[0, 2].set(W / 2).at[1, 2].set(H / 2)[None]
    Rt = jnp.eye(4).at[2, 3].set(1.0)[None]
    cam = {"KRT": K @ Rt, "extrin": Rt, "width": W, "height": H,
           "znear": 0.5, "zfar": 2.0}
    verts = jax.random.normal(jax.random.PRNGKey(1), (B, V2, 3)) * 0.05
    bounds = jnp.asarray([[[-0.1, -0.1, -0.1], [0.1, 0.1, 0.1]]])
    args = (im, pts, view, cam, fg, verts, jnp.ones((B, V2, 1)),
            jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
            jnp.zeros((B, 42, 3)), 4, 1)
    variables = model.init(key, *args, bounds=bounds)
    out, valid = model.apply(variables, *args, bounds=bounds)
    assert out.shape == (B, n, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_sp_conv_model_grads_finite_tiny():
    """The voxel branch must be differentiable end-to-end (scatter /
    trilinear-sample VJPs): grads of a scalar loss wrt params are finite
    and not identically zero."""
    from vanerf_tpu import config as vconfig
    from vanerf_tpu.models import VANeRF

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["sp_conv"] = True
    m["geo_args"]["n_downsample"] = 2
    model = VANeRF.from_config(cfg, num_v=10)
    model = model.clone(voxel_grid=(32, 32, 32))

    B, V2, H, W = 1, 20, 32, 32
    n = 8
    key = jax.random.PRNGKey(0)
    im = jnp.ones((B, H, W, 3)) * 0.5
    fg = jnp.ones((B, H, W, 1))
    pts = jax.random.normal(key, (B, n, 3)) * 0.05
    view = jnp.ones((B, n, 3)) / np.sqrt(3)
    K = jnp.eye(4).at[0, 0].set(100.0).at[1, 1].set(100.0) \
        .at[0, 2].set(W / 2).at[1, 2].set(H / 2)[None]
    Rt = jnp.eye(4).at[2, 3].set(1.0)[None]
    cam = {"KRT": K @ Rt, "extrin": Rt, "width": W, "height": H,
           "znear": 0.5, "zfar": 2.0}
    verts = jax.random.normal(jax.random.PRNGKey(1), (B, V2, 3)) * 0.05
    bounds = jnp.asarray([[[-0.1, -0.1, -0.1], [0.1, 0.1, 0.1]]])
    args = (im, pts, view, cam, fg, verts, jnp.ones((B, V2, 1)),
            jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
            jnp.zeros((B, 42, 3)), 4, 1)
    variables = model.init(key, *args, bounds=bounds)

    def loss(v):
        out, valid = model.apply(v, *args, bounds=bounds)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables)
    leaves = jax.tree.leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    total = sum(float(jnp.sum(jnp.abs(x))) for x in leaves)
    assert total > 0
