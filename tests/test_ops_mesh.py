"""Golden tests for point-mesh SDF / winding / barycentric kernels."""

import numpy as np
import jax.numpy as jnp
import pytest

from vanerf_tpu.ops import mesh_query as mq
from oracles import (point_triangle_dist_oracle, winding_number_oracle,
                     make_icosphere)


def test_point_triangle_distance_matches_oracle(rng):
    tris = rng.normal(size=(50, 3, 3)).astype(np.float32)
    pts = rng.normal(size=(50, 3)).astype(np.float32) * 2.0
    d2 = mq.point_triangle_sq_dist(
        jnp.asarray(pts), jnp.asarray(tris[:, 0]),
        jnp.asarray(tris[:, 1]), jnp.asarray(tris[:, 2]))
    got = np.sqrt(np.asarray(d2))
    want = np.array([
        point_triangle_dist_oracle(pts[i], *tris[i]) for i in range(50)])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_winding_number_inside_outside(rng):
    verts, faces = make_icosphere(subdiv=1)
    tri = jnp.asarray(verts)[jnp.asarray(faces)]
    inside = rng.normal(size=(20, 3)).astype(np.float32)
    inside = inside / np.linalg.norm(inside, axis=1, keepdims=True) * 0.5
    outside = inside * 4.0
    pts = np.concatenate([inside, outside], 0)
    w = np.asarray(mq.winding_number(jnp.asarray(pts), tri, chunk=16))
    assert np.all(w[:20] > 0.9)
    assert np.all(np.abs(w[20:]) < 0.1)
    # cross-check a few against the scalar oracle
    for i in [0, 5, 25, 35]:
        want = winding_number_oracle(pts[i], verts, faces)
        assert abs(w[i] - want) < 1e-3


def test_point_mesh_sdf_sign_and_value(rng):
    verts, faces = make_icosphere(subdiv=2)
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    r = np.linalg.norm(pts, axis=1)
    sdf, face_idx = mq.point_mesh_sdf(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pts), chunk=32)
    sdf = np.asarray(sdf)
    # icosphere radius 1: sdf ~ r - 1 (within facet chord error)
    np.testing.assert_allclose(sdf, r - 1.0, atol=0.02)
    assert np.asarray(face_idx).min() >= 0
    assert np.asarray(face_idx).max() < faces.shape[0]


def test_two_component_interpenetration():
    """A point inside BOTH of two overlapping spheres must be inside
    (winding ~2) — the case ray-parity methods get wrong for
    interpenetrating hands."""
    v1, f1 = make_icosphere(subdiv=1, center=(-0.3, 0, 0))
    v2, f2 = make_icosphere(subdiv=1, center=(0.3, 0, 0))
    verts = np.concatenate([v1, v2], 0)
    faces = np.concatenate([f1, f2 + len(v1)], 0)
    pts = np.array([[0.0, 0.0, 0.0], [5.0, 0.0, 0.0]], dtype=np.float32)
    sdf, _ = mq.point_mesh_sdf(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pts), chunk=2)
    assert float(sdf[0]) < 0.0
    assert float(sdf[1]) > 0.0


def test_barycentric_of_projection(rng):
    tris = rng.normal(size=(30, 3, 3)).astype(np.float32)
    w = rng.random(size=(30, 3)).astype(np.float32)
    w = w / w.sum(1, keepdims=True)
    pts = np.einsum("nk,nkd->nd", w, tris)
    # offset along the normal: projection must recover the same barycentrics
    n = np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0])
    n = n / np.linalg.norm(n, axis=1, keepdims=True)
    pts_off = pts + 0.37 * n
    got = np.asarray(mq.barycentric_of_projection(
        jnp.asarray(pts_off), jnp.asarray(tris)))
    np.testing.assert_allclose(got, w, rtol=2e-3, atol=2e-3)


def test_cal_vis_sdf_shapes(rng):
    verts, faces = make_icosphere(subdiv=1)
    vis = (rng.random(size=(len(verts), 1)) > 0.5).astype(np.float32)
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    sdf, qvis, cface = mq.cal_vis_sdf(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(pts),
        jnp.asarray(vis), chunk=8)
    assert sdf.shape == (40,)
    assert qvis.shape == (40, 1)
    assert cface.shape == (40, 3)
    assert set(np.unique(np.asarray(qvis))) <= {0.0, 1.0}
