"""Native C++ geometry library vs the JAX ops (independent implementations)."""

import numpy as np
import jax.numpy as jnp
import pytest

from vanerf_tpu import native
from vanerf_tpu.ops.mesh_query import point_mesh_query
from vanerf_tpu.ops.rasterize import rasterize_zbuffer
from oracles import make_icosphere

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_point_mesh_query_matches_jax(rng):
    verts, faces = make_icosphere(subdiv=2)
    tri = verts[faces]
    pts = rng.normal(size=(256, 3)).astype(np.float32)
    d2n, idxn, windn = native.point_mesh_query_native(pts, tri)
    d2j, idxj, windj = point_mesh_query(jnp.asarray(pts), jnp.asarray(tri),
                                        chunk=64)
    np.testing.assert_allclose(d2n, np.asarray(d2j), rtol=1e-4, atol=1e-7)
    # argmin may differ across f32/f64 on ties (near-center points are
    # almost equidistant to every sphere face) — require that whenever the
    # index differs, the two faces are distance-ties.
    idxj = np.asarray(idxj)
    mism = np.where(idxn != idxj)[0]
    from oracles import point_triangle_dist_oracle
    for i in mism:
        da = point_triangle_dist_oracle(pts[i], *tri[idxn[i]])
        db = point_triangle_dist_oracle(pts[i], *tri[idxj[i]])
        assert abs(da - db) < 1e-3 * max(da, 1e-6), (i, da, db)
    # native winding is ray-crossing (integer); jax default solid-angle
    np.testing.assert_allclose((windn > 0.5), (np.asarray(windj) > 0.5))


def test_native_rasterize_matches_jax(rng):
    verts, faces = make_icosphere(subdiv=2)
    H = W = 64
    xy = (verts[:, :2] * 0.4 + 0.5) * (W - 1)
    z = verts[:, 2] + 2.0
    fn, bn, zn = native.rasterize_native(xy, z, faces, H, W)
    fj, bj, zj = rasterize_zbuffer(jnp.asarray(xy.astype(np.float32)),
                                   jnp.asarray(z.astype(np.float32)),
                                   jnp.asarray(faces), H, W)
    fj = np.asarray(fj)
    agree = (fn == fj).mean()
    assert agree > 0.995          # ties on shared edges may differ
    m = (fn == fj) & (fn >= 0)
    np.testing.assert_allclose(bn[m], np.asarray(bj)[m], atol=1e-3)
    np.testing.assert_allclose(zn[m], np.asarray(zj)[m], rtol=1e-4)
