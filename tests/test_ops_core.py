"""Tests for grid sampling, rays, sampling, compositing, KNN, rasterizer."""

import numpy as np
import jax
import jax.numpy as jnp

from vanerf_tpu.ops import (feat_sample, ray_bbox_intersection,
                            get_rays_np, get_near_far_np,
                            stratified_sample, importance_sample, rgba2out,
                            knn_gather_1, rasterize_zbuffer,
                            vertex_visibility, render_vis_map)
from vanerf_tpu.ops.ray import pixel_grid_rays
from oracles import make_icosphere


# --------------------------- grid sample -----------------------------------

def torch_grid_sample_oracle(feat, uv):
    import torch
    import torch.nn.functional as F
    t = torch.from_numpy(feat)
    g = torch.from_numpy(uv)[:, :, None]
    out = F.grid_sample(t, g, mode="bilinear", padding_mode="border",
                        align_corners=True)
    return out.view(*out.shape[:2], -1).permute(0, 2, 1).numpy()


def test_feat_sample_matches_torch(rng):
    feat = rng.normal(size=(2, 5, 9, 7)).astype(np.float32)
    uv = (rng.random(size=(2, 33, 2)).astype(np.float32) * 2.6 - 1.3)
    got = np.asarray(feat_sample(jnp.asarray(feat), jnp.asarray(uv)))
    want = torch_grid_sample_oracle(feat, uv)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_two_res_sample_matches_standalone(rng):
    """grid_sample_two_res == two grid_sample_2d calls (one-gather
    scheme; ops/grid_sample.py).  Exercises production 2:1 shapes, an
    uneven ratio, and boundary coordinates."""
    from vanerf_tpu.ops.grid_sample import (feat_sample_two_res_nhwc,
                                            grid_sample_2d)
    for (hf, wf, cf), (hc, wc, cc) in (
            ((16, 16, 5), (8, 8, 3)),       # production-like 2:1
            ((13, 16, 2), (7, 9, 4)),       # uneven, non-square
            ((9, 9, 1), (9, 9, 2))):        # equal resolution (r = 1)
        fine = jnp.asarray(rng.normal(size=(2, hf, wf, cf)),
                           jnp.float32)
        coarse = jnp.asarray(rng.normal(size=(2, hc, wc, cc)),
                             jnp.float32)
        uv = jnp.asarray(rng.random(size=(2, 257, 2)) * 2.6 - 1.3,
                         jnp.float32)
        # include exact corners/edges of the [-1, 1] range
        uv = uv.at[:, :4].set(jnp.asarray(
            [[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0], [1.0, -1.0]]))
        got_f, got_c = feat_sample_two_res_nhwc(fine, coarse, uv)
        want_f = jax.vmap(grid_sample_2d)(fine, uv)
        want_c = jax.vmap(grid_sample_2d)(coarse, uv)
        np.testing.assert_allclose(np.asarray(got_f), np.asarray(want_f),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(got_c), np.asarray(want_c),
                                   rtol=1e-5, atol=1e-6)


def test_two_res_sample_grads_flow(rng):
    """Gradients reach both maps through the fused table build."""
    from vanerf_tpu.ops.grid_sample import grid_sample_two_res
    fine = jnp.asarray(rng.normal(size=(8, 8, 3)), jnp.float32)
    coarse = jnp.asarray(rng.normal(size=(5, 5, 2)), jnp.float32)
    uv = jnp.asarray(rng.random(size=(31, 2)) * 2.0 - 1.0, jnp.float32)

    def loss(fine, coarse):
        f, c = grid_sample_two_res(fine, coarse, uv)
        return (f ** 2).sum() + (c ** 2).sum()

    gf, gc = jax.grad(loss, argnums=(0, 1))(fine, coarse)
    assert np.isfinite(np.asarray(gf)).all()
    assert np.isfinite(np.asarray(gc)).all()
    assert float(jnp.abs(gf).sum()) > 0 and float(jnp.abs(gc).sum()) > 0


# ------------------------------- rays ---------------------------------------

def test_ray_bbox_matches_numpy(rng):
    bounds = np.array([[[-0.3, -0.2, -0.4], [0.5, 0.4, 0.3]]],
                      dtype=np.float32)
    orig = np.array([[[0.0, 0.0, -3.0]]], dtype=np.float32)
    d = rng.normal(size=(1, 200, 3)).astype(np.float32)
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    d[..., 2] = np.abs(d[..., 2])  # point roughly at the box
    near, far, hit = ray_bbox_intersection(
        jnp.asarray(bounds), jnp.asarray(orig), jnp.asarray(d))
    near, far, hit = map(np.asarray, (near, far, hit))

    n_np, f_np, m_np = get_near_far_np(bounds[0],
                                       np.broadcast_to(orig[0], d[0].shape).copy(),
                                       d[0].copy())
    np.testing.assert_array_equal(hit[0, :, 0], m_np)
    np.testing.assert_allclose(near[0, m_np, 0], n_np, rtol=1e-4)
    np.testing.assert_allclose(far[0, m_np, 0], f_np, rtol=1e-4)


def test_pixel_grid_rays_geometry():
    # camera at origin looking down +z with identity R
    K = np.eye(4, dtype=np.float32)[None]
    K[0, 0, 0] = K[0, 1, 1] = 100.0
    K[0, 0, 2] = K[0, 1, 2] = 32.0
    RT = np.eye(4, dtype=np.float32)[None]
    grids = np.array([[[32.0, 32.0], [0.0, 32.0]]], dtype=np.float32)
    cam_pos, rays, zn, zf = pixel_grid_rays(
        jnp.asarray(grids), jnp.asarray(K), jnp.asarray(RT), 0.5, 2.0)
    np.testing.assert_allclose(np.asarray(cam_pos), 0.0, atol=1e-6)
    # center pixel looks straight down +z
    np.testing.assert_allclose(np.asarray(rays)[0, 0], [0, 0, 1], atol=1e-6)
    assert np.asarray(zn)[0, 0, 0] >= 0.5 - 1e-5
    # off-center ray znear is scaled by the ray norm (> plane depth)
    assert np.asarray(zn)[0, 1, 0] > 0.5


# ----------------------------- sampling -------------------------------------

def test_stratified_sample_bounds_and_order():
    zn = jnp.full((4, 10, 1), 2.0)
    zf = jnp.full((4, 10, 1), 3.0)
    z = stratified_sample(zn, zf, 16, rng=jax.random.PRNGKey(0))
    z = np.asarray(z)
    assert z.shape == (4, 10, 16)
    assert (z >= 2.0 - 1e-6).all() and (z <= 3.0 + 1e-6).all()
    assert (np.diff(z, axis=-1) >= -1e-6).all()


def test_importance_sample_concentrates():
    B, N, D = 1, 1, 64
    z = jnp.linspace(0.0, 1.0, D)[None, None]
    contrib = np.zeros((B, N, D - 1), np.float32)
    contrib[..., 30:34] = 100.0  # all mass near z ~ 0.5
    s = importance_sample(jnp.asarray(contrib), z, 128,
                          rng=jax.random.PRNGKey(1))
    s = np.asarray(s)
    assert ((s > 0.4) & (s < 0.6)).mean() > 0.95


def test_importance_sample_uniform_matches_torch_semantics():
    import torch
    B, N, D = 2, 3, 16
    rng = np.random.default_rng(3)
    contrib = rng.random((B, N, D - 1)).astype(np.float32)
    z = np.sort(rng.random((B, N, D)).astype(np.float32), -1)
    got = np.asarray(importance_sample(
        jnp.asarray(contrib), jnp.asarray(z), 8, uniform=True))

    # reference torch implementation (model.py:1424-1462)
    c = torch.from_numpy(contrib) + 1e-5
    pdf = c / c.sum(-1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[:, :, :1]), cdf], 2)
    sample = torch.linspace(0.0, 1.0, steps=8)[None, None].expand(B, N, -1)
    idx = torch.searchsorted(cdf, sample, right=True)
    idx_prev = (idx - 1).clamp(min=0)
    idx = idx.clamp(max=cdf.shape[-1] - 1)
    idx = torch.cat([idx_prev, idx], -1)
    cdf_idx = torch.gather(cdf, -1, idx)
    cdf_prev, cdf_next = cdf_idx[:, :, :8], cdf_idx[:, :, 8:]
    z_idx = torch.gather(torch.from_numpy(z), -1, idx)
    z_prev, z_next = z_idx[:, :, :8], z_idx[:, :, 8:]
    num = sample - cdf_prev
    den = cdf_next - cdf_prev
    den = torch.where(den < 1e-5, torch.ones_like(den), den)
    want = (z_prev + (num / den) * (z_next - z_prev)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# ---------------------------- compositing -----------------------------------

def test_rgba2out_opaque_surface():
    B, N, D = 1, 4, 32
    z = jnp.broadcast_to(jnp.linspace(1.0, 2.0, D), (B, N, D))
    # a hard surface at index 16: sdf flips sign
    query_sdf = jnp.broadcast_to(jnp.linspace(0.5, -0.5, D), (B, N, D))
    rad = jnp.zeros((B, N, D))
    sdf = jnp.zeros((B, N, D))
    rgb = jnp.ones((B, N, D, 3)) * 0.7
    color, depth, acc, contrib, _ = rgba2out(
        rad, sdf, rgb, z, query_sdf, jnp.asarray(0.005))
    color, depth, acc = map(np.asarray, (color, depth, acc))
    np.testing.assert_allclose(acc, 1.0, atol=1e-3)
    np.testing.assert_allclose(color, 0.7, atol=1e-3)
    np.testing.assert_allclose(depth, 1.5, atol=0.05)


# ------------------------------- knn ----------------------------------------

def test_knn_gather_matches_bruteforce(rng):
    B, N, V = 2, 17, 24
    num_v = V // 2
    q = rng.normal(size=(B, N, 3)).astype(np.float32)
    verts = rng.normal(size=(B, V, 3)).astype(np.float32)
    feat = rng.normal(size=(B, V, 5)).astype(np.float32)
    vis = (rng.random(size=(B, V, 1)) > 0.5).astype(np.float32)
    f, f_toh, v, v_toh = knn_gather_1(
        jnp.asarray(q), jnp.asarray(verts), jnp.asarray(feat),
        jnp.asarray(vis), num_v)
    d = np.linalg.norm(q[:, :, None] - verts[:, None], axis=-1)
    idx = d.argmin(-1)
    toh_idx = (idx + num_v) % V
    for b in range(B):
        np.testing.assert_allclose(
            np.asarray(f)[b], feat[b, idx[b]] * vis[b, idx[b]], rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(f_toh)[b], feat[b, toh_idx[b]] * vis[b, toh_idx[b]],
            rtol=1e-4)
        np.testing.assert_allclose(np.asarray(v)[b], vis[b, idx[b]])


# ----------------------------- rasterizer -----------------------------------

def test_rasterizer_sphere_coverage_and_depth():
    verts, faces = make_icosphere(subdiv=2)
    # orthographic-ish: put sphere at image center, depth = z
    H = W = 64
    xy = (verts[:, :2] * 0.4 + 0.5) * (W - 1)
    z = verts[:, 2] + 2.0
    face, bary, zbuf = rasterize_zbuffer(
        jnp.asarray(xy), jnp.asarray(z), jnp.asarray(faces), H, W)
    face = np.asarray(face).reshape(H, W)
    zb = np.asarray(zbuf).reshape(H, W)
    # center pixel hits the near hemisphere (z ~ 1.0)
    assert face[H // 2, W // 2] >= 0
    assert abs(zb[H // 2, W // 2] - 1.0) < 0.05
    # corners are background
    assert face[0, 0] == -1 and face[-1, -1] == -1
    # covered area ~ circle of radius 0.4*63/2... sanity band
    frac = (face >= 0).mean()
    assert 0.3 < frac < 0.7


def test_rasterizer_pallas_matches_xla():
    """The pallas z-buffer kernel (the TPU default inside render_vis_map's
    training-loss path) must agree with the XLA fallback: same hit mask,
    same depths, same barycentrics — face ids may differ only at exact
    z-ties."""
    from vanerf_tpu.ops.rasterize_pallas import rasterize_zbuffer_pallas
    verts, faces = make_icosphere(subdiv=2)
    H, W = 48, 64                       # non-square: catches x/y mixups
    xy = (verts[:, :2] * 0.4 + 0.5) * (min(H, W) - 1)
    z = verts[:, 2] + 2.0
    fa, ba, za = rasterize_zbuffer(
        jnp.asarray(xy), jnp.asarray(z), jnp.asarray(faces), H, W)
    fb, bb, zb = rasterize_zbuffer_pallas(
        jnp.asarray(xy), jnp.asarray(z), jnp.asarray(faces), H, W,
        interpret=True)
    fa, fb = np.asarray(fa), np.asarray(fb)
    za, zb = np.asarray(za), np.asarray(zb)
    np.testing.assert_array_equal(fb >= 0, fa >= 0)
    hit = fa >= 0
    np.testing.assert_allclose(zb[hit], za[hit], rtol=1e-5, atol=1e-6)
    same = fb == fa
    assert same[hit].mean() > 0.99      # ties only at shared edges
    np.testing.assert_allclose(np.asarray(bb)[hit & same],
                               np.asarray(ba)[hit & same],
                               rtol=1e-4, atol=1e-5)


def test_vertex_visibility_front_back():
    verts, faces = make_icosphere(subdiv=2)
    xy01 = (verts[:, :2] * 0.4 + 0.5)
    z01 = (verts[:, 2] + 1.0) / 2.0
    vis = np.asarray(vertex_visibility(
        jnp.asarray(xy01), jnp.asarray(z01), jnp.asarray(faces), size=128))
    front = verts[:, 2] < -0.35
    back = verts[:, 2] > 0.35
    assert vis[front].mean() > 0.9          # near hemisphere visible
    assert vis[back].mean() < 0.15          # far hemisphere occluded


def test_render_vis_map_background_is_one():
    verts, faces = make_icosphere(subdiv=1, radius=0.1,
                                  center=(0.0, 0.0, 1.0))
    vis = np.ones((len(verts), 1), np.float32)
    K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
    Rt = np.eye(4, dtype=np.float32)
    rgb, vmap = render_vis_map(
        jnp.asarray(verts), jnp.asarray(faces), jnp.asarray(vis),
        jnp.asarray(K), jnp.asarray(Rt), 64, 64)
    vmap = np.asarray(vmap)[0]
    assert vmap[0, 0] == 1.0                # background
    assert vmap[32, 32] == 1.0              # visible mesh
    assert 0.02 < (vmap < 0.5).mean() < 0.5 or vmap.min() == 1.0


# --------------------------- sort_by_key VJP --------------------------------

def test_sort_by_key_matches_lax_sort_and_grad(rng):
    from vanerf_tpu.ops.sorting import sort_by_key

    key = rng.normal(size=(2, 5, 16)).astype(np.float32)
    p1 = rng.normal(size=(2, 5, 16)).astype(np.float32)
    p2 = rng.normal(size=(2, 5, 16)).astype(np.float32)

    ref = jax.lax.sort((jnp.asarray(key), jnp.asarray(p1), jnp.asarray(p2)),
                       dimension=-1, num_keys=1)
    out = sort_by_key(jnp.asarray(key), jnp.asarray(p1), jnp.asarray(p2))
    for r, o in zip(ref, out):
        np.testing.assert_array_equal(np.asarray(r), np.asarray(o))

    # gradient parity with XLA's builtin sort transpose, through a mix of
    # used/unused outputs (unused -> zero cotangent path)
    def loss_ref(k, a, b):
        ks, as_, bs = jax.lax.sort((k, a, b), dimension=-1, num_keys=1)
        return jnp.sum(ks * 2.0 + as_ * as_ + jnp.sin(bs))

    def loss_new(k, a, b):
        ks, as_, bs = sort_by_key(k, a, b)
        return jnp.sum(ks * 2.0 + as_ * as_ + jnp.sin(bs))

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        jnp.asarray(key), jnp.asarray(p1), jnp.asarray(p2))
    g_new = jax.grad(loss_new, argnums=(0, 1, 2))(
        jnp.asarray(key), jnp.asarray(p1), jnp.asarray(p2))
    for r, o in zip(g_ref, g_new):
        np.testing.assert_allclose(np.asarray(r), np.asarray(o),
                                   rtol=1e-6, atol=1e-6)


def test_sort_by_key_grad_with_duplicate_keys():
    """Ties: cotangents must follow the exact stable forward permutation —
    total gradient mass is preserved and sum-invariant losses agree with
    the builtin transpose."""
    from vanerf_tpu.ops.sorting import sort_by_key

    key = jnp.asarray([[3.0, 1.0, 3.0, 1.0, 2.0]])
    val = jnp.asarray([[10.0, 20.0, 30.0, 40.0, 50.0]])
    w = jnp.asarray([1.0, 2.0, 3.0, 4.0, 5.0])

    def loss(k, v):
        ks, vs = sort_by_key(k, v)
        return jnp.sum(w * (vs + ks))

    g_new = jax.grad(loss, argnums=(0, 1))(key, val)
    # each input element receives exactly one weight (a permutation)
    np.testing.assert_allclose(np.sort(np.asarray(g_new[1]).ravel()),
                               np.sort(np.asarray(w)))
    # stable order: values at tied keys keep input order -> perm is
    # [1,3,4,0,2]; grads route w back through it
    np.testing.assert_allclose(np.asarray(g_new[1]).ravel(),
                               [4.0, 1.0, 5.0, 2.0, 3.0])
    np.testing.assert_allclose(np.asarray(g_new[0]).ravel(),
                               [4.0, 1.0, 5.0, 2.0, 3.0])
