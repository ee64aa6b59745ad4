"""Probe: does Morton-ordering the query points speed up the culled
mesh kernel?

The kernel tiles points in ray-major order (16 rays x 8 consecutive
samples per 128-point tile).  Tiles that straddle the hand surface (or
mix near + far samples) carry a large certified upper bound
(``ub_t = max`` over the tile), so they visit many face chunks — the
docs/perf.md "hard patch" variance (8.7-16.8 ms/instance).  Sorting
points by Morton code makes tiles spatially compact: near-surface
points concentrate into few tight tiles and far points group into tiles
whose AABB distance lower bound kills every chunk.

This probe isolates the PRIZE: it times ``point_mesh_query_vis_culled``
on identical point sets in (a) natural ray-major order and (b) Morton
order, over several random mask-centered patches, coarse-pass
(stratified) and fine-like (surface-concentrated) depth distributions.
Sorting/permutation overhead is NOT included — if the kernel gap is
small, end-to-end wiring (sort + inverse gather, ~2-3 ms) cannot pay.

Usage: python tools/morton_probe.py [--seeds 6]
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def morton_order(pts: np.ndarray, bits: int = 10) -> np.ndarray:
    """Host-side argsort of 3-D Morton codes (probe only)."""
    lo = pts.min(0)
    hi = pts.max(0)
    q = ((pts - lo) / np.maximum(hi - lo, 1e-9) * ((1 << bits) - 1)
         ).astype(np.uint64)

    def spread(x):
        x &= (1 << bits) - 1
        x = (x | (x << 32)) & np.uint64(0x1F00000000FFFF)
        x = (x | (x << 16)) & np.uint64(0x1F0000FF0000FF)
        x = (x | (x << 8)) & np.uint64(0x100F00F00F00F00F)
        x = (x | (x << 4)) & np.uint64(0x10C30C30C30C30C3)
        x = (x | (x << 2)) & np.uint64(0x1249249249249249)
        return x

    key = spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) \
        | (spread(q[:, 2]) << np.uint64(2))
    return np.argsort(key, kind="stable")


def timed(fn, *a, iters=5):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=6)
    args = ap.parse_args()

    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.ops.knn import nearest_vertex_d2
    from vanerf_tpu.ops.mesh_query_pallas import (
        point_mesh_query_vis_culled, prepare_mesh_ray)
    from vanerf_tpu.ops.ray import pixel_grid_rays, ray_bbox_intersection
    from vanerf_tpu.ops.sampling import stratified_sample
    from vanerf_tpu.renderer import mask_centered_grid

    H = W = 256
    out_hw = 64
    spc = 64
    batch_np, _faces, _num_v = make_synthetic_batch(batch_size=1, H=H, W=W,
                                                    subdiv=3)
    batch = jax.tree.map(jnp.asarray, batch_np)
    verts = batch["verts"][0]
    faces = batch["faces"]
    face_vis = jnp.ones((faces.shape[0], 3), jnp.float32)
    tri = verts[faces]                                       # (F, 3, 3)
    prep = prepare_mesh_ray(tri, face_vis)

    @jax.jit
    def gen_pts(key):
        grids = mask_centered_grid(key, batch["tar_mask"][..., 0],
                                   out_hw, out_hw)
        cam_pos, cam_rays, zn, zf = pixel_grid_rays(
            grids, batch["tar_k"], batch["tar_rt"],
            batch["znear"], batch["zfar"])
        z1, z2, hit = ray_bbox_intersection(batch["bounds"], cam_pos,
                                            cam_rays)
        m1 = (hit & (z1 > zn)).astype(jnp.float32)
        zn = m1 * z1 + (1.0 - m1) * zn
        m2 = (hit & (z2 < zf)).astype(jnp.float32)
        zf = m2 * z2 + (1.0 - m2) * zf
        z = stratified_sample(zn, zf, spc, uniform=True)
        pts = (cam_pos[:, :, None] + cam_rays[:, :, None] * z[..., None])
        return pts.reshape(-1, 3)

    @jax.jit
    def fine_like(key):
        # surface-concentrated points: random verts + gaussian noise, the
        # shape of an importance-sampled fine pass
        n = out_hw * out_hw * spc
        vi = jax.random.randint(key, (n,), 0, verts.shape[0])
        off = jax.random.normal(jax.random.fold_in(key, 1), (n, 3)) * 0.01
        return verts[vi] + off

    @jax.jit
    def query(pts):
        _, ub = nearest_vertex_d2(pts, verts)
        return point_mesh_query_vis_culled(pts, tri, face_vis, ub,
                                           prep=prep)

    from vanerf_tpu.ops.mesh_query import to_blocked

    # dispatch-overhead reference: a near-empty jitted call on this
    # transport, so device-side deltas can be read off the wall numbers
    tiny = jnp.ones((8, 128))
    t_disp = timed(jax.jit(lambda x: x + 1.0), tiny)

    print(f"backend={jax.default_backend()}  N={out_hw*out_hw*spc}  "
          f"faces={faces.shape[0]}  dispatch~{t_disp*1e3:.2f} ms")
    P = out_hw * out_hw
    for label, gen in (("coarse", gen_pts), ("fine", fine_like)):
        rows = {"raw": [], "blocked": [], "morton": []}
        for s in range(args.seeds):
            pts = gen(jax.random.PRNGKey(s))
            pts_np = np.asarray(pts)
            variants = {
                "raw": pts,
                # production layout: 16 adjacent rays x 8 consecutive
                # depths per 128-point kernel tile (cal_vis_sdf_prepared)
                "blocked": to_blocked(pts, P, spc, 16, 8),
                "morton": jnp.asarray(pts_np[morton_order(pts_np)]),
            }
            ts = {k: timed(query, v) for k, v in variants.items()}
            for k, t in ts.items():
                rows[k].append(t)
            print(f"  {label} seed {s}: " + "   ".join(
                f"{k} {t*1e3:7.2f}" for k, t in ts.items()))
        means = {k: float(np.mean(v)) * 1e3 for k, v in rows.items()}
        print(f"{label} means: " + "   ".join(
            f"{k} {m:7.2f} ms" for k, m in means.items())
            + f"   morton-vs-blocked prize "
              f"{means['blocked'] - means['morton']:+6.2f} ms/call")

    # --- in-pipeline reorder overhead: device-side morton code + argsort
    # + row gather of (pts, ub) into sorted order + inverse-permutation
    # build + final inverse gather of a packed 7-ch result ---
    from vanerf_tpu.ops.mesh_query import _morton_order

    pts0 = gen_pts(jax.random.PRNGKey(0))
    res7 = jnp.ones((pts0.shape[0], 7))

    @jax.jit
    def reorder_cost(pts, res):
        order = _morton_order(pts)
        pts_s = jnp.take(pts, order, axis=0)
        inv = jnp.argsort(order)
        out = jnp.take(res, inv, axis=0)
        return pts_s, out

    t_re = timed(reorder_cost, pts0, res7)
    print(f"reorder overhead (code+argsort+2 gathers+inv-argsort): "
          f"{t_re*1e3:7.2f} ms/call (incl dispatch ~{t_disp*1e3:.2f})")


if __name__ == "__main__":
    main()
