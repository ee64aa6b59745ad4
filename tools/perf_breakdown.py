"""Per-phase timing of the patch-render pipeline on the current backend.

Times, at production shapes (64x64 rays, 64 samples, 256^2 images):
  mesh  — cal_vis_sdf_fast (pallas SDF + winding + vis interpolation)
  query — the network query path (spatial enc + fusion + MLP + IBR)
  full  — the whole jitted render_patch (coarse+fine)

Usage: python tools/perf_breakdown.py [--dtype bfloat16]
"""

import argparse
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


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
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--sdf-chunk", type=int, default=4096)
    args = ap.parse_args()

    import os
    if args.dtype:
        os.environ["VANERF_COMPUTE_DTYPE"] = args.dtype

    from vanerf_tpu import config as vconfig
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF
    from vanerf_tpu.ops.mesh_query import cal_vis_sdf_fast
    from vanerf_tpu.ops.rasterize import vertex_visibility
    from vanerf_tpu.renderer import render_patch, mask_centered_grid

    H = W = 256
    out_hw = 64
    spc = 64
    cfg = vconfig.default_cfg()
    batch_np, _faces, num_v = make_synthetic_batch(batch_size=1, H=H, W=W,
                                                   subdiv=3)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    print("compute_dtype:", model.compute_dtype, "backend:",
          jax.default_backend(), "faces:", batch["faces"].shape[0])

    rng = jax.random.PRNGKey(0)
    B = batch["tar_k"].shape[0]
    V2 = batch["verts"].shape[1]
    N = out_hw * out_hw * spc
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": W, "height": H, "znear": batch["znear"],
           "zfar": batch["zfar"]}

    n = 8
    params = jax.jit(lambda r: model.init(
        r, batch["src_img"], jnp.zeros((B, n, 3)), jnp.ones((B, n, 3)), cam,
        batch["src_mask"], batch["verts"], jnp.ones((B, V2, 1)),
        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)), batch["kpt3d"], n))(rng)

    # production-shaped inputs
    pts = jax.random.normal(rng, (B, N, 3)) * 0.05
    view = jnp.ones((B, N, 3)) / jnp.sqrt(3.0)
    vert_vis = jnp.ones((B, V2, 1))

    # mesh phase
    faces = batch["faces"]
    verts = batch["verts"]

    @jax.jit
    def mesh_fn(verts, pts, vert_vis):
        return jax.vmap(lambda vt, p, vv: cal_vis_sdf_fast(
            vt, faces, p, vv, chunk=args.sdf_chunk))(verts, pts, vert_vis)

    t_mesh = timed(mesh_fn, verts, pts, vert_vis)

    sdf, q_vis = mesh_fn(verts, pts, vert_vis)
    q_sdf = sdf[..., None]

    @jax.jit
    def enc_fn(params):
        return model.apply(params, batch["src_img"], method=model.encode)

    feat_geo, feat_tex = enc_fn(params)
    t_enc = timed(enc_fn, params)

    @jax.jit
    def query_fn(params, pts, q_vis, q_sdf):
        return model.apply(params, pts, view, cam, feat_geo, feat_tex,
                           batch["src_img"], batch["src_mask"], verts,
                           vert_vis, q_vis, q_sdf, batch["kpt3d"], spc, 1,
                           False, bounds=batch["bounds"], method=model.query)

    t_query = timed(query_fn, params, pts, q_vis, q_sdf)

    @jax.jit
    def vis_fn(verts):
        src_krt_b = batch["src_krt"].reshape(B, 1, 4, 4)[:, 0]
        vh = (verts @ jnp.swapaxes(src_krt_b[:, :3, :3], -1, -2)
              + src_krt_b[:, None, :3, 3])
        v_z = vh[..., 2:3]
        v_xy = vh[..., :2] / (v_z + 1e-8)
        v_xy01 = jnp.stack([v_xy[..., 0] / (W - 1.0),
                            v_xy[..., 1] / (H - 1.0)], -1)
        v_z01 = (v_z - batch["znear"]) / (batch["zfar"] - batch["znear"])
        return jax.vmap(lambda xy, vz: vertex_visibility(
            xy, vz, faces))(v_xy01, v_z01)

    t_vis = timed(vis_fn, verts)

    def run(params, batch, rng):
        grids = mask_centered_grid(rng, batch["tar_mask"][..., 0],
                                   out_hw, out_hw)
        out = render_patch(model, params, batch, rng=rng, grids=grids,
                           out_h=out_hw, out_w=out_hw, sample_per_ray_c=spc,
                           sample_per_ray_f=spc, fine=True, training=False,
                           sdf_chunk=args.sdf_chunk, compute_vis_map=False)
        return out["tex_fg_fine"]

    run_j = jax.jit(run)
    t_full = timed(run_j, params, batch, rng)

    # --- tail phases (the "elementwise/reduce tail" in docs/perf.md):
    # time each standalone at production shapes so a single hardware run
    # localizes it.  Each jit includes its own dispatch overhead, so the
    # sum overstates in-context cost — use for RELATIVE ranking only.
    from vanerf_tpu.ops.composite import rgba2out
    from vanerf_tpu.ops.knn import nearest_vertex_d2
    from vanerf_tpu.ops.sampling import importance_sample, stratified_sample
    from vanerf_tpu.ops.sorting import sort_by_key

    P = out_hw * out_hw
    beta = params["params"]["sigmoid_beta"]
    zn = jnp.full((B, P, 1), 0.5)
    zf = jnp.full((B, P, 1), 1.5)

    @jax.jit
    def samp_fn(key):
        z = stratified_sample(zn, zf, spc, rng=key, uniform=True)
        contrib = jax.nn.softmax(z, axis=-1)
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        z_new = importance_sample(contrib[..., 1:-1], z_mid, spc, rng=key,
                                  uniform=True)
        (z_s,) = sort_by_key(z_new)
        return z_s

    t_samp = timed(samp_fn, rng)

    zs = jnp.sort(jax.random.uniform(rng, (B, P, spc)), axis=-1)
    rad = jax.random.normal(rng, (B, P, spc))
    sdfc = jax.random.normal(rng, (B, P, spc))
    rgb = jax.random.uniform(rng, (B, P, spc, 3))
    qsdf = jax.random.normal(rng, (B, P, spc)) * 0.05

    @jax.jit
    def comp_fn(rad, sdfc, rgb, zs, qsdf):
        return rgba2out(rad, sdfc, rgb, zs, qsdf, beta)

    t_comp = timed(comp_fn, rad, sdfc, rgb, zs, qsdf)

    @jax.jit
    def knn_fn(pts, verts):
        return jax.vmap(nearest_vertex_d2)(pts, verts)

    t_knn = timed(knn_fn, pts, verts)

    print(f"mesh  (262k pts, 1 pass): {t_mesh*1e3:8.2f} ms  (x2 per step)")
    print(f"query (262k pts, 1 pass): {t_query*1e3:8.2f} ms  (x2 per step)")
    print(f"encoders:                 {t_enc*1e3:8.2f} ms")
    print(f"vertex visibility:        {t_vis*1e3:8.2f} ms")
    print(f"knn nearest-vertex (1 pass): {t_knn*1e3:8.2f} ms  (x2 per step)")
    print(f"sampling+sort (strat+importance+sort): {t_samp*1e3:8.2f} ms")
    print(f"composite rgba2out (1 pass): {t_comp*1e3:8.2f} ms  (x2 per step)")
    print(f"full patch render:        {t_full*1e3:8.2f} ms")
    resid = t_full - 2 * t_mesh - 2 * t_query - t_enc - t_vis
    print(f"residual (sampling/composite/sort): {resid*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
