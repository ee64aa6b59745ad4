"""Capture an XLA trace of the full patch render and print the top ops.

Parses the Chrome-trace json.gz emitted by jax.profiler directly (the
tensorboard profile plugin is not available in this image).

Usage: python tools/trace_patch.py [--dtype bfloat16] [--top 30]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--cached", action="store_true",
                    help="precompute per-frame encoders/vert-vis (serving shape)")
    ap.add_argument("--group", action="store_true",
                    help="group by op family instead of individual op")
    args = ap.parse_args()
    if args.dtype:
        os.environ["VANERF_COMPUTE_DTYPE"] = args.dtype

    from vanerf_tpu import config as vconfig
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF
    from vanerf_tpu.renderer import render_patch, mask_centered_grid

    H = W = 256
    out_hw = 64
    spc = spf = 64
    cfg = vconfig.default_cfg()
    batch_np, _faces, num_v = make_synthetic_batch(batch_size=1, H=H, W=W,
                                                   subdiv=3)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    rng = jax.random.PRNGKey(0)
    B = batch["tar_k"].shape[0]
    V2 = batch["verts"].shape[1]
    n = 8
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": W, "height": H, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = jax.jit(lambda r: model.init(
        r, batch["src_img"], jnp.zeros((B, n, 3)), jnp.ones((B, n, 3)), cam,
        batch["src_mask"], batch["verts"], jnp.ones((B, V2, 1)),
        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)), batch["kpt3d"], n))(rng)

    cached = None
    if args.cached:
        # per-frame encoders + vertex visibility precomputed (serving
        # shape: render_full_image shares them across a frame's tiles)
        from vanerf_tpu.ops.rasterize import vertex_visibility

        def enc(params, batch):
            feat_geo, feat_tex = model.apply(params, batch["src_img"],
                                             method=model.encode)
            src_krt_b = batch["src_krt"].reshape(B, 1, 4, 4)[:, 0]
            verts = batch["verts"]
            vh = (verts @ jnp.swapaxes(src_krt_b[:, :3, :3], -1, -2)
                  + src_krt_b[:, None, :3, 3])
            v_z = vh[..., 2:3]
            v_xy = vh[..., :2] / (v_z + 1e-8)
            v_xy01 = jnp.stack([v_xy[..., 0] / (W - 1.0),
                                v_xy[..., 1] / (H - 1.0)], -1)
            v_z01 = (v_z - batch["znear"]) / (batch["zfar"] - batch["znear"])
            vert_vis = jax.vmap(
                lambda xy, vz: vertex_visibility(xy, vz, batch["faces"]))(
                v_xy01, v_z01)
            return feat_geo, feat_tex, vert_vis

        cached = jax.jit(enc)(params, batch)
        jax.block_until_ready(cached)

    def run(params, batch, rng):
        grids = mask_centered_grid(rng, batch["tar_mask"][..., 0],
                                   out_hw, out_hw)
        out = render_patch(model, params, batch, rng=rng, grids=grids,
                           out_h=out_hw, out_w=out_hw, sample_per_ray_c=spc,
                           sample_per_ray_f=spf, fine=True, training=False,
                           sdf_chunk=4096, compute_vis_map=False,
                           cached=cached)
        return out["tex_fg_fine"]

    run_j = jax.jit(run)
    img = run_j(params, batch, rng)
    float(img.sum())  # sync

    tdir = "/tmp/vanerf_trace"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for i in range(3):
        img = run_j(params, batch, rng)
    float(img.sum())
    jax.profiler.stop_trace()

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace written under {tdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]

    # find TPU device pids (process names like "/device:TPU:0")
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, nm in pid_name.items()
                if "TPU" in nm.upper() or "device" in nm.lower()}

    tot = collections.Counter()
    cnt = collections.Counter()
    long = {}
    all_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        dur = e.get("dur", 0)
        if args.group:
            name = name.split(".")[0].rstrip("0123456789")
        tot[name] += dur
        cnt[name] += 1
        ln = (e.get("args") or {}).get("long_name", "")
        if ln and name not in long:
            long[name] = ln
        all_us += dur
    print(f"total device-op time: {all_us/3e3:.2f} ms/step over 3 steps "
          f"(pids={sorted(tpu_pids)})")
    for name, us in tot.most_common(args.top):
        print(f"{us/3e3:9.3f} ms  x{cnt[name]:4d}  {name[:60]}")
        ln = long.get(name, "")
        if ln:
            print(f"            {ln[:240]}")


if __name__ == "__main__":
    main()
