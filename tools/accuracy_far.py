"""Accuracy of the approximate serving tiers vs the exact render.

Renders one production-shaped patch (64x64 rays x 64+64+64 samples, the
bench.py scene) EXACTLY, then again with the requested approximation
flags, and reports PSNR / max-abs-diff of tex_fg_fine.  Run at the init
sigmoid-beta (0.1 — worst case: density not yet surface-saturated, every
sample carries weight) and at a trained-regime beta (5e-3) forced into
the params.

Usage:
  python tools/accuracy_far.py --set VANERF_FAR_SKIP=0.5 VANERF_FAR_TAU=0.02
Prints one JSON line per (beta, seed) with psnr/maxabs.
"""

import argparse
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", nargs="+", required=True,
                    help="ENV=VALUE approximation flags to measure")
    ap.add_argument("--seeds", type=int, default=4)
    args = ap.parse_args()
    flags = dict(kv.split("=", 1) for kv in getattr(args, "set"))
    for k in flags:
        os.environ.pop(k, None)
    os.environ["VANERF_FAR_TAU"] = "0"     # exact baseline (tau defaults
    # on at serving since the round-3 quality gate)

    import jax
    import jax.numpy as jnp
    import numpy as np
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

    def render(params, seed):
        k = jax.random.fold_in(rng, seed)
        grids = mask_centered_grid(k, batch["tar_mask"][..., 0],
                                   out_hw, out_hw)
        out = render_patch(model, params, batch, rng=k, grids=grids,
                           out_h=out_hw, out_w=out_hw, sample_per_ray_c=spc,
                           sample_per_ray_f=spf, fine=True, training=False,
                           sdf_chunk=4096, compute_vis_map=False)
        return out["tex_fg_fine"]

    import flax

    # env flags are read at TRACE time (renderer.render_patch), so trace
    # one jitted wrapper per variant and reuse it across betas/seeds.
    # DISTINCT lambdas: jit's cpp cache is keyed on the wrapped function,
    # so jitting the same `render` twice would reuse the first trace and
    # silently ignore the env change.
    exact_j = jax.jit(lambda p, s: render(p, s))
    jax.block_until_ready(exact_j(params, 0))
    os.environ.update(flags)
    approx_j = jax.jit(lambda p, s: render(p, s))
    jax.block_until_ready(approx_j(params, 0))
    for k in flags:
        os.environ.pop(k, None)

    for beta in (None, 5e-3):
        p = params
        if beta is not None:
            p = flax.core.unfreeze(jax.tree.map(lambda x: x, params))
            p["params"]["sigmoid_beta"] = jnp.full((1,), beta)
        for seed in range(args.seeds):
            exact = np.asarray(exact_j(p, seed))
            approx = np.asarray(approx_j(p, seed))
            mse = float(np.mean((exact - approx) ** 2))
            psnr = float(10 * np.log10(1.0 / max(mse, 1e-12)))
            print(json.dumps({
                "flags": flags, "beta": beta if beta is not None else 0.1,
                "seed": seed, "psnr_vs_exact": round(psnr, 2),
                "maxabs": round(float(np.abs(exact - approx).max()), 4),
            }), flush=True)


if __name__ == "__main__":
    main()
