"""JAX side of the cross-framework convergence anchor.

Trains the framework at the SAME tiny config as tools/torch_ab_train.py,
starting from the SAME initial weights (the torch driver's emitted
init_model.ckpt through the checkpoint converter), the same random-VGG
objective, the same number of steps — so final eval PSNR/SSIM anchors
the JAX training system against the reference architecture's own
convergence on identical data.

Usage:
  python tools/jax_ab_train.py --out /tmp/AB_JAX \
      --init_ckpt /tmp/AB_TORCH/init_model.ckpt --steps 1500
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.abspath(os.path.dirname(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--init_ckpt", default=None,
                    help="torch_ab_train.py init_model.ckpt (same-weights "
                         "start); fresh flax init if omitted")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval_frames", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--eval_only", action="store_true",
                    help="re-eval final_params.pkl from --out (set "
                         "VANERF_COMPUTE_DTYPE to probe eval numerics)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    # exact eval numerics on both sides of the anchor (the serving-default
    # far tier assumes a TRAINED beta; at 1500 steps it is not saturated)
    os.environ["VANERF_FAR_TAU"] = "0"

    import jax
    import jax.numpy as jnp
    from torch_ab_train import tiny_cfg, H, W, NUM_V, SUBDIV
    from vanerf_tpu import losses as L
    from vanerf_tpu.data import SyntheticDataset
    from vanerf_tpu.evaluator import compute_psnr, compute_ssim_crop
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.renderer import render_full_image
    from vanerf_tpu.training.loop import collate_numpy
    from vanerf_tpu.training.train_step import (create_train_state,
                                                make_train_step)

    cfg = tiny_cfg()
    ds = SyntheticDataset(split="train", H=H, W=W, subdiv=SUBDIV,
                          n_frames=4)
    ds_test = SyntheticDataset(split="test", n_frames=2, H=H, W=W,
                               subdiv=SUBDIV)
    model = VANeRF.from_config(cfg, num_v=NUM_V)
    disc = DiscriminatorVis()
    vgg = L.VGGLoss(dummy_hw=cfg["models"]["VANeRF"]["train_out_h"])
    item0 = ds[0]
    batch0 = collate_numpy([item0], faces=ds.faces)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, jax.random.PRNGKey(args.seed), batch0, cfg,
        steps_per_epoch=len(ds))

    if args.eval_only:
        import pickle
        with open(os.path.join(args.out, "final_params.pkl"), "rb") as f:
            saved = pickle.load(f)
        state = state._replace(
            params_g=jax.tree.map(
                lambda c, t: jnp.asarray(c, t.dtype),
                jax.tree.unflatten(jax.tree.structure(state.params_g),
                                   jax.tree.leaves(saved["params_g"])),
                state.params_g))
    elif args.init_ckpt:
        import torch
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from convert_reference_ckpt import convert_state_dict
        ckpt = torch.load(args.init_ckpt, map_location="cpu",
                          weights_only=False)
        sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
        g, d = convert_state_dict(
            sd, geo_cfg=cfg["models"]["VANeRF"]["geo_args"])
        cast = lambda conv, tmpl: jax.tree.map(      # noqa: E731
            lambda c, t: jnp.asarray(c, t.dtype), conv, tmpl)
        state = state._replace(params_g=cast(g, state.params_g),
                               params_d=cast(d, state.params_d))
        print("# started from converted torch init", file=sys.stderr)

    step_fn = jax.jit(make_train_step(model, disc, tx_g, tx_d, cfg, vgg),
                      donate_argnums=(0,))

    rs = np.random.RandomState(args.seed + 2)
    rng = jax.random.PRNGKey(args.seed + 3)
    logf = open(os.path.join(args.out, "metrics.jsonl"), "a")
    t0 = time.time()
    step = args.steps if args.eval_only else 0
    while step < args.steps:
        for i in rs.permutation(len(ds)):
            if step >= args.steps:
                break
            item = ds[int(i)]
            if item is None:
                continue
            batch = collate_numpy([item], faces=ds.faces)
            rng, k = jax.random.split(rng)
            state, logs = step_fn(state, batch, k)
            step += 1
            if step % 10 == 0:
                rec = {"step": step,
                       **{n: float(v) for n, v in logs.items()
                          if n in ("train/g_loss", "train/d_loss",
                                   "train/e_pix_l1", "train/e_vgg",
                                   "train/d", "train/r1")},
                       "wall_s": round(time.time() - t0, 1)}
                logf.write(json.dumps(rec) + "\n")
                logf.flush()

    # final eval, same protocol as the torch driver
    level = max(1, int(math.log2(H)) - 5)
    scores = []
    for i in range(args.eval_frames):
        item = ds_test[(i * (ds_test.n_cams + 1)) % len(ds_test)]
        batch = collate_numpy([item], faces=ds.faces)
        out = render_full_image(
            model, state.params_g, batch, level=level,
            sample_per_ray_c=cfg["models"]["VANeRF"]["dr_kwargs"]
            ["sample_per_ray_c"],
            sample_per_ray_f=cfg["models"]["VANeRF"]["dr_kwargs"]
            ["sample_per_ray_f"])
        pred = np.clip(np.asarray(out["tex_fg_fine"])[0], 0, 1)
        gt = np.asarray(batch["tar_img"])[0]
        mask = np.asarray(batch["tar_mask"])[0, ..., 0] > 0
        scores.append({"psnr": compute_psnr(pred, gt),
                       "ssim": compute_ssim_crop(pred, gt, mask)})
    result = {k: float(np.mean([s[k] for s in scores])) for k in scores[0]}
    result["steps"] = step
    result["wall_s"] = round(time.time() - t0, 1)
    result["compute_dtype"] = model.compute_dtype
    name = ("eval_" + model.compute_dtype + ".json" if args.eval_only
            else "eval.json")
    with open(os.path.join(args.out, name), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    if not args.eval_only:
        import pickle
        with open(os.path.join(args.out, "final_params.pkl"), "wb") as f:
            pickle.dump(
                {"params_g": jax.tree.map(np.asarray, state.params_g),
                 "params_d": jax.tree.map(np.asarray, state.params_d),
                 "global_step": step}, f)


if __name__ == "__main__":
    main()
