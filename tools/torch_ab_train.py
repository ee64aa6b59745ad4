"""Cross-framework convergence anchor: train the TORCH reference replica
on the synthetic fixture (VERDICT r2 Weak #1/#2).

Runs the reference-faithful training loop (two-forward GAN alternation,
dual Adam + MultiStepLR, L1+VGG+GAN losses) on the torch replica at a
tiny config, with the SAME fixture data, the SAME random-VGG objective
(weights exported from the JAX VGGLoss) and — via the checkpoint
converter — the option of byte-identical initial weights on the JAX side
(tools/jax_ab_train.py consumes the emitted init ckpt).  Mesh queries /
vertex visibility / GT vis maps come from the framework's oracle-tested
kernels via callbacks (they are inputs, not trained modules).

Usage:
  python tools/torch_ab_train.py --out /tmp/AB_TORCH --steps 2000
Writes metrics.jsonl (same scalar names as the JAX loop), an init
model.ckpt (reference Lightning layout, convertible), and a final eval
(PSNR/SSIM on held-out synthetic frames) to eval.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import torch
import torch.nn.functional as F

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "tests")))

# Scale knobs (round 5): the tiny defaults are the round-3/4 anchor
# protocol; `AB_HW=256 AB_OUT=64 AB_S=64 AB_SUBDIV=3 AB_NDOWN=4`
# reproduces the configs/vanerf_synth200.json recipe on the replica
# (jax_ab_train.py imports these, so both sides scale together).
H = W = int(os.environ.get("AB_HW", "64"))
OUT = int(os.environ.get("AB_OUT", "8"))
S_C = S_F = int(os.environ.get("AB_S", "8"))
SUBDIV = int(os.environ.get("AB_SUBDIV", "2"))
N_DOWN = int(os.environ.get("AB_NDOWN", "2"))
_V_BY_SUBDIV = {2: 162, 3: 642}    # icosphere vert counts (one hand)
NUM_V = _V_BY_SUBDIV[SUBDIV]


def tiny_cfg():
    from vanerf_tpu import config as vconfig
    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = OUT
    m["geo_args"]["n_downsample"] = N_DOWN
    m["dr_kwargs"]["sample_per_ray_c"] = S_C
    m["dr_kwargs"]["sample_per_ray_f"] = S_F
    cfg["dataset"]["synthetic_cfg"] = {"H": H, "W": W, "subdiv": SUBDIV,
                                       "n_frames": 4}
    return cfg


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--eval_frames", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--eval_only", action="store_true",
                    help="load final_model.ckpt from --out and re-eval")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    import torch_ref_replica as R
    from vanerf_tpu import losses as L
    from vanerf_tpu.data import SyntheticDataset
    from vanerf_tpu.evaluator import compute_psnr, compute_ssim_crop
    from vanerf_tpu.ops.mesh_query import cal_vis_sdf
    from vanerf_tpu.ops.rasterize import render_vis_map, vertex_visibility
    from vanerf_tpu.training.loop import collate_numpy

    cfg = tiny_cfg()
    torch.manual_seed(args.seed)
    rep = R.LightningReplicaT(cfg, num_v=NUM_V, hw3=H // 4, hw4=W)
    rep.train()
    # the identical perceptual objective as the JAX side (fixed-seed
    # random init; pretrained when VANERF_VGG19_NPZ is set)
    vgg_jax = L.VGGLoss(dummy_hw=OUT)
    R.load_vgg_from_jax(rep.model.vgg_loss.vgg_net, vgg_jax.params)
    for p in rep.model.vgg_loss.parameters():
        p.requires_grad_(False)

    # emit the INIT checkpoint in the reference Lightning layout so the
    # JAX side can start from byte-identical weights via the converter
    torch.save({"state_dict": rep.state_dict(), "epoch": 0,
                "global_step": 0},
               os.path.join(args.out, "init_model.ckpt"))

    ds = SyntheticDataset(split="train",
                          **{k: v for k, v in
                             cfg["dataset"]["synthetic_cfg"].items()
                             if k != "n_frames"},
                          n_frames=cfg["dataset"]["synthetic_cfg"]
                          ["n_frames"])
    ds_test = SyntheticDataset(split="test", n_frames=2, H=H, W=W,
                               subdiv=SUBDIV)
    faces = jnp.asarray(ds.faces)
    steps_per_epoch = len(ds)
    lambdas = cfg["models"]["VANeRF"]["lambdas"]
    dis_l = cfg["models"]["Discriminator"]["lambdas"]
    sp_args = cfg["models"]["VANeRF"]["sp_args"]

    g_params = [p for n, p in rep.model.named_parameters()
                if not n.startswith("vgg_loss")]
    opt_g = torch.optim.Adam(g_params, lr=cfg["training"]["lr"])
    opt_d = torch.optim.Adam(rep.discriminator.parameters(),
                             lr=cfg["training"]["lr"])
    sch_g = torch.optim.lr_scheduler.MultiStepLR(
        opt_g, [2, 5, 10, 20, 35], gamma=0.5)
    sch_d = torch.optim.lr_scheduler.MultiStepLR(
        opt_d, [2, 5, 10, 20, 35], gamma=0.5)

    gen = torch.Generator().manual_seed(args.seed + 1)
    rs = np.random.RandomState(args.seed + 2)

    def np_batch(item):
        b = collate_numpy([item], faces=ds.faces)
        return {k: np.asarray(v) if hasattr(v, "shape") else v
                for k, v in b.items()}

    def vert_vis_np(batch):
        verts = jnp.asarray(batch["verts"])
        krt = jnp.asarray(batch["src_krt"])
        vh = (verts @ jnp.swapaxes(krt[:, :3, :3], -1, -2)
              + krt[:, None, :3, 3])
        v_z = vh[..., 2:3]
        v_xy = vh[..., :2] / (v_z + 1e-8)
        v_xy01 = jnp.stack([v_xy[..., 0] / (W - 1.0),
                            v_xy[..., 1] / (H - 1.0)], -1)
        v_z01 = (v_z - batch["znear"]) / (batch["zfar"] - batch["znear"])
        return np.asarray(jax.vmap(lambda xy, vz: vertex_visibility(
            xy, vz, faces, size=256))(v_xy01, v_z01))

    def make_mesh_query(batch, vv):
        def fn(pts_np):
            sdf, qvis, _ = cal_vis_sdf(
                jnp.asarray(batch["verts"][0]), faces,
                jnp.asarray(pts_np[0]), jnp.asarray(vv[0]), chunk=1024)
            return np.asarray(sdf)[None], np.asarray(qvis)[None]
        return fn

    def make_vis_map(batch, vv):
        def fn():
            _rgb, vm = render_vis_map(
                jnp.asarray(batch["verts"][0]), faces,
                jnp.asarray(vv[0]), jnp.asarray(batch["tar_k"][0]),
                jnp.asarray(batch["tar_rt"][0]), H, W)
            return np.asarray(vm).reshape(H, W, 1)
        return fn

    def encode(batch):
        im = torch.from_numpy(
            np.moveaxis(batch["src_img"], -1, 1).copy()).float()
        im_g = F.avg_pool2d(im, 2, stride=2)
        fg = rep.model.geo_encoder(2.0 * im_g - 1.0)
        im_t = F.avg_pool2d(im, 2, stride=2)
        ft = rep.model.tex_encoder(2.0 * im_t - 1.0)
        return fg, ft

    def forward(batch, vv):
        fg, ft = encode(batch)
        b = dict(batch)
        b["feat_geo"] = fg
        b["feat_tex"] = ft
        b["vert_vis"] = vv
        return R.render_patch_train_t(
            rep, b, make_mesh_query(batch, vv), OUT, OUT, S_C, S_F,
            sp_args, gen,
            rand_noise_std=cfg["models"]["VANeRF"]["dr_kwargs"]
            .get("rand_noise_std", 0.01),
            vis_map_fn=make_vis_map(batch, vv))

    logf = open(os.path.join(args.out, "metrics.jsonl"), "a")
    step = 0
    t0 = time.time()
    epoch = 0
    if args.eval_only:
        ck = torch.load(os.path.join(args.out, "final_model.ckpt"),
                        map_location="cpu", weights_only=False)
        rep.load_state_dict(ck["state_dict"])
        step = ck.get("global_step", 0)
    while step < args.steps:
        order = rs.permutation(len(ds))
        for i in order:
            if step >= args.steps:
                break
            item = ds[int(i)]
            if item is None:
                continue
            batch = np_batch(item)
            vv = vert_vis_np(batch)

            # ---- G step (ref model.py:385-412) ----
            out = forward(batch, vv)
            loss, err = R.compute_error_t(out, lambdas,
                                          rep.model.vgg_loss.vgg_net)
            rendered = out["tex_fg_fine"].clamp(0, 1).permute(0, 3, 1, 2)
            dargs = [out["img_in"], out.get("input_densepose",
                                            out["img_in"]),
                     out.get("tar_densepose", out["tar_img"]), None]
            dargs = [a.permute(0, 3, 1, 2) if a is not None else None
                     for a in dargs]
            fake_pred, fake_vis = rep.discriminator(
                dargs[0], dargs[1], dargs[2], rendered)
            msk = out["tar_alpha"].permute(0, 3, 1, 2)
            vis_pix = F.binary_cross_entropy(
                fake_vis, torch.ones_like(fake_vis), reduction="none")
            vis_pix = torch.where(msk == 0, torch.zeros_like(vis_pix),
                                  vis_pix).mean()
            g_gan = R.g_nonsaturating_loss_t(fake_pred)
            g_loss = loss + dis_l["lambda_dis1"] * g_gan \
                + dis_l["lambda_dis2"] * vis_pix
            opt_g.zero_grad()
            g_loss.backward()
            opt_g.step()

            # ---- D step: fresh patch through the updated G
            # (ref model.py:417) ----
            with torch.no_grad():
                out_d = forward(batch, vv)
            gt = out_d["tar_img"].permute(0, 3, 1, 2).requires_grad_(True)
            rendered_d = out_d["tex_fg_fine"].clamp(0, 1) \
                .permute(0, 3, 1, 2)
            idp = out_d.get("input_densepose",
                            out_d["img_in"]).permute(0, 3, 1, 2)
            tdp = out_d.get("tar_densepose",
                            out_d["tar_img"]).permute(0, 3, 1, 2)
            ipt = out_d["img_in"].permute(0, 3, 1, 2)
            real_pred, real_vis = rep.discriminator(ipt, idp, tdp, gt)
            fake_pred, fake_vis = rep.discriminator(ipt, idp, tdp,
                                                    rendered_d)
            vis_gt = out_d["vis_img"].permute(0, 3, 1, 2)
            mskd = out_d["tar_alpha"].permute(0, 3, 1, 2)
            rvl = F.binary_cross_entropy(
                real_vis, torch.ones_like(real_vis), reduction="none")
            fvl = F.binary_cross_entropy(fake_vis, vis_gt,
                                         reduction="none")
            rvl = torch.where(mskd == 0, torch.zeros_like(rvl), rvl)
            fvl = torch.where(mskd == 0, torch.zeros_like(fvl), fvl)
            fvl = torch.where(vis_gt == 0, fvl * 5.0, fvl)
            d_gan = R.d_logistic_loss_t(real_pred, fake_pred)
            grad_real = torch.autograd.grad(real_pred.sum(), gt,
                                            create_graph=True)[0]
            r1 = 300.0 * 0.5 * grad_real.pow(2).reshape(
                gt.shape[0], -1).sum(1).mean()
            d_loss = d_gan + r1 + rvl.mean() + fvl.mean()
            opt_d.zero_grad()
            d_loss.backward()
            opt_d.step()

            step += 1
            if step % 10 == 0:
                rec = {"step": step,
                       "train/g_loss": float(g_loss),
                       "train/d_loss": float(d_loss),
                       "train/e_pix_l1": float(err["e_pix_l1"]),
                       "train/e_vgg": float(err.get("e_vgg", 0.0)),
                       "train/d": float(d_gan), "train/r1": float(r1),
                       "wall_s": round(time.time() - t0, 1)}
                logf.write(json.dumps(rec) + "\n")
                logf.flush()
        epoch += 1
        sch_g.step()
        sch_d.step()

    # ---- final eval: full-image renders on held-out frames ----
    rep.eval()
    scores = []
    for i in range(args.eval_frames):
        item = ds_test[(i * (ds_test.n_cams + 1)) % len(ds_test)]
        batch = np_batch(item)
        vv = vert_vis_np(batch)
        y, x = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        grids = np.stack([x, y], -1).reshape(1, -1, 2).astype(np.float32)
        with torch.no_grad():
            fg, ft = encode(batch)
            b = dict(batch)
            b["feat_geo"] = [f.numpy().transpose(0, 2, 3, 1) for f in fg]
            b["feat_tex"] = ft.numpy().transpose(0, 2, 3, 1)
            b["vert_vis"] = vv
            out = R.render_patch_eval_t(
                rep, b, grids, make_mesh_query(batch, vv), H, W, S_C, S_F,
                sp_args)
        pred = np.clip(out["tex_fg_fine"][0], 0, 1)
        gt = batch["tar_img"][0]
        mask = batch["tar_mask"][0, ..., 0] > 0
        scores.append({"psnr": compute_psnr(pred, gt),
                       "ssim": compute_ssim_crop(pred, gt, mask)})
    result = {k: float(np.mean([s[k] for s in scores])) for k in scores[0]}
    result["steps"] = step
    result["wall_s"] = round(time.time() - t0, 1)
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    torch.save({"state_dict": rep.state_dict(), "epoch": epoch,
                "global_step": step},
               os.path.join(args.out, "final_model.ckpt"))


if __name__ == "__main__":
    main()
