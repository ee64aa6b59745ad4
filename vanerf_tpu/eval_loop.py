"""Test/eval loop: full-image renders + metric aggregation + YAML report.

Parity target: ``test_step``/``test_epoch_end`` (reference
``src/model.py:575-597, 110-121``) — render each test frame at full
resolution via the tiled renderer, score with the Evaluator, dump a
``test_{name}_{epoch}_{step}.yml`` of means.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np
import yaml

import jax
import jax.numpy as jnp

from .evaluator import Evaluator
from .renderer import plan_tile_group, render_full_image
from .training.loop import collate_numpy


def make_val_fn(model, disc, dataset, cfg: dict, vggloss, n_views: int = 1,
                max_items: int = None):
    """Validation hook: full-image renders + losses + TB image strip.

    Parity with ``validation_step`` (reference ``model.py:547-573``): logs
    a horizontal strip [src | gt | render | denseposes | mask | gt-vis |
    D(real)-vis | D(fake)-vis] and aggregates ``val_total_loss`` (the
    checkpoint-selection metric).
    """
    from . import losses as L
    from .models.discriminator import bce_loss, g_nonsaturating_loss

    lambdas = cfg["models"]["VANeRF"].get("lambdas", {})
    n = max_items or cfg["dataset"].get("val_cfg", {}).get("max_len", 2)
    n = min(n, len(dataset))
    faces = dataset.faces

    def val_fn(state, step, logger):
        losses = []
        comps = []
        for i in range(n):
            item = dataset[i]
            if item is None:
                continue
            batch = collate_numpy([item], faces=faces)
            H = int(batch["src_img"].shape[1])
            level = max(1, int(math.log2(H)) - 5)
            out = render_full_image(
                model, state.params_g, batch, level=level, n_views=n_views,
                compute_vis_map=True)
            out["tex_cal"] = out["tex_fg"]
            out["tex_cal_fine"] = out["tex_fg_fine"]
            out["tar_img"] = batch["tar_img"]
            loss, err = L.compute_error(out, lambdas, vggloss)

            rendered = jnp.clip(out["tex_fg_fine"], 0.0, 1.0)
            fake_pred, fake_vis = disc.apply(
                state.params_d, out["img_in"], out["input_densepose"],
                out["tar_densepose"], rendered)
            real_pred, real_vis = disc.apply(
                state.params_d, out["img_in"], out["input_densepose"],
                out["tar_densepose"], batch["tar_img"])
            loss = loss + g_nonsaturating_loss(fake_pred)
            losses.append(float(loss))
            comps.append({k: float(v) for k, v in err.items()
                          if np.ndim(v) == 0})

            if i == 0 and logger is not None:
                def g(x):
                    x = np.asarray(x)[0]
                    if x.shape[-1] == 1:
                        x = np.repeat(x, 3, -1)
                    return np.clip(x, 0, 1)
                strip = np.concatenate([
                    g(batch["src_img"][None, 0]), g(batch["tar_img"]),
                    g(rendered), g(out["input_densepose"]),
                    g(out["tar_densepose"]), g(batch["tar_mask"]),
                    g(out["vis_img"]), g(real_vis), g(fake_vis)], axis=1)
                logger.log_image(step, "val/renderings", strip)
        if not losses:
            return {}
        # per-component val losses with the reference's val/ prefix
        # (ref model.py:570-572 logs every err_dict entry)
        logs = {f"val/{k}": float(np.mean([c[k] for c in comps]))
                for k in comps[0]}
        logs["val_total_loss"] = float(np.mean(losses))
        return logs

    return val_fn


def run_test(model, state, dataset, cfg: dict, save_dir: str,
             n_views: int = 1, max_items: Optional[int] = None,
             tag: Optional[str] = None, mesh=None,
             epoch: Optional[int] = None):
    test_dst_name = tag or cfg.get("test_dst_name", "test")
    result_dir = os.path.join(save_dir, f"images_{test_dst_name}")
    evaluator = Evaluator(result_dir)
    faces = dataset.faces

    n = len(dataset) if max_items is None else min(max_items, len(dataset))
    # overlap host-side item loading (decode/MANO) with device renders
    # (training.val_num_workers, the DataLoader-worker analog)
    from .training.loop import SampleLoader
    loader = SampleLoader(dataset, cfg["training"].get("val_num_workers", 1))
    try:
        return _run_test_inner(loader, n, model, state, cfg, save_dir,
                               evaluator, faces, n_views, mesh,
                               test_dst_name, epoch or 0)
    finally:
        loader.close()


def _run_test_inner(loader, n, model, state, cfg, save_dir, evaluator,
                    faces, n_views, mesh, test_dst_name, epoch=0):
    params = state.params_g
    scores = []
    items = loader.ordered(range(n))
    for i, item in zip(range(n), items):
        if item is None:
            continue
        batch = collate_numpy([item], faces=faces)
        H = int(batch["src_img"].shape[1])
        level = max(1, int(math.log2(H)) - 5)   # 256 -> 3 (model.py:581)
        n_tiles = 4 ** (level - 1)
        # tile_group > 1 folds several stride offsets into one call — the
        # multi-chip serving unit.  Single-chip it no longer pays (the
        # per-call dispatch overhead it amortized is gone), so default 1.
        tg, use_mesh = plan_tile_group(
            n_tiles, cfg["training"].get("eval_tile_group", 1), mesh)
        out = render_full_image(
            model, params, batch, level=level, n_views=n_views,
            tile_group=tg, mesh=use_mesh)
        pred = np.clip(np.asarray(out["tex_fg_fine"])[0], 0.0, 1.0)
        gt = np.asarray(batch["tar_img"])[0]
        # SSIM crop region: ray-AABB mask when the dataset provides it
        # (evaluator.py:21-23), else the foreground mask
        if "mask_at_box" in batch:
            mask_at_box = np.asarray(batch["mask_at_box"])[0] > 0
        else:
            mask_at_box = np.asarray(batch["tar_mask"])[0, ..., 0] > 0
        s = evaluator.compute_score(
            pred, gt,
            input_imgs=np.asarray(batch["src_img"]),
            mask_at_box=mask_at_box,
            human_idx=str(item.get("human_idx", 0)),
            frame_index=str(item.get("frame_index", i)),
            view_index=str(item.get("cam_ind", 0)))
        scores.append(s)
        print(f"[{i+1}/{n}]", {k: round(v, 4) for k, v in s.items()})

    results = {k: float(np.nanmean([s[k] for s in scores]))
               for k in scores[0]}
    # self-describing weight provenance: lpips is NaN until AlexNet
    # weights are converted (zero-egress blocker), and a random-init VGG
    # changes the training objective — every report says which ran.
    results["lpips_pretrained"] = evaluator.lpips_fn is not None
    results["vgg_random_init"] = not bool(
        os.environ.get("VANERF_VGG19_NPZ", ""))
    # approximate-tier provenance: the RESOLVED values (env var > config
    # `inference` section > default; renderer.resolve_tier) — every
    # report says which numerics produced it, and a saved config.json
    # reproduces the run when no env override is present
    # Applied values mirror the renderer's own gating (renderer.py:
    # 305-384): every tier is OFF under sp_conv / SoA / fused kernels,
    # and the global-budget tiers additionally need n_views==1 — a
    # multi-view report must not claim e.g. far_net=0.5 when the run
    # actually used exact numerics (ADVICE r4).  `*_requested` keeps the
    # env/config resolution for reproducibility.
    from .renderer import resolve_tier
    fused = bool(getattr(model, "sp_conv", False)
                 or os.environ.get("VANERF_FUSED_MLP"))
    soa = bool(int(os.environ.get("VANERF_SOA_POINTS", "0") or 0))

    def record(name, env, default, gated_off):
        req = resolve_tier(env, getattr(model, name, default), False)
        applied = 0.0 if gated_off else req
        if req and applied != req:
            results[f"{name}_requested"] = req
        if applied or name == "far_tau":
            results[name] = applied

    record("far_tau", "VANERF_FAR_TAU", 0.02, fused)
    record("far_skip", "VANERF_FAR_SKIP", 0.0, fused or soa)
    record("far_net", "VANERF_FAR_NET", 0.0,
           fused or soa or n_views != 1)
    record("far_tnet", "VANERF_FAR_TNET", 0.0,
           fused or soa or n_views != 1)
    step = int(state.step)
    # test_{name}_{epoch}_{step}.yml (ref model.py:110-121)
    path = os.path.join(save_dir,
                        f"test_{test_dst_name}_{epoch}_{step}.yml")
    with open(path, "w") as f:
        yaml.dump(results, f)
    print("Results saved in", path)
    print(results)
    return results
