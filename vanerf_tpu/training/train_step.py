"""GAN training step: generator render + losses, discriminator + R1 — one jit.

Parity target: ``VANeRFLightningModule.training_step``
(reference ``src/model.py:381-459``) with the dual-Adam / MultiStepLR
[2,5,10,20,35] x 0.5 optimizer config (``model.py:61-68``).

GAN scheme (config ``training.reference_faithful_gan``, default True):
the reference renders the full generator forward TWICE per step — once for
the G optimizer, and AGAIN for the D optimizer with a fresh random patch
(new stride + mask-centered grid draw) through the just-updated generator
(``model.py:417`` + random stride at ``:987-990``; PL steps each optimizer
after its closure).  The faithful mode reproduces exactly that.  Setting
the flag False (or env ``VANERF_FAITHFUL_GAN=0``) switches to the cheaper
single-render scheme: the patch is rendered once, the G update
differentiates through it, and the D update consumes the stop-gradient'd
render — a ~1.5x cut of step cost with standard simultaneous-GAN
semantics, but D then trains on the pre-update G's patch distribution
(deviation; see docs/perf.md for the measured A/B).  R1 is a nested
`jax.grad` through the discriminator inside the same jit either way.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from .. import losses as L
from ..models.discriminator import (DiscriminatorVis, bce_loss,
                                    d_logistic_loss, g_nonsaturating_loss)
from ..renderer import mask_centered_grid, render_patch


class TrainState(NamedTuple):
    params_g: Any
    params_d: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray


def make_lr_schedule(base_lr: float, steps_per_epoch: int,
                     milestones=(2, 5, 10, 20, 35), gamma: float = 0.5):
    """MultiStepLR(milestones, gamma) in steps (model.py:64-65)."""
    boundaries = {m * steps_per_epoch: gamma for m in milestones}
    return optax.piecewise_constant_schedule(base_lr, boundaries)


def create_train_state(model, disc: DiscriminatorVis, rng, sample_batch,
                       cfg: dict, steps_per_epoch: int = 5423,
                       n_views: int = 1) -> TrainState:
    """Initialize G/D params + optimizers from a sample batch."""
    lr = cfg["training"].get("lr", 1e-5)
    sched = make_lr_schedule(lr, steps_per_epoch)

    b = sample_batch
    H, W = b["src_img"].shape[1:3]
    n = 8
    kg, kd = jax.random.split(rng)
    cam = {"KRT": b["src_krt"], "extrin": b["src_extrin"], "width": W,
           "height": H, "znear": b["znear"], "zfar": b["zfar"]}
    B = b["tar_k"].shape[0]
    V2 = b["verts"].shape[1]
    def init_g(key, bb):
        c = dict(cam)
        return model.init(
            key, bb["src_img"], jnp.zeros((B, n, 3)), jnp.ones((B, n, 3)),
            c, bb["src_mask"], bb["verts"], jnp.ones((B, V2, 1)),
            jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)), bb["kpt3d"], n,
            n_views)

    params_g = jax.jit(init_g)(kg, b)
    d_imgs = [jnp.zeros((B, 64, 64, 3))] * 4
    params_d = jax.jit(disc.init)(kd, *d_imgs)

    tx_g = optax.adam(sched)
    tx_d = optax.adam(sched)
    accum = cfg["training"].get("accumulate_grad_batches", 1)
    if accum and accum > 1:
        # gradient accumulation (reference train.py:63)
        tx_g = optax.MultiSteps(tx_g, every_k_schedule=accum)
        tx_d = optax.MultiSteps(tx_d, every_k_schedule=accum)
    return TrainState(params_g, params_d, tx_g.init(params_g),
                      tx_d.init(params_d), jnp.zeros((), jnp.int32)), \
        (tx_g, tx_d)


def _generator_outputs(model, params_g, batch, rng, cfg, n_views):
    """Render the training patch and assemble the reconstruction losses."""
    m = cfg["models"]["VANeRF"]
    drk = m.get("dr_kwargs", {})
    out_h = m.get("train_out_h", 64)
    out_w = m.get("train_out_w", 64)
    H = batch["src_img"].shape[1]

    kgrid, krender = jax.random.split(rng)
    tar_mask = batch["tar_mask"][..., 0]
    grids = mask_centered_grid(kgrid, tar_mask, out_h, out_w)

    out = render_patch(
        model, params_g, batch, rng=krender, grids=grids,
        out_h=out_h, out_w=out_w,
        sample_per_ray_c=drk.get("sample_per_ray_c", 64),
        sample_per_ray_f=drk.get("sample_per_ray_f", 64),
        fine=drk.get("fine", True), uniform=drk.get("uniform", False),
        rand_noise_std=drk.get("rand_noise_std", 0.0), training=True,
        n_views=n_views)
    out["tex_cal"] = out["tex_fg"]
    if "tex_fg_fine" in out:
        out["tex_cal_fine"] = out["tex_fg_fine"]
    return out


def make_train_step(model, disc, tx_g, tx_d, cfg: dict, vggloss,
                    n_views: int = 1):
    """Build the jitted train step closure."""
    import os
    lambdas = cfg["models"]["VANeRF"].get("lambdas", {})
    dis_lambdas = cfg["models"]["Discriminator"]["lambdas"]
    l_dis1 = dis_lambdas.get("lambda_dis1", 0.1)
    l_dis2 = dis_lambdas.get("lambda_dis2", 0.1)
    env_fg = os.environ.get("VANERF_FAITHFUL_GAN", "")
    faithful = (env_fg not in ("", "0") if env_fg != ""
                else bool(cfg["training"].get("reference_faithful_gan",
                                              True)))

    def g_loss_fn(params_g, params_d, batch, rng):
        out = _generator_outputs(model, params_g, batch, rng, cfg, n_views)
        loss, err = L.compute_error(out, lambdas, vggloss)

        rendered = jnp.clip(out["tex_fg_fine"], 0.0, 1.0)
        fake_pred, fake_vis = disc.apply(
            params_d, out["img_in"], out["input_densepose"],
            out["tar_densepose"], rendered)
        msk = out["tar_alpha"]
        vis_pix = bce_loss(fake_vis, jnp.ones_like(fake_vis))
        vis_pix = jnp.where(msk == 0, 0.0, vis_pix).mean()
        g_gan = g_nonsaturating_loss(fake_pred)

        loss = loss + l_dis1 * g_gan + l_dis2 * vis_pix
        err["gan_loss"] = l_dis1 * g_gan
        err["vis_pix_loss"] = l_dis2 * vis_pix
        return loss, (out, err)

    def d_loss_fn(params_d, out, rng):
        rendered = jax.lax.stop_gradient(
            jnp.clip(out["tex_fg_fine"], 0.0, 1.0))
        gt = out["tar_img"]
        vis_gt = out["vis_img"]
        msk = out["tar_alpha"]
        ipt = out["img_in"]
        idp, tdp = out["input_densepose"], out["tar_densepose"]

        real_pred, real_vis = disc.apply(params_d, ipt, idp, tdp, gt)
        fake_pred, fake_vis = disc.apply(params_d, ipt, idp, tdp, rendered)

        real_vis_l = bce_loss(real_vis, jnp.ones_like(real_vis))
        fake_vis_l = bce_loss(fake_vis, vis_gt)
        real_vis_l = jnp.where(msk == 0, 0.0, real_vis_l)
        fake_vis_l = jnp.where(msk == 0, 0.0, fake_vis_l)
        fake_vis_l = jnp.where(vis_gt == 0, fake_vis_l * 5.0, fake_vis_l)
        real_vis_l = real_vis_l.mean()
        fake_vis_l = fake_vis_l.mean()

        d_gan = d_logistic_loss(real_pred, fake_pred)

        # R1 penalty (networks.py:591-597, weight model.py:444-445)
        def real_score(x):
            p, _ = disc.apply(params_d, ipt, idp, tdp, x)
            return p.sum()

        grad_real = jax.grad(real_score)(gt)
        r1 = 300.0 * 0.5 * (grad_real ** 2).reshape(gt.shape[0], -1) \
            .sum(1).mean()

        d_loss = d_gan + r1 + real_vis_l + fake_vis_l
        logs = {"d": d_gan, "r1": r1, "real_score": real_pred.mean(),
                "fake_score": fake_pred.mean(),
                "real_vis_pix_loss": real_vis_l,
                "fake_vis_pix_loss": fake_vis_l}
        return d_loss, logs

    def train_step(state: TrainState, batch, rng, axis_name=None):
        """One GAN step.  `axis_name`: when run per-shard under
        `shard_map` (data parallelism), gradients and logs are psum/pmean'd
        over that mesh axis before the (replicated) optimizer update —
        the explicit analog of DDP's allreduce (SURVEY §2.2)."""
        rng_g, rng_d = jax.random.split(rng)
        (g_loss, (out, err)), grads_g = jax.value_and_grad(
            g_loss_fn, has_aux=True)(state.params_g, state.params_d,
                                     batch, rng_g)
        if axis_name is not None:
            grads_g = jax.lax.pmean(grads_g, axis_name)
        updates_g, opt_g = tx_g.update(grads_g, state.opt_g, state.params_g)
        params_g = optax.apply_updates(state.params_g, updates_g)

        if faithful:
            # reference semantics (model.py:417): the D optimizer sees a
            # FRESH random patch rendered through the just-updated G; no
            # gradient flows into G from the D step (rendered.detach()).
            out_d = jax.lax.stop_gradient(_generator_outputs(
                model, params_g, batch, rng_d, cfg, n_views))
        else:
            out_d = out
        (d_loss, d_logs), grads_d = jax.value_and_grad(
            d_loss_fn, has_aux=True)(state.params_d, out_d, rng_d)
        if axis_name is not None:
            grads_d = jax.lax.pmean(grads_d, axis_name)
        updates_d, opt_d = tx_d.update(grads_d, state.opt_d, state.params_d)
        params_d = optax.apply_updates(state.params_d, updates_d)

        logs = {f"train/{k}": v for k, v in err.items()}
        logs.update({f"train/{k}": v for k, v in d_logs.items()})
        logs["train/g_loss"] = g_loss
        logs["train/d_loss"] = d_loss
        if axis_name is not None:
            logs = jax.lax.pmean(logs, axis_name)
        new_state = TrainState(params_g, params_d, opt_g, opt_d,
                               state.step + 1)
        return new_state, logs

    return train_step


# convenience alias used by __graft_entry__ / tests
train_step = make_train_step
