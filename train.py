"""Train / evaluate VANeRF-TPU — CLI-compatible with the reference.

Usage (same flags as reference ``train.py``):
  python train.py --config ./configs/vanerf.json                 # train
  python train.py --config ./configs/vanerf.json --run_val \
      --model_ckpt EXPERIMENTS/vanerf/ckpts                      # eval
  python train.py --config ./configs/vanerf.json --num_gpus 4    # 4-chip DP

Extra (TPU build): --synthetic_data runs on the built-in fixture so the
whole pipeline can be exercised without InterHand2.6M.
"""

import os

import numpy as np


def main(argv=None):
    import jax

    # Honor JAX_PLATFORMS even when the environment pre-imports jax and
    # force-registers a TPU backend (env-var forcing is snapshotted too
    # late there; jax.config.update works until backend init).
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass  # backend already initialized; leave as-is
    import jax.numpy as jnp

    from vanerf_tpu import config as vconfig
    from vanerf_tpu import losses as L
    from vanerf_tpu.data import SyntheticDataset
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.training.checkpoints import CheckpointManager
    from vanerf_tpu.training.loop import fit, collate_numpy, MetricLogger
    from vanerf_tpu.training.train_step import (create_train_state,
                                                make_train_step)

    parser = vconfig.create_parser()
    args = parser.parse_args(argv)
    vconfig.resolve_flags(args)
    cfg = vconfig.load_cfg(args.config)
    cfg["dataset"]["data_root"] = args.data_root
    if getattr(args, "in_the_wild", False):
        # render-from-estimated-meshes eval: routes to --run_val
        # (resolve_flags; the reference's own entry is broken upstream,
        # train.py:73) AND switches the dataset to InTagHand-predicted
        # meshes (dataset.py:485-496)
        cfg["dataset"]["use_intag_preds"] = True
    if args.out_dir is not None:
        cfg["out_dir"] = args.out_dir
    cfg["expname"] = cfg.get("expname", "default")
    save_dir = os.path.join(cfg["out_dir"], cfg["expname"])
    vconfig.save_config(save_dir, cfg)

    # ---- dataset ----
    if args.synthetic_data:
        scfg = cfg["dataset"].get("synthetic_cfg", {})
        ds_kw = {k: scfg[k] for k in ("H", "W", "subdiv", "n_cams")
                 if k in scfg}
        ds_kw["num_input_view"] = cfg["dataset"].get("num_input_view", 1)
        ds_train = SyntheticDataset(n_frames=scfg.get("n_frames", 4),
                                    split="train", **ds_kw)
        ds_test = SyntheticDataset(n_frames=2, split="test", **ds_kw)
        faces = ds_train.faces
        num_v = ds_train.num_v
    else:
        from vanerf_tpu.data.interhand import InterHandDataset
        ds_train = InterHandDataset.from_config(cfg["dataset"], "train", cfg)
        ds_test = InterHandDataset.from_config(cfg["dataset"], "test", cfg)
        faces = ds_train.faces
        num_v = ds_train.num_v

    model = VANeRF.from_config(cfg, num_v=num_v)
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(0)

    # DDP semantics (ref train.py:58-65): N ranks each draw
    # train_batch_size, so the global batch is N x train_batch_size,
    # sharded P("data") over the mesh.
    per_device_bs = cfg["training"].get("train_batch_size", 1)
    global_bs = args.num_gpus * per_device_bs

    collate = lambda items: collate_numpy(items, faces=faces)  # noqa: E731
    sample_batch = collate([ds_train[i % len(ds_train)]
                            for i in range(global_bs)])
    n_views = cfg["dataset"].get("num_input_view", 1)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, rng, sample_batch, cfg,
        steps_per_epoch=len(ds_train), n_views=n_views)

    # auto-resume (train.py:38-44 semantics); --model_ckpt accepts an
    # orbax dir OR a tools/convert_reference_ckpt.py output file
    from vanerf_tpu.training.checkpoints import restore_any
    ckpt_dir = os.path.join(save_dir, "ckpts")
    restored, step = restore_any(args.model_ckpt or ckpt_dir, state)
    if restored is not None:
        state = restored
        print(f"Resumed from step {step}")

    vgg = L.VGGLoss()
    step_fn = make_train_step(model, disc, tx_g, tx_d, cfg, vgg,
                              n_views=n_views)

    if args.num_gpus != 1:
        from vanerf_tpu.parallel import make_mesh, make_parallel_train_step
        mesh = make_mesh(args.num_gpus)
        step_fn = make_parallel_train_step(step_fn, mesh, sample_batch)
    else:
        step_fn = jax.jit(step_fn, donate_argnums=(0,))

    if args.run_val:
        from vanerf_tpu.eval_loop import run_test
        val_mesh = None
        if args.num_gpus != 1:
            from vanerf_tpu.parallel import make_mesh
            val_mesh = make_mesh(args.num_gpus)
        spe = max(1, len(ds_train) // global_bs)
        run_test(model, state, ds_test, cfg, save_dir, n_views=n_views,
                 mesh=val_mesh, epoch=int(state.step) // spe)
        return

    if args.synthetic_data:
        ds_val = SyntheticDataset(n_frames=1, split="test", **ds_kw)
    else:
        from vanerf_tpu.data.interhand import InterHandDataset
        ds_val = InterHandDataset.from_config(cfg["dataset"], "val", cfg)
    from vanerf_tpu.eval_loop import make_val_fn
    val_fn = make_val_fn(model, disc, ds_val, cfg, vgg, n_views=n_views)

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    state = fit(step_fn, state, ds_train, collate, cfg=cfg,
                save_dir=save_dir, rng=jax.random.PRNGKey(1),
                val_fn=None if args.fast_dev_run else val_fn,
                fast_dev_run=args.fast_dev_run, batch_size=global_bs)
    if args.profile_dir:
        jax.profiler.stop_trace()
    print("Training done at step", int(state.step))


if __name__ == "__main__":
    main()
