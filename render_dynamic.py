"""Free-viewpoint orbit video rendering — CLI-compatible with the reference.

Usage (reference ``render_dynamic.py:9-33``):
  python render_dynamic.py --config ./configs/vanerf.json \
      --model_ckpt EXPERIMENTS/vanerf/ckpts [--synthetic_data]

Renders a 20-frame 360-degree orbit around each subject with
``get_360cameras`` (wobble schedule parity) and writes PNG frames, a GIF
and an MJPEG .mp4 (pure-python muxer, ``vanerf_tpu/video.py``) — the same
three outputs as the reference (``model.py:190-207``).
"""

import os

import numpy as np


def main(argv=None):
    import imageio
    import jax

    # honor JAX_PLATFORMS even when the environment pre-registered a TPU
    # backend (see train.py)
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        try:
            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
    import jax.numpy as jnp

    from vanerf_tpu import config as vconfig
    from vanerf_tpu.camera_path import get_360cameras
    from vanerf_tpu.data import SyntheticDataset
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.renderer import plan_tile_group, render_full_image
    from vanerf_tpu.training.checkpoints import CheckpointManager
    from vanerf_tpu.training.loop import collate_numpy
    from vanerf_tpu.training.train_step import create_train_state

    parser = vconfig.create_parser()
    args = parser.parse_args(argv)
    cfg = vconfig.load_cfg(args.config)
    if args.out_dir is not None:
        cfg["out_dir"] = args.out_dir
    save_dir = os.path.join(cfg["out_dir"], cfg.get("expname", "default"))

    if args.synthetic_data:
        scfg = cfg["dataset"].get("synthetic_cfg", {})
        ds_kw = {k: scfg[k] for k in ("H", "W", "subdiv", "n_cams")
                 if k in scfg}
        ds = SyntheticDataset(n_frames=1, split="test", **ds_kw)
    else:
        from vanerf_tpu.data.interhand import InterHandDataset
        ds = InterHandDataset.from_config(cfg["dataset"], "test_visualize",
                                          cfg)
    faces = ds.faces
    model = VANeRF.from_config(cfg, num_v=ds.num_v)
    disc = DiscriminatorVis()

    item = ds[0]
    batch = collate_numpy([item], faces=faces)
    rng = jax.random.PRNGKey(0)
    state, _tx = create_train_state(model, disc, rng, batch, cfg, 10)
    if args.model_ckpt:
        from vanerf_tpu.training.checkpoints import restore_any
        restored, step = restore_any(args.model_ckpt, state)
        if restored is not None:
            state = restored
            print("Loaded checkpoint at step", step)

    # orbit cameras around the hand center (model.py:140-207 flow)
    trans = 10.0
    n_frames = cfg.get("video_cfg", {}).get("n_frames", 20)
    sc = 1.0
    znear, zfar = (trans - 5.0) * sc, (trans + 5.0) * sc
    im_w = im_h = int(batch["src_img"].shape[2])
    fstart, fend = im_w * 30, im_w * 0.05
    focal = fstart + 0.01 * (fend - fstart)
    center = np.asarray(batch["kpt3d"])[0, 0]
    headpose = np.eye(4, dtype=np.float32)
    headpose[:3, 3] = center
    cams = get_360cameras(headpose, focal, trans, sc, im_w, im_h,
                          znear, zfar, n_frames)

    # multi-chip serving: shard each frame's tile group over the device
    # mesh (same plan as the eval loop; the reference renders video on a
    # single GPU only, model.py:140-207)
    mesh = None
    if args.num_gpus != 1:
        from vanerf_tpu.parallel import make_mesh
        mesh = make_mesh(args.num_gpus)
    level = max(1, int(np.log2(im_h)) - 5)
    tg, mesh = plan_tile_group(
        4 ** (level - 1), cfg.get("training", {}).get("eval_tile_group", 1),
        mesh)

    out_dir = os.path.join(save_dir, "video_interhand")
    os.makedirs(out_dir, exist_ok=True)
    frames = []
    for fi, cam in enumerate(cams):
        b = dict(batch)
        b["tar_k"] = jnp.asarray(cam["intrinsics"])
        b["tar_rt"] = jnp.asarray(cam["w2cs"][None])
        b["znear"] = jnp.float32(cam["znear"])
        b["zfar"] = jnp.float32(cam["zfar"])
        b["tar_img"] = None
        b["tar_mask"] = None
        out = render_full_image(model, state.params_g, b, level=level,
                                tile_group=tg, mesh=mesh)
        img = np.clip(np.asarray(out["tex_fg_fine"])[0], 0, 1)
        frame = (img * 255).astype(np.uint8)
        imageio.imwrite(os.path.join(out_dir, f"{fi:06d}.png"), frame)
        frames.append(frame)
        print(f"frame {fi+1}/{n_frames}")
    imageio.mimsave(os.path.join(out_dir, "nvs.gif"), frames, duration=0.1)
    print("Saved:", os.path.join(out_dir, "nvs.gif"))
    # mp4 alongside the GIF (ref model.py:190-207 writes both); pure-python
    # MJPEG muxer since ffmpeg/cv2 are unavailable in this image
    from vanerf_tpu.video import write_mjpeg_mp4
    mp4 = write_mjpeg_mp4(os.path.join(out_dir, "nvs.mp4"), frames, fps=10)
    print("Saved:", mp4)


if __name__ == "__main__":
    main()
