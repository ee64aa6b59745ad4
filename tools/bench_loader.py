"""Input-pipeline throughput: items/s of SampleLoader at 1..N workers.

The GAN step is ~126 ms device time; dataset[i] (image decode + jitter +
MANO forward + near/far) must stay under that per item or the input
pipeline becomes the training bottleneck (ref model.py:74-105 uses
torch DataLoader workers for the same reason). CPU-only — runs anywhere.

Usage: python tools/bench_loader.py [--workers 1 2 4] [--items 64]

NOTE: worker scaling needs cores. On a 1-vCPU dev container extra
workers only add IPC overhead; on a real TPU-VM host (v5e: ~100 vCPUs)
N workers give ~N× until decode saturates.
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_interhand_fixture(root: str, n_frames: int = 8, n_cams: int = 4,
                           H: int = 256) -> str:
    """Write an InterHand2.6M-FORMAT on-disk fixture (same layout the real
    preprocessor emits: index/annotation pkls, cam_list.pth, jpg
    image/mask/densepose per capture/cam/frame) at production image size,
    so ``InterHandDataset.__getitem__``'s full cost — jpeg decode x3,
    shared-seed color jitter, masking+erosion, 2-hand MANO forward + seal,
    ray near/far — is measurable without the real (license-gated) data."""
    import json
    import pickle

    import numpy as np
    import torch
    from PIL import Image

    ann = os.path.join(root, "InterHand2.6M/annotations/train")
    proc = os.path.join(root, "processed_dataset/train")
    os.makedirs(ann, exist_ok=True)
    for sub in ("index", "annotation", "image", "mask", "densepose"):
        os.makedirs(os.path.join(proc, sub), exist_ok=True)

    cams = [f"4000{i:02d}" for i in range(n_cams)]
    rs = np.random.RandomState(0)
    joints, manos, cam_list = {}, {}, {}
    for fr in range(n_frames):
        joints.setdefault("0", {})[str(fr)] = {
            "world_coord": (rs.normal(scale=50.0, size=(42, 3))).tolist()}
        manos.setdefault("0", {})[str(fr)] = {
            hand: {"pose": (rs.normal(scale=0.1, size=48)).tolist(),
                   "shape": (rs.normal(scale=0.3, size=10)).tolist(),
                   "trans": [0.03 if hand == "right" else -0.03, 0.0, 1.1]}
            for hand in ("right", "left")}
        cam_list[fr] = {0: [(c, 0) for c in cams]}
        with open(os.path.join(proc, "index", f"{fr}.pkl"), "wb") as f:
            pickle.dump({"frame": fr, "capture": 0}, f)
    with open(os.path.join(ann, "InterHand2.6M_train_joint_3d.json"),
              "w") as f:
        json.dump(joints, f)
    with open(os.path.join(
            ann, "InterHand2.6M_train_MANO_NeuralAnnot.json"), "w") as f:
        json.dump(manos, f)
    torch.save(cam_list, os.path.join(proc, "cam_list.pth"))

    for i, cam in enumerate(cams):
        angle = i * np.pi / 6
        R = np.asarray([[np.cos(angle), 0, np.sin(angle)], [0, 1, 0],
                        [-np.sin(angle), 0, np.cos(angle)]], np.float32)
        t = np.asarray([0.05 * i, 0.0, 1.0 + 0.02 * i], np.float32)
        in_K = np.eye(4, dtype=np.float32)
        in_K[:3, :3] = np.asarray([[5 * H / 16, 0, H / 2],
                                   [0, 5 * H / 16, H / 2], [0, 0, 1]])
        d = f"capture0/cam{cam}"
        for sub in ("annotation", "image", "mask", "densepose"):
            os.makedirs(os.path.join(proc, sub, d), exist_ok=True)
        for fr in range(n_frames):
            with open(os.path.join(proc, "annotation", d,
                                   f"frame{fr}.pkl"), "wb") as f:
                pickle.dump({"camera": {"R": R, "t": t, "in_K": in_K}}, f)
            img = (rs.random((H, H, 3)) * 200 + 40).astype(np.uint8)
            mask = np.zeros((H, H), np.uint8)
            mask[H // 4: 3 * H // 4, H // 4: 3 * H // 4] = 255
            rel = f"{d}/frame{fr}.jpg"
            Image.fromarray(img).save(os.path.join(proc, "image", rel))
            Image.fromarray(mask).save(os.path.join(proc, "mask", rel))
            Image.fromarray(img[..., ::-1]).save(
                os.path.join(proc, "densepose", rel))
    return root


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workers", nargs="*", type=int, default=[1, 2, 4])
    ap.add_argument("--items", type=int, default=64)
    ap.add_argument("--H", type=int, default=256)
    ap.add_argument("--subdiv", type=int, default=3)
    ap.add_argument("--interhand", action="store_true",
                    help="bench the REAL InterHandDataset class on a "
                         "production-size on-disk fixture (VERDICT r4 #6)")
    ap.add_argument("--fixture_root", default="/tmp/ih_bench_fixture")
    args = ap.parse_args()

    # CPU platform: the loader is host-side; don't touch the TPU tunnel
    import jax
    jax.config.update("jax_platforms", "cpu")

    from vanerf_tpu.data.synthetic import SyntheticDataset
    from vanerf_tpu.training.loop import SampleLoader

    def make_ds():
        if args.interhand:
            from vanerf_tpu.data.interhand import InterHandDataset
            if not os.path.isdir(os.path.join(args.fixture_root,
                                              "processed_dataset")):
                print(f"# writing fixture at {args.fixture_root} ...")
                make_interhand_fixture(args.fixture_root, H=args.H)
            return InterHandDataset(
                split="train", data_root=args.fixture_root,
                smplx_path=os.path.join(args.fixture_root, "no_mano"),
                max_len=8, num_input_view=1, color_jitter=True)
        # fresh dataset per config: items must be COLD (the synthetic
        # dataset memoizes renders per process/worker, which would turn
        # later configs into an IPC-only measurement)
        return SyntheticDataset(split="train", H=args.H, W=args.H,
                                subdiv=args.subdiv,
                                n_frames=max(2, args.items // 8))

    idxs = list(range(args.items))
    for w in args.workers:
        ds = make_ds()
        if args.interhand:
            idxs = [i % len(ds) for i in range(args.items)]
        loader = SampleLoader(ds, w)
        try:
            # warm the pool processes (forkserver spawn + unpickle) on an
            # index outside the timed set
            next(iter(loader.ordered([len(ds) - 1])))
            t0 = time.time()
            n = sum(1 for it in loader.ordered(idxs) if it is not None)
            dt = time.time() - t0
        finally:
            loader.close()
        ms = 1e3 * dt / n
        print(f"workers={w}: {n / dt:.2f} items/s ({ms:.1f} ms/item)")
        if args.interhand:
            # device budget: BENCH_TRAIN (faithful 195.3 / single-render
            # 130.7 ms/step, batch 1); DP-8 consumes 8 items per step
            for name, budget in (("faithful", 195.3), ("single", 130.7)):
                need1 = ms / budget
                need8 = ms / (budget / 8.0)
                print(f"  vs {name} {budget} ms/step: "
                      f"{need1:.1f} workers at batch 1, "
                      f"{need8:.1f} at 8-device DP "
                      f"(host needs >= that many cores)")


if __name__ == "__main__":
    main()
