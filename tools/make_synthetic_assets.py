"""Dress rehearsal for the environment-blocked pretrained assets.

Zero egress blocks the real torchvision VGG19 weights, the lpips AlexNet
weights and the released reference ``model.ckpt`` (Google Drive).  This
tool emits SYNTHETIC stand-ins with the exact torch layouts the three
converters consume, so the full day-the-assets-arrive path can be
exercised end-to-end today:

  python tools/make_synthetic_assets.py --out /tmp/assets
  python tools/convert_vgg.py  --state_dict /tmp/assets/vgg19_features.pth \
      --out /tmp/assets/vgg19.npz
  python tools/convert_lpips.py --state_dict /tmp/assets/lpips_alex.pth \
      --out /tmp/assets/lpips.npz
  python tools/convert_reference_ckpt.py --ckpt /tmp/assets/model.ckpt \
      --out /tmp/assets/ckpt.pkl
  VANERF_VGG19_NPZ=/tmp/assets/vgg19.npz \
  VANERF_LPIPS_NPZ=/tmp/assets/lpips.npz \
  python train.py --config ./configs/vanerf.json --synthetic_data \
      --run_val --model_ckpt /tmp/assets/ckpt.pkl --out_dir <dir>

The weights are random (never trained); only layouts/shapes matter.
The same command sequence works unmodified with the real assets — see
docs/data.md.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import torch

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))
sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..", "tests")))

# torchvision vgg19 `features.*` conv layout (idx -> (in, out)); the
# converter consumes conv1_1 .. conv4_2 (tools/convert_vgg.py)
VGG_CONVS = {0: (3, 64), 2: (64, 64), 5: (64, 128), 7: (128, 128),
             10: (128, 256), 12: (256, 256), 14: (256, 256),
             16: (256, 256), 19: (256, 512), 21: (512, 512)}

# lpips AlexNet backbone: slice -> [(features_idx, in, out, k), ...]
ALEX_SLICES = {1: [(0, 3, 64, 11)], 2: [(3, 64, 192, 5)],
               3: [(6, 192, 384, 3)], 4: [(8, 384, 256, 3)],
               5: [(10, 256, 256, 3)]}
ALEX_CH = [64, 192, 384, 256, 256]


def synthetic_vgg19_sd(seed=0) -> dict:
    rs = np.random.RandomState(seed)
    sd = {}
    for idx, (cin, cout) in VGG_CONVS.items():
        sd[f"features.{idx}.weight"] = torch.from_numpy(
            rs.randn(cout, cin, 3, 3).astype(np.float32) * 0.05)
        sd[f"features.{idx}.bias"] = torch.from_numpy(
            rs.randn(cout).astype(np.float32) * 0.05)
    return sd


def synthetic_lpips_sd(seed=1) -> dict:
    rs = np.random.RandomState(seed)
    sd = {}
    for s, convs in ALEX_SLICES.items():
        for idx, cin, cout, k in convs:
            sd[f"net.slice{s}.{idx}.weight"] = torch.from_numpy(
                rs.randn(cout, cin, k, k).astype(np.float32) * 0.05)
            sd[f"net.slice{s}.{idx}.bias"] = torch.from_numpy(
                rs.randn(cout).astype(np.float32) * 0.05)
    for i, ch in enumerate(ALEX_CH):
        sd[f"lin{i}.model.1.weight"] = torch.from_numpy(
            np.abs(rs.randn(1, ch, 1, 1)).astype(np.float32))
    return sd


def synthetic_reference_ckpt(seed=2, cfg=None, num_v=779, hw3=64,
                             hw4=256) -> dict:
    """A full reference-layout Lightning checkpoint from the replica.

    num_v/hw3/hw4 default to production shapes; tests shrink them to
    match the synthetic fixture's mesh/image sizes.
    """
    import torch_ref_replica as R
    from vanerf_tpu import config as vconfig

    torch.manual_seed(seed)
    rep = R.LightningReplicaT(cfg or vconfig.default_cfg(), num_v=num_v,
                              hw3=hw3, hw4=hw4)
    return {"state_dict": rep.state_dict(), "epoch": 29,
            "global_step": 162690}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None,
                    help="config JSON for the model.ckpt replica "
                         "(default: configs/vanerf.json)")
    ap.add_argument("--num_v", type=int, default=779)
    ap.add_argument("--hw3", type=int, default=64)
    ap.add_argument("--hw4", type=int, default=256)
    args = ap.parse_args(argv)
    os.makedirs(args.out, exist_ok=True)

    cfg = None
    if args.config:
        from vanerf_tpu import config as vconfig
        cfg = vconfig.load_cfg(args.config)

    torch.save(synthetic_vgg19_sd(),
               os.path.join(args.out, "vgg19_features.pth"))
    torch.save(synthetic_lpips_sd(),
               os.path.join(args.out, "lpips_alex.pth"))
    torch.save(synthetic_reference_ckpt(cfg=cfg, num_v=args.num_v,
                                        hw3=args.hw3, hw4=args.hw4),
               os.path.join(args.out, "model.ckpt"))
    print("wrote synthetic vgg19_features.pth / lpips_alex.pth / "
          f"model.ckpt under {args.out}")


if __name__ == "__main__":
    main()
