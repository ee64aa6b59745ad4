"""Convert the torch `lpips` package's AlexNet LPIPS weights -> npz.

Run once where `lpips` + torch are installed:
  python tools/convert_lpips.py --out lpips_alex.npz
Then set VANERF_LPIPS_NPZ=lpips_alex.npz for eval-time LPIPS
(``vanerf_tpu.lpips.LPIPS``).
"""

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import lpips as lpips_pkg
    net = lpips_pkg.LPIPS(net="alex")
    out = {}
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    import torch.nn as nn
    conv_i = 0
    for m in convs:
        if isinstance(m, nn.Conv2d):
            out[f"conv{conv_i}.weight"] = m.weight.detach().numpy()
            out[f"conv{conv_i}.bias"] = m.bias.detach().numpy()
            conv_i += 1
    for i, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()   # (1, C, 1, 1)
        out[f"lin{i}.weight"] = w.reshape(-1)
    np.savez(args.out, **out)
    print("wrote", args.out, f"({conv_i} convs, {len(net.lins)} lins)")


if __name__ == "__main__":
    main()
