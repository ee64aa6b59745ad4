"""Convert the torch `lpips` package's AlexNet LPIPS weights -> npz.

Run once where `lpips` + torch are installed:
  python tools/convert_lpips.py --out lpips_alex.npz
Then set VANERF_LPIPS_NPZ=lpips_alex.npz for eval-time LPIPS
(``vanerf_tpu.lpips.LPIPS``).
"""

import argparse

import numpy as np


# AlexNet backbone conv shapes (out, in, kh, kw), torch layout — the
# contract between this converter and vanerf_tpu.lpips._ALEX
ALEX_CONV_SHAPES = [(64, 3, 11, 11), (192, 64, 5, 5), (384, 192, 3, 3),
                    (256, 384, 3, 3), (256, 256, 3, 3)]


def pack_lpips(convs, lins) -> dict:
    """(w, b) conv pairs + linear-head vectors -> flat npz mapping.

    Shapes are validated against the AlexNet contract so a mispacked
    checkpoint fails here, not as silent garbage at eval time.
    """
    out = {}
    assert len(convs) == len(ALEX_CONV_SHAPES) == len(lins)
    for i, ((w, b), shape) in enumerate(zip(convs, ALEX_CONV_SHAPES)):
        w, b = np.asarray(w), np.asarray(b)
        assert w.shape == shape, (i, w.shape, shape)
        assert b.shape == (shape[0],), (i, b.shape)
        out[f"conv{i}.weight"] = w
        out[f"conv{i}.bias"] = b
    for i, w in enumerate(lins):
        w = np.asarray(w).reshape(-1)
        assert w.shape == (ALEX_CONV_SHAPES[i][0],), (i, w.shape)
        out[f"lin{i}.weight"] = w
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import lpips as lpips_pkg
    net = lpips_pkg.LPIPS(net="alex")
    mods = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
           [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
           [m for m in net.net.slice5]
    import torch.nn as nn
    convs = [(m.weight.detach().numpy(), m.bias.detach().numpy())
             for m in mods if isinstance(m, nn.Conv2d)]
    lins = [lin.model[-1].weight.detach().numpy() for lin in net.lins]
    out = pack_lpips(convs, lins)
    np.savez(args.out, **out)
    print("wrote", args.out, f"({len(convs)} convs, {len(lins)} lins)")


if __name__ == "__main__":
    main()
