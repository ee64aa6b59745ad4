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


def convs_lins_from_state_dict(sd) -> tuple:
    """Extract (convs, lins) from a saved ``lpips.LPIPS(net='alex')``
    state_dict (``torch.save(net.state_dict(), ...)`` where lpips is
    installed) — keys ``net.slice{s}.{i}.weight/bias`` for the AlexNet
    backbone and ``lin{i}.model.1.weight`` for the linear heads.  Lets the
    conversion run where the lpips package itself is unavailable."""
    conv_keys = sorted(
        (k for k in sd if k.startswith("net.slice") and k.endswith(".weight")),
        key=lambda k: (int(k.split(".")[1][5:]), int(k.split(".")[2])))
    convs = [(np.asarray(sd[k]), np.asarray(sd[k[:-len("weight")] + "bias"]))
             for k in conv_keys]
    lins = [np.asarray(sd[f"lin{i}.model.1.weight"]) for i in range(5)]
    return convs, lins


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--state_dict", default=None,
                    help="saved lpips.LPIPS(net='alex') state_dict .pth; "
                         "imports the lpips package if omitted")
    args = ap.parse_args()

    if args.state_dict:
        import torch
        sd = torch.load(args.state_dict, map_location="cpu",
                        weights_only=False)
        convs, lins = convs_lins_from_state_dict(
            {k: v.numpy() for k, v in sd.items()})
    else:
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
