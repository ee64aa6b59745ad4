"""Convert torchvision VGG19 pretrained weights -> npz for vanerf_tpu.losses.

Run once in an environment with torchvision + the downloaded checkpoint:
  python tools/convert_vgg.py --out vgg19_features.npz \
      [--state_dict path/to/vgg19-dcbb9e9d.pth]
Then set VANERF_VGG19_NPZ=vgg19_features.npz.

Mapping: torch `features.{idx}` convs -> flax layer names used by
``vanerf_tpu.losses.Vgg19Features`` (conv1_1 ... conv4_1).  Torch conv
weights are (out, in, kh, kw); flax expects (kh, kw, in, out).
"""

import argparse

import numpy as np

_TORCH_IDX_TO_NAME = {
    0: "conv1_1", 2: "conv1_2", 5: "conv2_1", 7: "conv2_2",
    10: "conv3_1", 12: "conv3_2", 14: "conv3_3", 16: "conv3_4",
    19: "conv4_1",    # the reference's slice4 is features[12:21] — it
}                     # ends at relu4_1; conv4_2 (idx 21) is NOT used


def convert_vgg_sd(sd) -> dict:
    """torchvision vgg19 `features.*` state_dict -> flat npz mapping
    (`{layer}.kernel` HWIO / `{layer}.bias`) for losses.Vgg19Features."""
    out = {}
    for idx, name in _TORCH_IDX_TO_NAME.items():
        w = np.asarray(sd[f"features.{idx}.weight"])
        b = np.asarray(sd[f"features.{idx}.bias"])
        out[f"{name}.kernel"] = np.transpose(w, (2, 3, 1, 0))
        out[f"{name}.bias"] = b
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--state_dict", default=None,
                    help="local vgg19 .pth; downloads via torchvision if "
                         "omitted")
    args = ap.parse_args()

    import torch
    if args.state_dict:
        sd = torch.load(args.state_dict, map_location="cpu")
    else:
        import torchvision
        sd = torchvision.models.vgg19(pretrained=True).state_dict()

    out = convert_vgg_sd({k: v.numpy() for k, v in sd.items()
                          if k.startswith("features.")})
    np.savez(args.out, **out)
    print("wrote", args.out, "with", len(out), "arrays")


if __name__ == "__main__":
    main()
