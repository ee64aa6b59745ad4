"""Convert a reference VANeRF torch checkpoint (.ckpt) into flax params.

Maps the PyTorch-Lightning ``state_dict`` of the reference
(``VANeRFLightningModule``: generator under ``model.*``, discriminator under
``discriminator.*``) onto this framework's parameter tree so the released
``model.ckpt`` can be evaluated for metric parity.

Layout conversions:
  * Conv2d (o,i,kh,kw) -> (kh,kw,i,o); Conv1d (o,i,k) -> (k,i,o);
    Linear (o,i) -> (i,o).
  * ConvTranspose2d (i,o,kh,kw) -> (kh,kw,o,i) (our ConvTranspose uses
    ``transpose_kernel=True`` for exact torch alignment).
  * weight_norm Linear: weight_v -> v (transposed), weight_g -> g
    (flattened); norms recomputed identically at apply time.
  * GroupNorm/LayerNorm weight/bias -> scale/bias.

Usage:
  python tools/convert_reference_ckpt.py --ckpt model.ckpt --out params.msgpack

The converter is also importable for tests:
  from convert_reference_ckpt import convert_state_dict
"""

from __future__ import annotations

import argparse
import sys
import os

import numpy as np

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__),
                                                "..")))


def conv2d(sd, key, dst, name, bias=True):
    w = np.asarray(sd[f"{key}.weight"])
    dst[name] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias and f"{key}.bias" in sd:
        dst[name]["bias"] = np.asarray(sd[f"{key}.bias"])


def conv1d_as_dense(sd, key, dst_seq, bias=False):
    """1x1 Conv1d == Dense: (o,i,1) -> (i,o)."""
    w = np.asarray(sd[f"{key}.weight"])
    assert w.shape[-1] == 1, (key, w.shape)
    out = {"kernel": np.transpose(w[..., 0], (1, 0))}
    if bias and f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    dst_seq.append(out)


def conv1d(sd, key, dst, name, bias=True):
    w = np.asarray(sd[f"{key}.weight"])                 # (o, i, k)
    dst[name] = {"kernel": np.transpose(w, (2, 1, 0))}  # (k, i, o)
    if bias and f"{key}.bias" in sd:
        dst[name]["bias"] = np.asarray(sd[f"{key}.bias"])


def deconv2d(sd, key, dst, name, bias=True):
    w = np.asarray(sd[f"{key}.weight"])                 # (i, o, kh, kw)
    dst[name] = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if bias and f"{key}.bias" in sd:
        dst[name]["bias"] = np.asarray(sd[f"{key}.bias"])


def dense(sd, key, dst, name=None):
    w = np.asarray(sd[f"{key}.weight"])
    out = {"kernel": np.transpose(w, (1, 0))}
    if f"{key}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{key}.bias"])
    if name is None:
        return out
    dst[name] = out


def norm(sd, key, dst, name):
    dst[name] = {"scale": np.asarray(sd[f"{key}.weight"]),
                 "bias": np.asarray(sd[f"{key}.bias"])}


def wn_linear(sd, key):
    """torch weight_norm Linear -> our WNLinear {v, g, bias}."""
    out = {}
    if f"{key}.weight_v" in sd:
        out["v"] = np.transpose(np.asarray(sd[f"{key}.weight_v"]), (1, 0))
        out["g"] = np.asarray(sd[f"{key}.weight_g"]).reshape(-1)
    else:
        out["v"] = np.transpose(np.asarray(sd[f"{key}.weight"]), (1, 0))
    out["bias"] = np.asarray(sd[f"{key}.bias"])
    return out


# ---------------------------------------------------------------------------
# submodule converters
# ---------------------------------------------------------------------------

def convert_convblock(sd, pre, out):
    """ConvBlock (utils.py:549-607) -> our ConvBlock auto-named tree."""
    # call order in our ConvBlock: GroupNorm_0, conv1(Conv_0), GroupNorm_1,
    # conv2(Conv_1), GroupNorm_2, conv3(Conv_2), [GroupNorm_3 + Conv_3 res]
    norm(sd, f"{pre}.bn1", out, "GroupNorm_0")
    conv2d(sd, f"{pre}.conv1", out, "Conv_0", bias=False)
    norm(sd, f"{pre}.bn2", out, "GroupNorm_1")
    conv2d(sd, f"{pre}.conv2", out, "Conv_1", bias=False)
    norm(sd, f"{pre}.bn3", out, "GroupNorm_2")
    conv2d(sd, f"{pre}.conv3", out, "Conv_2", bias=False)
    if f"{pre}.downsample.2.weight" in sd:
        norm(sd, f"{pre}.bn4", out, "GroupNorm_3")
        conv2d(sd, f"{pre}.downsample.2", out, "Conv_3", bias=False)


def convert_hourglass(sd, pre, out, depth):
    for lv in range(depth, 0, -1):
        for blk in ([f"b1_{lv}", f"b2_{lv}", f"b3_{lv}"]
                    + ([f"b2_plus_{lv}"] if lv == 1 else [])):
            out[blk] = {}
            convert_convblock(sd, f"{pre}.{blk}", out[blk])


def convert_hgfilter(sd, pre, out, n_stack=1, n_downsample=4):
    conv2d(sd, f"{pre}.conv1", out, "conv1")
    norm(sd, f"{pre}.bn1", out, "GroupNorm_0")
    out["conv2"] = {}
    convert_convblock(sd, f"{pre}.conv2", out["conv2"])
    out["unpack1"] = {}
    deconv2d(sd, f"{pre}.unpack1.conv", out["unpack1"], "deconv", bias=False)
    norm(sd, f"{pre}.unpack1.norm", out["unpack1"], "GroupNorm_0")
    conv2d(sd, f"{pre}.conv_out", out, "conv_out")
    out["conv3"] = {}
    convert_convblock(sd, f"{pre}.conv3", out["conv3"])
    out["conv4"] = {}
    convert_convblock(sd, f"{pre}.conv4", out["conv4"])
    for i in range(n_stack):
        out[f"m{i}"] = {}
        convert_hourglass(sd, f"{pre}.m{i}", out[f"m{i}"], n_downsample)
        out[f"top_m_{i}"] = {}
        convert_convblock(sd, f"{pre}.top_m_{i}", out[f"top_m_{i}"])
        conv2d(sd, f"{pre}.conv_last{i}", out, f"conv_last{i}")
        norm(sd, f"{pre}.bn_end{i}", out, f"GroupNorm_{i + 1}")
        conv2d(sd, f"{pre}.l{i}", out, f"l{i}")
        if i < n_stack - 1:
            conv2d(sd, f"{pre}.bl{i}", out, f"bl{i}")
            conv2d(sd, f"{pre}.al{i}", out, f"al{i}")


def convert_resblk_encoder(sd, pre, out, ngf=64, n_downsample=3, n_blocks=4,
                           n_upsample=2):
    """ResBlkEncoder sequential indices -> named layers.

    torch layer indices (instance norm has no params):
      1: first conv7x7; 4+3i: downsample convs; then ResBlks; then deconvs;
      final conv7x7.
    """
    idx = 1                                  # 0 = ReplicationPad
    conv2d(sd, f"{pre}.layers.{idx}", out, "Conv_0")
    idx += 2                                 # norm, relu share module? no:
    # sequential: pad, conv, norm, relu => conv at 1, norm 2 (no params),
    # relu 3
    idx = 4
    ci = 1
    for i in range(n_downsample):
        conv2d(sd, f"{pre}.layers.{idx}", out, f"Conv_{ci}")
        ci += 1
        idx += 3                             # conv, norm, relu
    for b in range(n_blocks):
        blk = {}
        conv2d(sd, f"{pre}.layers.{idx}.layers.1", blk, "Conv_0")
        conv2d(sd, f"{pre}.layers.{idx}.layers.5", blk, "Conv_1")
        out[f"ResBlk_{b}"] = blk
        idx += 1
    for u in range(n_upsample):
        deconv2d(sd, f"{pre}.layers.{idx}", out, f"up{u}")
        idx += 3
    idx += 1                                 # ReplicationPad
    conv2d(sd, f"{pre}.layers.{idx}", out, f"Conv_{ci}")


def convert_mlp_unet_fusion(sd, pre, out, n1=4, n2=3):
    l1 = {}
    for i in range(n1):
        l1[f"l{i}"] = wn_linear(sd, f"{pre}.layers1.layers.{i}.linear")
    out["layers1"] = l1
    l2 = {}
    for i in range(n2):
        l2[f"l{i}"] = wn_linear(sd, f"{pre}.layers2.layers.{i}.linear")
    out["layers2"] = l2


def convert_geo_vis_fusion(sd, pre, out):
    for si, (at, ated) in enumerate([("fconv_at", "fconv_ated"),
                                     ("fconv_at1", "fconv_ated1")]):
        g = []
        conv1d_as_dense(sd, f"{pre}.{at}.0", g)
        conv1d_as_dense(sd, f"{pre}.{at}.2", g)
        out[f"at{si}"] = {"Dense_0": g[0], "Dense_1": g[1]}
        f = []
        conv1d_as_dense(sd, f"{pre}.{ated}.0", f)
        conv1d_as_dense(sd, f"{pre}.{ated}.2", f)
        out[f"ated{si}"] = {"Dense_0": f[0], "Dense_1": f[1]}


def convert_global_ctx(sd, pre, out):
    """fconv3/fconv4 (networks.py:246-264): torch LayerNorm([H, W])
    carries a full (H, W) elementwise affine -> our (H, W, 1) params."""
    conv2d(sd, f"{pre}.0", out, "Conv_0", bias=False)
    out["ln0_scale"] = np.asarray(sd[f"{pre}.1.weight"])[..., None]
    out["ln0_bias"] = np.asarray(sd[f"{pre}.1.bias"])[..., None]
    conv2d(sd, f"{pre}.3", out, "Conv_1", bias=False)
    out["ln1_scale"] = np.asarray(sd[f"{pre}.4.weight"])[..., None]
    out["ln1_bias"] = np.asarray(sd[f"{pre}.4.bias"])[..., None]


def convert_tex_vis_fusion(sd, pre, out):
    g = []
    conv1d_as_dense(sd, f"{pre}.fconv_at.0", g)
    conv1d_as_dense(sd, f"{pre}.fconv_at.2", g)
    out["at"] = {"Dense_0": g[0], "Dense_1": g[1]}
    f = []
    conv1d_as_dense(sd, f"{pre}.fconv.0", f)
    conv1d_as_dense(sd, f"{pre}.fconv.2", f)
    out["fuse"] = {"Dense_0": f[0], "Dense_1": f[1]}
    for dst, src, ln in [("gt0", "fconv_gt.0", "fconv_gt.1"),
                         ("gt1", "fconv_gt.3", "fconv_gt.4")]:
        d = {}
        conv1d(sd, f"{pre}.{src}", d, "Conv_0", bias=False)
        d["LayerNorm_0"] = {"scale": np.asarray(sd[f"{pre}.{ln}.weight"]),
                            "bias": np.asarray(sd[f"{pre}.{ln}.bias"])}
        out[dst] = d
    for name in ("fconv3", "fconv4"):
        d = {}
        convert_global_ctx(sd, f"{pre}.{name}", d)
        out[name] = d


def convert_ibr(sd, pre, out):
    out["ani_al"] = np.asarray(sd[f"{pre}.ani_al"])
    dense(sd, f"{pre}.ray_encoder.0", out, "ray0")
    dense(sd, f"{pre}.ray_encoder.2", out, "ray1")
    dense(sd, f"{pre}.base_layer.0", out, "base0")
    dense(sd, f"{pre}.base_layer.2", out, "base1")
    dense(sd, f"{pre}.vis_layer1.0", out, "vis1a")
    dense(sd, f"{pre}.vis_layer1.2", out, "vis1b")
    dense(sd, f"{pre}.vis_layer2.0", out, "vis2a")
    dense(sd, f"{pre}.vis_layer2.2", out, "vis2b")
    dense(sd, f"{pre}.out_layer.0", out, "out0")
    dense(sd, f"{pre}.out_layer.2", out, "out1")
    dense(sd, f"{pre}.out_layer.4", out, "out2")


def convert_discriminator(sd, pre="discriminator"):
    out = {}
    conv2d(sd, f"{pre}.fconv3.0", out, "g0")
    conv2d(sd, f"{pre}.fconv3.2", out, "g1")
    dense(sd, f"{pre}.linear.0", out, "gl0")
    dense(sd, f"{pre}.linear.2", out, "gl1")
    conv2d(sd, f"{pre}.fconv4.0", out, "v0")
    conv2d(sd, f"{pre}.fconv4.2", out, "v1")
    conv2d(sd, f"{pre}.fconv4.4", out, "v2")
    conv2d(sd, f"{pre}.fconv2.0", out, "p0")
    conv2d(sd, f"{pre}.fconv2.2", out, "p1")
    conv2d(sd, f"{pre}.fconv2.4", out, "p2")
    return out


def convert_state_dict(sd: dict, geo_cfg=None):
    """Torch state_dict -> (generator params, discriminator params)."""
    geo_cfg = geo_cfg or {"n_stack": 1, "n_downsample": 4}
    g = {"sigmoid_beta": np.asarray(sd["model.sigmoid_beta"]).reshape(1)}
    g["geo_encoder"] = {}
    convert_hgfilter(sd, "model.geo_encoder", g["geo_encoder"],
                     geo_cfg.get("n_stack", 1),
                     geo_cfg.get("n_downsample", 4))
    g["tex_encoder"] = {}
    convert_resblk_encoder(sd, "model.tex_encoder", g["tex_encoder"])
    g["mlp_geo"] = {}
    convert_mlp_unet_fusion(sd, "model.mlp_geo", g["mlp_geo"])
    g["geo_vis_fusion"] = {}
    convert_geo_vis_fusion(sd, "model.geo_vis_fusion", g["geo_vis_fusion"])
    g["tex_vis_fusion"] = {}
    convert_tex_vis_fusion(sd, "model.tex_vis_fusion", g["tex_vis_fusion"])
    g["ibr_compress_gfeat"] = dense(sd, "model.ibr_compress_gfeat", None)
    g["mlp_tex"] = {}
    convert_ibr(sd, "model.mlp_tex", g["mlp_tex"])
    d = convert_discriminator(sd)
    return {"params": g}, {"params": d}


def assert_tree_matches(converted, template, path=""):
    """Every template leaf must be present with the same shape."""
    import jax
    t_flat = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    c_flat = dict(jax.tree_util.tree_flatten_with_path(converted)[0])
    missing = [k for k in t_flat if k not in c_flat]
    extra = [k for k in c_flat if k not in t_flat]
    bad = [(k, c_flat[k].shape, t_flat[k].shape) for k in t_flat
           if k in c_flat and tuple(np.shape(c_flat[k])) != tuple(
               np.shape(t_flat[k]))]
    return missing, extra, bad


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--config", default=None,
                    help="config JSON to read geo_args from (hourglass "
                         "depth; default matches configs/vanerf.json)")
    args = ap.parse_args()
    import torch
    ckpt = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in ckpt["state_dict"].items()}
    geo_cfg = None
    if args.config:
        from vanerf_tpu import config as vconfig
        geo_cfg = vconfig.load_cfg(args.config)["models"]["VANeRF"][
            "geo_args"]
    g, d = convert_state_dict(sd, geo_cfg=geo_cfg)
    import pickle
    with open(args.out, "wb") as f:
        pickle.dump({"params_g": g, "params_d": d,
                     "epoch": ckpt.get("epoch"),
                     "global_step": ckpt.get("global_step")}, f)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
