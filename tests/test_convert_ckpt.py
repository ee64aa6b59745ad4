"""Checkpoint-converter validation against a synthetic reference state_dict.

The released ``model.ckpt`` needs egress (Google Drive), so the converter is
proven here on a torch mini-replica with the reference's EXACT key names and
shapes (tests/torch_ref_replica.py):

  1. every reference state_dict key is consumed (or on the documented
     skip list: vgg_loss handled by tools/convert_vgg.py, constant
     SpatialEncoder buffers, parameters the reference itself never uses);
  2. every flax param of our VANeRF + DiscriminatorVis is produced with
     the right shape (no silent zero-inits at parity-eval time);
  3. forward passes through converted params match the torch modules
     layerwise (torch IS installed; the reference's own modules can't
     import here — pytorch3d/torchvision/spconv absent).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import sys
sys.path.insert(0, "/root/repo/tools")
sys.path.insert(0, "/root/repo/tests")

from convert_reference_ckpt import (assert_tree_matches, convert_state_dict,
                                    convert_discriminator)
import torch_ref_replica as R

from vanerf_tpu import config as vconfig


class TrackingDict(dict):
    """Records which keys the converter read."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)


def make_reference_sd():
    cfg = vconfig.default_cfg()
    torch.manual_seed(0)
    rep = R.LightningReplicaT(cfg)
    sd = {k: v.detach().numpy() for k, v in rep.state_dict().items()}
    return rep, TrackingDict(sd)


@pytest.fixture(scope="module")
def converted():
    rep, sd = make_reference_sd()
    g, d = convert_state_dict(sd)
    return rep, sd, g, d


SKIP_REASONS = {
    "model.vgg_loss.": "VGG19 perceptual weights: tools/convert_vgg.py",
    ".center": "SpatialEncoder constant zero buffer (spatial.py:15)",
}


def _skippable(key, sd):
    for pat in SKIP_REASONS:
        if pat in key:
            return True
    # ConvBlock registers bn4 unconditionally but only uses it inside
    # `downsample` when in_ch != out_ch (utils.py:552-568); without a
    # downsample the bn4 params are dead in the reference forward.
    if ".bn4." in key:
        return key.replace(".bn4.", ".downsample.2.") not in sd
    # downsample.0 is the SAME module object as bn4 (shared, emitted twice
    # in the state_dict); the converter reads it via the bn4 path.
    if ".downsample.0." in key:
        return key.replace(".downsample.0.", ".bn4.") in sd
    return False


def test_all_reference_keys_consumed(converted):
    rep, sd, g, d = converted
    unconsumed = [k for k in sd if k not in sd.accessed
                  and not _skippable(k, sd)]
    assert unconsumed == [], (
        f"{len(unconsumed)} reference keys not consumed: "
        f"{unconsumed[:10]}")


@pytest.fixture(scope="module")
def template_params():
    """Init our full-config model at production shapes (256^2, 2x779
    verts) so every param the converter must produce exists."""
    from vanerf_tpu.models import VANeRF, DiscriminatorVis

    cfg = vconfig.default_cfg()
    model = VANeRF.from_config(cfg, num_v=779)
    B, V, n, V2 = 1, 1, 8, 2 * 779
    H = W = 256
    rng = jax.random.PRNGKey(0)
    cam = {"KRT": jnp.eye(4)[None], "extrin": jnp.eye(4)[None],
           "width": W, "height": H, "znear": jnp.full((B,), 0.71),
           "zfar": jnp.full((B,), 1.42)}
    src_img = jnp.zeros((B * V, H, W, 3))
    params_g = jax.jit(lambda: model.init(
        rng, src_img, jnp.zeros((B, n, 3)), jnp.ones((B, n, 3)), cam,
        jnp.ones((B * V, H, W, 1)), jnp.zeros((B, V2, 3)),
        jnp.ones((B, V2, 1)), jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
        jnp.zeros((B, 42, 3)), n))()
    disc = DiscriminatorVis()
    imgs = [jnp.zeros((B, 64, 64, 3))] * 4
    params_d = jax.jit(lambda: disc.init(rng, *imgs))()
    return params_g, params_d


@pytest.mark.slow
def test_converted_tree_matches_model(converted, template_params):
    _, _, g, d = converted
    tg, td = template_params
    missing, extra, bad = assert_tree_matches(g, jax.tree.map(np.asarray, tg))
    assert missing == [], f"flax params NOT produced: {missing[:10]}"
    assert extra == [], f"converter produced unknown params: {extra[:10]}"
    assert bad == [], f"shape mismatches: {bad[:10]}"
    m2, e2, b2 = assert_tree_matches(d, jax.tree.map(np.asarray, td))
    assert m2 == [] and e2 == [] and b2 == [], (m2, e2, b2)


# ---------------------------------------------------------------------------
# layerwise forward parity, torch replica vs flax on converted params
# ---------------------------------------------------------------------------

def nchw(x):
    return torch.from_numpy(np.moveaxis(np.asarray(x), -1, 1).copy())


def to_nhwc(t):
    return np.moveaxis(t.detach().numpy(), 1, -1)


def test_discriminator_forward_parity(converted):
    rep, _, _, d = converted
    from vanerf_tpu.models import DiscriminatorVis
    rs = np.random.RandomState(0)
    imgs = [rs.rand(2, 16, 16, 3).astype(np.float32) for _ in range(4)]
    gan_j, vis_j = DiscriminatorVis().apply(d, *[jnp.asarray(i)
                                                 for i in imgs])
    with torch.no_grad():
        gan_t, vis_t = rep.discriminator(*[nchw(i) for i in imgs])
    np.testing.assert_allclose(np.asarray(gan_j), gan_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(vis_j), to_nhwc(vis_t),
                               rtol=1e-4, atol=1e-5)


def test_mlp_unet_fusion_forward_parity(converted):
    rep, _, g, _ = converted
    from vanerf_tpu.models.mlp import MLPUNetFusion
    cfg = vconfig.default_cfg()["models"]["VANeRF"]["mlp_geo_args"]
    n_dims1 = list(cfg["n_dims1"])
    n_dims1[0] = 7 * 42
    mod = MLPUNetFusion(n_dims1, cfg["n_dims2"], cfg["skip_dims"],
                        cfg["skip_layers"], pool_types=cfg["pool_types"])
    rs = np.random.RandomState(1)
    B, V, N = 1, 2, 13
    x = rs.randn(B, V, N, n_dims1[0]).astype(np.float32)
    feats = [rs.randn(B, V, N, c).astype(np.float32)
             for c in cfg["skip_dims"]]
    a = (rs.rand(B, V, N, 1) > 0.3).astype(np.float32)
    out_j, valid_j, xv_j, xp_j = mod.apply(
        {"params": g["params"]["mlp_geo"]}, jnp.asarray(x),
        [jnp.asarray(f) for f in feats], jnp.asarray(a))
    with torch.no_grad():
        out_t, valid_t, xv_t, xp_t = rep.model.mlp_geo(
            torch.from_numpy(x), [torch.from_numpy(f) for f in feats],
            torch.from_numpy(a))
    np.testing.assert_allclose(np.asarray(xv_j), xv_t.numpy(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


def test_ibr_head_forward_parity(converted):
    rep, _, g, _ = converted
    from vanerf_tpu.models.ibr import IBRRenderingHead
    rs = np.random.RandomState(2)
    Rr, S, V = 5, 4, 2
    # feature width = 3 rgb + in_channels(37) = 40 (ref model.py:1581-1620)
    feats = rs.randn(Rr, S, V, 40).astype(np.float32)
    diffs = rs.randn(Rr, S, V, 4).astype(np.float32)
    mask = (rs.rand(Rr, S, V, 1) > 0.2).astype(np.float32)
    out_j = IBRRenderingHead().apply(
        {"params": g["params"]["mlp_tex"]}, jnp.asarray(feats),
        jnp.asarray(diffs), jnp.asarray(mask))
    with torch.no_grad():
        out_t = rep.model.mlp_tex(torch.from_numpy(feats),
                                  torch.from_numpy(diffs),
                                  torch.from_numpy(mask))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_resblk_encoder_forward_parity(converted):
    rep, _, g, _ = converted
    from vanerf_tpu.models.blocks import ResBlkEncoder
    cfg = vconfig.default_cfg()["models"]["VANeRF"]["tex_args"]
    mod = ResBlkEncoder(out_ch=cfg["out_ch"], ngf=cfg["ngf"],
                        n_downsample=cfg["n_downsample"],
                        n_blocks=cfg["n_blocks"],
                        n_upsample=cfg["n_upsample"], norm=cfg["norm"])
    rs = np.random.RandomState(3)
    x = rs.rand(1, 32, 32, 3).astype(np.float32) * 2 - 1
    out_j = mod.apply({"params": g["params"]["tex_encoder"]},
                      jnp.asarray(x))
    with torch.no_grad():
        out_t = rep.model.tex_encoder(nchw(x))
    np.testing.assert_allclose(np.asarray(out_j), to_nhwc(out_t),
                               rtol=1e-3, atol=1e-4)


@pytest.mark.slow
def test_hgfilter_forward_parity(converted):
    rep, _, g, _ = converted
    from vanerf_tpu.models.blocks import HGFilter
    cfg = vconfig.default_cfg()["models"]["VANeRF"]["geo_args"]
    mod = HGFilter(n_stack=cfg["n_stack"], n_downsample=cfg["n_downsample"],
                   out_ch=cfg["out_ch"])
    rs = np.random.RandomState(4)
    x = rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1
    coarse_j, fine_j = mod.apply({"params": g["params"]["geo_encoder"]},
                                 jnp.asarray(x))
    with torch.no_grad():
        coarse_t, fine_t = rep.model.geo_encoder(nchw(x))
    # fine path (conv/deconv only) is exact; the hourglass path uses
    # bicubic upsampling where torch's CPU kernel deviates ~0.3% from the
    # exact separable form our implementation computes — compare loosely.
    np.testing.assert_allclose(np.asarray(fine_j), to_nhwc(fine_t),
                               rtol=1e-3, atol=1e-4)
    c_j, c_t = np.asarray(coarse_j), to_nhwc(coarse_t)
    denom = np.abs(c_t).mean() + 1e-6
    assert np.abs(c_j - c_t).mean() / denom < 0.02, (
        np.abs(c_j - c_t).mean() / denom)


@pytest.mark.slow
def test_fusion_forward_parity(converted):
    """GeoVisFusion + TexVisFusion end-to-end vs torch (brute KNN)."""
    rep, _, g, _ = converted
    from vanerf_tpu.models.fusion import GeoVisFusion, TexVisFusion
    rs = np.random.RandomState(5)
    B, N, V2 = 1, 17, 2 * 779

    vert_xy = (rs.rand(B, V2, 2).astype(np.float32) * 2 - 1)
    fg0 = rs.randn(B, 8, 8, 64).astype(np.float32)
    fg1 = rs.randn(B, 16, 16, 8).astype(np.float32)
    fs0 = rs.randn(B, N, 64).astype(np.float32)
    fs1 = rs.randn(B, N, 8).astype(np.float32)
    vert = rs.randn(B, V2, 3).astype(np.float32)
    v = rs.randn(B, N, 3).astype(np.float32)
    vert_vis = (rs.rand(B, V2, 1) > 0.5).astype(np.float32)
    query_vis = rs.rand(B, N, 1).astype(np.float32)
    query_sdf = rs.randn(B, N, 1).astype(np.float32)

    geo = GeoVisFusion(num_v=779)
    outs_j = geo.apply(
        {"params": g["params"]["geo_vis_fusion"]}, jnp.asarray(vert_xy),
        [jnp.asarray(fg0), jnp.asarray(fg1)],
        [jnp.asarray(fs0), jnp.asarray(fs1)], jnp.asarray(vert),
        jnp.asarray(v), jnp.asarray(vert_vis), jnp.asarray(query_vis),
        jnp.asarray(query_sdf))
    with torch.no_grad():
        outs_t = rep.model.geo_vis_fusion(
            torch.from_numpy(vert_xy), [nchw(fg0), nchw(fg1)],
            [torch.from_numpy(fs0), torch.from_numpy(fs1)],
            torch.from_numpy(vert), torch.from_numpy(v),
            torch.from_numpy(vert_vis), torch.from_numpy(query_vis),
            torch.from_numpy(query_sdf))
    for oj, ot in zip(outs_j, outs_t):
        np.testing.assert_allclose(np.asarray(oj), ot.numpy(),
                                   rtol=1e-3, atol=1e-4)

    # texture branch — ft1 64x64, img 256x256 (the reference's hard-coded
    # LayerNorm shapes, networks.py:248-263)
    ft1 = rs.randn(B, 64, 64, 8).astype(np.float32)
    img = rs.rand(B, 256, 256, 3).astype(np.float32)
    ft_xy = rs.randn(B, N, 8).astype(np.float32)
    img_xy = rs.rand(B, N, 3).astype(np.float32)
    latent = rs.randn(B, N, 24).astype(np.float32)
    tex = TexVisFusion(num_v=779)
    out_j = tex.apply(
        {"params": g["params"]["tex_vis_fusion"]}, jnp.asarray(vert_xy),
        jnp.asarray(ft1), jnp.asarray(ft_xy), jnp.asarray(vert),
        jnp.asarray(v), jnp.asarray(vert_vis), jnp.asarray(query_vis),
        jnp.asarray(img_xy), jnp.asarray(img), jnp.asarray(latent))
    with torch.no_grad():
        out_t = rep.model.tex_vis_fusion(
            torch.from_numpy(vert_xy), nchw(ft1),
            torch.from_numpy(ft_xy), torch.from_numpy(vert),
            torch.from_numpy(v), torch.from_numpy(vert_vis),
            torch.from_numpy(query_vis), torch.from_numpy(img_xy),
            nchw(img), torch.from_numpy(latent))
    np.testing.assert_allclose(np.asarray(out_j), out_t.numpy(),
                               rtol=1e-3, atol=1e-4)
