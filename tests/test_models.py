"""Shape/sanity tests for the Flax model components (tiny sizes for speed)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-module forwards compile for minutes on the single-core CPU tier
pytestmark = pytest.mark.slow

from vanerf_tpu.models import (ConvBlock, HourGlass, HGFilter, ResBlkEncoder,
                               MLP, MLPUNetFusion, SpatialEncoder,
                               GeoVisFusion, TexVisFusion, IBRRenderingHead,
                               DiscriminatorVis, VANeRF)
from vanerf_tpu.models.discriminator import (d_logistic_loss,
                                             g_nonsaturating_loss, bce_loss,
                                             d_r1_loss)
from vanerf_tpu import config as vconfig

KEY = jax.random.PRNGKey(0)


def test_hgfilter_shapes():
    m = HGFilter(n_stack=1, n_downsample=4, out_ch=64)
    x = jnp.zeros((1, 128, 128, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    # for a 128 encoder input (256 image with ds_geo=1): coarse 32^2 (=H/8
    # of the full image, reference comment model.py:971), fine 128^2 (=H/2).
    assert out[0].shape == (1, 32, 32, 64)
    assert out[1].shape == (1, 128, 128, 8)


def test_resblk_encoder_shapes():
    m = ResBlkEncoder(out_ch=8, ngf=16, n_downsample=3, n_blocks=2,
                      n_upsample=2, norm="instance")
    x = jnp.zeros((1, 64, 64, 3))
    params = m.init(KEY, x)
    out = m.apply(params, x)
    assert out.shape == (1, 32, 32, 8)       # H/2


def test_spatial_encoder_rel_z_decay():
    enc = SpatialEncoder(sp_level=3, sp_type="rel_z_decay", scale=1.0,
                         n_kpt=5, sigma=0.1)
    assert enc.get_dim() == 7 * 5
    B, N = 2, 11
    out = enc(v=jnp.ones((B, N, 3)), pts=jnp.ones((B, N, 3)),
              z=jnp.zeros((B, N, 1)), xy=jnp.zeros((B, N, 2)),
              extrin=jnp.broadcast_to(jnp.eye(4), (B, 4, 4)),
              kpt3d=jnp.zeros((B, 5, 3)), n_view=1)
    assert out.shape == (B, N, 35)
    assert np.isfinite(np.asarray(out)).all()


def test_position_embedding_direct_matches_recurrence(monkeypatch):
    """VANERF_PE_DIRECT=1 (independent sin/cos per octave, the reference's
    own formulation spatial.py:19-43) must match the default double-angle
    recurrence to fp tolerance at every level and with decay weights."""
    from vanerf_tpu.models.spatial import position_embedding

    x = jnp.asarray(np.random.default_rng(0).uniform(-2, 2, (3, 17, 6)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (3, 17, 6)),
                    jnp.float32)
    for nlevels in (0, 1, 3, 6):
        monkeypatch.delenv("VANERF_PE_DIRECT", raising=False)
        ref = position_embedding(x, nlevels, scale=0.5, weight=w)
        monkeypatch.setenv("VANERF_PE_DIRECT", "1")
        out = position_embedding(x, nlevels, scale=0.5, weight=w)
        assert out.shape == ref.shape == (3, 17, 6 * (1 + 2 * nlevels))
        # recurrence error grows with level; 2^5*pi*2 arguments stay well
        # inside f32 sin range
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-4, atol=2e-5)
        parts = position_embedding(x, nlevels, scale=0.5, weight=w,
                                   return_parts=True)
        np.testing.assert_allclose(
            np.asarray(jnp.concatenate(parts, -1)), np.asarray(out),
            rtol=0, atol=0)


def test_mlp_unet_fusion_shapes():
    cfg = vconfig.default_cfg()["models"]["VANeRF"]["mlp_geo_args"]
    nd1 = list(cfg["n_dims1"])
    nd1[0] = 294
    m = MLPUNetFusion(n_dims1=nd1, n_dims2=cfg["n_dims2"],
                      skip_dims=cfg["skip_dims"],
                      skip_layers=cfg["skip_layers"],
                      pool_types=tuple(cfg["pool_types"]))
    B, V, N = 1, 1, 13
    x = jnp.zeros((B, V, N, 294))
    feats = [jnp.zeros((B, V, N, 64)), jnp.zeros((B, V, N, 8))]
    a = jnp.ones((B, V, N, 1))
    params = m.init(KEY, x, feats, a)
    out, valid, x_view, x_pool = m.apply(params, x, feats, a)
    assert out.shape == (B, N, 2)
    assert x_pool.shape == (B, N, 128)       # mean+var of 64


def test_geo_vis_fusion_shapes():
    B, V2, N = 1, 20, 9
    m = GeoVisFusion(num_v=10)
    args = (jnp.zeros((B, V2, 2)),
            [jnp.zeros((B, 8, 8, 64)), jnp.zeros((B, 16, 16, 8))],
            [jnp.zeros((B, N, 64)), jnp.zeros((B, N, 8))],
            jnp.zeros((B, V2, 3)), jnp.zeros((B, N, 3)),
            jnp.ones((B, V2, 1)), jnp.ones((B, N, 1)), jnp.zeros((B, N, 1)))
    params = m.init(KEY, *args)
    out = m.apply(params, *args)
    assert out[0].shape == (B, N, 64) and out[1].shape == (B, N, 8)


def test_tex_vis_fusion_shapes():
    B, V2, N = 1, 20, 12
    m = TexVisFusion(num_v=10)
    args = (jnp.zeros((B, V2, 2)), jnp.zeros((B, 12, 12, 8)),
            jnp.zeros((B, N, 8)), jnp.zeros((B, V2, 3)),
            jnp.zeros((B, N, 3)), jnp.ones((B, V2, 1)),
            jnp.ones((B, N, 1)), jnp.zeros((B, N, 3)),
            jnp.zeros((B, 24, 24, 3)), jnp.zeros((B, N, 24)))
    params = m.init(KEY, *args)
    out = m.apply(params, *args)
    assert out.shape == (B, N, 40)


def test_ibr_head_blends_source_rgb():
    R, S, V = 6, 4, 2
    m = IBRRenderingHead()
    rgb_feats = jnp.concatenate(
        [jnp.ones((R, S, V, 3)) * 0.5, jnp.zeros((R, S, V, 37))], -1)
    rd = jnp.zeros((R, S, V, 4))
    mask = jnp.ones((R, S, V, 1))
    params = m.init(KEY, rgb_feats, rd, mask)
    out = m.apply(params, rgb_feats, rd, mask)
    assert out.shape == (R, S, 3)
    # softmax blend of identical 0.5 colors == 0.5
    np.testing.assert_allclose(np.asarray(out), 0.5, atol=1e-5)


def test_discriminator_and_losses():
    m = DiscriminatorVis()
    B, H, W = 2, 16, 16
    imgs = [jnp.zeros((B, H, W, 3))] * 4
    params = m.init(KEY, *imgs)
    gan, vis = m.apply(params, *imgs)
    assert gan.shape == (B, 1) and vis.shape == (B, H, W, 1)
    assert float(d_logistic_loss(gan, gan)) > 0
    assert float(g_nonsaturating_loss(gan)) > 0
    assert bce_loss(vis, jnp.ones_like(vis)).shape == vis.shape
    r1 = d_r1_loss(m.apply, params, *imgs[:3], imgs[3])
    assert np.isfinite(float(r1))


def test_vanerf_query_end_to_end_tiny():
    cfg = vconfig.default_cfg()
    model = VANeRF.from_config(cfg, num_v=10)
    B, V2, H, W = 1, 20, 128, 128
    n_rays, n_samples = 4, 8
    N = n_rays * n_samples
    im = jnp.ones((B, H, W, 3)) * 0.5
    fg = jnp.ones((B, H, W, 1))
    pts = jax.random.normal(KEY, (B, N, 3)) * 0.05
    view = jnp.ones((B, N, 3)) / np.sqrt(3)
    K = jnp.eye(4).at[0, 0].set(200.0).at[1, 1].set(200.0) \
        .at[0, 2].set(W / 2).at[1, 2].set(H / 2)[None]
    Rt = jnp.eye(4).at[2, 3].set(1.0)[None]
    cam = {"KRT": K @ Rt, "extrin": Rt, "width": W, "height": H,
           "znear": 0.5, "zfar": 2.0}
    verts = jax.random.normal(jax.random.PRNGKey(1), (B, V2, 3)) * 0.05
    vert_vis = jnp.ones((B, V2, 1))
    q_vis = jnp.ones((B, N, 1))
    q_sdf = jnp.zeros((B, N, 1))
    kpt3d = jnp.zeros((B, 42, 3))

    variables = model.init(KEY, im, pts, view, cam, fg, verts, vert_vis,
                           q_vis, q_sdf, kpt3d, n_samples)
    out, valid = model.apply(variables, im, pts, view, cam, fg, verts,
                             vert_vis, q_vis, q_sdf, kpt3d, n_samples)
    assert out.shape == (B, N, 5)
    assert valid.shape == (B, N, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_vanerf_query_bf16_matches_f32():
    """The bf16 activation policy must agree with the f32 path to bf16
    tolerance (params stay f32; only activations are cast)."""
    cfg = vconfig.default_cfg()
    model32 = VANeRF.from_config(cfg, num_v=10)
    cfg16 = vconfig.default_cfg()
    cfg16["models"]["VANeRF"]["compute_dtype"] = "bfloat16"
    model16 = VANeRF.from_config(cfg16, num_v=10)
    assert model16.compute_dtype == "bfloat16"

    B, V2, H, W = 1, 20, 128, 128
    n_rays, n_samples = 4, 8
    N = n_rays * n_samples
    im = jax.random.uniform(jax.random.PRNGKey(3), (B, H, W, 3))
    fg = jnp.ones((B, H, W, 1))
    pts = jax.random.normal(KEY, (B, N, 3)) * 0.05
    view = jnp.ones((B, N, 3)) / np.sqrt(3)
    K = jnp.eye(4).at[0, 0].set(200.0).at[1, 1].set(200.0) \
        .at[0, 2].set(W / 2).at[1, 2].set(H / 2)[None]
    Rt = jnp.eye(4).at[2, 3].set(1.0)[None]
    cam = {"KRT": K @ Rt, "extrin": Rt, "width": W, "height": H,
           "znear": 0.5, "zfar": 2.0}
    verts = jax.random.normal(jax.random.PRNGKey(1), (B, V2, 3)) * 0.05
    vert_vis = jnp.ones((B, V2, 1))
    q_vis = jnp.ones((B, N, 1))
    q_sdf = jnp.zeros((B, N, 1))
    kpt3d = jnp.zeros((B, 42, 3))

    variables = model32.init(KEY, im, pts, view, cam, fg, verts, vert_vis,
                             q_vis, q_sdf, kpt3d, n_samples)
    out32, valid32 = model32.apply(variables, im, pts, view, cam, fg, verts,
                                   vert_vis, q_vis, q_sdf, kpt3d, n_samples)
    out16, valid16 = model16.apply(variables, im, pts, view, cam, fg, verts,
                                   vert_vis, q_vis, q_sdf, kpt3d, n_samples)
    assert out16.dtype == jnp.float32      # outputs cast back for compositing
    np.testing.assert_array_equal(np.asarray(valid32), np.asarray(valid16))
    assert np.isfinite(np.asarray(out16)).all()
    # bf16 has ~2-3 significant digits; the fusion chain compounds it
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out32),
                               atol=0.1, rtol=0.1)
