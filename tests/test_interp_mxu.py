"""MXU bilinear-interpolation kernel vs the XLA gather+lerp path.

The kernel must reproduce ``grid_sample_2d`` (torch F.grid_sample
bilinear/border/align_corners parity, tested in test_ops_core.py) on
every map it declares viable — including border clips, exactly-integer
coords, and out-of-range uv.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vanerf_tpu.ops.grid_sample import feat_sample_nhwc, grid_sample_2d
from vanerf_tpu.ops.interp_mxu import (interp_mxu_viable, interp_sample_nhwc,
                                       mxu_grid_sample)


def _uv(rng, n):
    """Random uv hitting interiors, borders, out-of-range and exact knots."""
    uv = rng.uniform(-1.15, 1.15, size=(n, 2)).astype(np.float32)
    uv[: n // 8] = np.sign(uv[: n // 8])              # exact corners
    uv[n // 8: n // 4, 0] = 1.0                       # x border strip
    k = n // 4
    uv[k: k + n // 8] = np.round(uv[k: k + n // 8] * 8) / 8.0
    return uv


@pytest.mark.parametrize("hwc", [(32, 32, 64), (64, 64, 8), (16, 16, 5)])
def test_matches_gather_lerp_f32(hwc):
    H, W, C = hwc
    assert interp_mxu_viable(H, W)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(H, W, C).astype(np.float32))
    uv = jnp.asarray(_uv(rng, 700))
    ref = grid_sample_2d(feat, uv)
    got = mxu_grid_sample(feat, uv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_matches_gather_lerp_bf16():
    rng = np.random.RandomState(1)
    feat = jnp.asarray(rng.randn(32, 32, 16).astype(np.float32))
    uv = jnp.asarray(_uv(rng, 512))
    ref = grid_sample_2d(feat.astype(jnp.bfloat16), uv)
    got = mxu_grid_sample(feat.astype(jnp.bfloat16), uv, interpret=True)
    assert got.dtype == jnp.bfloat16
    # bf16 lerp vs f32-accumulated hat product: equal to bf16 rounding
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32),
                               rtol=0.03, atol=0.03)


def test_batched_vmap():
    rng = np.random.RandomState(2)
    feat = jnp.asarray(rng.randn(3, 32, 32, 8).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1, 1, size=(3, 300, 2)).astype(np.float32))
    ref = feat_sample_nhwc(feat, uv)
    got = interp_sample_nhwc(feat, uv, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_row_gather_exact():
    """mxu_row_gather must be BITWISE identical to the native gather."""
    from vanerf_tpu.ops.interp_mxu import mxu_row_gather, row_gather_viable
    rng = np.random.RandomState(3)
    for V, C, dt in [(1558, 20, np.float32), (1558, 20, jnp.bfloat16),
                     (130, 7, np.float32)]:
        assert row_gather_viable(V)
        tbl = jnp.asarray(rng.randn(V, C).astype(np.float32)).astype(dt)
        idx = jnp.asarray(rng.randint(0, V, size=900).astype(np.int32))
        ref = tbl[idx]
        got = mxu_row_gather(tbl, idx, interpret=True)
        assert got.dtype == tbl.dtype
        np.testing.assert_array_equal(np.asarray(got, np.float32),
                                      np.asarray(ref, np.float32))
    assert not row_gather_viable(8192)


def test_viability_gate():
    assert interp_mxu_viable(32, 32)
    assert interp_mxu_viable(64, 64)
    assert not interp_mxu_viable(128, 128)     # too many rows
    assert not interp_mxu_viable(64, 65)       # non-pow2 width
    assert not interp_mxu_viable(2, 48)        # rows not chunk-aligned


@pytest.mark.slow
def test_query_integration_force_flag(monkeypatch):
    """VANERF_MXU_INTERP=force routes the small-map samples through the
    kernel inside model.query and matches the default path."""
    from vanerf_tpu import config as vconfig
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF
    from vanerf_tpu.renderer import render_patch, mask_centered_grid

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 4
    m["dr_kwargs"]["sample_per_ray_f"] = 4

    batch_np, _faces, num_v = make_synthetic_batch(batch_size=1, H=32, W=32,
                                                   subdiv=1)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    rng = jax.random.PRNGKey(0)
    B = batch["tar_k"].shape[0]
    V2 = batch["verts"].shape[1]
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": 32, "height": 32, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = model.init(
        rng, batch["src_img"], jnp.zeros((B, 4, 3)), jnp.ones((B, 4, 3)),
        cam, batch["src_mask"], batch["verts"], jnp.ones((B, V2, 1)),
        jnp.ones((B, 4, 1)), jnp.zeros((B, 4, 1)), batch["kpt3d"], 4)

    def render():
        grids = mask_centered_grid(rng, batch["tar_mask"][..., 0], 4, 4)
        out = render_patch(model, params, batch, rng=rng, grids=grids,
                           out_h=4, out_w=4, sample_per_ray_c=4,
                           sample_per_ray_f=4, fine=True, training=False,
                           sdf_chunk=64, compute_vis_map=False)
        return out["tex_fg_fine"]

    monkeypatch.delenv("VANERF_MXU_INTERP", raising=False)
    base = render()
    monkeypatch.setenv("VANERF_MXU_INTERP", "force")
    fast = render()
    np.testing.assert_allclose(np.asarray(fast), np.asarray(base),
                               rtol=1e-4, atol=1e-4)
