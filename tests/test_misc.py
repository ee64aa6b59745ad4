"""Tests for config, evaluator metrics, camera path, MANO layer, losses."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vanerf_tpu import config as vconfig
from vanerf_tpu.camera_path import get_360cameras
from vanerf_tpu.evaluator import (Evaluator, bounding_rect, compute_psnr,
                                  compute_ssim_crop)
from vanerf_tpu.losses import VGGLoss, pix_loss, psnr, ssim
from vanerf_tpu.mano import (load_mano_model, mano_forward, seal_verts_np)
from vanerf_tpu.mano.layer import synthetic_mano_model, rodrigues


def test_config_roundtrip(tmp_path):
    cfg = vconfig.default_cfg()
    assert cfg["models"]["VANeRF"]["sp_args"]["n_kpt"] == 42
    assert cfg["training"]["lr"] == 0.001
    vconfig.save_config(str(tmp_path), cfg)
    re = vconfig.load_cfg(str(tmp_path / "config.json"))
    assert re["models"]["VANeRF"]["dr_level"] == 5
    assert "git_head" in re


def test_in_the_wild_routes_to_run_val():
    """--in_the_wild routes to the eval path (documented deviation: ref
    train.py:73 is broken upstream — undefined `model_in_the_wild`)."""
    parser = vconfig.create_parser()
    args = parser.parse_args(["--config", "x.json", "--in_the_wild"])
    assert not args.run_val
    vconfig.resolve_flags(args)
    assert args.run_val
    # plain parse stays untouched
    args2 = parser.parse_args(["--config", "x.json"])
    vconfig.resolve_flags(args2)
    assert not args2.run_val


def test_psnr_ssim_sane(rng):
    a = rng.random((32, 32, 3)).astype(np.float32)
    noise = (a + 0.1 * rng.standard_normal((32, 32, 3))).astype(np.float32)
    p_same = compute_psnr(a, a.copy() + 1e-6)
    p_noisy = compute_psnr(a, noise)
    assert p_same > 50 > p_noisy > 10
    s = compute_ssim_crop(a, a.copy(), np.ones((32, 32), np.uint8))
    assert s > 0.99
    s2 = compute_ssim_crop(a, noise, np.ones((32, 32), np.uint8))
    assert s2 < s


def test_bounding_rect():
    m = np.zeros((10, 12), np.uint8)
    m[3:7, 4:9] = 1
    assert bounding_rect(m) == (4, 3, 5, 4)


def test_evaluator_saves_and_scores(tmp_path, rng):
    ev = Evaluator(str(tmp_path))
    pred = rng.random((16, 16, 3)).astype(np.float32)
    gt = rng.random((16, 16, 3)).astype(np.float32)
    s = ev.compute_score(pred, gt, input_imgs=pred[None],
                         mask_at_box=np.ones((16, 16)))
    assert set(s) == {"mse", "psnr", "ssim", "lpips"}
    assert np.isnan(s["lpips"])          # no weights in this env
    assert os.path.exists(os.path.join(str(tmp_path), "0", "pred"))


def test_evaluator_lpips_uint8_crop_semantics(rng):
    """LPIPS must see uint8-quantized crops (PNG round-trip semantics,
    reference src/evaluator.py:47-64), not raw float crops."""
    ev = Evaluator(None)
    seen = []
    ev.lpips_fn = lambda p, g: (seen.append((p, g)), 0.5)[1]
    pred = rng.random((64, 64, 3)).astype(np.float32)
    gt = rng.random((64, 64, 3)).astype(np.float32)
    s = ev.compute_score(pred, gt, mask_at_box=np.ones((64, 64)))
    assert s["lpips"] == 0.5
    (p, g), = seen
    for img, src in [(p, pred), (g, gt)]:
        # exactly the PNG save+reload quantization
        np.testing.assert_array_equal(
            img, (np.clip(src, 0, 1) * 255).astype(np.uint8)
            .astype(np.float32) / 255.0)
        # and genuinely quantized (255*img is integral)
        np.testing.assert_allclose(np.round(img * 255), img * 255,
                                   atol=1e-6)
    # sub-32px crops skip LPIPS (AlexNet pool chain needs >=32; the
    # reference's torch lpips errors there)
    s2 = ev.compute_score(pred, gt, mask_at_box=np.pad(
        np.ones((16, 16)), ((0, 48), (0, 48))))
    assert np.isnan(s2["lpips"])


def test_camera_path_orbits():
    cams = get_360cameras(np.eye(4, dtype=np.float32), 500.0, 10.0, 1.0,
                          256, 256, 5.0, 15.0, n_frames=20)
    assert len(cams) == 20
    for c in cams:
        # valid rigid transforms
        R = c["w2cs"][:3, :3]
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-4)
    # the orbit should move the camera around
    centers = np.stack([np.linalg.inv(c["w2cs"])[:3, 3] for c in cams])
    assert np.ptp(centers, axis=0).max() > 1.0


def test_mano_synthetic_forward_shapes():
    m = synthetic_mano_model(True)
    betas = jnp.zeros(10)
    pose = jnp.zeros(48)
    trans = jnp.asarray([0.1, 0.2, 0.3])
    verts, joints = mano_forward(m, betas, pose, trans)
    assert verts.shape == (778, 3)
    assert joints.shape == (16, 3)
    # zero pose, zero shape -> template + trans (atol covers the bf16
    # default matmul precision of the LBS einsums)
    np.testing.assert_allclose(
        np.asarray(verts), m.v_template + np.asarray(trans), atol=5e-4)
    # global rotation moves vertices rigidly
    pose_rot = jnp.zeros(48).at[1].set(np.pi / 2)
    v2, _ = mano_forward(m, betas, pose_rot, jnp.zeros(3))
    d0 = np.linalg.norm(np.asarray(verts) - np.asarray(trans), axis=1)
    d2 = np.linalg.norm(np.asarray(v2), axis=1)
    # distances from the root joint are preserved under global rotation
    # the root joint is the fixed point of the global rotation
    root = m.J_regressor @ m.v_template
    r0 = np.linalg.norm(m.v_template - root[0], axis=1)
    r2 = np.linalg.norm(np.asarray(v2) - root[0], axis=1)
    np.testing.assert_allclose(r0, r2, atol=1e-3)


def test_seal_adds_center_vertex():
    m = synthetic_mano_model(True)
    v, f = seal_verts_np(m.v_template, m.faces, "right")
    assert v.shape == (779, 3)
    assert f.shape == (m.faces.shape[0] + 16, 3)
    from vanerf_tpu.mano.layer import SEAL_RING
    np.testing.assert_allclose(v[-1], m.v_template[SEAL_RING].mean(0),
                               rtol=1e-5)


def test_load_mano_model_falls_back():
    m = load_mano_model("/nonexistent/MANO_RIGHT.pkl", True)
    assert m.synthetic
    assert m.faces.shape == (1538, 3)


def test_pix_loss_variants(rng):
    a = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    losses = pix_loss(a, b, {"l1": 1.0, "l2": 0.5, "lp": 0.1, "ssim": 1.0})
    assert set(losses) == {"l1", "l2", "lp", "ssim"}
    for v in losses.values():
        assert np.isfinite(float(v))
    top = pix_loss(a, b, {"l1top20": 1.0})
    assert float(top["l1top20"]) >= float(losses["l1"])


def test_vgg_loss_runs_and_decreases_with_similarity(rng):
    vgg = VGGLoss(dummy_hw=16)
    a = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    b = jnp.asarray(rng.random((1, 16, 16, 3)).astype(np.float32))
    assert float(vgg(a, a)) < float(vgg(a, b))


def test_preprocessor_helpers_roundtrip():
    """Smoke the offline preprocessor's geometry helpers (the CLI itself
    needs raw InterHand2.6M): bbox expansion, affine crop, K adjustment
    keep the projected mesh inside the crop."""
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from data_process.dataset_process import (process_bbox, crop_affine,
                                              adjust_K, IMG_SIZE)

    H = W = 128
    bbox = process_bbox([30, 40, 50, 30], W, H)
    assert bbox[2] > 0 and bbox[3] > 0
    # aspect forced to square-ish of the output
    assert abs(bbox[2] / bbox[3] - 1.0) < 1e-6

    img = np.zeros((H, W, 3), np.uint8)
    img[40:70, 30:80] = 255
    crop = crop_affine(img, bbox, out_size=IMG_SIZE)
    assert crop.shape[:2] == (IMG_SIZE, IMG_SIZE)
    assert crop.max() == 255

    K = np.asarray([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]])
    K2 = adjust_K(K, bbox, out_size=IMG_SIZE)
    # a point at the bbox center must project to the crop center
    cx, cy = bbox[0] + bbox[2] / 2, bbox[1] + bbox[3] / 2
    p_cam = np.linalg.inv(K) @ np.asarray([cx, cy, 1.0])
    p2 = K2 @ p_cam
    p2 = p2[:2] / p2[2]
    np.testing.assert_allclose(p2, [IMG_SIZE / 2, IMG_SIZE / 2], atol=1.0)


def test_preprocessor_render_mask_densepose():
    import numpy as np
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from data_process.dataset_process import render_mask_densepose
    from oracles import make_icosphere

    v, f = make_icosphere(subdiv=1, radius=0.05, center=(0.0, 0.0, 0.5))
    K = np.asarray([[120.0, 0, 32.0], [0, 120.0, 32.0], [0, 0, 1]],
                   np.float32)
    R = np.eye(3, dtype=np.float32)
    t = np.zeros(3, np.float32)
    mask, dp = render_mask_densepose(v.astype(np.float32),
                                     f.astype(np.int32), K, R, t, 64, 64)
    assert mask.shape == (64, 64)
    assert mask.max() > 0          # sphere visible
    assert dp.shape == (64, 64, 3)
    assert (dp[mask > 0] > 0).any()


def test_bench_supervisor_retries(monkeypatch, capsys):
    """bench.py's driver entry retries transient tunnel failures in fresh
    subprocesses (jax caches a failed backend in-process)."""
    import subprocess
    import bench

    calls = []

    def fake_run(cmd, **kw):
        calls.append(cmd)
        if len(calls) < 2:
            return subprocess.CompletedProcess(cmd, 1, "", "UNAVAILABLE")
        return subprocess.CompletedProcess(
            cmd, 0, '{"metric": "ray_samples_per_sec", "value": 1}\n', "")

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.delenv("_VANERF_BENCH_CHILD", raising=False)
    bench.main_with_retries(tries=3)
    out = capsys.readouterr().out
    assert '"ray_samples_per_sec"' in out
    assert len(calls) == 2
