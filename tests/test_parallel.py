"""Data-parallel training over the 8-virtual-device CPU mesh.

Mirrors the driver's dryrun_multichip: full GAN train step under
shard_map (batch sharded, params replicated, explicit gradient pmean).
"""

import json
import sys

import numpy as np
import pytest

# 8-device shard_map GAN-step compiles take minutes on CPU
pytestmark = pytest.mark.slow


def test_shard_map_train_step_runs_and_averages():
    import jax
    import jax.numpy as jnp
    from vanerf_tpu import losses as L
    from vanerf_tpu import config as vconfig
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.parallel import make_mesh, make_parallel_train_step
    from vanerf_tpu.training.train_step import (create_train_state,
                                                make_train_step)

    n_dev = jax.device_count()
    assert n_dev == 8, f"expected the 8-device CPU mesh, got {n_dev}"

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 8
    m["dr_kwargs"]["sample_per_ray_f"] = 8

    batch_np, _faces, num_v = make_synthetic_batch(
        batch_size=n_dev, H=32, W=32, subdiv=1)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(0)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, rng, batch_np, cfg, steps_per_epoch=10)
    vgg = L.VGGLoss(dummy_hw=8)
    step = make_train_step(model, disc, tx_g, tx_d, cfg, vgg)

    # snapshot before the step: the parallel step donates its input state
    leaf_old = np.asarray(jax.tree.leaves(state.params_g)[0]).copy()
    step_old = int(state.step)

    mesh = make_mesh(n_dev)
    with mesh:
        pstep = make_parallel_train_step(step, mesh, batch)
        new_state, logs = pstep(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(logs)

    g = float(logs["train/g_loss"])
    d = float(logs["train/d_loss"])
    assert np.isfinite(g) and np.isfinite(d)
    # params were updated and stayed replicated (pmean'd grads)
    leaf_new = np.asarray(jax.tree.leaves(new_state.params_g)[0])
    assert not np.allclose(leaf_old, leaf_new)
    assert int(new_state.step) == step_old + 1


@pytest.mark.slow
def test_cli_multi_device_train(tmp_path):
    """Drive train.py's ACTUAL main path on a 2-device mesh.

    DDP semantics (ref train.py:58-65): global batch = num_gpus x
    train_batch_size, sharded P("data"). Round-1 bug: fit drew batches of
    train_batch_size=1 which is not divisible over N>1 devices.
    """
    from vanerf_tpu import config as vconfig

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 8
    m["dr_kwargs"]["sample_per_ray_f"] = 8
    cfg["dataset"]["synthetic_cfg"] = {"H": 32, "W": 32, "subdiv": 1,
                                       "n_frames": 2}
    cfg["out_dir"] = str(tmp_path / "out")
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(cfg))

    sys.path.insert(0, "/root/repo")
    try:
        import train as train_cli
        train_cli.main(["--config", str(cfg_path), "--synthetic_data",
                        "--fast_dev_run", "--num_gpus", "2",
                        "--out_dir", str(tmp_path / "out")])
    finally:
        sys.path.remove("/root/repo")
    # fast_dev_run exits after 1 step; reaching here means the sharded
    # dispatch succeeded (global batch 2 over 2 devices).
    assert (tmp_path / "out" / cfg["expname"] / "config.json").exists()


def test_cli_multi_device_run_val(tmp_path):
    """Drive `train.py --run_val --num_gpus 2` end-to-end.

    The eval CLI builds a mesh and hands it to run_test; at this tiny
    image size (level=1, a single tile) run_test must detect the group is
    not splittable and fall back to single-chip — the wiring and the
    fallback are both exercised (sharded-path numerics are covered by
    test_sharded_full_image_matches_single_device).
    """
    from vanerf_tpu import config as vconfig

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 8
    m["dr_kwargs"]["sample_per_ray_f"] = 8
    cfg["dataset"]["synthetic_cfg"] = {"H": 32, "W": 32, "subdiv": 1,
                                       "n_frames": 2}
    cfg["out_dir"] = str(tmp_path / "out")
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps(cfg))

    sys.path.insert(0, "/root/repo")
    try:
        import train as train_cli
        train_cli.main(["--config", str(cfg_path), "--synthetic_data",
                        "--run_val", "--num_gpus", "2",
                        "--out_dir", str(tmp_path / "out")])
    finally:
        sys.path.remove("/root/repo")
    ymls = list((tmp_path / "out" / cfg["expname"]).glob("test_*.yml"))
    assert ymls, "run_val did not write a results YAML"


def test_plan_tile_group_resolves_mesh_and_rounding():
    """plan_tile_group (renderer.py): rounds the group up to the mesh
    size, degrades to single-chip when the frame has too few tiles, and
    leaves single-chip plans untouched."""
    from vanerf_tpu.parallel import make_mesh
    from vanerf_tpu.renderer import plan_tile_group

    # single-chip: clamp to n_tiles, floor at 1
    assert plan_tile_group(16, 1, None) == (1, None)
    assert plan_tile_group(4, 16, None) == (4, None)
    assert plan_tile_group(1, 0, None) == (1, None)

    mesh = make_mesh(4)
    # group rounds up to the mesh size and shards
    tg, m = plan_tile_group(16, 1, mesh)
    assert tg == 4 and m is mesh
    # already divisible: kept as-is
    tg, m = plan_tile_group(16, 8, mesh)
    assert tg == 8 and m is mesh
    # non-multiple group rounds DOWN to a mesh multiple (8//4*4)
    tg, m = plan_tile_group(16, 6, mesh)
    assert tg % 4 == 0 and m is mesh
    # too few tiles to split: falls back to single-chip
    tg, m = plan_tile_group(1, 4, mesh)
    assert tg == 1 and m is None
    tg, m = plan_tile_group(2, 1, mesh)
    assert tg == 2 and m is None


def test_sharded_full_image_matches_single_device():
    """Multi-chip inference: render_full_image with a 4-device mesh shards
    the tile-group batch under shard_map and reproduces the single-device
    output exactly (serving-side DP; renderer._lazy_sharded_tile)."""
    import jax
    import jax.numpy as jnp
    from vanerf_tpu import config as vconfig
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF
    from vanerf_tpu.parallel import make_mesh
    from vanerf_tpu.renderer import render_full_image

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    batch_np, _faces, num_v = make_synthetic_batch(
        batch_size=1, H=32, W=32, subdiv=1)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    rng = jax.random.PRNGKey(0)
    B = batch["tar_k"].shape[0]
    V2 = batch["verts"].shape[1]
    n = 4
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": 32, "height": 32, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = model.init(rng, batch["src_img"], jnp.zeros((B, n, 3)),
                        jnp.ones((B, n, 3)), cam, batch["src_mask"],
                        batch["verts"], jnp.ones((B, V2, 1)),
                        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
                        batch["kpt3d"], n)

    ref = render_full_image(model, params, batch, level=2,
                            sample_per_ray_c=8, sample_per_ray_f=8,
                            tile_group=4)
    mesh = make_mesh(4)
    out = render_full_image(model, params, batch, level=2,
                            sample_per_ray_c=8, sample_per_ray_f=8,
                            tile_group=4, mesh=mesh)
    assert out["tex_fg_fine"].shape == (B, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(out["tex_fg_fine"]),
                               np.asarray(ref["tex_fg_fine"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out["alpha_fine"]),
                               np.asarray(ref["alpha_fine"]),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("envs", [
    {"VANERF_REMAT_QUERY": "2"},
    {"VANERF_FUSED_TRAIN": "1"},
])
def test_shard_map_composes_with_backward_modes(monkeypatch, envs):
    """The remat / fused-train backward modes must compose with the DP
    shard_map step (custom_vjp + pallas-interpret inside shard_map): one
    2-device step runs, losses finite, params move."""
    import jax
    import jax.numpy as jnp
    from vanerf_tpu import losses as L
    from vanerf_tpu import config as vconfig
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.parallel import make_mesh, make_parallel_train_step
    from vanerf_tpu.training.train_step import (create_train_state,
                                                make_train_step)

    for k, v in envs.items():
        monkeypatch.setenv(k, v)

    n_dev = 2
    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 8
    m["dr_kwargs"]["sample_per_ray_f"] = 8

    batch_np, _faces, num_v = make_synthetic_batch(
        batch_size=n_dev, H=32, W=32, subdiv=1)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(0)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, rng, batch_np, cfg, steps_per_epoch=10)
    vgg = L.VGGLoss(dummy_hw=8)
    step = make_train_step(model, disc, tx_g, tx_d, cfg, vgg)

    leaf_old = np.asarray(jax.tree.leaves(state.params_g)[0]).copy()
    mesh = make_mesh(n_dev)
    with mesh:
        pstep = make_parallel_train_step(step, mesh, batch)
        new_state, logs = pstep(state, batch, jax.random.PRNGKey(1))
        jax.block_until_ready(logs)

    for k, v in logs.items():
        assert np.isfinite(float(v)), f"non-finite {k} under {envs}"
    leaf_new = np.asarray(jax.tree.leaves(new_state.params_g)[0])
    assert np.abs(leaf_new - leaf_old).max() > 0
