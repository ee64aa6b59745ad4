"""End-to-end smoke tests: patch render + GAN train step on synthetic data.

Tiny shapes (32x32 images, 8x8 patch, 8+8 samples) so the whole pipeline
compiles and runs on the CPU test platform.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vanerf_tpu import config as vconfig
from vanerf_tpu.data import make_synthetic_batch
from vanerf_tpu.models import VANeRF, DiscriminatorVis
from vanerf_tpu.renderer import render_patch, mask_centered_grid
from vanerf_tpu.training.train_step import (create_train_state,
                                            make_train_step)
from vanerf_tpu import losses as L


def tiny_cfg():
    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = 8
    m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 8
    m["dr_kwargs"]["sample_per_ray_f"] = 8
    return cfg


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    batch_np, faces, num_v = make_synthetic_batch(
        batch_size=1, H=32, W=32, subdiv=1)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    return cfg, model, batch, num_v


@pytest.mark.slow
def test_render_patch_smoke(setup):
    cfg, model, batch, _ = setup
    rng = jax.random.PRNGKey(0)
    B = batch["tar_k"].shape[0]
    grids = mask_centered_grid(rng, batch["tar_mask"][..., 0], 8, 8)
    assert grids.shape == (B, 64, 2)

    # init params via the joint __call__
    n = 4
    V2 = batch["verts"].shape[1]
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": 32, "height": 32, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = model.init(rng, batch["src_img"], jnp.zeros((B, n, 3)),
                        jnp.ones((B, n, 3)), cam, batch["src_mask"],
                        batch["verts"], jnp.ones((B, V2, 1)),
                        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
                        batch["kpt3d"], n)

    out = render_patch(model, params, batch, rng=rng, grids=grids,
                       out_h=8, out_w=8, sample_per_ray_c=8,
                       sample_per_ray_f=8, fine=True, training=True,
                       rand_noise_std=0.01, sdf_chunk=64)
    assert out["tex_fg"].shape == (B, 8, 8, 3)
    assert out["tex_fg_fine"].shape == (B, 8, 8, 3)
    assert out["tar_img"].shape == (B, 8, 8, 3)
    assert out["vis_img"].shape == (B, 8, 8, 1)
    assert out["alpha"].shape == (B, 8, 8)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"
    # rays centered on the hands should hit: some accumulated alpha > 0.2
    assert float(out["alpha_fine"].max()) > 0.2


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["1", "2"])
def test_render_patch_soa_points_matches(setup, monkeypatch, mode):
    """VANERF_SOA_POINTS=1 (coordinate-major kernel I/O) and =2 (dual
    generate: the network's (N, 3) points recomputed from (o, d, z)
    instead of transposing pts_T) must reproduce the row-major path:
    same sample positions, same mesh queries, same render.

    On the pallas backend the kernels are bit-identical; this CPU test
    drives the renderer plumbing through the XLA fallback where the SoA
    path transposes at the wrapper boundary, so outputs match to fp
    association noise at most.
    """
    cfg, model, batch, _ = setup
    rng = jax.random.PRNGKey(3)
    B = batch["tar_k"].shape[0]
    grids = mask_centered_grid(rng, batch["tar_mask"][..., 0], 8, 8)
    n = 4
    V2 = batch["verts"].shape[1]
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": 32, "height": 32, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = model.init(rng, batch["src_img"], jnp.zeros((B, n, 3)),
                        jnp.ones((B, n, 3)), cam, batch["src_mask"],
                        batch["verts"], jnp.ones((B, V2, 1)),
                        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
                        batch["kpt3d"], n)

    def run():
        return render_patch(model, params, batch, rng=rng, grids=grids,
                            out_h=8, out_w=8, sample_per_ray_c=8,
                            sample_per_ray_f=8, fine=True, training=False,
                            sdf_chunk=64)

    monkeypatch.setenv("VANERF_SOA_POINTS", "0")
    out_a = run()
    monkeypatch.setenv("VANERF_SOA_POINTS", mode)
    out_b = run()
    for k in out_a:
        np.testing.assert_allclose(np.asarray(out_b[k]),
                                   np.asarray(out_a[k]), rtol=1e-5,
                                   atol=1e-6, err_msg=k)


@pytest.mark.slow
@pytest.mark.parametrize("level", ["1", "2"])
def test_render_patch_fused_mlp_matches(setup, monkeypatch, level):
    """VANERF_FUSED_MLP=1 (pallas PE+MLPUNetFusion+gcompress kernel) and
    =2 (additionally both gate/fuse nets + the V=1 rgb head) must
    reproduce the XLA composition. f32 on CPU: differences are limited to
    matmul-split accumulation order, so tolerances are tight."""
    cfg, model, batch, _ = setup
    rng = jax.random.PRNGKey(5)
    B = batch["tar_k"].shape[0]
    grids = mask_centered_grid(rng, batch["tar_mask"][..., 0], 8, 8)
    n = 4
    V2 = batch["verts"].shape[1]
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": 32, "height": 32, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = model.init(rng, batch["src_img"], jnp.zeros((B, n, 3)),
                        jnp.ones((B, n, 3)), cam, batch["src_mask"],
                        batch["verts"], jnp.ones((B, V2, 1)),
                        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
                        batch["kpt3d"], n)

    def run():
        return render_patch(model, params, batch, rng=rng, grids=grids,
                            out_h=8, out_w=8, sample_per_ray_c=8,
                            sample_per_ray_f=8, fine=True, training=False,
                            sdf_chunk=64)

    monkeypatch.setenv("VANERF_FUSED_MLP", "0")
    out_a = run()
    monkeypatch.setenv("VANERF_FUSED_MLP", level)
    out_b = run()
    for k in out_a:
        np.testing.assert_allclose(np.asarray(out_b[k]),
                                   np.asarray(out_a[k]), rtol=2e-4,
                                   atol=2e-5, err_msg=k)


@pytest.mark.slow
def test_ibr_v1_shortcut_bitwise(setup, monkeypatch):
    """At one source view the IBR head is exactly identity on
    rgb_feat[..., :3] (softmax over a single view == 1): the shortcut must
    be bitwise equal to running the full head."""
    cfg, model, batch, _ = setup
    rng = jax.random.PRNGKey(7)
    B = batch["tar_k"].shape[0]
    grids = mask_centered_grid(rng, batch["tar_mask"][..., 0], 8, 8)
    n = 4
    V2 = batch["verts"].shape[1]
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": 32, "height": 32, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = model.init(rng, batch["src_img"], jnp.zeros((B, n, 3)),
                        jnp.ones((B, n, 3)), cam, batch["src_mask"],
                        batch["verts"], jnp.ones((B, V2, 1)),
                        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
                        batch["kpt3d"], n)

    def run():
        return render_patch(model, params, batch, rng=rng, grids=grids,
                            out_h=8, out_w=8, sample_per_ray_c=8,
                            sample_per_ray_f=8, fine=True, training=False,
                            sdf_chunk=64)

    monkeypatch.setenv("VANERF_IBR_V1_SHORTCUT", "0")
    out_a = run()
    monkeypatch.setenv("VANERF_IBR_V1_SHORTCUT", "1")
    out_b = run()
    for k in out_a:
        np.testing.assert_array_equal(np.asarray(out_b[k]),
                                      np.asarray(out_a[k]), err_msg=k)


def test_mask_centered_grid_non_square():
    """Per-axis offset + per-axis clamp (ref model.py:1172-1189 clamps
    per-dim; round-1 build clamped both axes to min(W-1,H-1))."""
    H, W, out_h, out_w = 16, 48, 4, 8
    rng = jax.random.PRNGKey(3)
    # mask concentrated at far right so x coords exceed min(W-1, H-1)=15
    mask = jnp.zeros((1, H, W)).at[:, 8, 40].set(1.0)
    g = mask_centered_grid(rng, mask, out_h, out_w)
    assert g.shape == (1, out_h * out_w, 2)
    x, y = np.asarray(g[0, :, 0]), np.asarray(g[0, :, 1])
    assert x.min() >= 0 and x.max() <= W - 1
    assert y.min() >= 0 and y.max() <= H - 1
    # the grid is centered per-axis: spans out_w in x, out_h in y
    np.testing.assert_allclose(x.max() - x.min(), out_w - 1)
    np.testing.assert_allclose(y.max() - y.min(), out_h - 1)
    assert x.max() > 15  # would fail under the old min(W-1,H-1) clamp
    # corner mask: clamped but still in-bounds on both axes independently
    mask2 = jnp.zeros((1, H, W)).at[:, 0, W - 1].set(1.0)
    g2 = np.asarray(mask_centered_grid(rng, mask2, out_h, out_w)[0])
    assert g2[:, 0].max() <= W - 1 and g2[:, 1].min() >= 0


@pytest.mark.slow
def test_train_step_updates_and_is_finite(setup):
    cfg, model, batch, _ = setup
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(1)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, rng, batch, cfg, steps_per_epoch=10)
    vgg = L.VGGLoss(dummy_hw=8)
    step = jax.jit(make_train_step(model, disc, tx_g, tx_d, cfg, vgg))
    new_state, logs = step(state, batch, jax.random.PRNGKey(2))

    assert int(new_state.step) == 1
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"non-finite log {k}"
    # both param trees actually changed
    def l2diff(a, b):
        return sum(float(jnp.sum((x - y) ** 2))
                   for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)))
    assert l2diff(state.params_g, new_state.params_g) > 0
    assert l2diff(state.params_d, new_state.params_d) > 0


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["1", "2"])
def test_train_step_remat_query_matches(setup, monkeypatch, mode):
    """VANERF_REMAT_QUERY rematerializes the per-point network in the
    backward pass (jax.checkpoint) — losses and the GRADIENTS must match
    the residual-storing baseline.  Gradients are observed exactly by
    running the step under SGD(lr=1): params_new - params == -grad.
    (Comparing params after an Adam step is hopeless: step-1 Adam updates
    are ~lr*sign(g), so ulp-level fp-reorder noise on near-zero grads
    flips whole elements.)"""
    import optax
    cfg, model, batch, _ = setup
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(1)
    state, _ = create_train_state(
        model, disc, rng, batch, cfg, steps_per_epoch=10)
    sgd = optax.sgd(1.0)
    state = state._replace(opt_g=sgd.init(state.params_g),
                           opt_d=sgd.init(state.params_d))
    vgg = L.VGGLoss(dummy_hw=8)

    def grads_of_step():
        step = jax.jit(make_train_step(model, disc, sgd, sgd, cfg, vgg))
        new_state, logs = step(state, batch, jax.random.PRNGKey(2))
        g = jax.tree.map(lambda old, new: np.asarray(old) - np.asarray(new),
                         state.params_g, new_state.params_g)
        return g, {k: float(v) for k, v in logs.items()}

    monkeypatch.setenv("VANERF_REMAT_QUERY", "0")
    g0, logs0 = grads_of_step()
    monkeypatch.setenv("VANERF_REMAT_QUERY", mode)
    g1, logs1 = grads_of_step()
    for k in logs0:
        np.testing.assert_allclose(logs1[k], logs0[k], rtol=2e-4,
                                   atol=1e-5, err_msg=k)
    # Normalized infinity-norm per tensor with an absolute noise floor:
    # tensors whose whole grad is ~1e-7 (e.g. tex-encoder biases at these
    # tiny shapes) see pure fp-reorder noise; a missing grad path on any
    # numerically meaningful tensor (grads >> 1e-5) is still caught.
    paths0 = jax.tree_util.tree_leaves_with_path(g0)
    for (path, a), b in zip(paths0, jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        diff = np.abs(b - a).max()
        bound = 2e-3 * np.abs(a).max() + 1e-5
        assert diff < bound, \
            f"{jax.tree_util.keystr(path)}: {diff:.2e} > {bound:.2e}"


@pytest.mark.slow
@pytest.mark.parametrize("level", ["1", "2"])
def test_train_step_fused_train_matches(setup, monkeypatch, level):
    """VANERF_FUSED_TRAIN=<level> runs the G forward through the pallas
    fused query kernel with a custom_vjp that differentiates the XLA
    composition. Losses track the baseline to kernel-parity tolerance;
    gradients are the XLA function's grads driven by cotangents computed
    on fused outputs, so they match to the same order."""
    import optax
    cfg, model, batch, _ = setup
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(1)
    state, _ = create_train_state(
        model, disc, rng, batch, cfg, steps_per_epoch=10)
    sgd = optax.sgd(1.0)
    state = state._replace(opt_g=sgd.init(state.params_g),
                           opt_d=sgd.init(state.params_d))
    vgg = L.VGGLoss(dummy_hw=8)

    def grads_of_step():
        step = jax.jit(make_train_step(model, disc, sgd, sgd, cfg, vgg))
        new_state, logs = step(state, batch, jax.random.PRNGKey(2))
        g = jax.tree.map(lambda old, new: np.asarray(old) - np.asarray(new),
                         state.params_g, new_state.params_g)
        return g, {k: float(v) for k, v in logs.items()}

    monkeypatch.setenv("VANERF_FUSED_TRAIN", "0")
    g0, logs0 = grads_of_step()
    monkeypatch.setenv("VANERF_FUSED_TRAIN", level)
    g1, logs1 = grads_of_step()
    for k in logs0:
        np.testing.assert_allclose(logs1[k], logs0[k], rtol=5e-3,
                                   atol=5e-4, err_msg=k)
    paths0 = jax.tree_util.tree_leaves_with_path(g0)
    for (path, a), b in zip(paths0, jax.tree.leaves(g1)):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        diff = np.abs(b - a).max()
        bound = 1e-2 * np.abs(a).max() + 1e-4
        assert diff < bound, \
            f"{jax.tree_util.keystr(path)}: {diff:.2e} > {bound:.2e}"


@pytest.mark.slow
def test_render_full_image_tile_groups_match(setup):
    from vanerf_tpu.renderer import render_full_image
    cfg, model, batch, _ = setup
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
    o1 = render_full_image(model, params, batch, level=2,
                           sample_per_ray_c=8, sample_per_ray_f=8,
                           tile_group=1)
    o4 = render_full_image(model, params, batch, level=2,
                           sample_per_ray_c=8, sample_per_ray_f=8,
                           tile_group=4)
    assert o1["tex_fg_fine"].shape == (B, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(o1["tex_fg_fine"]),
                               np.asarray(o4["tex_fg_fine"]),
                               rtol=1e-4, atol=1e-5)
    # deterministic across calls
    o1b = render_full_image(model, params, batch, level=2,
                            sample_per_ray_c=8, sample_per_ray_f=8,
                            tile_group=1)
    np.testing.assert_allclose(np.asarray(o1["tex_fg_fine"]),
                               np.asarray(o1b["tex_fg_fine"]), atol=1e-6)


@pytest.mark.slow
def test_render_patch_two_views():
    """Multi-view path: V=2 source views, view-dependent IBR blending."""
    cfg = tiny_cfg()
    batch_np, faces, num_v = make_synthetic_batch(
        batch_size=1, H=32, W=32, subdiv=1, num_input_view=2)
    batch = jax.tree.map(jnp.asarray, batch_np)
    assert batch["src_img"].shape[0] == 2        # B*V flattened
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
                        batch["kpt3d"], n, 2)
    grids = mask_centered_grid(rng, batch["tar_mask"][..., 0], 8, 8)
    out = render_patch(model, params, batch, rng=rng, grids=grids,
                       out_h=8, out_w=8, sample_per_ray_c=8,
                       sample_per_ray_f=8, fine=True, training=False,
                       n_views=2, sdf_chunk=64)
    assert out["tex_fg_fine"].shape == (B, 8, 8, 3)
    for k, v in out.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"


@pytest.mark.slow
def test_gradient_accumulation_defers_updates(setup):
    """accumulate_grad_batches=2 (ref train.py:63 config hook) wraps both
    optimizers in optax.MultiSteps: params change only every 2nd step."""
    import copy
    cfg, model, batch, _ = setup
    cfg = copy.deepcopy(cfg)
    cfg["training"]["accumulate_grad_batches"] = 2
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(5)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, rng, batch, cfg, steps_per_epoch=10)
    vgg = L.VGGLoss(dummy_hw=8)
    step = jax.jit(make_train_step(model, disc, tx_g, tx_d, cfg, vgg))

    leaf0 = np.asarray(jax.tree.leaves(state.params_g)[0]).copy()
    s1, logs1 = step(state, batch, jax.random.PRNGKey(6))
    leaf1 = np.asarray(jax.tree.leaves(s1.params_g)[0])
    np.testing.assert_array_equal(leaf0, leaf1)     # grads only accumulated
    s2, logs2 = step(s1, batch, jax.random.PRNGKey(7))
    leaf2 = np.asarray(jax.tree.leaves(s2.params_g)[0])
    assert not np.array_equal(leaf1, leaf2)         # applied on 2nd batch


@pytest.mark.slow
def test_train_step_two_views_smoke():
    """GAN step at V=2 source views: exercises the view-dropout
    regularizer (ref model.py:804-810, training + n_views>1 only) and the
    multi-view IBR/fusion paths under grad. Losses finite, params move."""
    import optax
    cfg = tiny_cfg()
    batch_np, faces, num_v = make_synthetic_batch(
        batch_size=1, H=32, W=32, subdiv=1, num_input_view=2)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(3)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, rng, batch, cfg, steps_per_epoch=10, n_views=2)
    vgg = L.VGGLoss(dummy_hw=8)
    step = jax.jit(make_train_step(model, disc, tx_g, tx_d, cfg, vgg,
                                   n_views=2))
    new_state, logs = step(state, batch, jax.random.PRNGKey(4))
    for k, v in logs.items():
        assert np.isfinite(float(v)), f"non-finite {k}"
    diff = sum(float(jnp.sum((a - b) ** 2)) for a, b in
               zip(jax.tree.leaves(state.params_g),
                   jax.tree.leaves(new_state.params_g)))
    assert diff > 0


@pytest.mark.slow
def test_val_fn_logs_components(setup):
    """make_val_fn returns val_total_loss plus every loss component with
    the reference's val/ prefix (ref model.py:570-572)."""
    from vanerf_tpu.data.synthetic import SyntheticDataset
    from vanerf_tpu.eval_loop import make_val_fn

    cfg, model, batch, num_v = setup
    ds = SyntheticDataset(split="test", n_frames=1, H=32, W=32, subdiv=1)
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(1)
    state, _ = create_train_state(model, disc, rng, batch, cfg,
                                  steps_per_epoch=10)
    vgg = L.VGGLoss(dummy_hw=8)
    val_fn = make_val_fn(model, disc, ds, cfg, vgg, max_items=1)
    logs = val_fn(state, 0, None)
    assert "val_total_loss" in logs and np.isfinite(logs["val_total_loss"])
    comp = [k for k in logs if k.startswith("val/")]
    assert comp, f"no val/ component losses in {sorted(logs)}"
    for k in comp:
        assert np.isfinite(logs[k]), k


@pytest.mark.slow
def test_render_patch_far_tau(setup, monkeypatch):
    """VANERF_FAR_TAU far-field tier plumbing through the renderer.

    With a huge tau no tile qualifies and the render must be bit-identical
    to the exact path (the mask machinery adds nothing); with a tiny tau
    (virtually) every tile is far — the render must stay finite and
    actually diverge from the exact run (the tier engaged).
    """
    cfg, model, batch, _ = setup
    rng = jax.random.PRNGKey(5)
    B = batch["tar_k"].shape[0]
    grids = mask_centered_grid(rng, batch["tar_mask"][..., 0], 8, 8)
    n = 4
    V2 = batch["verts"].shape[1]
    cam = {"KRT": batch["src_krt"], "extrin": batch["src_extrin"],
           "width": 32, "height": 32, "znear": batch["znear"],
           "zfar": batch["zfar"]}
    params = model.init(rng, batch["src_img"], jnp.zeros((B, n, 3)),
                        jnp.ones((B, n, 3)), cam, batch["src_mask"],
                        batch["verts"], jnp.ones((B, V2, 1)),
                        jnp.ones((B, n, 1)), jnp.zeros((B, n, 1)),
                        batch["kpt3d"], n)

    def run():
        return render_patch(model, params, batch, rng=rng, grids=grids,
                            out_h=8, out_w=8, sample_per_ray_c=8,
                            sample_per_ray_f=8, fine=True, training=False,
                            sdf_chunk=64)

    out_exact = run()
    monkeypatch.setenv("VANERF_FAR_TAU", "1000.0")
    out_none_far = run()
    for k in out_exact:
        np.testing.assert_array_equal(np.asarray(out_none_far[k]),
                                      np.asarray(out_exact[k]),
                                      err_msg=k)

    monkeypatch.setenv("VANERF_FAR_TAU", "1e-4")
    out_far = run()
    for k, v in out_far.items():
        assert np.isfinite(np.asarray(v)).all(), f"non-finite {k}"
    assert not np.allclose(np.asarray(out_far["tex_fg_fine"]),
                           np.asarray(out_exact["tex_fg_fine"]))
