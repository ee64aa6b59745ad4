"""Data-parallel training over the 8-virtual-device CPU mesh.

Mirrors the driver's dryrun_multichip: full GAN train step under
shard_map (batch sharded, params replicated, explicit gradient pmean).
"""

import numpy as np


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
