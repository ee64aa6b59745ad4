"""reference_faithful_gan flag: the D step's patch source.

faithful=True (default): the D optimizer sees a FRESH random patch
rendered through the just-updated generator — exactly the reference's
alternating two-forward scheme (ref src/model.py:417 + random grid draw
inside forward).  faithful=False: the cheaper single-render deviation
(D consumes the stop-gradient of G's patch).

The G update must be IDENTICAL under both modes (the flag only changes
what D trains on); the D update must differ (different patch).
"""

import numpy as np
import pytest

pytestmark = pytest.mark.slow      # two train-step compiles on CPU


def _setup():
    import jax
    import jax.numpy as jnp
    from vanerf_tpu import losses as L
    from vanerf_tpu import config as vconfig
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.training.train_step import (create_train_state,
                                                make_train_step)

    cfg = vconfig.default_cfg()
    m = cfg["models"]["VANeRF"]
    m["train_out_h"] = m["train_out_w"] = 8
    m["geo_args"]["n_downsample"] = 2
    m["dr_kwargs"]["sample_per_ray_c"] = 8
    m["dr_kwargs"]["sample_per_ray_f"] = 8

    batch_np, _faces, num_v = make_synthetic_batch(batch_size=1, H=32, W=32,
                                                   subdiv=1)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    disc = DiscriminatorVis()
    vgg = L.VGGLoss(dummy_hw=8)
    return cfg, model, disc, vgg, batch, batch_np


def _one_step(cfg, model, disc, vgg, batch, batch_np, faithful):
    import jax
    from vanerf_tpu.training.train_step import (create_train_state,
                                                make_train_step)
    cfg = dict(cfg)
    cfg["training"] = dict(cfg["training"],
                           reference_faithful_gan=faithful)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, jax.random.PRNGKey(0), batch_np, cfg,
        steps_per_epoch=10)
    step = jax.jit(make_train_step(model, disc, tx_g, tx_d, cfg, vgg))
    new_state, logs = step(state, batch, jax.random.PRNGKey(3))
    jax.block_until_ready(logs)
    return new_state, logs


def test_faithful_gan_changes_d_not_g():
    import jax
    cfg, model, disc, vgg, batch, batch_np = _setup()
    s_f, logs_f = _one_step(cfg, model, disc, vgg, batch, batch_np, True)
    s_s, logs_s = _one_step(cfg, model, disc, vgg, batch, batch_np, False)

    for logs, mode in ((logs_f, "faithful"), (logs_s, "single")):
        for k, v in logs.items():
            assert np.isfinite(float(v)), (mode, k)

    # identical G update (same init, same rng stream for the G render)
    for pf, ps in zip(jax.tree.leaves(s_f.params_g),
                      jax.tree.leaves(s_s.params_g)):
        np.testing.assert_array_equal(np.asarray(pf), np.asarray(ps))

    # the D update differs: faithful mode trains D on a fresh patch
    # through the updated G
    diffs = [float(np.abs(np.asarray(pf) - np.asarray(ps)).max())
             for pf, ps in zip(jax.tree.leaves(s_f.params_d),
                               jax.tree.leaves(s_s.params_d))]
    assert max(diffs) > 0, "faithful flag did not change the D step"
