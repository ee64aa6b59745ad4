"""Orbax checkpoint save/restore + auto-resume semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from vanerf_tpu.training.checkpoints import CheckpointManager
from vanerf_tpu.training.train_step import TrainState


def make_state(seed):
    k = jax.random.PRNGKey(seed)
    params = {"w": jax.random.normal(k, (4, 4)), "b": jnp.zeros(4)}
    tx = optax.adam(1e-3)
    return TrainState(params, {"d": jnp.ones(3)}, tx.init(params),
                      tx.init({"d": jnp.ones(3)}),
                      jnp.asarray(7, jnp.int32))


def test_save_restore_roundtrip(tmp_path):
    state = make_state(0)
    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    mngr.save(7, state)
    assert mngr.latest_step() == 7

    template = make_state(1)          # different values, same structure
    restored, step = mngr.restore(template)
    assert step == 7
    for a, b in zip(jax.tree.leaves(restored), jax.tree.leaves(state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_restore_latest_of_many(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "ckpts"))
    for s in (3, 9, 12):
        mngr.save(s, make_state(s))
    restored, step = mngr.restore(make_state(0))
    assert step == 12
    assert int(restored.step) == 7    # the stored state's own counter


def test_restore_empty_returns_none(tmp_path):
    mngr = CheckpointManager(str(tmp_path / "empty"))
    restored, step = mngr.restore(make_state(0))
    assert restored is None and step is None
