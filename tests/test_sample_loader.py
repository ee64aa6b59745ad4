"""SampleLoader: multi-process dataset[i] evaluation (the torch
DataLoader(num_workers=N) analog, ref model.py:74-105 /
training.train_num_workers in configs/vanerf.json).

dataset[i] is a pure function of the index in both datasets, so the
pool must be a pure overlap optimization: same items, same order.
"""

import os

import numpy as np

from vanerf_tpu.training.loop import SampleLoader


class _DS:
    """Index-deterministic dataset; item 5 is corrupt (None), like the
    reference's None-dropping collate path."""

    def __len__(self):
        return 13

    def __getitem__(self, i):
        if i == 5:
            return None
        return {"x": np.full((3,), i, np.float32), "pid": os.getpid()}


def test_inline_and_pool_agree():
    ds = _DS()
    idxs = [3, 1, 5, 0, 12, 7, 7, 2]
    inline = list(SampleLoader(ds, 1).ordered(idxs))
    pool = SampleLoader(ds, 3)
    try:
        parallel = list(pool.ordered(idxs))
    finally:
        pool.close()
    assert len(inline) == len(parallel) == len(idxs)
    for a, b, i in zip(inline, parallel, idxs):
        if i == 5:
            assert a is None and b is None
            continue
        np.testing.assert_array_equal(a["x"], b["x"])


def test_pool_runs_in_worker_processes():
    pool = SampleLoader(_DS(), 2)
    try:
        items = [it for it in pool.ordered(range(13)) if it is not None]
    finally:
        pool.close()
    pids = {it["pid"] for it in items}
    assert os.getpid() not in pids
    assert len(pids) >= 1


def test_window_bounds_inflight_order():
    # more indices than 2*workers: exercises the submit-ahead window
    # refill path; order must be exactly the request order
    ds = _DS()
    idxs = list(range(5)) * 4  # 20 >> window 4
    pool = SampleLoader(ds, 2)
    try:
        out = list(pool.ordered(idxs))
    finally:
        pool.close()
    for it, i in zip(out, idxs):
        if i == 5:
            assert it is None
        else:
            assert it["x"][0] == i


def test_close_idempotent_and_inline_close():
    pool = SampleLoader(_DS(), 2)
    pool.close()
    pool.close()
    inline = SampleLoader(_DS(), 1)
    inline.close()


def test_fit_dataset_smaller_than_batch(tmp_path):
    """n < batch_size (e.g. --num_gpus x train_batch_size exceeding a tiny
    dataset): the sample stream holds only n items, so batch assembly must
    draw exactly the per-batch slice length and cyclically pad — not hang
    waiting for batch_size items that will never come."""
    import jax
    import jax.numpy as jnp
    from vanerf_tpu.training.loop import fit
    from vanerf_tpu.training.train_step import TrainState

    class Tiny:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            return {"x": np.full((3,), i, np.float32)}

    seen = []

    def train_step(state, batch, rng):
        seen.append(np.asarray(batch["x"]))
        return state._replace(step=state.step + 1), {"loss": jnp.float32(0)}

    def collate(items):
        return {"x": np.stack([it["x"] for it in items])}

    state = TrainState(params_g={"w": jnp.zeros(1)},
                       params_d={"w": jnp.zeros(1)},
                       opt_g=None, opt_d=None, step=jnp.int32(0))
    cfg = {"training": {"max_epochs": 1, "train_batch_size": 4,
                        "pl_cfg": {"val_check_interval": 10.0}}}
    out = fit(train_step, state, Tiny(), collate, cfg=cfg,
              save_dir=str(tmp_path), rng=jax.random.PRNGKey(0))
    assert int(out.step) == 1
    assert len(seen) == 1 and seen[0].shape == (4, 3)  # cyclic padding


def test_synthetic_dataset_pickles_for_worker_pool():
    import pickle
    from vanerf_tpu.data.synthetic import SyntheticDataset

    ds = SyntheticDataset(split="train", H=32, W=32, subdiv=1)
    ds2 = pickle.loads(pickle.dumps(ds))
    a, b = ds[1], ds2[1]
    for k in a:
        if a[k] is not None and np.ndim(a[k]) > 0:
            np.testing.assert_array_equal(np.asarray(a[k]),
                                          np.asarray(b[k]), err_msg=k)
