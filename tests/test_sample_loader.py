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
