"""Data-parallel train step over a device mesh.

Replaces the reference's `Trainer(strategy="ddp")` path: one jitted step
whose inputs are annotated with shardings — batch split over the 'data'
axis, params/optimizer state replicated.  XLA lowers the implied gradient
reduction to `all-reduce` over ICI; nothing else is needed.

`faces` (static topology) and scalar znear/zfar are replicated.
"""

from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


_REPLICATED_KEYS = ("faces", "znear", "zfar")


def batch_shardings(mesh: Mesh, batch: dict, axis: str = "data"):
    out = {}
    for k, v in batch.items():
        nd = getattr(v, "ndim", 0)
        if k in _REPLICATED_KEYS or nd == 0:
            out[k] = NamedSharding(mesh, P())
        else:
            out[k] = NamedSharding(mesh, P(axis, *([None] * (nd - 1))))
    return out


def make_parallel_train_step(train_step: Callable, mesh: Mesh,
                             sample_batch: dict, axis: str = "data"):
    """jit the single-device train step with data-parallel shardings."""
    repl = NamedSharding(mesh, P())
    b_shard = batch_shardings(mesh, sample_batch, axis)
    return jax.jit(
        train_step,
        in_shardings=(repl, b_shard, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )
