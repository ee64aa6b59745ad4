"""Device mesh + sharding helpers (the DDP/NCCL replacement).

The reference scales with PyTorch-Lightning DDP over NCCL
(``train.py:58,65``); here scale-out is a 1-D `jax.sharding.Mesh` over the
'data' axis: the batch (and everything derived from it — rays, samples, mesh
queries) shards across chips, parameters are replicated, and XLA inserts the
gradient all-reduce over ICI automatically from the sharding annotations.
No process groups, no SyncBatchNorm (all norms are batch-independent).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(mesh: Mesh, axis: str = "data"):
    """NamedSharding that splits the leading (batch) dim of every leaf."""
    def spec(x):
        ndim = np.ndim(x)
        if ndim == 0:
            return NamedSharding(mesh, P())
        return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))
    return spec


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())
