"""MXU one-hot matmul *scatter* for small-table gather gradients.

TPU scatter-adds are sort-based and row-count bound: each of the train
step's table-grad scatters (the VJPs of the KNN vertex-row lookups and the
coarse-map bilinear gathers) costs ~2.7 ms for 262k rows.  For SMALL tables
the same scatter-add is a matmul: ``d_table[t] = sum_n [idx[n] == t] * g[n]``
with the one-hot selection matrix built IN VMEM (never materialized to HBM —
the reason an XLA-level one-hot rewrite measures slower, docs/perf.md) and
contracted on the MXU, accumulating f32 across point blocks.

Measured on v5e-1, ISOLATED op (262k rows): native sort-based scatter
~3.5 ms vs one-hot matmul scatter ~0.5-0.9 ms, bit-identical gradients.
The FORWARD one-hot matmul gather was also measured and LOSES to the
native gather (2.6 vs 1.9 ms at T=1024, C=256), so :func:`take_rows`
keeps the native gather forward and swaps only the VJP.

**Measured on the FULL GAN train step it LOSES: 177.8 ms with the policy
on vs 136.5 ms off (v5e-1, 2026-08-19, `tools/perf_sweep.py --train`).**
The custom_vjp boundary walls the gathers off from XLA's joint
forward/backward schedule — the fusion loss costs ~4x more than the
~10 ms of native scatters it attacks (the same lesson as
VANERF_FUSED_TRAIN/VANERF_REMAT_QUERY, docs/perf.md). Hence
**default OFF**: opt in with ``VANERF_ONEHOT_SCATTER=1``.

Gradient contract: cotangents flow to the TABLE only (``idx`` is integer).

``VANERF_ONEHOT_BN`` tunes the point-block size and
``VANERF_ONEHOT_MAX_T`` the table-size ceiling (one-hot FLOPs scale with
table rows — large tables stay on the native sort-based scatter).

NOTE for callers: the backward pallas kernel accumulates across grid steps
keyed on ``program_id(0)`` — do NOT ``jax.vmap`` over this function (vmap
prepends a batch grid dimension, silently breaking the accumulation init).
Unroll small static batch dims instead (see ``ops/grid_sample.py`` /
``ops/knn.py``).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def _bn() -> int:
    return int(os.environ.get("VANERF_ONEHOT_BN", "1024"))


def onehot_scatter_enabled(n_rows: int, n_queries: int) -> bool:
    """Trace-time policy: the MXU scatter wins only for small tables (FLOPs
    scale with ``n_rows``) and large query counts (fixed kernel overheads).
    """
    flag = os.environ.get("VANERF_ONEHOT_SCATTER", "0")
    if flag in ("", "0"):
        return False
    if jax.default_backend() != "tpu":
        return False
    max_t = int(os.environ.get("VANERF_ONEHOT_MAX_T", "2048"))
    return n_rows <= max_t and n_queries >= 8 * _bn()


def _take_scatter_kernel(idx_ref, g_ref, out_ref):
    tp = out_ref.shape[0]
    bn = idx_ref.shape[-1]
    rows = jax.lax.broadcasted_iota(jnp.int32, (tp, bn), 0)
    onehot_t = (rows == idx_ref[0]).astype(g_ref.dtype)
    contrib = jax.lax.dot_general(
        onehot_t, g_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        out_ref[:] = contrib

    @pl.when(i != 0)
    def _acc():
        out_ref[:] += contrib


@functools.lru_cache(maxsize=None)
def _take_rows_fn(t, c, n, bn, dtype_name, interpret):
    dtype = jnp.dtype(dtype_name)
    tp = -(-t // 128) * 128          # zero-padded table rows: dead one-hot
    n_pad = (-n) % bn                # rows multiply exact zeros on the MXU
    g_blocks = (n + n_pad) // bn

    @jax.custom_vjp
    def f(table, idx):
        return table.at[idx].get(mode="promise_in_bounds")

    def f_fwd(table, idx):
        return f(table, idx), idx

    def f_bwd(idx, g):
        if n_pad:
            # padded slots scatter g=0 into row 0 — a no-op by construction
            idx = jnp.pad(idx, (0, n_pad))
            g = jnp.pad(g, ((0, n_pad), (0, 0)))
        idx3d = idx.astype(jnp.int32).reshape(g_blocks, 1, bn)
        d_p = pl.pallas_call(
            _take_scatter_kernel,
            grid=(g_blocks,),
            in_specs=[pl.BlockSpec((1, 1, bn), lambda i: (i, 0, 0)),
                      pl.BlockSpec((bn, c), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((tp, c), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((tp, c), jnp.float32),
            interpret=interpret,
        )(idx3d, g.astype(dtype))
        return d_p[:t].astype(dtype), np.zeros((n,), jax.dtypes.float0)

    f.defvjp(f_fwd, f_bwd)
    return f


def take_rows(table: jnp.ndarray, idx: jnp.ndarray,
              interpret: bool | None = None) -> jnp.ndarray:
    """``table[idx]`` whose VJP scatter-add runs as an MXU one-hot matmul.

    The forward pass IS the native gather (bit-identical, same speed); only
    the gradient w.r.t. ``table`` is rerouted to the pallas kernel, with f32
    accumulation.  Callers gate on :func:`onehot_scatter_enabled`.

    Args:
      table: (T, C) feature rows; T small (policy caps at
        ``VANERF_ONEHOT_MAX_T`` — one-hot FLOPs are N*T*C).
      idx:   (N,) integer row indices, all in [0, T).
    Returns:
      (N, C) gathered rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t, c = table.shape
    f = _take_rows_fn(t, c, idx.shape[0], _bn(), table.dtype.name, interpret)
    return f(table, idx.astype(jnp.int32))
