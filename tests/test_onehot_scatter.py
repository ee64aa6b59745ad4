"""One-hot MXU scatter VJP (ops/onehot_gather.py) vs native gather autodiff.

The forward pass is the native gather by construction; these tests pin the
backward pass: the pallas one-hot matmul scatter (interpret mode on CPU)
must reproduce XLA's scatter-add gradient exactly, including duplicate
indices, padding tails, and the policy-gated call sites (feat_sample /
knn_gather).
"""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vanerf_tpu.ops.onehot_gather import onehot_scatter_enabled, take_rows


def _grad_pair(table, idx):
    def loss_take(t):
        return jnp.sum(take_rows(t, idx, interpret=True) ** 2)

    def loss_native(t):
        return jnp.sum(t.at[idx].get(mode="promise_in_bounds") ** 2)

    return jax.grad(loss_take)(table), jax.grad(loss_native)(table)


def test_forward_is_native_gather(rng):
    table = jnp.asarray(rng.normal(size=(37, 5)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 37, size=300).astype(np.int32))
    out = take_rows(table, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(table)[idx])


def test_scatter_grad_matches_native_with_duplicates(rng):
    # N >> T so every row accumulates many duplicate contributions
    table = jnp.asarray(rng.normal(size=(37, 5)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, 37, size=4096).astype(np.int32))
    g_take, g_native = _grad_pair(table, idx)
    np.testing.assert_allclose(np.asarray(g_take), np.asarray(g_native),
                               rtol=1e-5)


def test_scatter_grad_padding_tail(rng):
    # N not a multiple of the block size: padded slots scatter g=0 to row 0
    os.environ["VANERF_ONEHOT_BN"] = "256"
    try:
        table = jnp.asarray(rng.normal(size=(130, 3)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, 130, size=777).astype(np.int32))
        g_take, g_native = _grad_pair(table, idx)
        np.testing.assert_allclose(np.asarray(g_take), np.asarray(g_native),
                                   rtol=1e-5)
    finally:
        del os.environ["VANERF_ONEHOT_BN"]


def test_rows_never_indexed_get_zero_grad(rng):
    table = jnp.asarray(rng.normal(size=(16, 4)).astype(np.float32))
    idx = jnp.zeros((512,), jnp.int32)  # only row 0 ever gathered
    g_take, _ = _grad_pair(table, idx)
    assert np.all(np.asarray(g_take)[1:] == 0.0)
    assert np.any(np.asarray(g_take)[0] != 0.0)


def test_policy_off_on_cpu():
    # the hermetic test platform is CPU — the policy must never fire here
    assert not onehot_scatter_enabled(1024, 262144)


def test_policy_respects_flag_and_sizes(monkeypatch):
    monkeypatch.setenv("VANERF_ONEHOT_SCATTER", "1")
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert onehot_scatter_enabled(1024, 262144)
    assert not onehot_scatter_enabled(16384, 262144)   # table too large
    assert not onehot_scatter_enabled(1024, 1024)      # too few queries
    monkeypatch.setenv("VANERF_ONEHOT_SCATTER", "0")
    assert not onehot_scatter_enabled(1024, 262144)


def test_callsite_grads_unchanged_when_policy_fires(rng, monkeypatch):
    """feat_sample_nhwc / knn_gather_1 gradients with the unrolled one-hot
    branch (interpret-mode kernels) match the vmapped native path."""
    import functools

    from vanerf_tpu.ops import grid_sample as gs
    from vanerf_tpu.ops import knn as knn_mod
    from vanerf_tpu.ops import onehot_gather as og

    feat = jnp.asarray(rng.normal(size=(2, 8, 8, 6)).astype(np.float32))
    uv = jnp.asarray(rng.uniform(-1, 1, size=(2, 1024, 2))
                     .astype(np.float32))

    def loss(f, sampler):
        return jnp.sum(sampler(f, uv) ** 2)

    # native gradient FIRST (before any patching: the vmapped
    # grid_sample_2d path must never see the one-hot branch)
    g_native = jax.grad(lambda f: loss(f, jax.vmap(gs.grid_sample_2d)))(feat)

    # force the policy on (it requires a TPU backend) and the kernels into
    # interpret mode; both call sites re-import from the module at call
    # time, so patching the module attributes reroutes them.
    monkeypatch.setenv("VANERF_ONEHOT_BN", "128")
    monkeypatch.setattr(og, "onehot_scatter_enabled",
                        lambda n_rows, n_queries: True)
    monkeypatch.setattr(og, "take_rows",
                        functools.partial(og.take_rows, interpret=True))

    g_onehot = jax.grad(lambda f: loss(f, gs.feat_sample_nhwc))(feat)
    np.testing.assert_allclose(np.asarray(g_onehot), np.asarray(g_native),
                               rtol=1e-5)

    # knn_gather_1 site
    query = jnp.asarray(rng.normal(size=(2, 512, 3)).astype(np.float32))
    verts = jnp.asarray(rng.normal(size=(2, 64, 3)).astype(np.float32))
    vfeat = jnp.asarray(rng.normal(size=(2, 64, 7)).astype(np.float32))
    vvis = jnp.asarray((rng.uniform(size=(2, 64, 1)) > 0.5)
                       .astype(np.float32))

    def knn_loss(vf):
        f, f_toh, v, v_toh = knn_mod.knn_gather_1(query, verts, vf, vvis, 32)
        return jnp.sum(f ** 2) + jnp.sum(f_toh ** 2)

    g_on = jax.grad(knn_loss)(vfeat)
    monkeypatch.setattr(og, "onehot_scatter_enabled",
                        lambda n_rows, n_queries: False)
    g_off = jax.grad(knn_loss)(vfeat)
    np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                               rtol=1e-5)
