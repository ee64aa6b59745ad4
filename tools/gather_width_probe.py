"""Probe: TPU row-gather cost vs row width at production row counts.

docs/perf.md records gathers as ROW-COUNT bound (~200M rows/s flat over
4..146 channels), and the 2026-08-20 trace shows the 204-ch vertex-table
gather running 1.88 ms vs 1.27 ms for 16..32-ch map gathers (same 262k
rows).  This probe maps the width/cost curve precisely — the decision
input for channel-packing schemes that widen one gather to eliminate
another (e.g. folding the 64^2 feat_tex corner gather into the 128^2
half-map gather needs a 104-ch row).

Usage: python tools/gather_width_probe.py
"""

import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *a, iters=10):
    out = fn(*a)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    N = 262144
    rows = 16384
    rng = jax.random.PRNGKey(0)
    idx = jax.random.randint(rng, (N,), 0, rows)

    print(f"backend={jax.default_backend()}  {N} gathered rows, "
          f"{rows}-row bf16 table")
    for width in (16, 32, 64, 96, 104, 128, 146, 160, 204, 256, 320):
        tbl = jnp.ones((rows, width), jnp.bfloat16)

        @jax.jit
        def g(tbl, idx):
            return tbl.at[idx].get(mode="promise_in_bounds")

        t = timed(g, tbl, idx)
        print(f"  width {width:4d}: {t*1e3:7.3f} ms   "
              f"({N/t/1e6:6.1f} M rows/s)")

    # the decision comparison: one wide gather vs two narrow ones
    tbl_a = jnp.ones((rows, 32), jnp.bfloat16)
    tbl_b = jnp.ones((4096, 32), jnp.bfloat16)
    idx_b = jax.random.randint(rng, (N,), 0, 4096)

    @jax.jit
    def two(tbl_a, tbl_b, idx, idx_b):
        return (tbl_a.at[idx].get(mode="promise_in_bounds"),
                tbl_b.at[idx_b].get(mode="promise_in_bounds"))

    t2 = timed(two, tbl_a, tbl_b, idx, idx_b)
    tbl_w = jnp.ones((rows, 104), jnp.bfloat16)

    @jax.jit
    def one(tbl_w, idx):
        return tbl_w.at[idx].get(mode="promise_in_bounds")

    t1 = timed(one, tbl_w, idx)
    print(f"two gathers (32ch@16k + 32ch@4k rows): {t2*1e3:7.3f} ms")
    print(f"one 104-ch gather @16k rows:           {t1*1e3:7.3f} ms")

    # --- production-faithful variants: why does the in-pipeline
    # (16384-row, 32-ch) corner gather cost 1.27 ms in the trace? ---
    from vanerf_tpu.ops.grid_sample import grid_sample_2d

    for hw, ch in ((128, 8), (64, 8), (256, 4)):
        feat = jax.random.normal(rng, (hw, hw, ch)).astype(jnp.bfloat16)
        uv = jax.random.uniform(rng, (N, 2), minval=-1.0, maxval=1.0)

        t_lib = timed(jax.jit(grid_sample_2d), feat, uv)

        # the same gather WITHOUT the surrounding lerp fusion: corner-pack
        # outside, barrier the packed table, gather, return raw rows
        @jax.jit
        def raw(feat, uv):
            from vanerf_tpu.ops.grid_sample import pack_corners
            H, W, C = feat.shape
            x = jnp.clip((uv[:, 0] + 1.0) * 0.5 * (W - 1), 0, W - 1)
            y = jnp.clip((uv[:, 1] + 1.0) * 0.5 * (H - 1), 0, H - 1)
            idx = (jnp.floor(y).astype(jnp.int32) * W
                   + jnp.floor(x).astype(jnp.int32))
            packed = pack_corners(feat).reshape(H * W, 4 * C)
            packed = jax.lax.optimization_barrier(packed)
            idx = jax.lax.optimization_barrier(idx)
            return packed.at[idx].get(mode="promise_in_bounds")

        t_raw = timed(raw, feat, uv)
        print(f"grid_sample_2d {hw}^2x{ch}: full {t_lib*1e3:7.3f} ms   "
              f"barriered gather-only {t_raw*1e3:7.3f} ms")

    # spatially-coherent indices (the production case: ray-adjacent
    # samples project to adjacent pixels) vs uniform-random
    feat = jax.random.normal(rng, (128, 128, 8)).astype(jnp.bfloat16)
    uv_r = jax.random.uniform(rng, (N, 2), minval=-1.0, maxval=1.0)
    uv_c = jnp.sort(uv_r, axis=0)                  # crude coherence proxy
    t_r = timed(jax.jit(grid_sample_2d), feat, uv_r)
    t_c = timed(jax.jit(grid_sample_2d), feat, uv_c)
    print(f"grid_sample_2d 128^2x8: random-uv {t_r*1e3:7.3f} ms   "
          f"coherent-uv {t_c*1e3:7.3f} ms")

    # --- THE production difference candidate: vmapped (batched) gather.
    # feat_sample_nhwc vmaps grid_sample_2d over the batch dim; a gather
    # with operand batching dims may lower to a far slower TPU path than
    # the unbatched gather even at B=1. ---
    for B in (1, 2):
        featb = jax.random.normal(rng, (B, 128, 128, 8)).astype(jnp.bfloat16)
        uvb = jax.random.uniform(rng, (B, N, 2), minval=-1.0, maxval=1.0)
        t_vm = timed(jax.jit(jax.vmap(grid_sample_2d)), featb, uvb)

        @jax.jit
        def unrolled(featb, uvb):
            return jnp.stack([grid_sample_2d(featb[b], uvb[b])
                              for b in range(featb.shape[0])])

        t_un = timed(unrolled, featb, uvb)
        print(f"B={B} 128^2x8 x {N} rows: vmap {t_vm*1e3:7.3f} ms   "
              f"unrolled {t_un*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
