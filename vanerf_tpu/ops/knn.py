"""Brute-force nearest-neighbor queries against the MANO vertex cloud.

TPU-native replacement for pytorch3d's CUDA ``knn_points`` as used by the
reference's ``KNN_vis``/``KNN`` (``src/networks.py:27-41``, always K=1 against
2x779 vertices).  The full (N, V) squared-distance matrix is expressed as a
matmul (`-2 q @ v^T`) so the heavy term rides the MXU; the argmin runs on the
VPU.  Static shapes throughout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def nearest_vertex_d2(query: jnp.ndarray, verts: jnp.ndarray,
                      chunk: int = 4096):
    """Nearest vertex index + squared distance per query point.

    The distance is a certified upper bound on the point-to-mesh squared
    distance (vertices lie on the mesh) — the culled mesh-query kernel's
    branch-and-bound bound.

    Args:
      query: (N, 3); verts: (V, 3).
    Returns:
      idx (N,) int32, d2 (N,) float32.
    """
    import os
    backend = os.environ.get("VANERF_MESH_BACKEND", "auto")
    use_pallas = (backend == "pallas"
                  or (backend == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        if os.environ.get("VANERF_KNN_CULL"):
            from .knn_pallas import nearest_vertex_d2_pallas_culled
            return nearest_vertex_d2_pallas_culled(query, verts)
        from .knn_pallas import nearest_vertex_d2_pallas
        return nearest_vertex_d2_pallas(query, verts)
    N = query.shape[0]
    # d2 must be a certified upper bound in f32 for any input dtype: a
    # bf16 difference could round below the true distance, which the
    # culled kernel's tolerance does not cover.
    query = query.astype(jnp.float32)
    verts = verts.astype(jnp.float32)

    def one(qc):
        d2 = jnp.sum((qc[:, None] - verts[None]) ** 2, axis=-1)
        return (jnp.argmin(d2, axis=-1).astype(jnp.int32),
                jnp.min(d2, axis=-1))

    if N <= chunk:
        return one(query)
    pad = (-N) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    idx, d2 = jax.lax.map(one, q)
    return idx.reshape(-1)[:N], d2.reshape(-1)[:N]


def nearest_vertex_d2_T(query_T: jnp.ndarray, verts: jnp.ndarray,
                        chunk: int = 4096):
    """Transposed-input :func:`nearest_vertex_d2`.

    Args:
      query_T: (3, N) query coordinates — the packed TPU layout ((N, 3)
        pads its 3-wide minor dim to 128 lanes, a 42x HBM blowup).
    Returns:
      idx (N,) int32, d2 (N,) float32 — packed (N,) layouts.
    """
    import os
    backend = os.environ.get("VANERF_MESH_BACKEND", "auto")
    use_pallas = (backend == "pallas"
                  or (backend == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        if os.environ.get("VANERF_KNN_CULL"):
            from .knn_pallas import nearest_vertex_d2_pallas_T_culled
            return nearest_vertex_d2_pallas_T_culled(query_T, verts)
        from .knn_pallas import nearest_vertex_d2_pallas_T
        return nearest_vertex_d2_pallas_T(query_T, verts)
    return nearest_vertex_d2(jnp.transpose(query_T, (1, 0)), verts,
                             chunk=chunk)


def nearest_vertex(query: jnp.ndarray, verts: jnp.ndarray,
                   chunk: int = 4096) -> jnp.ndarray:
    """Index of the nearest vertex for each query point.

    Exact difference-form distance (the expanded ``||v||^2 - 2 q.v`` form
    loses enough precision — bf16 MXU on TPU, fp32 cancellation elsewhere —
    to flip argmins, which changes which vertex features feed the fusion
    nets).  Chunked over queries so the (chunk, V, 3) temp stays on-chip.

    Args:
      query: (N, 3); verts: (V, 3).
    Returns:
      (N,) int32 argmin indices.
    """
    import os
    backend = os.environ.get("VANERF_MESH_BACKEND", "auto")
    use_pallas = (backend == "pallas"
                  or (backend == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        from .knn_pallas import nearest_vertex_pallas
        return nearest_vertex_pallas(query, verts)
    N = query.shape[0]
    if N <= chunk:
        d2 = jnp.sum((query[:, None] - verts[None]) ** 2, axis=-1)
        return jnp.argmin(d2, axis=-1).astype(jnp.int32)
    pad = (-N) % chunk
    q = jnp.pad(query, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    idx = jax.lax.map(
        lambda qc: jnp.argmin(
            jnp.sum((qc[:, None] - verts[None]) ** 2, axis=-1),
            axis=-1).astype(jnp.int32), q)
    return idx.reshape(-1)[:N]


def _take_batched(packed_both: jnp.ndarray, idx: jnp.ndarray,
                  mxu: bool = False) -> jnp.ndarray:
    """Batched in-bounds row gather (B, V, C)[B, N] -> (B, N, C).

    With ``mxu`` (inference only — no VJP), the lookup runs as a VMEM
    one-hot MXU contraction (ops/interp_mxu.py::mxu_row_gather) —
    bitwise-identical rows without paying the gather unit's row-rate
    floor.

    When the one-hot scatter policy fires, the batch dim is unrolled (it is
    small and static) so the table-grad VJP runs the MXU one-hot matmul
    scatter — which must not be vmapped (see ops/onehot_gather.py).
    """
    from .onehot_gather import onehot_scatter_enabled, take_rows
    B, V, _ = packed_both.shape
    if mxu:
        from .interp_mxu import mxu_row_gather, row_gather_viable
        if row_gather_viable(V):
            return jax.vmap(
                lambda a, i: mxu_row_gather(
                    a, i, interpret=jax.default_backend() != "tpu"))(
                packed_both, idx)
    if onehot_scatter_enabled(V, idx.shape[1]):
        return jnp.stack([take_rows(packed_both[b], idx[b])
                          for b in range(B)])
    take = jax.vmap(lambda a, i: a.at[i].get(mode="promise_in_bounds"))
    return take(packed_both, idx)


def knn_gather_1(query: jnp.ndarray, verts: jnp.ndarray,
                 vert_feat: jnp.ndarray, vert_vis: jnp.ndarray,
                 num_v: int, weight_by_vis: bool = True,
                 nn_idx: jnp.ndarray | None = None, mxu: bool = False):
    """K=1 nearest-vertex feature lookup for this-hand and other-hand.

    Parity with ``networks.py:27-33`` (``KNN_vis``) /
    ``networks.py:35-41`` (``KNN`` with weight_by_vis=False): the other-hand
    ("toh") features are the vertex arrays rolled by `num_v` (one hand's
    vertex count) so the *same* nearest index reads the mirrored hand.

    Args:
      query:     (B, N, 3) query points.
      verts:     (B, V, 3) vertex positions, V = 2*num_v.
      vert_feat: (B, V, C) per-vertex features.
      vert_vis:  (B, V, 1) per-vertex visibility (0/1).
      num_v:     vertices per hand.
      nn_idx:    optional precomputed (B, N) nearest-vertex indices — the
        argmin is identical for every fusion net querying the same points,
        so callers compute it once and share.
    Returns:
      feat_knn (B, N, C), feat_knn_toh (B, N, C),
      vis (B, N, 1), vis_toh (B, N, 1).
    """
    idx = (nn_idx if nn_idx is not None
           else jax.vmap(nearest_vertex)(query, verts))    # (B, N)
    # TPU gathers are row-count bound, so fuse everything one query row
    # needs into ONE gather: feat+vis packed channel-wise, and the
    # other-hand ("toh") row — verts rolled by one hand's vertex count —
    # appended as extra channels.  1 gather instead of the naive 4.
    packed = jnp.concatenate(
        [vert_feat, vert_vis.astype(vert_feat.dtype)], -1)
    packed_both = jnp.concatenate(
        [packed, jnp.roll(packed, -num_v, axis=1)], -1)    # (B, V, 2(C+1))
    # argmin indices are in-bounds by construction; the promise removes
    # jnp.take's out-of-bounds fill select on the gathered rows.
    g2 = _take_batched(packed_both, idx, mxu=mxu)
    C1 = packed.shape[-1]
    g, g_toh = g2[..., :C1], g2[..., C1:]
    f, v = g[..., :-1], g[..., -1:]
    f_toh, v_toh = g_toh[..., :-1], g_toh[..., -1:]
    if weight_by_vis:
        f = f * v
        f_toh = f_toh * v_toh
    return f, f_toh, v, v_toh


def knn_gather_raw(query: jnp.ndarray, verts: jnp.ndarray,
                   vert_feat: jnp.ndarray, vert_vis: jnp.ndarray,
                   num_v: int, nn_idx: jnp.ndarray | None = None,
                   mxu: bool = False):
    """The :func:`knn_gather_1` gather WITHOUT the split/vis-weighting.

    Returns the raw gathered rows (B, N, 2(C+1)) laid out as
    [feat_this (C) | vis_this (1) | feat_toh (C) | vis_toh (1)] — the
    fused query kernel (ops/fused_mlp.py) slices and vis-weights them in
    VMEM instead of materializing four weighted tensors in HBM.
    """
    idx = (nn_idx if nn_idx is not None
           else jax.vmap(nearest_vertex)(query, verts))    # (B, N)
    packed = jnp.concatenate(
        [vert_feat, vert_vis.astype(vert_feat.dtype)], -1)
    packed_both = jnp.concatenate(
        [packed, jnp.roll(packed, -num_v, axis=1)], -1)    # (B, V, 2(C+1))
    return _take_batched(packed_both, idx, mxu=mxu)
