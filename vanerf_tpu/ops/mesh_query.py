"""Point-to-mesh queries: exact distance, winding-number sign, visibility.

TPU-native replacement for the reference's CUDA mesh ops
(``src/lib/dataset/mesh_util.py:498-524`` built on kaolin
``point_to_mesh_distance``/``check_sign`` and pytorch3d): one fused,
statically-shaped XLA computation, batched over query chunks.  The sign is
computed with generalized winding numbers (the robust inside/outside test the
reference itself carries at ``src/lib/common/render_utils.py:28-108``), which
handles interpenetrating two-hand meshes correctly.

Hot-path structure (per chunk of points x all faces):
  * exact point-triangle squared distance (Ericson region method, branchless
    `where` chains -> VPU friendly),
  * running min + argmin over faces,
  * solid-angle accumulation for the winding number.
XLA fuses the elementwise chain into the reductions so the (chunk, F)
intermediates never round-trip HBM.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def point_triangle_sq_dist(p: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray,
                           c: jnp.ndarray) -> jnp.ndarray:
    """Exact squared distance from points to triangles (broadcasting).

    Args:
      p, a, b, c: (..., 3) broadcast-compatible.
    Returns:
      (...,) squared distances.
    """
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = _dot(ab, ap)
    d2 = _dot(ac, ap)
    bp = p - b
    d3 = _dot(ab, bp)
    d4 = _dot(ac, bp)
    cp = p - c
    d5 = _dot(ab, cp)
    d6 = _dot(ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    denom_face = va + vb + vc
    v_face = vb / jnp.where(denom_face == 0, 1.0, denom_face)
    w_face = vc / jnp.where(denom_face == 0, 1.0, denom_face)

    # Region tests (Ericson, Real-Time Collision Detection 5.1.5).
    in_vert_a = (d1 <= 0) & (d2 <= 0)
    in_vert_b = (d3 >= 0) & (d4 <= d3)
    in_vert_c = (d6 >= 0) & (d5 <= d6)
    in_edge_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    in_edge_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    in_edge_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    eps = 1e-20
    t_ab = d1 / jnp.maximum(d1 - d3, eps)
    t_ac = d2 / jnp.maximum(d2 - d6, eps)
    t_bc = (d4 - d3) / jnp.maximum((d4 - d3) + (d5 - d6), eps)

    q = a + v_face[..., None] * ab + w_face[..., None] * ac
    q = jnp.where(in_edge_bc[..., None], b + t_bc[..., None] * (c - b), q)
    q = jnp.where(in_edge_ac[..., None], a + t_ac[..., None] * ac, q)
    q = jnp.where(in_edge_ab[..., None], a + t_ab[..., None] * ab, q)
    q = jnp.where(in_vert_c[..., None], c, q)
    q = jnp.where(in_vert_b[..., None], b, q)
    q = jnp.where(in_vert_a[..., None], a, q)

    d = p - q
    return _dot(d, d)


def _solid_angle(p, a, b, c):
    """Van Oosterom-Strackee solid angle of triangle (a,b,c) seen from p.

    Parity with reference ``render_utils.py:28-77`` (atan2 form, robust).
    """
    r1 = a - p
    r2 = b - p
    r3 = c - p
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    n3 = jnp.linalg.norm(r3, axis=-1)
    num = _dot(r1, jnp.cross(r2, r3))
    den = (n1 * n2 * n3 + _dot(r1, r2) * n3 + _dot(r1, r3) * n2
           + _dot(r2, r3) * n1)
    return 2.0 * jnp.arctan2(num, den)


def _chunk_query(pts_chunk, tri_a, tri_b, tri_c, with_winding):
    """(P, 3) points vs (F, 3) triangle corners -> min dist/argmin/winding."""
    p = pts_chunk[:, None, :]                       # (P, 1, 3)
    d2 = point_triangle_sq_dist(p, tri_a[None], tri_b[None], tri_c[None])
    idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    dmin = jnp.take_along_axis(d2, idx[:, None], axis=-1)[:, 0]
    if with_winding:
        omega = _solid_angle(p, tri_a[None], tri_b[None], tri_c[None])
        winding = omega.sum(-1) / (4.0 * jnp.pi)
    else:
        winding = jnp.zeros_like(dmin)
    return dmin, idx, winding


def _use_pallas() -> bool:
    import os
    backend = os.environ.get("VANERF_MESH_BACKEND", "auto")
    if backend == "pallas":
        return True
    if backend == "xla":
        return False
    return jax.default_backend() == "tpu"


@partial(jax.jit, static_argnames=("chunk", "with_winding"))
def point_mesh_query(points: jnp.ndarray, triangles: jnp.ndarray,
                     chunk: int = 2048, with_winding: bool = True):
    """Exact point->mesh distance, closest-face index and winding number.

    Dispatches to the fused Pallas kernel on TPU
    (:mod:`vanerf_tpu.ops.mesh_query_pallas`) and to the chunked XLA map
    elsewhere; override with VANERF_MESH_BACKEND={pallas,xla}.

    Args:
      points:    (N, 3) query points.
      triangles: (F, 3, 3) face corner positions.
      chunk:     points per inner tile (static; bounds the (chunk, F) temps).
    Returns:
      sq_dist (N,), face_idx (N,) int32, winding (N,).
    """
    if _use_pallas():
        from .mesh_query_pallas import point_mesh_query_pallas
        return point_mesh_query_pallas(points, triangles,
                                       with_winding=with_winding)
    N = points.shape[0]
    pad = (-N) % chunk
    pts = jnp.pad(points, ((0, pad), (0, 0)))
    pts = pts.reshape(-1, chunk, 3)
    ta, tb, tc = triangles[:, 0], triangles[:, 1], triangles[:, 2]

    d2, idx, w = jax.lax.map(
        lambda pc: _chunk_query(pc, ta, tb, tc, with_winding), pts)
    return (d2.reshape(-1)[:N], idx.reshape(-1)[:N], w.reshape(-1)[:N])


def winding_number(points: jnp.ndarray, triangles: jnp.ndarray,
                   chunk: int = 2048) -> jnp.ndarray:
    """Generalized winding number of each point w.r.t. the mesh."""
    _, _, w = point_mesh_query(points, triangles, chunk=chunk)
    return w


def barycentric_of_projection(points: jnp.ndarray,
                              tri: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coords of each point's projection onto its triangle.

    Parity with ``mesh_util.py:321-356`` (Heidrich JGT'05).
    Args:
      points: (N, 3); tri: (N, 3, 3).
    Returns:
      (N, 3) weights (1-b1-b2, b1, b2).
    """
    v0, v1, v2 = tri[:, 0], tri[:, 1], tri[:, 2]
    u = v1 - v0
    v = v2 - v0
    n = jnp.cross(u, v)
    s = _dot(n, n)
    s = jnp.where(s == 0, 1e-6, s)
    w = points - v0
    b2 = _dot(jnp.cross(u, w), n) / s
    b1 = _dot(jnp.cross(w, v), n) / s
    return jnp.stack([1.0 - b1 - b2, b1, b2], axis=-1)


def point_mesh_sdf(verts: jnp.ndarray, faces: jnp.ndarray,
                   points: jnp.ndarray, chunk: int = 2048):
    """Signed distance (negative inside) + closest face per query point.

    Parity with ``mesh_util.py:498-511``: sqrt(residual + 1e-6) distance,
    sign = -1 inside (winding > 0.5), +1 outside.

    Args:
      verts: (V, 3); faces: (F, 3) int; points: (N, 3).
    Returns:
      sdf (N,), face_idx (N,) int32.
    """
    tri = verts[faces]                                   # (F, 3, 3)
    d2, idx, w = point_mesh_query(points, tri, chunk=chunk)
    dist = jnp.sqrt(d2 + 1e-6)
    sign = jnp.where(w > 0.5, -1.0, 1.0)
    return dist * sign, idx


def cal_vis_sdf_fast(verts: jnp.ndarray, faces: jnp.ndarray,
                     points: jnp.ndarray, vert_vis: jnp.ndarray,
                     chunk: int = 2048):
    """cal_vis_sdf without the closest-face output (the renderer never uses
    it — nor does the reference's fusion net, networks.py:75).  On TPU the
    visibility interpolation happens INSIDE the pallas kernel, saving the
    post-kernel closest-face gathers.

    Returns sdf (N,), query_vis (N, 1).
    """
    if _use_pallas():
        import os
        from .mesh_query_pallas import point_mesh_query_vis_pallas
        tri = verts[faces]
        face_vis = vert_vis[..., 0][faces]               # (F, 3)
        mode = os.environ.get("VANERF_WINDING", "ray")
        d2, _idx, w, qv = point_mesh_query_vis_pallas(points, tri, face_vis,
                                                      mode=mode)
        dist = jnp.sqrt(d2 + 1e-6)
        sign = jnp.where(w > 0.5, -1.0, 1.0)
        qvis = (qv >= 1e-1).astype(verts.dtype)[:, None]
        return dist * sign, qvis
    sdf, query_vis, _cface = cal_vis_sdf(verts, faces, points, vert_vis,
                                         chunk=chunk)
    return sdf, query_vis


def cal_vis_sdf(verts: jnp.ndarray, faces: jnp.ndarray, points: jnp.ndarray,
                vert_vis: jnp.ndarray, chunk: int = 2048):
    """SDF + interpolated visibility + closest-face ids per query point.

    Functional parity with ``cal_vis_sdf_batch`` (``mesh_util.py:498-524``)
    minus the vertex-visibility rasterization, which is computed once per
    view by :func:`vanerf_tpu.ops.rasterize.vertex_visibility` and passed in
    (the reference recomputes it inside every SDF call; hoisting it is pure
    win and bit-equivalent).

    Args:
      verts: (V, 3) fused two-hand mesh vertices (world).
      faces: (F, 3) int faces.
      points: (N, 3) query points.
      vert_vis: (V, 1) per-vertex visibility in the source view.
    Returns:
      sdf (N,), query_vis (N, 1) float 0/1, closest_face (N, 3) int32
      (vertex ids of the closest face).
    """
    sdf, face_idx = point_mesh_sdf(verts, faces, points, chunk=chunk)
    closest_face = faces[face_idx]                       # (N, 3)
    tri = verts[closest_face]                            # (N, 3, 3)
    bary = barycentric_of_projection(points, tri)        # (N, 3)
    vis_tri = vert_vis[closest_face][..., 0]             # (N, 3)
    q_vis = (vis_tri * bary).sum(-1)
    query_vis = (q_vis >= 1e-1).astype(verts.dtype)[:, None]
    return sdf, query_vis, closest_face.astype(jnp.int32)


def blocked_order(P: int, S: int, ray_block: int | None = None,
                  s_block: int | None = None):
    """Static block sizes for the spatially-coherent point layout.

    Points come ray-major ((P rays) x (S samples), sample fastest); a
    128-point kernel tile then spans two full rays — a bbox as long as the
    whole ray.  Re-ordering into (ray_block x s_block) tiles (16 adjacent
    pixels x 8 consecutive depths) makes tiles compact in all three
    dimensions, which is what the culled kernel's AABB tests feed on.
    Falls back to identity blocks when shapes don't divide.

    Defaults match the kernel's 128-point tiles; tune together with
    VANERF_MESH_TILE_P via VANERF_BLOCK_RAYS / VANERF_BLOCK_SAMPLES
    (ray_block * s_block should equal the kernel tile size — point tiles
    ride the sublane axis, so 8-multiples below 128 are legal there).
    """
    import os
    if ray_block is None:
        ray_block = int(os.environ.get("VANERF_BLOCK_RAYS", "16"))
    if s_block is None:
        s_block = int(os.environ.get("VANERF_BLOCK_SAMPLES", "8"))
    if P % ray_block or S % s_block:
        return None
    return (ray_block, s_block)


def to_blocked(x: jnp.ndarray, P: int, S: int, rb: int, sb: int):
    """(N=P*S, ...) ray-major -> blocked tile order (pure relayout)."""
    lead = x.shape[1:]
    x = x.reshape(P // rb, rb, S // sb, sb, *lead)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(P * S, *lead)


def from_blocked(x: jnp.ndarray, P: int, S: int, rb: int, sb: int):
    """Inverse of :func:`to_blocked`."""
    lead = x.shape[1:]
    x = x.reshape(P // rb, S // sb, rb, sb, *lead)
    x = jnp.swapaxes(x, 1, 2)
    return x.reshape(P * S, *lead)


def _morton_order(centroids: jnp.ndarray) -> jnp.ndarray:
    """Morton (z-curve) sort order of 3D points — spatially coherent
    chunks give the culled kernel tight per-chunk bounding boxes."""
    lo = centroids.min(0)
    hi = centroids.max(0)
    q = ((centroids - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0)
    q = jnp.clip(q, 0, 1023).astype(jnp.uint32)

    def spread(x):  # interleave 10 bits with two zero bits
        x = (x | (x << 16)) & jnp.uint32(0x030000FF)
        x = (x | (x << 8)) & jnp.uint32(0x0300F00F)
        x = (x | (x << 4)) & jnp.uint32(0x030C30C3)
        x = (x | (x << 2)) & jnp.uint32(0x09249249)
        return x

    code = spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)
    return jnp.argsort(code)


def prepare_culled_mesh(verts: jnp.ndarray, faces: jnp.ndarray,
                        vert_vis: jnp.ndarray):
    """One-time per-mesh preparation for :func:`cal_vis_sdf_prepared`.

    Morton-sorts the faces (spatially compact 128-face chunks for the
    culled kernel's AABB tests — the closest-face index is discarded
    downstream, so only the per-face inputs need permuting) and builds the
    kernel's transposed corner/visibility/crossing-constant arrays.  Also
    keeps the raw mesh for the non-TPU fallback.
    """
    out = {"verts": verts, "faces": faces, "vert_vis": vert_vis}
    if _use_pallas():
        from .mesh_query_pallas import prepare_mesh_ray
        # center the mesh (and, below, the query points) so coordinates
        # stay O(hand size): the kernel's |p|^2 - 2 p.a + |a|^2 corner
        # forms would lose precision at |p| ~ meters.
        center = 0.5 * (verts.min(0) + verts.max(0))
        tri = verts[faces] - center
        face_vis = vert_vis[..., 0][faces]
        order = _morton_order(tri.mean(1))
        tri = jnp.take(tri, order, axis=0)
        face_vis = jnp.take(face_vis, order, axis=0)
        out["prep"] = prepare_mesh_ray(tri, face_vis)
        out["center"] = center
    return out


def _far_tiles(ub_b: jnp.ndarray, far2: float):
    """Per-kernel-tile far flags + their per-point broadcast.

    A tile (TILE_P consecutive points in the kernel's layout) is "far"
    when EVERY point's certified squared-distance upper bound exceeds
    ``far2``: the exact nearest-face search is then skipped and the
    nearest-vertex distance stands in (error bounded by the face covering
    radius; such points are at least sqrt(far2) from the surface, where
    the sigmoid-beta density is saturated).  The winding-number sign stays
    exact.  Requires len(ub_b) % TILE_P == 0 (callers guard).
    """
    from .mesh_query_pallas import TILE_P
    far_t = ub_b.reshape(-1, TILE_P).min(1) > far2
    return far_t, jnp.repeat(far_t, TILE_P)


def cal_vis_sdf_prepared(mesh: dict, points: jnp.ndarray,
                         ub_d2: jnp.ndarray, n_samples: int | None = None,
                         chunk: int = 2048, far2: float | None = None):
    """cal_vis_sdf_fast with branch-and-bound face culling (TPU).

    Args:
      mesh: output of :func:`prepare_culled_mesh`.
      points: (N, 3) in ray-major order (rays x n_samples, sample fastest).
      ub_d2: (N,) certified squared-distance upper bound per point (the
        nearest-vertex squared distance from the KNN kernel).
      n_samples: samples per ray — enables the blocked spatial relayout.
      far2: optional squared far-field threshold (see :func:`_far_tiles`).
        Far points return |sdf| = sqrt(ub_d2 + 1e-6) with the exact
        winding sign and query_vis = 0 — callers substitute the
        nearest-vertex visibility via the returned mask.

    Point layout note: a data-dependent Morton sort of the points (in
    place of the static 16x8 blocked relayout) was probed and REJECTED —
    for ray-structured point sets the blocked tiles are already
    spatially compact (morton wins only +0.5 ms/call on the kernel)
    while the device-side argsort + permute + inverse costs ~6.6 ms
    (tools/morton_probe.py, docs/perf.md 2026-08-20).
    Returns sdf (N,), query_vis (N, 1), far (N,) bool or None.
    """
    from .mesh_query_pallas import TILE_P
    N = points.shape[0]
    if far2 is not None and N % TILE_P != 0:
        far2 = None
    if not _use_pallas():
        sdf, qvis = cal_vis_sdf_fast(mesh["verts"], mesh["faces"], points,
                                     mesh["vert_vis"], chunk=chunk)
        if far2 is None:
            return sdf, qvis, None
        # identical tier rule as the kernel path: tiles over the kernel's
        # (blocked) point order
        blocks = None
        if n_samples is not None and N % n_samples == 0:
            blocks = blocked_order(N // n_samples, n_samples)
        if blocks is not None:
            rb, sb = blocks
            P = N // n_samples
            ub_b = to_blocked(ub_d2, P, n_samples, rb, sb)
            _ft, far_b = _far_tiles(ub_b, far2)
            far = from_blocked(far_b, P, n_samples, rb, sb)
        else:
            _ft, far = _far_tiles(ub_d2, far2)
        sign = jnp.where(sdf < 0, -1.0, 1.0)
        sdf = jnp.where(far, sign * jnp.sqrt(ub_d2 + 1e-6), sdf)
        qvis = jnp.where(far[:, None], 0.0, qvis)
        return sdf, qvis, far
    from .mesh_query_pallas import point_mesh_query_vis_culled
    points = points - mesh["center"]          # see prepare_culled_mesh
    blocks = None
    if n_samples is not None and N % n_samples == 0:
        blocks = blocked_order(N // n_samples, n_samples)
    if blocks is not None:
        rb, sb = blocks
        P = N // n_samples
        pts_b = to_blocked(points, P, n_samples, rb, sb)
        ub_b = to_blocked(ub_d2, P, n_samples, rb, sb)
    else:
        pts_b, ub_b = points, ub_d2

    far_t = far_b = None
    if far2 is not None:
        far_t, far_b = _far_tiles(ub_b, far2)

    d2, _idx, w, qv = point_mesh_query_vis_culled(
        pts_b, None, None, ub_b, prep=mesh["prep"], far_t=far_t)

    far = far_b
    if blocks is not None:
        cols = [d2, w, qv]
        if far_b is not None:
            cols.append(far_b.astype(d2.dtype))
        packed = jnp.stack(cols, -1)
        packed = from_blocked(packed, P, n_samples, rb, sb)
        d2, w, qv = packed[:, 0], packed[:, 1], packed[:, 2]
        if far_b is not None:
            far = packed[:, 3] > 0.5
    dist = jnp.sqrt(d2 + 1e-6)
    sign = jnp.where(w > 0.5, -1.0, 1.0)
    qvis = (qv >= 1e-1).astype(points.dtype)[:, None]
    return dist * sign, qvis, far


def cal_vis_sdf_prepared_T(mesh: dict, points_T: jnp.ndarray,
                           ub_d2: jnp.ndarray,
                           n_samples: int | None = None, chunk: int = 2048,
                           rays_hw: tuple | None = None,
                           far2: float | None = None):
    """Transposed-input :func:`cal_vis_sdf_prepared`.

    Takes (3, N) points (the packed TPU layout — see
    ``point_mesh_query_vis_culled_T``) and keeps every relayout
    (centering, ray/sample blocking, output unblocking) in packed
    coordinate-major form.  Bit-identical results.

    rays_hw: optional (H, W) shape of the ray grid (rays row-major) —
    enables 2-D pixel blocking when VANERF_BLOCK_2D is set.
    far2: optional squared far-field threshold (see
    :func:`cal_vis_sdf_prepared`).
    """
    from .mesh_query_pallas import TILE_P
    N = points_T.shape[1]
    if far2 is not None and N % TILE_P != 0:
        far2 = None
    if not _use_pallas():
        sdf, qvis, far = cal_vis_sdf_prepared(
            mesh, jnp.transpose(points_T, (1, 0)), ub_d2,
            n_samples=n_samples, chunk=chunk, far2=far2)
        return sdf, qvis, far
    from .mesh_query_pallas import point_mesh_query_vis_culled_T
    points_T = points_T - mesh["center"][:, None]
    blocks = blocks2d = None
    if n_samples is not None and N % n_samples == 0:
        if rays_hw is not None and rays_hw[0] * rays_hw[1] * n_samples == N:
            blocks2d = blocked2d_order(rays_hw[0], rays_hw[1], n_samples)
        if blocks2d is None:
            blocks = blocked_order(N // n_samples, n_samples)
    if blocks2d is not None:
        H, W = rays_hw
        bh, bw, sb = blocks2d
        pts_b = _to_blocked2d_ax1(points_T, H, W, n_samples, bh, bw, sb)
        ub_b = _to_blocked2d_ax1(ub_d2[None], H, W, n_samples, bh, bw,
                                 sb)[0]
    elif blocks is not None:
        rb, sb = blocks
        P = N // n_samples
        # blocked relayout along the packed point axis: (3, N) -> (3, N)
        pts_b = _to_blocked_ax1(points_T, P, n_samples, rb, sb)
        ub_b = to_blocked(ub_d2, P, n_samples, rb, sb)
    else:
        pts_b, ub_b = points_T, ub_d2

    far_t = far_b = None
    if far2 is not None:
        far_t, far_b = _far_tiles(ub_b, far2)

    d2, _idx, w, qv = point_mesh_query_vis_culled_T(
        pts_b, None, None, ub_b, prep=mesh["prep"], far_t=far_t)

    far = far_b
    if blocks2d is not None or blocks is not None:
        cols = [d2, w, qv]
        if far_b is not None:
            cols.append(far_b.astype(d2.dtype))
        packed = jnp.stack(cols, 0)                           # (k, N) packed
        if blocks2d is not None:
            packed = _from_blocked2d_ax1(packed, rays_hw[0], rays_hw[1],
                                         n_samples, bh, bw, sb)
        else:
            packed = _from_blocked_ax1(packed, P, n_samples, rb, sb)
        d2, w, qv = packed[0], packed[1], packed[2]
        if far_b is not None:
            far = packed[3] > 0.5
    dist = jnp.sqrt(d2 + 1e-6)
    sign = jnp.where(w > 0.5, -1.0, 1.0)
    qvis = (qv >= 1e-1).astype(points_T.dtype)[:, None]
    return dist * sign, qvis, far


def _to_blocked_ax1(x: jnp.ndarray, P: int, S: int, rb: int, sb: int):
    """:func:`to_blocked` along axis 1 of a (C, N=P*S) array."""
    C = x.shape[0]
    x = x.reshape(C, P // rb, rb, S // sb, sb)
    x = jnp.swapaxes(x, 2, 3)
    return x.reshape(C, P * S)


def _from_blocked_ax1(x: jnp.ndarray, P: int, S: int, rb: int, sb: int):
    """Inverse of :func:`_to_blocked_ax1`."""
    C = x.shape[0]
    x = x.reshape(C, P // rb, S // sb, rb, sb)
    x = jnp.swapaxes(x, 2, 3)
    return x.reshape(C, P * S)


def blocked2d_order(H: int, W: int, S: int):
    """Optional 2-D pixel blocking (VANERF_BLOCK_2D="bh,bw,sb").

    The 1-D blocking groups `ray_block` CONSECUTIVE pixels — a row strip
    whose bbox is long in one image axis.  A (bh x bw) pixel block x sb
    depths is compact in all three world dimensions, tightening the
    culled kernel's per-tile AABBs.  Returns (bh, bw, sb) or None.
    """
    import os
    spec = os.environ.get("VANERF_BLOCK_2D", "")
    if not spec:
        return None
    try:
        bh, bw, sb = (int(t) for t in spec.replace("x", ",").split(","))
    except ValueError:
        return None
    if H % bh or W % bw or S % sb:
        return None
    return bh, bw, sb


def _to_blocked2d_ax1(x, H, W, S, bh, bw, sb):
    """(C, N=H*W*S) row-major rays -> (bh x bw x sb) tile order."""
    C = x.shape[0]
    x = x.reshape(C, H // bh, bh, W // bw, bw, S // sb, sb)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6))
    return x.reshape(C, H * W * S)


def _from_blocked2d_ax1(x, H, W, S, bh, bw, sb):
    """Inverse of :func:`_to_blocked2d_ax1`."""
    C = x.shape[0]
    x = x.reshape(C, H // bh, W // bw, S // sb, bh, bw, sb)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3, 6))
    return x.reshape(C, H * W * S)


def cal_vis_sdf_cull(verts: jnp.ndarray, faces: jnp.ndarray,
                     points: jnp.ndarray, vert_vis: jnp.ndarray,
                     ub_d2: jnp.ndarray, n_samples: int | None = None,
                     chunk: int = 2048):
    """Single-shot convenience wrapper over prepare + query.

    Returns (sdf, query_vis, far) like :func:`cal_vis_sdf_prepared`
    (far is always None here — no ``far2`` threshold is exposed).
    """
    mesh = prepare_culled_mesh(verts, faces, vert_vis)
    return cal_vis_sdf_prepared(mesh, points, ub_d2, n_samples=n_samples,
                                chunk=chunk)
