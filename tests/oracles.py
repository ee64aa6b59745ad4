"""Pure-numpy reference oracles for geometry kernels (slow, obviously right).

trimesh is not available in this image, so these double-check the JAX ops
against independently-written scalar implementations.
"""

import numpy as np


def point_triangle_dist_oracle(p, a, b, c):
    """Closest distance from a single point to a single triangle, scalar."""
    # Exhaustive: closest point among face projection, 3 edges, 3 verts.
    candidates = [a, b, c]
    for (u, v) in [(a, b), (b, c), (c, a)]:
        d = v - u
        t = np.dot(p - u, d) / max(np.dot(d, d), 1e-30)
        t = min(max(t, 0.0), 1.0)
        candidates.append(u + t * d)
    n = np.cross(b - a, c - a)
    nn = np.dot(n, n)
    if nn > 1e-30:
        # project p onto plane; check inside via barycentric
        t = np.dot(p - a, n) / nn
        q = p - t * n
        # barycentric
        v0, v1, v2 = b - a, c - a, q - a
        d00, d01, d11 = np.dot(v0, v0), np.dot(v0, v1), np.dot(v1, v1)
        d20, d21 = np.dot(v2, v0), np.dot(v2, v1)
        denom = d00 * d11 - d01 * d01
        if abs(denom) > 1e-30:
            w1 = (d11 * d20 - d01 * d21) / denom
            w2 = (d00 * d21 - d01 * d20) / denom
            if w1 >= 0 and w2 >= 0 and (w1 + w2) <= 1:
                candidates.append(q)
    return min(np.linalg.norm(p - q) for q in candidates)


def winding_number_oracle(p, verts, faces):
    """Generalized winding number of a point, scalar loop."""
    total = 0.0
    for f in faces:
        r1 = verts[f[0]] - p
        r2 = verts[f[1]] - p
        r3 = verts[f[2]] - p
        n1, n2, n3 = (np.linalg.norm(r) for r in (r1, r2, r3))
        num = np.dot(r1, np.cross(r2, r3))
        den = (n1 * n2 * n3 + np.dot(r1, r2) * n3 + np.dot(r1, r3) * n2
               + np.dot(r2, r3) * n1)
        total += 2.0 * np.arctan2(num, den)
    return total / (4.0 * np.pi)


def make_icosphere(subdiv=2, radius=1.0, center=(0.0, 0.0, 0.0)):
    """Watertight icosphere mesh (verts, faces)."""
    t = (1.0 + np.sqrt(5.0)) / 2.0
    verts = np.array([
        [-1, t, 0], [1, t, 0], [-1, -t, 0], [1, -t, 0],
        [0, -1, t], [0, 1, t], [0, -1, -t], [0, 1, -t],
        [t, 0, -1], [t, 0, 1], [-t, 0, -1], [-t, 0, 1]], dtype=np.float64)
    verts /= np.linalg.norm(verts, axis=1, keepdims=True)
    faces = np.array([
        [0, 11, 5], [0, 5, 1], [0, 1, 7], [0, 7, 10], [0, 10, 11],
        [1, 5, 9], [5, 11, 4], [11, 10, 2], [10, 7, 6], [7, 1, 8],
        [3, 9, 4], [3, 4, 2], [3, 2, 6], [3, 6, 8], [3, 8, 9],
        [4, 9, 5], [2, 4, 11], [6, 2, 10], [8, 6, 7], [9, 8, 1]],
        dtype=np.int64)
    for _ in range(subdiv):
        edge_mid = {}
        new_faces = []
        verts = list(verts)

        def midpoint(i, j):
            key = (min(i, j), max(i, j))
            if key not in edge_mid:
                m = (np.asarray(verts[i]) + np.asarray(verts[j])) / 2.0
                m /= np.linalg.norm(m)
                edge_mid[key] = len(verts)
                verts.append(m)
            return edge_mid[key]

        for (i, j, k) in faces:
            a, b, c = midpoint(i, j), midpoint(j, k), midpoint(k, i)
            new_faces += [[i, a, c], [j, b, a], [k, c, b], [a, b, c]]
        verts = np.asarray(verts)
        faces = np.asarray(new_faces, dtype=np.int64)
    verts = verts * radius + np.asarray(center)
    return verts.astype(np.float32), faces.astype(np.int32)
