"""Ray sampling: stratified coarse samples + inverse-CDF importance samples.

Parity targets: stratified jitter ``model.py:1222-1232``; hierarchical
importance sampling ``VANeRF.importance_sample`` (``model.py:1424-1462``).
Everything is static-shape and jit/vmap friendly (searchsorted + gathers).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_sample(znear: jnp.ndarray, zfar: jnp.ndarray, n_samples: int,
                      rng: jax.Array | None = None, uniform: bool = False):
    """Stratified depths along each ray.

    Args:
      znear, zfar: (..., 1) per-ray bounds.
      n_samples: number of coarse samples (static).
      rng: PRNG key for jitter (required unless `uniform`).
      uniform: midpoint (deterministic) sampling when True.
    Returns:
      z: (..., n_samples) sorted sample depths.
    """
    z = jnp.linspace(0.0, 1.0, n_samples, dtype=znear.dtype)
    z = jnp.broadcast_to(z, znear.shape[:-1] + (n_samples,))
    if not uniform:
        z_mid = 0.5 * (z[..., 1:] + z[..., :-1])
        z_lower = jnp.concatenate([z[..., :1], z_mid], -1)
        z_upper = jnp.concatenate([z_mid, z[..., -1:]], -1)
        u = jax.random.uniform(rng, z.shape, dtype=z.dtype)
        z = z_lower + u * (z_upper - z_lower)
    return znear + (zfar - znear) * z


def importance_sample(contrib: jnp.ndarray, z: jnp.ndarray, n_samples: int,
                      rng: jax.Array | None = None, uniform: bool = False):
    """Inverse-CDF importance sampling of new depths.

    Args:
      contrib: (B, N, D-1) per-bin weights (detached by caller).
      z:       (B, N, D) bin edge depths, sorted.
      n_samples: number of new samples (static).
    Returns:
      (B, N, n_samples) new depths (unsorted).

    Mirrors ``model.py:1424-1462`` exactly (+1e-5 floor, right-searchsorted,
    degenerate-bin guard).
    """
    assert contrib.shape[-1] == z.shape[-1] - 1
    contrib = contrib + 1e-5
    pdf = contrib / contrib.sum(-1, keepdims=True)
    cdf = jnp.cumsum(pdf, -1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], -1)  # (B,N,D)

    if uniform:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=z.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(rng, cdf.shape[:-1] + (n_samples,),
                               dtype=z.dtype)

    # vectorized right-searchsorted: count of cdf bins <= u.  The vmapped
    # jnp.searchsorted lowers to a serial while-loop on TPU (~13 ms/step);
    # the dense comparison is (B, N, S, D) elementwise and fuses away.
    D = cdf.shape[-1]
    idx_raw = jnp.sum((u[..., :, None] >= cdf[..., None, :]),
                      axis=-1).astype(jnp.int32)
    idx = jnp.clip(idx_raw, None, D - 1)

    # ONE packed gather instead of four (TPU gathers are row-count bound):
    # packed[j] = [cdf[max(j-1,0)], cdf[j], z[max(j-1,0)], z[j]].
    packed = jnp.stack(
        [jnp.concatenate([cdf[..., :1], cdf[..., :-1]], -1), cdf,
         jnp.concatenate([z[..., :1], z[..., :-1]], -1), z], -1)  # (B,N,D,4)
    g = jnp.take_along_axis(packed, idx[..., None], axis=-2)      # (B,N,S,4)
    # idx_raw == D (u at/above the last cdf edge): the reference clips both
    # prev and next to D-1, so prev falls back to the "next" slot there.
    over = (idx_raw >= D)
    cdf_prev = jnp.where(over, g[..., 1], g[..., 0])
    cdf_next = g[..., 1]
    z_prev = jnp.where(over, g[..., 3], g[..., 2])
    z_next = g[..., 3]

    num = u - cdf_prev
    den = cdf_next - cdf_prev
    den = jnp.where(den < 1e-5, 1.0, den)
    return z_prev + (num / den) * (z_next - z_prev)
