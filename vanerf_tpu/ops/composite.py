"""Volume compositing (alpha blending along rays).

Parity target: ``VANeRF.rgba2out`` (``src/model.py:1464-1494``).  The
SDF-residual -> density activation (sigmoid-beta, ``model.py:879-882``) is
applied here so the whole chain stays in one fused jit region.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sdf_activation(x: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """sigma = sigmoid(x / beta) / beta with beta clamped >= 2e-3
    (``model.py:879-882``; the clamp is a hard floor, not a projection of the
    parameter, so it stays differentiable above the floor)."""
    beta = jnp.maximum(beta, 2e-3)
    return jax.nn.sigmoid(x / beta) / beta


def rgba2out(rad: jnp.ndarray, sdf: jnp.ndarray, rgb: jnp.ndarray,
             z: jnp.ndarray, query_sdf: jnp.ndarray, beta: jnp.ndarray,
             use_sdf_prior: bool = True):
    """Composite per-sample predictions into per-ray outputs.

    Args:
      rad:  (B, N, D) masked ReLU'd radiance residual (pre-activation).
      sdf:  (B, N, D) network sdf channel.
      rgb:  (B, N, D, 3) per-sample color.
      z:    (B, N, D) sorted sample depths.
      query_sdf: (B, N, D) mesh-prior SDF at the samples.
      beta: scalar learnable sigmoid-beta.
    Returns:
      color (B, N, 3), depth (B, N), alpha (B, N), contrib (B, N, D),
      sdf_out (B, N).

    Matches ``model.py:1476-1494``: density = sigmoid(-(rad + query_sdf)/beta)
    / beta, alpha_i = 1 - exp(-density * dz), front-to-back transmittance.
    """
    if use_sdf_prior:
        alpha = sdf_activation(-(rad + query_sdf), beta)
    else:
        # sp_conv path: the network output is already a density
        # (model.py:1477-1478).
        alpha = rad
    dist = jnp.concatenate(
        [z[..., 1:] - z[..., :-1], jnp.full_like(z[..., :1], 1e10)], -1)
    contrib = 1.0 - jnp.exp(-alpha * dist)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(contrib[..., :1]),
                         1.0 - contrib[..., :-1]], -1), -1)
    contrib = contrib * trans                              # (B, N, D)

    color = (rgb * contrib[..., None]).sum(-2)             # (B, N, 3)
    acc = contrib.sum(-1)                                  # (B, N)
    sdf_out = (sdf * contrib).sum(-1) / (acc + 1e-8)
    depth = (z * contrib).sum(-1) / (acc + 1e-8)
    return color, depth, acc, contrib, sdf_out
