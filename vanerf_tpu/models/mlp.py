"""MLP stacks with weight normalization, U-Net skips and multi-view pooling.

Parity targets: ``Linear``/``MLP``/``MLPUNet``/``MLPUNetFusion``/``PoolModule``
/``pool_ops`` (reference ``src/utils.py:609-880``).  These run per query
point, batched over (rays x samples): every layer is a Dense over the last
axis, which XLA maps onto the MXU as one big (B*V*N, C) matmul.
"""

from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def get_nl(name: Optional[str]):
    if name == "leakyrelu":
        return lambda x: nn.leaky_relu(x, 0.2)
    if name == "softplus":
        # torch Softplus(beta=100, threshold=20): linear above 20/100.
        return lambda x: jnp.where(
            x * 100.0 > 20.0, x, jnp.logaddexp(x * 100.0, 0.0) / 100.0)
    if name == "elu":
        return nn.elu
    if name == "tanh":
        return jnp.tanh
    if name == "sigmoid":
        return nn.sigmoid
    if name == "relu":
        return nn.relu
    if name in (None, "none", "None", ""):
        return None
    raise NotImplementedError(f"unsupported nl layer {name}")


class WNLinear(nn.Module):
    """Dense layer with weight normalization (torch ``weight_norm`` default
    dim: one gain per output unit).

    Accepts a LIST of inputs as a "virtual concat": `[p0, p1, ...] @ W ==
    concat(parts) @ W == sum_i parts_i @ W_i` — the concat of wide
    per-point features (e.g. the 294-ch positional encoding) costs ~1 ms
    per pass in HBM traffic on TPU, while the split matmuls read the parts
    where they already are.  Param shapes are identical either way."""
    features: int
    use_wn: bool = True

    @nn.compact
    def __call__(self, x):
        parts = x if isinstance(x, (list, tuple)) else (x,)
        in_f = sum(p.shape[-1] for p in parts)
        v = self.param("v", nn.initializers.lecun_normal(),
                       (in_f, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.use_wn:
            g = self.param("g", nn.initializers.ones, (self.features,))
            norm = jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12
            w = v * (g[None, :] / norm)
        else:
            w = v
        # follow the input compute dtype (params stay f32; the weight-norm
        # above is computed in f32, only the matmul runs in e.g. bf16)
        w = w.astype(parts[0].dtype)
        out = b.astype(parts[0].dtype)
        o = 0
        for p in parts:
            out = out + p @ w[o:o + p.shape[-1]]
            o += p.shape[-1]
        return out


class MLP(nn.Module):
    """Skip-connected MLP (utils.py:687-719)."""
    n_dims: Sequence[int]
    skip_layers: Sequence[int] = ()
    nl_layer: str = "softplus"
    norm: str = "weight"
    last_op: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        nl = get_nl(self.nl_layer)
        x0 = x
        n = len(self.n_dims) - 1
        for i in range(n):
            if i in self.skip_layers:
                x = jnp.concatenate([x, x0], -1)
            x = WNLinear(self.n_dims[i + 1],
                         use_wn=(self.norm == "weight" and i != n - 1),
                         name=f"l{i}")(x)
            if i != n - 1 and nl is not None:
                x = nl(x)
        last = get_nl(self.last_op)
        return last(x) if last is not None else x


class MLPUNet(nn.Module):
    """MLP with multi-scale image-feature skip inputs (utils.py:781-852)."""
    n_dims: Sequence[int]
    skip_dims: Sequence[int]
    skip_layers: Sequence[int]
    nl_layer: str = "softplus"
    norm: str = "weight"

    @nn.compact
    def __call__(self, x, feats: Sequence[jnp.ndarray]):
        """`x` may be a list of parts (virtual concat, see WNLinear)."""
        nl = get_nl(self.nl_layer)
        skip_dict = {j: i for i, j in enumerate(self.skip_layers)}
        n = len(self.n_dims) - 1
        for i in range(n):
            if i in skip_dict:
                f = feats[skip_dict[i]]
                if x is None:
                    x = f
                elif isinstance(x, (list, tuple)):
                    x = list(x) + [f]
                else:
                    x = jnp.concatenate([x, f], -1)
            x = WNLinear(self.n_dims[i + 1],
                         use_wn=(self.norm == "weight" and i != n - 1),
                         name=f"l{i}")(x)
            if i != n - 1 and nl is not None:
                x = nl(x)
        return x


def pool_views(x: jnp.ndarray, a: jnp.ndarray, w: Optional[jnp.ndarray],
               pool_types: Sequence[str]):
    """Masked/weighted pooling over the view axis (utils.py:854-880).

    Args:
      x: (B, V, N, C); a: (B, V, N, 1) validity; w: (B, V, N, 1) weights.
    Returns:
      pooled (B, N, len(pool_types)*C), valid (B, N, 1) bool.
    """
    a_sum = a.sum(1)
    if w is None:
        w = a / (a_sum[:, None] + 1e-6)
    ret = []
    if "max" in pool_types:
        ret.append(x.max(1))
    mean = (w * x).sum(1)
    if "mean" in pool_types:
        ret.append(mean)
    if "var" in pool_types:
        var = (w * (x - mean[:, None]) ** 2).sum(1)
        ret.append(var)
    valid = a_sum > 0.0
    return jnp.concatenate(ret, -1), valid


class MLPUNetFusion(nn.Module):
    """Per-view MLPUNet -> view pooling -> head MLP (utils.py:609-649).

    Call signature mirrors the reference forward: x is the spatial encoding
    (B, V, N, C), feats the fused image features, a the projection mask,
    w the boundary-smooth pixel weights.
    Returns (out, valid, x_view, x_pool) like ``utils.py:633-649``.
    """
    n_dims1: Sequence[int]
    n_dims2: Sequence[int]
    skip_dims: Sequence[int]
    skip_layers: Sequence[int]
    nl_layer: str = "softplus"
    norm: str = "weight"
    pool_types: Sequence[str] = ("mean",)

    @nn.compact
    def __call__(self, x, feats, a, w=None):
        x_view = MLPUNet(self.n_dims1, self.skip_dims, self.skip_layers,
                         self.nl_layer, self.norm, name="layers1")(x, feats)
        x_pool, valid = pool_views(x_view, a, w, self.pool_types)
        out = MLP(self.n_dims2, (), self.nl_layer, self.norm,
                  name="layers2")(x_pool)
        return out, valid, x_view, x_pool
