"""Keypoint-relative spatial (positional) encoding — pure functions.

Parity target: ``SpatialEncoder`` (reference ``src/spatial.py:4-134``).  The
encoder has no learnable parameters, so it is a plain function here (the
reference wraps it in an nn.Module only for the buffer).  All 10 ``sp_type``
variants are implemented; the shipped configs use ``rel_z_decay``
(``configs/vanerf.json:51``).

Model-space variants (``mxyz``/``rel_mxyz``, ref ``spatial.py:95-98,
125-133``) take the query points through a per-batch model transform
``T``.  Upstream these are UNREACHABLE as written: the reference never
puts a ``'T'`` key into ``sp_data`` (``model.py:318-325`` sets
``hT = None`` and only ever adds ``extrin``/``kpt3d``), so selecting
them raises KeyError there — and ``rel_mxyz`` additionally references an
undefined name ``vpt3do`` (NameError; clearly intended ``kpt3do``).
Here they are real: pass ``model_T`` (B, 4, 4) — the renderer forwards
``batch['model_T']`` — and ``rel_mxyz`` implements the intended
keypoint-relative model-space math.
"""

from __future__ import annotations

import dataclasses
import os

import jax.numpy as jnp
import numpy as np


def position_embedding(x: jnp.ndarray, nlevels: int,
                       scale: float = 1.0,
                       weight: jnp.ndarray | None = None,
                       return_parts: bool = False):
    """[x, sin(pi x), cos(pi x), sin(2 pi x), ...] (spatial.py:19-43).

    Octave frequencies are generated with double-angle recurrences
    (sin 2a = 2 sin a cos a, cos 2a = 1 - 2 sin^2 a): one sin+cos
    transcendental pair per element instead of `nlevels` — the PE is one of
    the hot VPU ops at 262k points/step.  Layout matches the reference:
    [x, sin_0, cos_0, sin_1, cos_1, ...] per level.
    """
    if nlevels <= 0:
        out = x if weight is None else x * weight
        return [out] if return_parts else out
    a = (scale * np.pi) * x
    if os.environ.get("VANERF_PE_DIRECT", "0") != "0":
        # VANERF_PE_DIRECT=1: one independent sin/cos pair per octave
        # (the reference's own formulation, spatial.py:19-43).  More
        # transcendentals than the recurrence, but each part is a pure
        # function of `a`, so XLA can fuse the whole PE into the wide
        # concat instead of materializing the (N, 42) tuple of recurrence
        # intermediates (each lane-padded 42->128 in HBM).
        parts = [x]
        for lv in range(nlevels):
            f = float(2 ** lv) * a
            parts.append(jnp.sin(f))
            parts.append(jnp.cos(f))
    else:
        s = jnp.sin(a)
        c = jnp.cos(a)
        parts = [x]
        for _ in range(nlevels):
            parts.append(s)
            parts.append(c)
            s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
    if weight is not None:
        # per-part weighting (rel_z_decay) applied pre-concat — avoids the
        # (N, 1+2L, C) reshape round-trip, which XLA was materializing with
        # a hostile layout (~4.5 ms/step).
        parts = [p * weight for p in parts]
    if return_parts:
        # callers can feed the parts straight into WNLinear's virtual
        # concat, skipping the wide-feature materialization entirely
        return parts
    return jnp.concatenate(parts, -1)


@dataclasses.dataclass(frozen=True)
class SpatialEncoder:
    sp_level: int = 3
    sp_type: str = "rel_z_decay"
    scale: float = 1.0
    n_kpt: int = 42
    sigma: float = 0.1
    center: tuple = (0.0, 0.0, 0.0)

    def get_dim(self) -> int:
        """Output feature width (spatial.py:45-57)."""
        if self.sp_type in ("z", "rel_z", "rel_z_decay"):
            if "rel" in self.sp_type:
                return (1 + 2 * self.sp_level) * self.n_kpt
            return 1 + 2 * self.sp_level
        if "xyz" in self.sp_type:
            if "rel" in self.sp_type:
                return (1 + 2 * self.sp_level) * 3 * self.n_kpt
            return (1 + 2 * self.sp_level) * 3
        return 0

    def __call__(self, *, v, pts, z, xy, extrin, kpt3d=None, n_view=1,
                 model_T=None, return_parts=False):
        """Encode query points (spatial.py:59-134).

        Args:
          v:   (B*V, N, 3) world points after view expansion.
          pts: (B, N, 3) world points before view expansion.
          z:   (B*V, N, 1) normalized depth.
          xy:  (B*V, N, 2) normalized pixel coords.
          extrin: (B*V, 4, 4) world->camera.
          kpt3d: (B, K, 3) keypoints (for 'rel_*' variants).
        Returns:
          (B*V, N, dim) or None.
        """
        Rt = extrin
        cxyz = v @ jnp.swapaxes(Rt[:, :3, :3], -1, -2) + Rt[:, None, :3, 3]
        t = self.sp_type

        if "rel" in t:
            assert kpt3d is not None and kpt3d.shape[1] == self.n_kpt
            k = jnp.repeat(kpt3d, n_view, axis=0) if n_view != 1 else kpt3d
            kptxyz = k @ jnp.swapaxes(Rt[:, :3, :3], -1, -2) + Rt[:, None, :3, 3]

        if t == "z":
            return position_embedding(z, self.sp_level)
        if t == "ixyz":
            return position_embedding(
                jnp.concatenate([xy, z], -1), self.sp_level)
        if t == "cxyz":
            return position_embedding(cxyz, self.sp_level)
        if t == "wxyz":
            c = jnp.asarray(self.center)
            return position_embedding(
                self.scale * (v - c[None, None]), self.sp_level)
        if t == "rel_z":
            dz = self.scale * (cxyz[:, :, None, 2:3] - kptxyz[:, None, :, 2:3])
            return position_embedding(
                dz.reshape(*dz.shape[:2], -1), self.sp_level)
        if t == "rel_z_decay":
            dz = self.scale * (cxyz[:, :, None, 2:3] - kptxyz[:, None, :, 2:3])
            dxyz = cxyz[:, :, None] - kptxyz[:, None, :]
            w = jnp.exp(-(dxyz ** 2).sum(-1, keepdims=True)
                        / (2.0 * self.sigma ** 2))
            w = w.reshape(*w.shape[:2], -1)                  # (BV, N, K)
            return position_embedding(
                dz.reshape(*dz.shape[:2], -1), self.sp_level, weight=w,
                return_parts=return_parts)
        if t == "rel_cxyz":
            dxyz = self.scale * (cxyz[:, :, None] - kptxyz[:, None])
            return position_embedding(
                dxyz.reshape(*dxyz.shape[:2], -1), self.sp_level)
        if t == "rel_wxyz":
            k = jnp.repeat(kpt3d, n_view, axis=0) if n_view != 1 else kpt3d
            dxyz = v[:, :, None] - k[:, None]
            return position_embedding(
                dxyz.reshape(*dxyz.shape[:2], -1), self.sp_level)
        if t in ("mxyz", "rel_mxyz"):
            # model-space PE (spatial.py:95-98,125-133): query points
            # BEFORE view expansion through the model transform, encoded
            # once per batch row and then view-expanded (view_expand=True
            # default) — cheaper than encoding the expanded points.
            if model_T is None:
                raise ValueError(
                    f"sp_type '{t}' needs a (B,4,4) model transform: pass "
                    "model_T (renderer: batch['model_T'])")
            m = self.scale * (
                pts @ jnp.swapaxes(model_T[:, :3, :3], -1, -2)
                + model_T[:, None, :3, 3])
            if t == "mxyz":
                out = position_embedding(m, self.sp_level)
            else:
                # intended reference math (its `vpt3do` is a NameError;
                # kpt3d is the only keypoint tensor in scope upstream)
                assert kpt3d is not None and kpt3d.shape[1] == self.n_kpt
                km = self.scale * (
                    kpt3d @ jnp.swapaxes(model_T[:, :3, :3], -1, -2)
                    + model_T[:, None, :3, 3])
                dxyz = m[:, :, None] - km[:, None]
                out = position_embedding(
                    dxyz.reshape(*dxyz.shape[:2], -1), self.sp_level)
            return jnp.repeat(out, n_view, axis=0) if n_view != 1 else out
        raise ValueError(
            f"unknown sp_type '{t}'; valid: z, ixyz, cxyz, wxyz, mxyz, "
            "rel_z, rel_z_decay, rel_cxyz, rel_wxyz, rel_mxyz")
