"""Fused geometry-MLP Pallas kernel: PE + MLPUNetFusion + gcompress in VMEM.

Parity target: the per-point geometry network of ``VANeRF.query`` —
``SpatialEncoder`` (reference ``src/spatial.py:109-117``) feeding
``MLPUNetFusion`` (``src/utils.py:609-649``) and the ``gcompress`` latent
Dense (``src/model.py:875``, ``mlp_tex_args.gcompress``) — for the
single-source-view inference path.

Why a kernel: at production shapes (262k points/pass) the XLA composition
writes every intermediate to HBM — 7 positional-encoding parts, the 294-ch
concat, four layers1 activations, the pooled features, three layers2
activations (~10 tensors x 67-154 MB/pass) — while the whole weight set is
~101k parameters (<1 MB).  One pass per 256-point tile holds every
activation in VMEM/registers: HBM traffic drops to the kernel inputs
(cxyz, fusion features) and two packed outputs.

Scope (asserted by the caller):
  * ``sp_type == 'rel_z_decay'`` (the shipped config) with any sp_level;
  * one source view (V=1) — the view-pooling reduces to ``mean = w*x``,
    ``var = w*(x-mean)^2`` elementwise;
  * inference only (no custom VJP; training uses the XLA path).

Numerics: PE math in f32 (like the XLA path), matmuls in the activation
dtype with f32 accumulation, rounded once per layer — equivalent to the
materialized-concat XLA path up to one-rounding differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_N = 256


def _softplus100(x):
    """torch Softplus(beta=100, threshold=20): linear above 20/100."""
    return jnp.where(x * 100.0 > 20.0, x,
                     jnp.logaddexp(x * 100.0, 0.0) / 100.0)


def _kernel(cxyz_ref, kpt_ref, aux_ref,
            w0_refs, w0f_ref, w1_ref, w2h_ref, w2f_ref, w3_ref,
            w4m_ref, w4v_ref, w5_ref, w6_ref, w7m_ref, w7v_ref,
            b_refs, out_ref, lat_ref, *, sp_level, scale, sigma, cdt):
    c3 = cxyz_ref[:]                                   # (TILE, 3) f32
    cx = c3[:, 0:1]
    cy = c3[:, 1:2]
    cz = c3[:, 2:3]
    kx = kpt_ref[0:1, :]                               # (1, K) f32
    ky = kpt_ref[1:2, :]
    kz = kpt_ref[2:3, :]

    # --- rel_z_decay positional encoding (f32, like the XLA path) ---
    dz = scale * (cz - kz)                             # (TILE, K)
    dxx = cx - kx
    dyy = cy - ky
    dzz = cz - kz
    wgt = jnp.exp(-(dxx * dxx + dyy * dyy + dzz * dzz)
                  / (2.0 * sigma * sigma))
    a = np.float32(np.pi) * dz
    s = jnp.sin(a)
    c = jnp.cos(a)
    parts = [dz]
    for _ in range(sp_level):
        parts.append(s)
        parts.append(c)
        s, c = 2.0 * s * c, 1.0 - 2.0 * s * s
    parts = [(p * wgt).astype(cdt) for p in parts]

    aux = aux_ref[:]                                   # (TILE, 74) cdt
    fused0 = aux[:, 0:64]
    fused1 = aux[:, 64:72]
    a_m = aux[:, 72:73].astype(jnp.float32)
    w_v = aux[:, 73:74].astype(jnp.float32)

    f32 = jnp.float32

    def dot(x, w_ref):
        return jax.lax.dot_general(
            x, w_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32)

    # layers1 l0: virtual concat of the PE parts + fused0 (one f32
    # accumulator, rounded once — the materialized-concat semantics)
    acc = dot(parts[0], w0_refs[0])
    for i in range(1, len(parts)):
        acc = acc + dot(parts[i], w0_refs[i])
    acc = acc + dot(fused0, w0f_ref) + b_refs[0][:]
    h = _softplus100(acc.astype(cdt))

    h = _softplus100((dot(h, w1_ref) + b_refs[1][:]).astype(cdt))
    h = _softplus100((dot(h, w2h_ref) + dot(fused1, w2f_ref)
                      + b_refs[2][:]).astype(cdt))
    x_view = (dot(h, w3_ref) + b_refs[3][:]).astype(cdt)   # (TILE, 64)

    # V=1 masked/weighted pooling (mean + var), f32 like pool_views
    xv = x_view.astype(f32)
    mean = w_v * xv
    var = w_v * (xv - mean) ** 2
    mean = mean.astype(cdt)
    var = var.astype(cdt)

    h = _softplus100((dot(mean, w4m_ref) + dot(var, w4v_ref)
                      + b_refs[4][:]).astype(cdt))
    h = _softplus100((dot(h, w5_ref) + b_refs[5][:]).astype(cdt))
    out2 = (dot(h, w6_ref) + b_refs[6][:]).astype(f32)      # (TILE, 2)
    lat = (dot(mean, w7m_ref) + dot(var, w7v_ref)
           + b_refs[7][:]).astype(cdt)                      # (TILE, 24)

    del a_m  # validity is derived outside (valid = mask.sum(views) > 0)
    out_ref[:] = jnp.transpose(out2, (1, 0))                # (2, TILE)
    lat_ref[:] = jnp.transpose(lat, (1, 0))                 # (24, TILE)


def prepare_geo_mlp_weights(params: dict, cdt) -> dict:
    """Apply weight normalization + dtype casts once, outside the kernel.

    Args:
      params: the VANeRF "params" subtree (``variables['params']``).
    Returns:
      dict of kernel-ready weight/bias arrays.
    """
    cdt = jnp.dtype(cdt)

    def wn(p):
        v = p["v"]
        if "g" in p:
            norm = jnp.linalg.norm(v, axis=0, keepdims=True) + 1e-12
            v = v * (p["g"][None, :] / norm)
        return v.astype(cdt), p["bias"].astype(jnp.float32)[None]

    l1 = params["mlp_geo"]["layers1"]
    l2 = params["mlp_geo"]["layers2"]
    gc = params["ibr_compress_gfeat"]
    w0, b0 = wn(l1["l0"])
    w1, b1 = wn(l1["l1"])
    w2, b2 = wn(l1["l2"])
    w3, b3 = wn(l1["l3"])
    w4, b4 = wn(l2["l0"])
    w5, b5 = wn(l2["l1"])
    w6, b6 = wn(l2["l2"])
    w7 = gc["kernel"].astype(cdt)
    b7 = gc["bias"].astype(jnp.float32)[None]

    pe_in = w0.shape[0] - 64          # PE width (e.g. 294); fused0 = 64
    return {
        "w0_parts": w0[:pe_in], "w0_f": w0[pe_in:],
        "w1": w1, "w2_h": w2[:-8], "w2_f": w2[-8:], "w3": w3,
        "w4_m": w4[:64], "w4_v": w4[64:], "w5": w5, "w6": w6,
        "w7_m": w7[:64], "w7_v": w7[64:],
        "biases": (b0, b1, b2, b3, b4, b5, b6, b7),
    }


@functools.partial(jax.jit, static_argnames=("sp_level", "scale", "sigma",
                                              "interpret"))
def fused_geo_mlp(cxyz: jnp.ndarray, kpt_T: jnp.ndarray, aux: jnp.ndarray,
                  weights: dict, *, sp_level: int = 3, scale: float = 1.0,
                  sigma: float = 0.1, interpret: bool | None = None):
    """Run the fused PE + MLPUNetFusion + gcompress kernel.

    Args:
      cxyz: (N, 3) f32 camera-frame query points.
      kpt_T: (3, K) f32 camera-frame keypoints.
      aux: (N, 74) activation-dtype per-point inputs packed as
        [fused0 (64) | fused1 (8) | out_mask (1) | pix_weight (1)].
      weights: output of :func:`prepare_geo_mlp_weights`.
    Returns:
      out (N, 2) f32 (sdf residual, radiance), lat (N, 24) activation-dtype
      (the gcompress'd pooled latent).
    """
    if interpret is None:          # auto: interpret off-TPU (CI/tests)
        interpret = jax.default_backend() != "tpu"
    N = cxyz.shape[0]
    K = kpt_T.shape[1]
    pad = (-N) % TILE_N
    if pad:
        cxyz = jnp.pad(cxyz, ((0, pad), (0, 0)))
        aux = jnp.pad(aux, ((0, pad), (0, 0)))
    np_ = N + pad
    cdt = aux.dtype

    w0p = weights["w0_parts"]
    n_parts = 1 + 2 * sp_level
    assert w0p.shape[0] == n_parts * K, (w0p.shape, n_parts, K)
    w0_list = [w0p[i * K:(i + 1) * K] for i in range(n_parts)]
    biases = weights["biases"]

    def full(x):
        return pl.BlockSpec(x.shape, lambda i: tuple(0 for _ in x.shape),
                            memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _kernel, sp_level=sp_level, scale=float(scale), sigma=float(sigma),
        cdt=cdt)

    def body(cxyz_ref, kpt_ref, aux_ref, *refs):
        w0_refs = refs[:n_parts]
        (w0f, w1, w2h, w2f, w3, w4m, w4v, w5, w6, w7m, w7v) = \
            refs[n_parts:n_parts + 11]
        b_refs = refs[n_parts + 11:n_parts + 19]
        out_ref, lat_ref = refs[n_parts + 19:]
        kernel(cxyz_ref, kpt_ref, aux_ref, w0_refs, w0f, w1, w2h, w2f,
               w3, w4m, w4v, w5, w6, w7m, w7v, b_refs, out_ref, lat_ref)

    ins = ([cxyz, kpt_T, aux] + w0_list
           + [weights["w0_f"], weights["w1"], weights["w2_h"],
              weights["w2_f"], weights["w3"], weights["w4_m"],
              weights["w4_v"], weights["w5"], weights["w6"],
              weights["w7_m"], weights["w7_v"]]
           + list(biases))
    in_specs = ([pl.BlockSpec((TILE_N, 3), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 full(kpt_T),
                 pl.BlockSpec((TILE_N, aux.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
                + [full(x) for x in ins[3:]])

    out, lat = pl.pallas_call(
        body, grid=(np_ // TILE_N,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((2, TILE_N), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((24, TILE_N), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((2, np_), jnp.float32),
                   jax.ShapeDtypeStruct((24, np_), cdt)],
        interpret=interpret,
    )(*ins)
    return jnp.transpose(out[:, :N], (1, 0)), jnp.transpose(lat[:, :N],
                                                            (1, 0))
