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
    """torch Softplus(beta=100, threshold=20): linear above 20/100.

    The predicate and logaddexp run in f32: Mosaic cannot lower packed
    bf16 vector comparisons on v5e ("Target does not support this
    comparison"), and f32 transcendentals are what the VPU runs anyway.
    """
    xf = x.astype(jnp.float32) * 100.0
    return jnp.where(xf > 20.0, x,
                     (jnp.logaddexp(xf, 0.0) / 100.0).astype(x.dtype))


def _dot(x, w_ref):
    return jax.lax.dot_general(
        x, w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)


def _pe_parts(cxyz_ref, kpt_ref, *, sp_level, scale, sigma, cdt):
    """rel_z_decay positional-encoding parts (f32 math, cast to cdt)."""
    c3 = cxyz_ref[:]                                   # (TILE, 3) f32
    cx = c3[:, 0:1]
    cy = c3[:, 1:2]
    cz = c3[:, 2:3]
    kx = kpt_ref[0:1, :]                               # (1, K) f32
    ky = kpt_ref[1:2, :]
    kz = kpt_ref[2:3, :]

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
    return [(p * wgt).astype(cdt) for p in parts]


def _geo_mlp(parts, fused0, fused1, w_v, w0_refs, w0f_ref, w1_ref, w2h_ref,
             w2f_ref, w3_ref, w4m_ref, w4v_ref, w5_ref, w6_ref,
             w7m_ref, w7v_ref, b_refs, *, cdt):
    """MLPUNetFusion (V=1) + gcompress on in-register activations.

    Returns out2 (TILE, 2) f32 and lat24 (TILE, 24) cdt.
    """
    f32 = jnp.float32
    # layers1 l0: virtual concat of the PE parts + fused0 (one f32
    # accumulator, rounded once — the materialized-concat semantics)
    acc = _dot(parts[0], w0_refs[0])
    for i in range(1, len(parts)):
        acc = acc + _dot(parts[i], w0_refs[i])
    acc = acc + _dot(fused0, w0f_ref) + b_refs[0][:]
    h = _softplus100(acc.astype(cdt))

    h = _softplus100((_dot(h, w1_ref) + b_refs[1][:]).astype(cdt))
    h = _softplus100((_dot(h, w2h_ref) + _dot(fused1, w2f_ref)
                      + b_refs[2][:]).astype(cdt))
    x_view = (_dot(h, w3_ref) + b_refs[3][:]).astype(cdt)   # (TILE, 64)

    # V=1 masked/weighted pooling (mean + var), f32 like pool_views
    xv = x_view.astype(f32)
    mean = w_v * xv
    var = w_v * (xv - mean) ** 2
    mean = mean.astype(cdt)
    var = var.astype(cdt)

    h = _softplus100((_dot(mean, w4m_ref) + _dot(var, w4v_ref)
                      + b_refs[4][:]).astype(cdt))
    h = _softplus100((_dot(h, w5_ref) + b_refs[5][:]).astype(cdt))
    out2 = (_dot(h, w6_ref) + b_refs[6][:]).astype(f32)      # (TILE, 2)
    lat = (_dot(mean, w7m_ref) + _dot(var, w7v_ref)
           + b_refs[7][:]).astype(cdt)                       # (TILE, 24)
    return out2, lat


def _kernel(cxyz_ref, kpt_ref, aux_ref,
            w0_refs, w0f_ref, w1_ref, w2h_ref, w2f_ref, w3_ref,
            w4m_ref, w4v_ref, w5_ref, w6_ref, w7m_ref, w7v_ref,
            b_refs, out_ref, lat_ref, *, sp_level, scale, sigma, cdt):
    parts = _pe_parts(cxyz_ref, kpt_ref, sp_level=sp_level, scale=scale,
                      sigma=sigma, cdt=cdt)
    aux = aux_ref[:]                                   # (TILE, 74) cdt
    fused0 = aux[:, 0:64]
    fused1 = aux[:, 64:72]
    w_v = aux[:, 73:74].astype(jnp.float32)
    out2, lat = _geo_mlp(parts, fused0, fused1, w_v, w0_refs, w0f_ref,
                         w1_ref, w2h_ref, w2f_ref, w3_ref, w4m_ref,
                         w4v_ref, w5_ref, w6_ref, w7m_ref, w7v_ref,
                         b_refs, cdt=cdt)
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


# ---------------------------------------------------------------------------
# full query kernel: gating fusion nets + geo MLP + tex gating + rgb
# ---------------------------------------------------------------------------
#
# Extends the geo-MLP kernel with the visibility-gated fusion nets on both
# ends: GeoVisFusion's two gate/fuse scales in front (reference
# networks.py:75-106), TexVisFusion's gate/fuse behind (networks.py:268-293),
# consuming the RAW shared-KNN gather rows and emitting the final
# (sdf_ch, rad, rgb) — at one source view the IBR head is exactly
# rgb_feat[..., :3] (see models/vanerf.py), so the fuse layer's output
# columns beyond 3 are dead and sliced from the weights outside.

# fixed channel layout (vanerf.json shapes): g2 rows are
# [geo64 | geo8 | tex_img+ft 11 | tex_global 18 | vis 1] x {this, toh}
_G2 = dict(g0=(0, 64), g1=(64, 72), tf=(72, 83), tg=(83, 101),
           vis=(101, 102))


def _gate_fuse(parts, at0_refs, at1_ref, fu0_refs, fu1_ref, *, cdt,
               n_gated):
    """GateMLP + FuseMLP pair over a virtual-concat parts list.

    The first `n_gated` parts are re-scaled by their gate channel; the
    remaining parts pass through ungated (the ctx block).
    """
    acc = _dot(parts[0], at0_refs[0])
    for i in range(1, len(parts)):
        acc = acc + _dot(parts[i], at0_refs[i])
    # relu on the f32 accumulator, then round: same values as
    # relu(round(x)) (rounding is monotone, round(0)=0) and avoids packed
    # bf16 maximumf, which Mosaic may not lower on v5e.  The sigmoid runs
    # in f32 on the cdt-rounded input for the same reason (Mosaic's bf16
    # lax.logistic lowering emits an ill-typed f32->bf16 broadcast).
    g = jax.nn.sigmoid(_dot(jax.nn.relu(acc).astype(cdt),
                            at1_ref).astype(cdt).astype(jnp.float32)
                       ).astype(cdt)
    acc = None
    for i, p in enumerate(parts):
        pg = p * g[:, i:i + 1] if i < n_gated else p
        d = _dot(pg, fu0_refs[i])
        acc = d if acc is None else acc + d
    return _dot(jax.nn.relu(acc).astype(cdt), fu1_ref).astype(cdt)


def _kernel_full(cxyz_ref, kpt_ref, feats_ref, g2_ref, *, refs, sp_level,
                 scale, sigma, cdt):
    f32 = jnp.float32
    feats = feats_ref[:]                               # (TILE, 87) cdt
    fs0 = feats[:, 0:64]
    fs1 = feats[:, 64:72]
    img_xy = feats[:, 72:75]
    ft_xy = feats[:, 75:83]
    q_sdf = feats[:, 83:84]
    q_vis = feats[:, 84:85]
    w_v = feats[:, 86:87].astype(f32)

    g2 = g2_ref[:]                                     # (TILE, 204) cdt
    C1 = 102
    vis_th = g2[:, _G2["vis"][0]:_G2["vis"][1]]
    vis_toh = g2[:, C1 + _G2["vis"][0]:C1 + _G2["vis"][1]]

    def th(k):
        lo, hi = _G2[k]
        return g2[:, lo:hi] * vis_th

    def toh(k):
        lo, hi = _G2[k]
        return g2[:, C1 + lo:C1 + hi] * vis_toh

    ctx4 = jnp.concatenate([q_sdf, q_vis, vis_th, vis_toh], 1)

    # GeoVisFusion: two gated scales -> fused0 (64), fused1 (8)
    fused0 = _gate_fuse([fs0, th("g0"), toh("g0"), ctx4],
                        refs["gat0_0"], refs["gat0_1"][0],
                        refs["gfu0_0"], refs["gfu0_1"][0],
                        cdt=cdt, n_gated=3)
    fused1 = _gate_fuse([fs1, th("g1"), toh("g1"), ctx4],
                        refs["gat1_0"], refs["gat1_1"][0],
                        refs["gfu1_0"], refs["gfu1_1"][0],
                        cdt=cdt, n_gated=3)

    parts = _pe_parts(cxyz_ref, kpt_ref, sp_level=sp_level, scale=scale,
                      sigma=sigma, cdt=cdt)
    out2, lat = _geo_mlp(parts, fused0, fused1, w_v,
                         refs["w0"], refs["w0f"][0], refs["w1"][0],
                         refs["w2h"][0], refs["w2f"][0], refs["w3"][0],
                         refs["w4m"][0], refs["w4v"][0], refs["w5"][0],
                         refs["w6"][0], refs["w7m"][0], refs["w7v"][0],
                         refs["b"], cdt=cdt)

    # TexVisFusion gate/fuse -> rgb (fuse weights pre-sliced to 3 cols)
    qf = jnp.concatenate([img_xy, ft_xy], 1)           # (TILE, 11)
    vis3 = jnp.concatenate([q_vis, vis_th, vis_toh], 1)
    rgb = _gate_fuse([qf, th("tf"), toh("tf"), th("tg"), toh("tg"),
                      lat, vis3],
                     refs["tat_0"], refs["tat_1"][0],
                     refs["tfu_0"], refs["tfu_1"][0],
                     cdt=cdt, n_gated=6)               # (TILE, 3)

    out5 = jnp.concatenate([out2, rgb.astype(f32)], 1)
    refs["out"][0][:] = jnp.transpose(out5, (1, 0))    # (5, TILE)


# canonical kernel-argument order of the named weight groups
_WEIGHT_ORDER = ("gat0_0", "gat0_1", "gfu0_0", "gfu0_1",
                 "gat1_0", "gat1_1", "gfu1_0", "gfu1_1",
                 "w0", "w0f", "w1", "w2h", "w2f", "w3", "w4m", "w4v",
                 "w5", "w6", "w7m", "w7v", "b",
                 "tat_0", "tat_1", "tfu_0", "tfu_1")


def prepare_query_weights(params: dict, cdt, n_parts: int = 7) -> dict:
    """Kernel-ready weight groups for :func:`fused_query_mlp`.

    Applies weight norm, dtype casts, the virtual-concat row splits of
    every first-layer kernel, and the V=1 rgb column slice of the tex
    fuse layer — all once, outside the kernel.  Returns a dict
    name -> list of arrays (a jit-able pytree).
    """
    cdt = jnp.dtype(cdt)
    geo = prepare_geo_mlp_weights(params, cdt)

    def cast(x):
        return x.astype(cdt)

    out = {}

    def add(name, *arrs):
        for a in arrs:
            out.setdefault(name, []).append(a)

    gvf = params["geo_vis_fusion"]
    for si, w in [(0, 64), (1, 8)]:
        at0 = cast(gvf[f"at{si}"]["Dense_0"]["kernel"])
        fu0 = cast(gvf[f"ated{si}"]["Dense_0"]["kernel"])
        splits = (w, w, w, 4)
        o = 0
        for s in splits:
            add(f"gat{si}_0", at0[o:o + s])
            o += s
        add(f"gat{si}_1", cast(gvf[f"at{si}"]["Dense_1"]["kernel"]))
        o = 0
        for s in splits:
            add(f"gfu{si}_0", fu0[o:o + s])
            o += s
        add(f"gfu{si}_1", cast(gvf[f"ated{si}"]["Dense_1"]["kernel"]))

    Kk = geo["w0_parts"].shape[0] // n_parts   # keypoint count per part
    for i in range(n_parts):
        add("w0", geo["w0_parts"][i * Kk:(i + 1) * Kk])
    add("w0f", geo["w0_f"])
    add("w1", geo["w1"])
    add("w2h", geo["w2_h"])
    add("w2f", geo["w2_f"])
    add("w3", geo["w3"])
    add("w4m", geo["w4_m"])
    add("w4v", geo["w4_v"])
    add("w5", geo["w5"])
    add("w6", geo["w6"])
    add("w7m", geo["w7_m"])
    add("w7v", geo["w7_v"])
    for b in geo["biases"]:
        add("b", b)

    tvf = params["tex_vis_fusion"]
    tat0 = cast(tvf["at"]["Dense_0"]["kernel"])
    tfu0 = cast(tvf["fuse"]["Dense_0"]["kernel"])
    splits = (11, 11, 11, 18, 18, 24, 3)
    o = 0
    for s in splits:
        add("tat_0", tat0[o:o + s])
        o += s
    add("tat_1", cast(tvf["at"]["Dense_1"]["kernel"]))
    o = 0
    for s in splits:
        add("tfu_0", tfu0[o:o + s])
        o += s
    # V=1: only the first 3 output columns (src_rgb) survive the IBR head
    add("tfu_1", cast(tvf["fuse"]["Dense_1"]["kernel"][:, :3]))
    return out


@functools.partial(jax.jit, static_argnames=("sp_level", "scale", "sigma",
                                              "interpret"))
def fused_query_mlp(cxyz: jnp.ndarray, kpt_T: jnp.ndarray,
                    feats: jnp.ndarray, g2: jnp.ndarray, weights,
                    *, sp_level: int = 3, scale: float = 1.0,
                    sigma: float = 0.1, interpret: bool | None = None):
    """Full per-point query network in one pallas pass (V=1 inference).

    Args:
      cxyz: (N, 3) f32 camera-frame query points.
      kpt_T: (3, K) f32 camera-frame keypoints.
      feats: (N, 87) activation-dtype pack
        [feat_s0 64 | feat_s1 8 | img_xy 3 | ft_xy 8 | q_sdf | q_vis |
         out_mask | pix_weight].
      g2: (N, 204) raw shared-KNN gather rows (ops/knn.py knn_gather_raw).
      weights: output of :func:`prepare_query_weights`.
    Returns:
      out (N, 5) f32 = [sdf_ch, rad, rgb3].
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    N = cxyz.shape[0]
    pad = (-N) % TILE_N
    if pad:
        cxyz = jnp.pad(cxyz, ((0, pad), (0, 0)))
        feats = jnp.pad(feats, ((0, pad), (0, 0)))
        g2 = jnp.pad(g2, ((0, pad), (0, 0)))
    np_ = N + pad
    cdt = feats.dtype

    names = [n for n in _WEIGHT_ORDER for _ in weights[n]]
    arrs = [a for n in _WEIGHT_ORDER for a in weights[n]]

    def full(x):
        return pl.BlockSpec(x.shape, lambda i: tuple(0 for _ in x.shape),
                            memory_space=pltpu.VMEM)

    def body(cxyz_ref, kpt_ref, feats_ref, g2_ref, *rest):
        refs = {}
        for n, r in zip(names, rest[:len(names)]):
            refs.setdefault(n, []).append(r)
        refs["out"] = [rest[len(names)]]
        _kernel_full(cxyz_ref, kpt_ref, feats_ref, g2_ref, refs=refs,
                     sp_level=sp_level, scale=float(scale),
                     sigma=float(sigma), cdt=cdt)

    in_specs = ([pl.BlockSpec((TILE_N, 3), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 full(kpt_T),
                 pl.BlockSpec((TILE_N, feats.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((TILE_N, g2.shape[1]), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
                + [full(x) for x in arrs])

    (out,) = pl.pallas_call(
        body, grid=(np_ // TILE_N,),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((5, TILE_N), lambda i: (0, i),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((5, np_), jnp.float32)],
        interpret=interpret,
    )(cxyz, kpt_T, feats, g2, *arrs)
    return jnp.transpose(out[:, :N], (1, 0))


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
