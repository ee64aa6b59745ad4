"""vanerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for generalizable
visibility-aware NeRFs of interacting hands.

Re-implements the full capability surface of the VANeRF reference
(XuanHuang0/VANeRF, AAAI'24) with a TPU-first architecture:

- pure-functional Flax models + one fused, jitted render step;
- Pallas / XLA kernels for the mesh geometry queries (point-to-mesh SDF,
  winding-number sign, z-buffer rasterization, KNN, bilinear sampling)
  replacing the reference's kaolin / pytorch3d / spconv CUDA ops;
- `jax.sharding.Mesh` + data-parallel train/render steps replacing
  PyTorch-Lightning DDP / NCCL;
- orbax checkpointing, optax GAN optimizers, deterministic input pipeline.
"""

__version__ = "0.1.0"

import os as _os

# Matmul/conv precision: JAX's default truncates inputs to bf16 (the right
# TPU-first training default — MXU-native, f32 accumulate).  For
# checkpoint-parity evaluation against the torch reference set
# VANERF_PRECISION=highest (true f32 everywhere).
_prec = _os.environ.get("VANERF_PRECISION", "")
if _prec:
    import jax as _jax
    _jax.config.update("jax_default_matmul_precision", _prec)

# Persistent XLA compilation cache (OPT-IN via VANERF_COMPILE_CACHE=<dir>
# or =1 for the default dir): the production render/train programs
# (tile-grouped lax.map over the full query pipeline) take minutes to
# compile cold; caching makes repeat runs (bench, CLI restarts, resumed
# sessions) start in seconds.  Not on by default: XLA:CPU caches AOT
# executables keyed to the *compiling* machine's CPU features, and
# loading them under a different feature mask (e.g. sandboxed vs bare
# runs on the same host) warns about possible SIGILL.
_cc = _os.environ.get("VANERF_COMPILE_CACHE", "")
if _cc and _cc != "0":
    import jax as _jax
    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.expanduser("~/.cache/vanerf_jax") if _cc == "1" else _cc)
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

