"""Test harness: force an 8-virtual-device CPU platform before jax imports.

This mirrors multi-chip TPU topology for sharding tests without hardware
(the strategy the reference entirely lacks — it has no tests at all,
see SURVEY.md section 4).
"""

import os

# FORCE cpu (the ambient environment may point JAX_PLATFORMS at a remote
# TPU; tests must run hermetically on the virtual-device CPU platform).
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# The environment may PRE-IMPORT jax (sitecustomize) before this conftest
# runs, in which case jax snapshotted JAX_PLATFORMS at interpreter start
# and the env vars above are ignored — force the config directly (legal
# any time before backend initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert jax.default_backend() == "cpu", (
    "tests must run on the hermetic CPU platform, got "
    f"{jax.default_backend()}")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
