"""Profiling & debugging helpers (the reference has none — SURVEY.md §5).

- `trace(dir)`: context manager around `jax.profiler` for XLA traces.
- `timed`: wall-clock timing with `block_until_ready`.
- `nan_guard`: checkify-style non-finite detection for loss dicts
  (replacement for torch detect_anomaly, reference ``train.py:12,61``).
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def timed(fn: Callable, *args, warmup: int = 1, iters: int = 5, **kw):
    """Run fn with warmup, return (mean_seconds, last_result)."""
    out = None
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def nan_guard(logs: dict, step: int | None = None):
    """Raise on non-finite scalars (train-anomaly tripwire)."""
    bad = {k: float(v) for k, v in logs.items()
           if not np.isfinite(float(v))}
    if bad:
        raise FloatingPointError(
            f"non-finite metrics at step {step}: {bad}")
