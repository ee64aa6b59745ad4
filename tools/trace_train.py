"""Capture an XLA trace of the jitted GAN train step and print top ops.

Usage: python tools/trace_train.py [--dtype bfloat16] [--top 30] [--group]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import time

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default=None)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--group", action="store_true")
    ap.add_argument("--no_trace", action="store_true",
                    help="wall-time the step only (for perf_sweep --train)")
    args = ap.parse_args()
    if args.dtype:
        os.environ["VANERF_COMPUTE_DTYPE"] = args.dtype

    from vanerf_tpu import config as vconfig
    from vanerf_tpu import losses as L
    from vanerf_tpu.data import make_synthetic_batch
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.training.train_step import (create_train_state,
                                                make_train_step)

    cfg = vconfig.default_cfg()
    batch_np, _faces, num_v = make_synthetic_batch(batch_size=1, H=256,
                                                   W=256, subdiv=3)
    batch = jax.tree.map(jnp.asarray, batch_np)
    model = VANeRF.from_config(cfg, num_v=num_v)
    disc = DiscriminatorVis()
    rng = jax.random.PRNGKey(0)
    state, (tx_g, tx_d) = create_train_state(
        model, disc, rng, batch_np, cfg, steps_per_epoch=100)
    vgg = L.VGGLoss()
    step = make_train_step(model, disc, tx_g, tx_d, cfg, vgg, n_views=1)
    step_j = jax.jit(step)

    state, logs = step_j(state, batch, rng)
    float(logs["train/g_loss"])  # sync
    t0 = time.perf_counter()
    for i in range(3):
        state, logs = step_j(state, batch, jax.random.PRNGKey(i))
    float(logs["train/g_loss"])
    print(f"train step: {(time.perf_counter()-t0)/3*1e3:.1f} ms (wall)")
    if args.no_trace:
        return

    tdir = "/tmp/vanerf_trace_train"
    os.system(f"rm -rf {tdir}")
    jax.profiler.start_trace(tdir)
    for i in range(3):
        state, logs = step_j(state, batch, jax.random.PRNGKey(i))
    float(logs["train/g_loss"])
    jax.profiler.stop_trace()

    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    assert paths, f"no trace written under {tdir}"
    with gzip.open(paths[0], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_name = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_name[e["pid"]] = e["args"].get("name", "")
    tpu_pids = {p for p, nm in pid_name.items()
                if "TPU" in nm.upper() or "device" in nm.lower()}
    tot = collections.Counter()
    cnt = collections.Counter()
    long = {}
    all_us = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in tpu_pids:
            continue
        name = e.get("name", "?")
        if args.group:
            name = name.split(".")[0].rstrip("0123456789")
        dur = e.get("dur", 0)
        tot[name] += dur
        cnt[name] += 1
        ln = (e.get("args") or {}).get("long_name", "")
        if ln and name not in long:
            long[name] = ln
        all_us += dur
    print(f"total device-op time: {all_us/3e3:.2f} ms/step over 3 steps")
    for name, us in tot.most_common(args.top):
        print(f"{us/3e3:9.3f} ms  x{cnt[name]:4d}  {name[:60]}")
        ln = long.get(name, "")
        if ln:
            print(f"            {ln[:200]}")


if __name__ == "__main__":
    main()
