"""Sequential bench.py sweep over perf-flag combinations (one TPU process
at a time — the axon tunnel hangs on concurrent clients).

Usage: python tools/perf_sweep.py [--configs NAME ...] [--timeout SECS]

Each run is a fresh process (the flags are read at trace time); results
append to /tmp/perf_sweep.jsonl and print as a table.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "base": {},
    "soa": {"VANERF_SOA_POINTS": "1"},
    "soa_f1": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "1"},
    "soa_f2": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "2"},
    "soa_f2_b2d": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "2",
                   "VANERF_BLOCK_2D": "4,4,8"},
    "soa_f2_b2d_t64": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "2",
                       "VANERF_BLOCK_2D": "4,4,4",
                       "VANERF_MESH_TILE_P": "64"},
    "f2": {"VANERF_FUSED_MLP": "2"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=list(CONFIGS))
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--out", default="/tmp/perf_sweep.jsonl")
    args = ap.parse_args()

    results = []
    for name in args.configs:
        env = dict(os.environ)
        env.update(CONFIGS[name])
        env.setdefault("VANERF_COMPILE_CACHE", "1")
        t0 = time.time()
        try:
            p = subprocess.run(
                [sys.executable, os.path.join(ROOT, "bench.py")],
                env=env, capture_output=True, text=True,
                timeout=args.timeout)
            line = [l for l in p.stdout.splitlines()
                    if l.startswith("{")]
            rec = json.loads(line[-1]) if line else {
                "error": (p.stderr or "no output")[-800:]}
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout {args.timeout}s"}
        rec["config"] = name
        rec["env"] = CONFIGS[name]
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        val = rec.get("value", rec.get("error", "?"))
        print(f"{name:18s} {val}  ({rec['wall_s']}s)", flush=True)

    best = max((r for r in results if "value" in r),
               key=lambda r: r["value"], default=None)
    if best:
        print(f"\nbest: {best['config']} = {best['value']:.0f} "
              f"ray-samples/s ({best.get('vs_baseline')})")


if __name__ == "__main__":
    main()
