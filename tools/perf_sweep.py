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
    # dual generate: (3, N) kernel I/O, network points recomputed from
    # (o, d, z) instead of transposing pts_T (mode 1's measured loss)
    "soa2": {"VANERF_SOA_POINTS": "2"},
    # direct per-octave sin/cos PE (fuses into the wide concat)
    "pe_direct": {"VANERF_PE_DIRECT": "1"},
    "soa2_pe": {"VANERF_SOA_POINTS": "2", "VANERF_PE_DIRECT": "1"},
    "soa_f1": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "1"},
    "soa_f2": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "2"},
    "soa_f2_b2d": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "2",
                   "VANERF_BLOCK_2D": "4,4,8"},
    "soa_f2_b2d_t64": {"VANERF_SOA_POINTS": "1", "VANERF_FUSED_MLP": "2",
                       "VANERF_BLOCK_2D": "4,4,4",
                       "VANERF_MESH_TILE_P": "64"},
    "f2": {"VANERF_FUSED_MLP": "2"},
    # landmark-culled KNN kernel (ops/knn_pallas.py): cull quality depends
    # on point-tile locality, so measure with and without 2-D blocking
    "knn_cull": {"VANERF_KNN_CULL": "1"},
    "knn_cull_b2d": {"VANERF_KNN_CULL": "1", "VANERF_BLOCK_2D": "4,4,8"},
    "knn_cull_soa": {"VANERF_KNN_CULL": "1", "VANERF_SOA_POINTS": "1"},
    # far-field mesh-query tier (approximate: nearest-vertex distance
    # stands in beyond tau; see renderer.py VANERF_FAR_TAU comment)
    "far02": {"VANERF_FAR_TAU": "0.02"},
    "far03": {"VANERF_FAR_TAU": "0.03"},
    # per-ray network budget (approximate; renderer.py VANERF_FAR_SKIP):
    # evaluate the per-point net on only frac*S nearest-to-surface samples
    "fskip75": {"VANERF_FAR_SKIP": "0.75"},
    "fskip50": {"VANERF_FAR_SKIP": "0.5"},
    "fskip375": {"VANERF_FAR_SKIP": "0.375"},
    "fskip50_far02": {"VANERF_FAR_SKIP": "0.5", "VANERF_FAR_TAU": "0.02"},
    "fskip375_far02": {"VANERF_FAR_SKIP": "0.375",
                       "VANERF_FAR_TAU": "0.02"},
    # per-sample network budget with nearest-evaluated inheritance
    # (renderer.py VANERF_FAR_TNET); `select` = round-5 log-shift fill
    # (default), `scan` = the round-4 scan+gather reference impl
    "tnet50": {"VANERF_FAR_TNET": "0.5"},
    "tnet375": {"VANERF_FAR_TNET": "0.375"},
    "tnet50_scan": {"VANERF_FAR_TNET": "0.5", "VANERF_TNET_IMPL": "scan"},
    # cull-granularity sweep: per-patch mesh-query time varies 8.7-16.8 ms
    # with patch content (visit-rate variance), so tile/chunk granularity
    # is the lever on the HARD patches. CULL_CHUNK=32 would exceed the
    # 61-chunk compacted-list layout (mesh_query_pallas.py).
    "b2d": {"VANERF_BLOCK_2D": "4,4,8"},
    "t64": {"VANERF_MESH_TILE_P": "64"},
    "t256": {"VANERF_MESH_TILE_P": "256"},
    "cc64": {"VANERF_CULL_CHUNK": "64"},
    "cc256": {"VANERF_CULL_CHUNK": "256"},
    "t64_cc64": {"VANERF_MESH_TILE_P": "64", "VANERF_CULL_CHUNK": "64"},
    "b2d_t64": {"VANERF_BLOCK_2D": "4,4,4", "VANERF_MESH_TILE_P": "64"},
}


# Training is n_views=1 too (configs/vanerf.json num_input_view). The
# layout/blocking flags apply directly; VANERF_REMAT_QUERY trades
# backward HBM for recompute, and VANERF_FUSED_TRAIN runs the pallas
# fused forward with an XLA custom_vjp backward (renderer.py).
TRAIN_CONFIGS = {
    "base": {},
    # one-hot MXU matmul scatter VJP for small-table gather grads
    # (ops/onehot_gather.py): measured LOSER on the full step (177.8 vs
    # 136.5 ms base) — the custom_vjp boundary breaks XLA's joint
    # fwd/bwd schedule. Kept opt-in for isolated-scatter workloads.
    "ohs": {"VANERF_ONEHOT_SCATTER": "1"},
    "soa": {"VANERF_SOA_POINTS": "1"},
    "soa2": {"VANERF_SOA_POINTS": "2"},
    "pe_direct": {"VANERF_PE_DIRECT": "1"},
    "b2d": {"VANERF_BLOCK_2D": "4,4,8"},
    "soa_b2d": {"VANERF_SOA_POINTS": "1", "VANERF_BLOCK_2D": "4,4,8"},
    "remat1": {"VANERF_REMAT_QUERY": "1"},
    "remat2": {"VANERF_REMAT_QUERY": "2"},
    "remat2_soa": {"VANERF_REMAT_QUERY": "2", "VANERF_SOA_POINTS": "1"},
    "ft1": {"VANERF_FUSED_TRAIN": "1"},
    "ft2": {"VANERF_FUSED_TRAIN": "2"},
    "ft2_soa": {"VANERF_FUSED_TRAIN": "2", "VANERF_SOA_POINTS": "1"},
    "knn_cull": {"VANERF_KNN_CULL": "1"},
    "far02": {"VANERF_FAR_TAU": "0.02"},
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", nargs="*", default=None)
    ap.add_argument("--train", action="store_true",
                    help="sweep the GAN train step (tools/trace_train.py "
                         "--no_trace) instead of bench.py")
    ap.add_argument("--timeout", type=int, default=1500)
    ap.add_argument("--out", default="/tmp/perf_sweep.jsonl")
    args = ap.parse_args()
    table = TRAIN_CONFIGS if args.train else CONFIGS
    names = args.configs if args.configs else list(table)

    results = []
    for name in names:
        env = dict(os.environ)
        env.update(table[name])
        env.setdefault("VANERF_COMPILE_CACHE", "1")
        cmd = ([sys.executable, os.path.join(ROOT, "tools",
                                             "trace_train.py"), "--no_trace"]
               if args.train else
               [sys.executable, os.path.join(ROOT, "bench.py")])
        t0 = time.time()
        try:
            p = subprocess.run(
                cmd, env=env, capture_output=True, text=True,
                timeout=args.timeout)
            if args.train:
                ms = [l for l in p.stdout.splitlines()
                      if l.startswith("train step:")]
                rec = ({"metric": "train_step_ms", "unit": "ms/step",
                        "value": float(ms[-1].split()[2])} if ms else
                       {"error": (p.stderr or "no output")[-800:]})
            else:
                line = [l for l in p.stdout.splitlines()
                        if l.startswith("{")]
                rec = json.loads(line[-1]) if line else {
                    "error": (p.stderr or "no output")[-800:]}
        except subprocess.TimeoutExpired:
            rec = {"error": f"timeout {args.timeout}s"}
        rec["config"] = name
        rec["env"] = table[name]
        rec["wall_s"] = round(time.time() - t0, 1)
        results.append(rec)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        val = rec.get("value", rec.get("error", "?"))
        print(f"{name:18s} {val}  ({rec['wall_s']}s)", flush=True)

    scored = [r for r in results if "value" in r]
    if scored:
        best = (min(scored, key=lambda r: r["value"]) if args.train
                else max(scored, key=lambda r: r["value"]))
        unit = "ms/step" if args.train else "ray-samples/s"
        print(f"\nbest: {best['config']} = {best['value']:.1f} "
              f"{unit} ({best.get('vs_baseline', '')})")


if __name__ == "__main__":
    main()
