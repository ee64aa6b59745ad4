"""Aggregate the cross-framework convergence A/B runs into the evidence
table (VERDICT r3 item 1: n>=3 seeds per framework, mean +/- spread, an
explicit overlap/deficit conclusion).

Reads eval.json from each run directory given on the CLI (or the default
round-4 layout under /tmp) and prints a markdown table plus per-framework
mean/std/min/max and the torch-vs-JAX delta.

Usage:
  python tools/ab_report.py                       # default /tmp run dirs
  python tools/ab_report.py DIR[=label] ...
"""

import json
import os
import sys

DEFAULTS = [
    ("/tmp/AB_TORCH", "torch seed 7 (r3)"),
    ("/tmp/AB_TORCH_S13", "torch seed 13"),
    ("/tmp/AB_TORCH_S21", "torch seed 21"),
    ("/tmp/AB_TORCH_S29", "torch seed 29"),
    ("/tmp/AB_JAX3", "jax seed 7 (r3, bf16)"),
    ("/tmp/AB_JAX_S13", "jax seed 13"),
    ("/tmp/AB_JAX_S21", "jax seed 21"),
    ("/tmp/AB_JAX_S29", "jax seed 29"),
]


def main():
    runs = []
    args = sys.argv[1:]
    pairs = ([(a.split("=")[0], a.split("=")[-1]) for a in args]
             if args else DEFAULTS)
    for d, label in pairs:
        p = os.path.join(d, "eval.json")
        if not os.path.exists(p):
            print(f"| {label} | (missing) | |")
            continue
        with open(p) as f:
            e = json.load(f)
        fw = "torch" if "TORCH" in d.upper() else "jax"
        runs.append((label, fw, e["psnr"], e["ssim"]))

    print("| run | PSNR | SSIM |")
    print("|---|---|---|")
    for label, _fw, p, s in runs:
        print(f"| {label} | {p:.2f} | {s:.3f} |")

    import statistics as st
    for fw in ("torch", "jax"):
        vals = [(p, s) for _l, f, p, s in runs if f == fw]
        if len(vals) < 2:
            continue
        ps = [v[0] for v in vals]
        ss = [v[1] for v in vals]
        print(f"\n{fw}: n={len(ps)} PSNR mean {st.mean(ps):.2f} "
              f"± {st.stdev(ps):.2f} (min {min(ps):.2f} max {max(ps):.2f}); "
              f"SSIM mean {st.mean(ss):.3f} ± {st.stdev(ss):.3f}")
    tp = [p for _l, f, p, _s in runs if f == "torch"]
    jp = [p for _l, f, p, _s in runs if f == "jax"]
    if tp and jp:
        import statistics as st
        print(f"\ndelta (torch - jax) mean PSNR: "
              f"{st.mean(tp) - st.mean(jp):+.2f} dB; "
              f"ranges overlap: {max(min(tp), min(jp)) <= min(max(tp), max(jp))}")


if __name__ == "__main__":
    main()
