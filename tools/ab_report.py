"""Aggregate the cross-framework convergence A/B runs into the evidence
table (VERDICT r3 item 1 / r4 item 1): per-run table, per-framework
mean/spread, and — the point of the matched-init design — PAIRED
per-seed statistics (mean paired delta, t, p, sign counts).

Reads eval.json from each run directory given on the CLI (or the default
round-4/5 layout under /tmp).

Usage:
  python tools/ab_report.py                          # default run dirs
  python tools/ab_report.py DIR[=label] ...          # dir name has TORCH/JAX
  python tools/ab_report.py DIR=torch:label ...      # explicit framework tag

Framework attribution: an explicit `torch:`/`jax:` prefix on the label
wins; otherwise the dir name must contain TORCH or JAX (case-insensitive)
— anything else is an error, not a silent default (ADVICE r4).  Seeds are
parsed from `_s<k>` / `seed <k>` in the dir/label for pairing.
"""

import json
import os
import re
import sys

DEFAULTS = [
    ("/tmp/AB_TORCH", "torch seed 7 (r3)"),
    ("/tmp/AB_TORCH_S13", "torch seed 13"),
    ("/tmp/AB_TORCH_S21", "torch seed 21"),
    ("/tmp/AB_TORCH_S29", "torch seed 29"),
    ("/tmp/AB_TORCH_s37", "torch seed 37"),
    ("/tmp/AB_TORCH_s43", "torch seed 43"),
    ("/tmp/AB_TORCH_s51", "torch seed 51"),
    ("/tmp/AB_TORCH_s59", "torch seed 59"),
    ("/tmp/AB_JAX3", "jax seed 7 (r3, bf16)"),
    ("/tmp/AB_JAX_S13", "jax seed 13"),
    ("/tmp/AB_JAX_S21", "jax seed 21"),
    ("/tmp/AB_JAX_S29", "jax seed 29"),
    ("/tmp/AB_JAX_s37", "jax seed 37"),
    ("/tmp/AB_JAX_s43", "jax seed 43"),
    ("/tmp/AB_JAX_s51", "jax seed 51"),
    ("/tmp/AB_JAX_s59", "jax seed 59"),
]
# round-3/4 runs predate the _s<seed> dir convention
SEED_OVERRIDES = {"/tmp/AB_TORCH": 7, "/tmp/AB_JAX3": 7}


def parse_arg(a):
    """DIR[=[(torch|jax):]label] -> (dir, framework|None, label)."""
    if "=" not in a:
        return a, None, a
    d, label = a.split("=", 1)
    fw = None
    m = re.match(r"^(torch|jax):(.*)$", label)
    if m:
        fw, label = m.group(1), m.group(2) or d
    return d, fw, label


def attribute(d, fw):
    if fw in ("torch", "jax"):
        return fw
    has_t = "TORCH" in d.upper()
    has_j = "JAX" in d.upper()
    if has_t == has_j:
        sys.exit(f"ab_report: cannot attribute {d!r} to a framework — "
                 "dir name has neither/both of TORCH|JAX; use an "
                 "explicit tag: DIR=torch:label or DIR=jax:label")
    return "torch" if has_t else "jax"


def parse_seed(d, label):
    if d in SEED_OVERRIDES:
        return SEED_OVERRIDES[d]
    m = re.search(r"_[sS](\d+)\b", d) or \
        re.search(r"seed[ _]?(\d+)", label)
    return int(m.group(1)) if m else None


def main():
    runs = []
    args = sys.argv[1:]
    if args:
        triples = [parse_arg(a) for a in args]
    else:
        triples = [(d, None, lab) for d, lab in DEFAULTS]
    for d, fw, label in triples:
        p = os.path.join(d, "eval.json")
        if not os.path.exists(p):
            print(f"| {label} | (missing) | |")
            continue
        with open(p) as f:
            e = json.load(f)
        runs.append((label, attribute(d, fw), parse_seed(d, label),
                     e["psnr"], e["ssim"]))

    print("| run | PSNR | SSIM |")
    print("|---|---|---|")
    for label, _fw, _seed, p, s in runs:
        print(f"| {label} | {p:.2f} | {s:.3f} |")

    import statistics as st
    for fw in ("torch", "jax"):
        vals = [(p, s) for _l, f, _sd, p, s in runs if f == fw]
        if len(vals) < 2:
            continue
        ps = [v[0] for v in vals]
        ss = [v[1] for v in vals]
        print(f"\n{fw}: n={len(ps)} PSNR mean {st.mean(ps):.2f} "
              f"± {st.stdev(ps):.2f} (min {min(ps):.2f} max {max(ps):.2f}); "
              f"SSIM mean {st.mean(ss):.3f} ± {st.stdev(ss):.3f}")
    tp = [p for _l, f, _sd, p, _s in runs if f == "torch"]
    jp = [p for _l, f, _sd, p, _s in runs if f == "jax"]
    if tp and jp:
        print(f"\ndelta (torch - jax) mean PSNR: "
              f"{st.mean(tp) - st.mean(jp):+.2f} dB; ranges overlap: "
              f"{max(min(tp), min(jp)) <= min(max(tp), max(jp))}")

    # paired per-seed statistics (the matched-init design's payoff)
    by = {}
    for _l, f, sd, p, s in runs:
        if sd is not None:
            by.setdefault(sd, {})[f] = (p, s)
    pairs = {sd: v for sd, v in by.items()
             if "torch" in v and "jax" in v}
    if len(pairs) >= 2:
        for mi, name in ((0, "PSNR"), (1, "SSIM")):
            ds = [v["torch"][mi] - v["jax"][mi]
                  for _sd, v in sorted(pairs.items())]
            n = len(ds)
            mean = st.mean(ds)
            sdv = st.stdev(ds)
            t = mean / (sdv / n ** 0.5) if sdv > 0 else float("inf")
            line = (f"\npaired {name} (torch - jax), n={n} seeds "
                    f"{sorted(pairs)}: per-seed "
                    f"{[round(d, 3) for d in ds]}; mean {mean:+.3f} "
                    f"± {sdv:.3f}; torch ahead in "
                    f"{sum(d > 0 for d in ds)}/{n}; paired t={t:.2f}")
            try:
                from scipy import stats as sps
                tt = sps.ttest_rel([v["torch"][mi]
                                    for _sd, v in sorted(pairs.items())],
                                   [v["jax"][mi]
                                    for _sd, v in sorted(pairs.items())])
                line += f", p={tt.pvalue:.4f}"
                if n >= 6:
                    w = sps.wilcoxon(ds)
                    line += f"; wilcoxon p={w.pvalue:.4f}"
            except Exception:
                pass
            print(line)


if __name__ == "__main__":
    main()
