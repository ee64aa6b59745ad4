"""Held-out render-suite quality gate for the approximate serving tiers.

Renders N fixed synthetic test frames EXACTLY and under each candidate
approximation config (``VANERF_FAR_TAU`` / ``VANERF_FAR_SKIP`` sweeps),
then reports per-config PSNR/SSIM of the approximate render against the
exact render (plus PSNR vs GT when a trained checkpoint is given, so the
delta can be read against the model's own fidelity).  This is the gate
VERDICT r2 Weak #4 asked for: a tier may default on only if its PSNR
delta vs the exact render stays above the gate (i.e. the approximation
error is far below the model's own error floor).

Usage (trained ckpt strongly preferred — the tiers' premise is the
TRAINED sigmoid-beta's density saturation):
  python tools/quality_gate.py --ckpt /tmp/EXP_SYNTH/vanerf/ckpts \
      [--frames 4] [--sweep default]
Prints one JSON line per config; the exact render is the reference.
"""

import argparse
import itertools
import json
import os
import sys

sys.path.append(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SWEEPS = {
    "default": [
        {"VANERF_FAR_TAU": "0.02"},
        {"VANERF_FAR_TAU": "0.03"},
        {"VANERF_FAR_SKIP": "0.75"},
        {"VANERF_FAR_SKIP": "0.5"},
        {"VANERF_FAR_SKIP": "0.375"},
        {"VANERF_FAR_TAU": "0.02", "VANERF_FAR_SKIP": "0.5"},
        {"VANERF_FAR_TAU": "0.03", "VANERF_FAR_SKIP": "0.375"},
    ],
    # global nearest-to-surface network budget (threshold-adaptive)
    "far_net": [
        {"VANERF_FAR_NET": "0.75"},
        {"VANERF_FAR_NET": "0.5"},
        {"VANERF_FAR_NET": "0.375"},
        {"VANERF_FAR_NET": "0.25"},
        {"VANERF_FAR_NET": "0.5", "VANERF_FAR_TAU": "0.02"},
        {"VANERF_FAR_NET": "0.375", "VANERF_FAR_TAU": "0.02"},
    ],
    # compact re-gate for a new checkpoint (VERDICT r3 item 8): the tau
    # serving default + the recommended budget tiers of both skip modes
    "regate": [
        {"VANERF_FAR_TAU": "0.02"},
        {"VANERF_FAR_NET": "0.5"},
        {"VANERF_FAR_NET": "0.375"},
        {"VANERF_FAR_TNET": "0.5"},
        {"VANERF_FAR_TNET": "0.375"},
    ],
    # round-5 TNET inheritance impl A/B: log-shift select fill (default,
    # reach 2^4-1 = 15 of 128 samples) vs the full-range scan+gather
    "tnet_impl": [
        {"VANERF_FAR_TNET": "0.5"},
        {"VANERF_FAR_TNET": "0.5", "VANERF_TNET_IMPL": "scan"},
        {"VANERF_FAR_TNET": "0.375"},
        {"VANERF_FAR_TNET": "0.375", "VANERF_TNET_IMPL": "scan"},
        {"VANERF_FAR_NET": "0.375"},
    ],
    # per-sample skip with nearest-evaluated inheritance (VERDICT r4 #5)
    "far_tnet": [
        {"VANERF_FAR_TNET": "0.5"},
        {"VANERF_FAR_TNET": "0.375"},
        {"VANERF_FAR_TNET": "0.25"},
        {"VANERF_FAR_TNET": "0.5", "VANERF_FAR_TAU": "0.02"},
        {"VANERF_FAR_TNET": "0.375", "VANERF_FAR_TAU": "0.02"},
        {"VANERF_FAR_TNET": "0.25", "VANERF_FAR_TAU": "0.02"},
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default=None,
                    help="orbax ckpt dir or converted pickle; random init "
                         "if omitted (worst case, documented)")
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--sweep", default="default")
    ap.add_argument("--H", type=int, default=256)
    args = ap.parse_args()

    # pin the EXACT baseline: tau now defaults ON at serving, so the
    # reference render must force it off
    os.environ["VANERF_FAR_TAU"] = "0"
    for k in ("VANERF_FAR_SKIP", "VANERF_FAR_NET", "VANERF_FAR_TNET"):
        os.environ.pop(k, None)
    # env-pin the OTHER tiers off too so config `inference` defaults
    # cannot leak into the exact baseline
    os.environ["VANERF_FAR_SKIP"] = "0"
    os.environ["VANERF_FAR_NET"] = "0"
    os.environ["VANERF_FAR_TNET"] = "0"

    import jax
    import jax.numpy as jnp
    import numpy as np
    from vanerf_tpu import config as vconfig
    from vanerf_tpu import losses as L
    from vanerf_tpu.data import SyntheticDataset
    from vanerf_tpu.evaluator import compute_psnr, compute_ssim_crop
    from vanerf_tpu.models import VANeRF, DiscriminatorVis
    from vanerf_tpu.renderer import render_full_image
    from vanerf_tpu.training.loop import collate_numpy
    from vanerf_tpu.training.train_step import create_train_state

    cfg = vconfig.default_cfg()
    ds = SyntheticDataset(n_frames=max(2, args.frames), split="test",
                          H=args.H, W=args.H, subdiv=3)
    model = VANeRF.from_config(cfg, num_v=ds.num_v)
    disc = DiscriminatorVis()
    item0 = ds[0]
    batch0 = collate_numpy([item0], faces=ds.faces)
    state, _tx = create_train_state(model, disc, jax.random.PRNGKey(0),
                                    batch0, cfg, steps_per_epoch=10)
    if args.ckpt:
        from vanerf_tpu.training.checkpoints import restore_any
        restored, step = restore_any(args.ckpt, state)
        assert restored is not None, f"no checkpoint under {args.ckpt}"
        state = restored
        print(f"# loaded ckpt step {step}", file=sys.stderr)
    else:
        print("# RANDOM INIT params — worst-case beta, see docstring",
              file=sys.stderr)

    import math
    level = max(1, int(math.log2(args.H)) - 5)

    def render_suite():
        outs = []
        for i in range(args.frames):
            item = ds[i * ds.n_cams % len(ds)]
            batch = collate_numpy([item], faces=ds.faces)
            out = render_full_image(model, state.params_g, batch,
                                    level=level)
            outs.append((np.clip(np.asarray(out["tex_fg_fine"])[0], 0, 1),
                         np.asarray(batch["tar_img"])[0],
                         np.asarray(batch["tar_mask"])[0, ..., 0] > 0))
        return outs

    exact = render_suite()
    gt_psnr = float(np.mean([compute_psnr(p, g) for p, g, _ in exact]))
    print(json.dumps({"config": "exact", "psnr_vs_exact": None,
                      "ssim_vs_exact": None, "psnr_vs_gt": gt_psnr}))

    # the config-schema serving defaults (`inference` section — env vars
    # override them; renderer.resolve_tier) are themselves a gated row, so
    # the gate certifies exactly what a saved config.json will run
    inf = cfg.get("inference", {})
    cfg_flags = {f"VANERF_FAR_{k.split('_', 1)[1].upper()}": str(v)
                 for k, v in inf.items()
                 if k in ("far_tau", "far_skip", "far_net", "far_tnet")
                 and float(v) > 0}
    sweep = ([dict(cfg_flags, _label="config-inference-defaults")]
             if cfg_flags else []) + SWEEPS[args.sweep]

    for row in sweep:
        label = row.get("_label")
        flags = {k: v for k, v in row.items() if not k.startswith("_")}
        os.environ.update(flags)
        approx = render_suite()
        for k in ("VANERF_FAR_TAU", "VANERF_FAR_SKIP", "VANERF_FAR_NET",
                  "VANERF_FAR_TNET"):
            os.environ[k] = "0"     # re-pin the exact/off baseline
        os.environ.pop("VANERF_TNET_IMPL", None)
        dp = float(np.mean([compute_psnr(a[0], e[0])
                            for a, e in zip(approx, exact)]))
        dssim = float(np.mean([compute_ssim_crop(a[0], e[0], e[2])
                               for a, e in zip(approx, exact)]))
        gp = float(np.mean([compute_psnr(p, g) for p, g, _ in approx]))
        rec = {"config": flags, "psnr_vs_exact": round(dp, 2),
               "ssim_vs_exact": round(dssim, 4),
               "psnr_vs_gt": round(gp, 3),
               "gt_psnr_delta": round(gp - gt_psnr, 4)}
        if label:
            rec["label"] = label
        print(json.dumps(rec))


if __name__ == "__main__":
    main()
