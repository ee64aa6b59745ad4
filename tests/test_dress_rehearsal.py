"""Dress rehearsal for the environment-blocked pretrained assets.

Generates synthetic torch-layout stand-ins (VGG19 features, lpips-AlexNet
state_dict, full reference Lightning model.ckpt), runs ALL THREE
converters exactly as docs/data.md prescribes, then drives
`train.py --run_val --model_ckpt <converted>` with the npz env vars set —
the one command sequence that must work unmodified the day the real
weights/data arrive.  Eval must report a real (non-NaN) LPIPS and
vgg_random_init=false.
"""

import json
import os
import os.path as osp
import sys

import numpy as np
import pytest
import yaml

pytestmark = pytest.mark.slow     # full tiny eval render + 3 conversions


def test_asset_pipeline_end_to_end(tmp_path, monkeypatch):
    sys.path.insert(0, "/root/repo")
    sys.path.insert(0, "/root/repo/tools")
    try:
        import make_synthetic_assets as mk
        import convert_vgg
        import convert_lpips
        import convert_reference_ckpt as crc
        from vanerf_tpu import config as vconfig

        assets = str(tmp_path / "assets")

        # tiny config matching the synthetic fixture shapes
        cfg = vconfig.default_cfg()
        m = cfg["models"]["VANeRF"]
        m["train_out_h"] = m["train_out_w"] = 8
        m["geo_args"]["n_downsample"] = 2
        m["dr_kwargs"]["sample_per_ray_c"] = 8
        m["dr_kwargs"]["sample_per_ray_f"] = 8
        # 64^2: LPIPS needs >=32px mask crops (evaluator guard)
        cfg["dataset"]["synthetic_cfg"] = {"H": 64, "W": 64, "subdiv": 2,
                                           "n_frames": 2}
        cfg["out_dir"] = str(tmp_path / "out")
        cfg_path = str(tmp_path / "tiny.json")
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)

        # 1. generate the synthetic stand-ins (num_v=162: subdiv-2 hands;
        #    hw3=16: feat_tex at 64/2/2; hw4=64: full image)
        mk.main(["--out", assets, "--config", cfg_path,
                 "--num_v", "162", "--hw3", "16", "--hw4", "64"])
        for name in ("vgg19_features.pth", "lpips_alex.pth", "model.ckpt"):
            assert osp.exists(osp.join(assets, name)), name

        # 2. the three converters, exactly as documented
        vgg_npz = osp.join(assets, "vgg19.npz")
        lpips_npz = osp.join(assets, "lpips.npz")
        ckpt_pkl = osp.join(assets, "ckpt.pkl")
        sys.argv = ["convert_vgg.py", "--state_dict",
                    osp.join(assets, "vgg19_features.pth"),
                    "--out", vgg_npz]
        convert_vgg.main()
        sys.argv = ["convert_lpips.py", "--state_dict",
                    osp.join(assets, "lpips_alex.pth"), "--out", lpips_npz]
        convert_lpips.main()
        sys.argv = ["convert_reference_ckpt.py", "--ckpt",
                    osp.join(assets, "model.ckpt"), "--out", ckpt_pkl,
                    "--config", cfg_path]
        crc.main()

        # 3. the documented eval command with everything wired in
        monkeypatch.setenv("VANERF_VGG19_NPZ", vgg_npz)
        monkeypatch.setenv("VANERF_LPIPS_NPZ", lpips_npz)
        import train as train_cli
        train_cli.main(["--config", cfg_path, "--synthetic_data",
                        "--run_val", "--model_ckpt", ckpt_pkl,
                        "--out_dir", str(tmp_path / "out")])

        ymls = list((tmp_path / "out" / cfg["expname"]).glob("test_*.yml"))
        assert ymls, "run_val did not write a results YAML"
        with open(ymls[0]) as f:
            results = yaml.safe_load(f)
        # converted weights are LIVE: LPIPS real, VGG non-random,
        # checkpoint step taken from the converted ckpt
        assert results["lpips_pretrained"] is True
        assert results["vgg_random_init"] is False
        assert np.isfinite(float(results["lpips"])), results["lpips"]
        assert np.isfinite(float(results["psnr"]))
    finally:
        for p in ("/root/repo", "/root/repo/tools"):
            if p in sys.path:
                sys.path.remove(p)
