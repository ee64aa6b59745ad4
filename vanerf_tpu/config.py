"""Config system: JSON/YAML loader + CLI, schema-compatible with the reference.

Mirrors the behavior of the reference's ``src/config.py:11-102`` — the same
JSON schema (``configs/vanerf.json``) and the same CLI flags (``--config
--data_root --out_dir --run_val --in_the_wild --fast_dev_run --model_ckpt
--num_gpus``) so existing configs and launch scripts work unchanged.  The
``--num_gpus`` flag is interpreted as the number of data-parallel devices in
the `jax.sharding.Mesh`.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import pathlib
import subprocess

import yaml

logger = logging.getLogger("vanerf_tpu")


def create_parser() -> argparse.ArgumentParser:
    """CLI parser — flag-compatible with reference ``src/config.py:11-51``."""
    parser = argparse.ArgumentParser(description="Run VANeRF (TPU).")
    parser.add_argument("--config", type=str, help="Configuration file")
    parser.add_argument("--data_root", type=str, required=False,
                        help="Data directory")
    parser.add_argument("--out_dir", type=str, default=None, required=False,
                        help="Overwrite the log directory from the config.")
    parser.add_argument("--run_val", action="store_true")
    parser.add_argument("--in_the_wild", action="store_true")
    parser.add_argument("--fast_dev_run", action="store_true")
    parser.add_argument("--model_ckpt", type=str, default=None)
    parser.add_argument("--num_gpus", default=1, type=int,
                        help="Number of data-parallel devices (mesh size).")
    # TPU-build extensions (additive; do not break reference launch lines).
    parser.add_argument("--synthetic_data", action="store_true",
                        help="Run on the built-in synthetic fixture dataset.")
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="If set, write jax.profiler traces here.")
    return parser


def resolve_flags(args) -> None:
    """Post-parse flag routing (mutates args in place).

    ``--in_the_wild``: the reference's own code path is broken (ref
    ``train.py:73`` references an undefined ``model_in_the_wild``), so the
    flag routes to the eval path — equivalent to ``--run_val``. Documented
    deviation (PARITY.md).
    """
    if getattr(args, "in_the_wild", False):
        logger.warning("--in_the_wild: reference code path is broken "
                       "upstream (train.py:73); treating as --run_val.")
        args.run_val = True


def load_cfg(path: str) -> dict:
    """Load a JSON or YAML config (reference ``src/config.py:54-68``)."""
    if path.endswith(".json"):
        with open(path, "r") as file:
            return json.load(file)
    if path.endswith(".yml") or path.endswith(".yaml"):
        with open(path, "r") as file:
            return yaml.safe_load(file)
    raise ValueError("Invalid config file.")


def save_config(dst_directory: str, config: dict) -> None:
    """Save the run config + git head (reference ``src/config.py:70-84``)."""
    pathlib.Path(dst_directory).mkdir(parents=True, exist_ok=True)
    dst_path = os.path.join(dst_directory, "config.json")
    config = dict(config)
    config["git_head"] = get_git_commit_head()
    with open(dst_path, "w") as file:
        json.dump(config, file, indent=4, default=str)


def get_git_commit_head() -> str:
    try:
        head = subprocess.check_output(
            "git rev-parse HEAD", stderr=subprocess.DEVNULL, shell=True)
        return head.decode("utf-8").strip()
    except (subprocess.SubprocessError, UnicodeDecodeError):
        logger.warning("Git commit is not saved.")
        return ""


# ---------------------------------------------------------------------------
# Typed views over the raw dict (the raw dict remains the source of truth so
# the exact reference schema keeps working, incl. `.get` defaults).
# ---------------------------------------------------------------------------

def model_cfg(cfg: dict) -> dict:
    return cfg["models"]["VANeRF"]


def disc_cfg(cfg: dict) -> dict:
    return cfg["models"]["Discriminator"]


def default_cfg() -> dict:
    """A self-contained default config equal to configs/vanerf.json."""
    here = pathlib.Path(__file__).resolve().parent.parent
    return load_cfg(str(here / "configs" / "vanerf.json"))
