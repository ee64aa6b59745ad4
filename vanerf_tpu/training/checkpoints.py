"""Orbax checkpointing with auto-resume (the PL ModelCheckpoint replacement).

Parity target: reference ``train.py:27-44`` (save every epoch, keep all +
`last`, auto-resume from last unless --model_ckpt overrides) and
``VANeRFLightningModule.load_ckpt`` (``model.py:134-138``).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, ckpt_dir: str, max_to_keep: Optional[int] = None):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.mngr = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True),
        )

    def save(self, step: int, state: Any, metrics: Optional[dict] = None,
             wait: bool = True):
        """wait=False overlaps the disk write with subsequent compute
        (orbax still copies device->host synchronously inside save(), so
        donated/updated buffers cannot corrupt the snapshot; writes are
        atomic via temp dirs).  Call :meth:`wait` before reading the dir
        or exiting."""
        self.mngr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics, force=True)
        if wait:
            self.mngr.wait_until_finished()

    def wait(self):
        self.mngr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self.mngr.latest_step()

    def restore(self, state_template: Any, step: Optional[int] = None):
        if step is None:
            step = self.latest_step()
        if step is None:
            return None, None
        restored = self.mngr.restore(
            step, args=ocp.args.StandardRestore(state_template))
        return restored, step


def auto_resume(ckpt_dir: str, state_template: Any,
                model_ckpt: Optional[str] = None):
    """Resume from `last` checkpoint unless an explicit path is given
    (reference ``train.py:38-44``)."""
    if model_ckpt is not None:
        return restore_any(model_ckpt, state_template)
    mngr = CheckpointManager(ckpt_dir)
    return mngr.restore(state_template)


def load_converted_ckpt(path: str, state_template: Any):
    """Load a ``tools/convert_reference_ckpt.py`` output file into a
    TrainState.

    The converter writes a pickle {params_g, params_d, epoch, global_step}
    (torch state_dict -> flax trees); optimizer states come from the
    template (the reference ckpt's Adam moments are not convertible to
    optax trees and eval never touches them).
    """
    import pickle

    import jax
    import numpy as np

    with open(path, "rb") as f:
        blob = pickle.load(f)
    params_g, params_d = blob["params_g"], blob["params_d"]

    def check(name, conv, tmpl):
        c = dict(jax.tree_util.tree_flatten_with_path(conv)[0])
        t = dict(jax.tree_util.tree_flatten_with_path(tmpl)[0])
        missing = [k for k in t if k not in c]
        bad = [k for k in t if k in c
               and tuple(np.shape(c[k])) != tuple(np.shape(t[k]))]
        if missing or bad:
            raise ValueError(
                f"converted {name} does not match the model: "
                f"missing={missing[:5]} shape-mismatch={bad[:5]}")

    check("params_g", params_g, state_template.params_g)
    check("params_d", params_d, state_template.params_d)
    cast = lambda conv, tmpl: jax.tree.map(      # noqa: E731
        lambda c, t: jax.numpy.asarray(c, dtype=t.dtype), conv, tmpl)
    step = int(blob.get("global_step") or 0)
    state = state_template._replace(
        params_g=cast(params_g, state_template.params_g),
        params_d=cast(params_d, state_template.params_d),
        step=jax.numpy.asarray(step, dtype=state_template.step.dtype))
    return state, step


def restore_any(path: str, state_template: Any):
    """Restore from either an orbax checkpoint dir or a converted-ckpt
    pickle file (``--model_ckpt`` accepts both)."""
    if os.path.isfile(path):
        return load_converted_ckpt(path, state_template)
    return CheckpointManager(path).restore(state_template)
