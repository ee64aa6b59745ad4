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

    def save(self, step: int, state: Any, metrics: Optional[dict] = None):
        self.mngr.save(step, args=ocp.args.StandardSave(state),
                       metrics=metrics, force=True)
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
        mngr = CheckpointManager(model_ckpt)
        return mngr.restore(state_template)
    mngr = CheckpointManager(ckpt_dir)
    return mngr.restore(state_template)
