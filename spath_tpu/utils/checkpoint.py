"""Checkpoint/resume for the inverse-rendering loop.

The reference has no serialization of any kind (every frame recomputed
from scratch, ``README.md`` limitations; SURVEY.md §5 "Checkpoint /
resume: None"). The differentiable training loop needs it: orbax
PyTree checkpoints of ``(params, opt_state, step)`` with keep-latest
retention and crash-safe atomic writes (orbax's default behavior).
"""

from __future__ import annotations

import os
from typing import Any

import orbax.checkpoint as ocp


class Checkpointer:
    """Thin orbax wrapper: numbered step checkpoints under one dir."""

    def __init__(self, directory: str, keep: int = 3):
        self._dir = os.path.abspath(directory)
        os.makedirs(self._dir, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self._dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True
            ),
        )

    def save(self, step: int, state: Any) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()

    def restore_latest(self, template: Any):
        """Restore the newest checkpoint shaped like ``template``;
        None if the directory has no checkpoints."""
        step = self._mngr.latest_step()
        if step is None:
            return None
        return self._mngr.restore(
            step, args=ocp.args.StandardRestore(template)
        )

    def latest_step(self):
        return self._mngr.latest_step()
