"""Orbax checkpointing: save/restore of the full train state.

Replaces the reference's three checkpoint mechanisms (SURVEY §5):
Lightning ``ModelCheckpoint`` + ``ckpt_path`` resume becomes orbax
save/restore of the full :class:`TrainState`; the partial warm-start
loader (``src/utils/weight.py``) becomes the explicit port tool
(:mod:`nope_tpu.training.port`); the dormant MPI broadcast loader is
subsumed by jax.distributed array placement.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp

from nope_tpu.training.train_state import TrainState


class CheckpointManager:
    """Thin orbax wrapper with the reference's cadence semantics
    (save every N optimizer steps, keep all:
    ``configs/callback/checkpoint/base.yaml``)."""

    def __init__(
        self,
        directory: str,
        save_interval_steps: int = 100,
        max_to_keep: Optional[int] = None,  # None == reference save_top_k=-1
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            save_interval_steps=save_interval_steps,
            max_to_keep=max_to_keep,
            create=True,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: TrainState, force: bool = False) -> bool:
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(state._asdict()), force=force
        )
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template._asdict())
        )
        return TrainState(**restored)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def save_params(path: str, params: Any, overwrite: bool = False) -> None:
    """One-shot params save (e.g. exported/ported weights).

    ``overwrite`` replaces an existing checkpoint at ``path`` (orbax
    refuses by default) — used by periodic re-saves of a running job.
    """
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=overwrite)
    ckptr.wait_until_finished()


def restore_params(path: str, template: Any = None) -> Any:
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)
