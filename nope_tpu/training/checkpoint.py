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
import numpy as np
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

    def save(
        self, step: int, state: TrainState, force: bool = False,
        ema_params: Any = None,
    ) -> bool:
        """``ema_params`` (optional) rides in the same checkpoint under
        an ``ema_params`` key, so an EMA-enabled run resumes its EMA
        stream exactly; omitting it keeps the layout of pre-EMA
        checkpoints byte-compatible."""
        d = state._asdict()
        if ema_params is not None:
            d["ema_params"] = ema_params
        saved = self._mgr.save(
            step, args=ocp.args.StandardSave(d), force=force
        )
        return bool(saved)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template: TrainState, step: Optional[int] = None) -> TrainState:
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = state_template._asdict()
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except ValueError:
            # EMA checkpoint read without EMA: StandardRestore requires
            # the template to match the stored tree exactly in BOTH
            # directions (and item_metadata cannot introspect a
            # StandardSave from a fresh manager), so retry with the EMA
            # stream in the template and discard it.  A genuinely
            # corrupt/foreign layout still fails on this second,
            # exact-match attempt.
            template = dict(template, ema_params=state_template.unet_params)
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        restored.pop("ema_params", None)
        return TrainState(**restored)

    def restore_with_ema(
        self, state_template: TrainState, ema_template: Any,
        step: Optional[int] = None,
    ):
        """(state, ema_params) from a checkpoint saved with
        ``ema_params``; ``(state, None)`` when resuming an EMA-enabled
        run from a pre-EMA checkpoint (the caller seeds a fresh EMA)."""
        step = self._mgr.latest_step() if step is None else step
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {self.directory}")
        template = state_template._asdict()
        template["ema_params"] = ema_template
        try:
            restored = self._mgr.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        except ValueError:  # pre-EMA layout on disk
            return self.restore(state_template, step=step), None
        ema = restored.pop("ema_params")
        return TrainState(**restored), ema

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def fetch_sequential(tree: Any) -> Any:
    """Device→host fetch one leaf at a time (synchronous per leaf).

    ``jax.device_get`` starts the async copy of EVERY leaf before
    materializing any of them — a multi-GB burst for a full TrainState
    (params + Adam moments ≈ 3x params).  On bandwidth-constrained or
    proxied device links a burst that size can stall the transport
    (observed on this project's tunnelled v5e: a ~2 GB whole-tree fetch
    wedged the client permanently while fresh processes talked to the
    chip fine).  Fetching leaf-by-leaf bounds in-flight bytes by the
    largest single leaf (~85 MB here) at a negligible cost next to the
    checkpoint's disk write."""
    return jax.tree.map(lambda x: np.asarray(x), tree)


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
