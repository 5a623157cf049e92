"""Training loop: the Lightning Trainer replacement.

One process drives: combined multi-dataset loading → device-sharded
jitted train step → metric logging (JSONL + optional TensorBoard) →
orbax checkpointing/resume → periodic geodesic validation.  DDP, NCCL,
``sync_dist`` and callbacks (SURVEY §2.8) all collapse into the mesh-
aware jitted step; the trainer is plain Python.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np
import jax

from nope_tpu.configs.config import ExperimentConfig
from nope_tpu.data.pipeline import CombinedLoader, device_prefetch
from nope_tpu.parallel.mesh import create_mesh, data_sharding, replicate
from nope_tpu.tasks.pose_conditional import PoseConditionalTask
from nope_tpu.training.checkpoint import CheckpointManager, fetch_sequential
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import TrainState, create_train_state, make_train_step


class MetricLogger:
    """JSONL metric stream + optional tensorboardX + optional W&B.

    The W&B sink mirrors the reference's ``WandbLogger`` usage
    (``train.py:34``, ``model.py:164-191``): enabled when a project name
    is configured AND the wandb package imports; otherwise metrics flow
    to JSONL/TB only (wandb is not part of this image)."""

    def __init__(
        self,
        save_dir: str,
        wandb_project: Optional[str] = None,
        wandb_api_key: Optional[str] = None,
        wandb_config: Optional[dict] = None,
    ):
        os.makedirs(save_dir, exist_ok=True)
        self._jsonl = open(os.path.join(save_dir, "metrics.jsonl"), "a")
        try:
            from tensorboardX import SummaryWriter

            self._tb = SummaryWriter(os.path.join(save_dir, "tb"))
        except Exception:
            self._tb = None
        self._wandb = None
        if wandb_project:
            # the env-var handoff is the reference's own mechanism
            # (train.py:34); ALWAYS restore the previous value afterwards
            # (wandb keeps the key internally once initialised) so the
            # credential never stays exported to later code and child
            # processes
            prev_key = os.environ.get("WANDB_API_KEY")
            try:
                if wandb_api_key:
                    os.environ["WANDB_API_KEY"] = wandb_api_key
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, dir=save_dir, config=wandb_config or {}
                )
            except Exception as e:
                logging.warning("wandb requested but unavailable (%s); "
                                "logging to JSONL/TB only", e)
            finally:
                if wandb_api_key:
                    if prev_key is None:
                        os.environ.pop("WANDB_API_KEY", None)
                    else:
                        os.environ["WANDB_API_KEY"] = prev_key

    def log(self, step: int, metrics: Dict[str, float]) -> None:
        record = {"step": int(step)}
        record.update({k: float(v) for k, v in metrics.items()})
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in record.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(
                {k: v for k, v in record.items() if k != "step"}, step=step
            )

    def log_image(self, key: str, path: str, step: int) -> None:
        """Media grid → W&B image (``model.py:164``); no-op without W&B
        (the PNG itself is already on disk for JSONL/TB users)."""
        if self._wandb is not None:
            try:
                import wandb

                self._wandb.log({key: wandb.Image(path)}, step=step)
            except Exception as e:
                logging.warning("wandb image log failed: %s", e)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


class Trainer:
    def __init__(
        self,
        cfg: ExperimentConfig,
        task: PoseConditionalTask,
        train_loaders: Dict[str, Iterable],
        val_fn: Optional[Callable[[TrainState], Dict[str, float]]] = None,
    ):
        self.cfg = cfg
        self.task = task
        self.combined = CombinedLoader(train_loaders)
        self.val_fn = val_fn

        steps_per_epoch = len(self.combined)
        self.tx = make_optimizer(
            optim_name=cfg.model.optim_config.optim_name,
            base_lr=cfg.model.optim_config.lr,
            weight_decay=cfg.model.optim_config.weight_decay,
            warm_up_steps=cfg.model.optim_config.warm_up_steps,
            milestones_epochs=cfg.model.optim_config.milestones_epochs,
            gamma=cfg.model.optim_config.gamma,
            steps_per_epoch=steps_per_epoch,
            clip_grad_norm=cfg.model.optim_config.clip_grad_norm,
            skip_spike_factor=getattr(
                cfg.model.optim_config, "skip_spike_factor", 0.0
            ),
        )
        # LR stream for the metric log (LearningRateMonitor analogue,
        # configs/callback/lr/base.yaml)
        from nope_tpu.training.optim import make_lr_schedule

        self.lr_schedule = make_lr_schedule(
            base_lr=cfg.model.optim_config.lr,
            warm_up_steps=cfg.model.optim_config.warm_up_steps,
            milestones_epochs=cfg.model.optim_config.milestones_epochs,
            gamma=cfg.model.optim_config.gamma,
            steps_per_epoch=steps_per_epoch,
        )
        self.mesh = create_mesh(
            data=cfg.machine.mesh_data, template=cfg.machine.mesh_template
        )
        # ZeRO-1 (machine.zero1): AdamW moments shard over the data axis.
        # The sharding pytree needs the state's tree structure only, so
        # eval_shape derives it without instantiating any parameters.
        self._state_shardings = None
        if getattr(cfg.machine, "zero1", False):
            from nope_tpu.parallel.zero import zero1_state_shardings

            state_shape = jax.eval_shape(
                lambda: create_train_state(
                    task, self.tx, jax.random.key(cfg.trainer.seed),
                    image_size=cfg.model.img_size,
                )
            )
            self._state_shardings = zero1_state_shardings(state_shape, self.mesh)
        # parameter EMA (optim_config.ema_decay > 0): the update is
        # fused into the jitted step — see make_train_step(ema_decay=)
        self.ema_decay = float(
            getattr(cfg.model.optim_config, "ema_decay", 0.0) or 0.0
        )
        self.ema_params = None  # populated by init_state when enabled
        self.train_step = make_train_step(
            task, self.tx,
            half_precision=getattr(cfg.model.optim_config, "half_precision_train", False),
            state_shardings=self._state_shardings,
            ema_decay=self.ema_decay,
        )
        user = getattr(cfg, "user", None)
        self.logger = MetricLogger(
            cfg.save_dir,
            wandb_project=getattr(user, "wandb_project_name", None),
            wandb_api_key=getattr(user, "wandb_api_key", None),
            wandb_config={"name_exp": cfg.name_exp},
        )
        self.ckpt = CheckpointManager(
            os.path.join(cfg.save_dir, "checkpoints"),
            save_interval_steps=cfg.trainer.checkpoint_every_n_steps,
            max_to_keep=cfg.trainer.keep_checkpoints,
        )
        # reconstruction grids every N steps (model.py:141-166 media
        # logging analogue); 0 disables
        self.media_every_n_steps = getattr(cfg.trainer, "media_every_n_steps", 1000)
        # monitored best-checkpoint selection (ModelCheckpoint monitor/
        # mode, configs/callback/checkpoint/base.yaml:5-7).  The tracker
        # persists in best.json so a resumed run keeps selecting against
        # the whole-run best, not "best since resume".
        self.monitor = getattr(cfg.trainer, "monitor", "") or ""
        self.monitor_mode = getattr(cfg.trainer, "monitor_mode", "min")
        self._best = {"value": None, "step": -1, "stream": ""}
        self._best_json = os.path.join(cfg.save_dir, "checkpoints", "best.json")
        if self.monitor and os.path.exists(self._best_json):
            with open(self._best_json) as f:
                self._best = json.load(f)
            logging.info(
                "best-checkpoint tracker resumed: %s=%s at step %s (%s)",
                self.monitor, self._best["value"], self._best["step"],
                self._best["stream"],
            )

    def _log_media(self, state: TrainState, batches, step: int) -> None:
        """Save a reference | query | prediction comparison grid for the
        first dataset's batch (decode path exists only for VAE encoders)."""
        try:
            from nope_tpu.utils.visualization import save_image_grid, unnormalize

            params = {"unet": state.unet_params, "vae": state.vae_params}
            name, batch = next(iter(batches.items()))

            def f32(x):  # uint8 wire batches normalize on device in the
                x = np.asarray(x)  # step; media grids normalize here
                if x.dtype == np.uint8:
                    return x.astype(np.float32) / 255.0 * 2.0 - 1.0
                return x

            batch = {k: f32(v) for k, v in batch.items()}
            _, pred_rgb = self.task.sample(
                params, batch["reference"][:4], batch["relativeR"][:4], decode_rgb=True
            )
            if pred_rgb is None:
                return
            # rank-suffixed like the reference (model.py:146) so
            # multi-host runs on shared storage never collide
            path = os.path.join(
                self.cfg.save_dir, "media",
                f"reconst_step{step}_rank{jax.process_index()}.png",
            )
            save_image_grid(
                [
                    unnormalize(np.asarray(batch["reference"][:4])),
                    unnormalize(np.asarray(batch["query"][:4])),
                    np.asarray(pred_rgb),
                ],
                path,
            )
            self.logger.log_image(f"reconstruction/train_{name}", path, step)
            logging.info("media grid written: %s", path)
        except Exception as e:  # media logging must never kill training
            logging.warning("media logging failed: %s", e)

    def _update_best(self, step: int, streams) -> None:
        """Monitored best-checkpoint selection: if any stream improves
        ``cfg.trainer.monitor``, export its params (unet + frozen vae)
        to <save_dir>/checkpoints/best and persist the tracker in
        best.json (so resume keeps the WHOLE-run best).  Reference:
        ModelCheckpoint monitor/mode, configs/callback/checkpoint/
        base.yaml:5-7."""
        sign = -1.0 if self.monitor_mode == "max" else 1.0
        winner = None
        for stream, st, scores in streams:
            if self.monitor not in scores:
                logging.warning(
                    "monitor key %r missing from val scores %s",
                    self.monitor, sorted(scores),
                )
                continue
            v = float(scores[self.monitor])
            best_v = self._best["value"]
            cur = sign * v
            if best_v is None or cur < sign * float(best_v):
                self._best = {"value": v, "step": step, "stream": stream}
                winner = st
        if winner is None:
            return
        from nope_tpu.training.checkpoint import save_params

        best_dir = os.path.join(self.cfg.save_dir, "checkpoints", "best")
        save_params(
            best_dir,
            fetch_sequential(
                {"unet": winner.unet_params, "vae": winner.vae_params}
            ),
            overwrite=True,
        )
        with open(self._best_json, "w") as f:
            json.dump({**self._best, "monitor": self.monitor}, f)
        logging.info(
            "best checkpoint updated: %s=%s at step %d (%s) -> %s",
            self.monitor, self._best["value"], step, self._best["stream"],
            best_dir,
        )

    # -- state ------------------------------------------------------------

    def init_state(self, resume: bool = True) -> TrainState:
        state = create_train_state(
            self.task, self.tx, jax.random.key(self.cfg.trainer.seed),
            image_size=self.cfg.model.img_size,
        )
        ema = None
        if resume and self.ckpt.latest_step() is not None:
            logging.info("resuming from step %s", self.ckpt.latest_step())
            if self.ema_decay:
                state, ema = self.ckpt.restore_with_ema(state, state.unet_params)
                if ema is None:
                    logging.warning(
                        "checkpoint has no EMA stream (pre-EMA run?); "
                        "seeding EMA from the restored params"
                    )
            else:
                state = self.ckpt.restore(state)
        state = jax.device_put(
            state,
            self._state_shardings
            if self._state_shardings is not None
            else replicate(self.mesh),
        )
        if self.ema_decay:
            if ema is None:
                # fresh stream seeded from the current params; must be a
                # REAL copy — the jitted step donates BOTH the state and
                # the EMA buffers, and an aliased seed would be donated
                # twice on the first step
                import jax.numpy as jnp

                ema = jax.tree.map(
                    lambda x: jnp.array(x, copy=True), state.unet_params
                )
            self.ema_params = jax.device_put(ema, replicate(self.mesh))
        return state

    # -- loop ------------------------------------------------------------

    def fit(self, state: Optional[TrainState] = None, max_steps: Optional[int] = None):
        cfg = self.cfg
        state = self.init_state() if state is None else state
        max_steps = max_steps or cfg.trainer.max_steps or (
            cfg.trainer.max_epochs * len(self.combined)
        )

        # sanity validation (the reference's num_sanity_val_steps)
        if self.val_fn is not None and cfg.trainer.num_sanity_val_steps > 0:
            logging.info("sanity validation...")
            self.val_fn(state)

        step = int(state.step)
        if step:
            # deterministic resume of the DATA stream: position every
            # loader (shuffle epoch + within-epoch offset + the
            # dataset's set_epoch sampling stream) exactly where an
            # uninterrupted run would be after `step` optimizer steps.
            # The reference's Lightning resume (train.py:142-149)
            # restores the epoch counter but replays the epoch-0
            # sampler order; here the continued (index, loss) stream is
            # bit-identical to an uninterrupted run
            # (tests/test_elastic_resume.py::test_resume_replays_exact_data_stream).
            self.combined.set_state(step)
        first_step = step
        t_last = time.perf_counter()
        def shard(batches):
            return {
                name: {
                    k: jax.device_put(v, data_sharding(self.mesh, np.ndim(v)))
                    for k, v in b.items()
                }
                for name, b in batches.items()
            }

        while step < max_steps:
            # async host->device: keep 2 sharded batches in flight
            for batches in device_prefetch(
                map(shard, iter(self.combined)), sharding=None, depth=2
            ):
                if self.ema_decay:
                    state, metrics, self.ema_params = self.train_step(
                        state, batches, self.ema_params
                    )
                else:
                    state, metrics = self.train_step(state, batches)
                step = int(state.step)
                if step == first_step + 1:
                    # int(state.step) above fenced on the step result;
                    # on the tunnelled backend the first step blocks on
                    # a SERVER-side compile that can take minutes —
                    # surface it so a compile stall is distinguishable
                    # from a loader stall
                    logging.info(
                        "first step done in %.1f s (server-side compile "
                        "included)", time.perf_counter() - t_last,
                    )
                    t_last = time.perf_counter()

                if step % cfg.trainer.log_every_n_steps == 0:
                    now = time.perf_counter()
                    metrics = {k: float(v) for k, v in metrics.items()}
                    metrics["steps_per_sec"] = cfg.trainer.log_every_n_steps / (
                        now - t_last
                    )
                    metrics["lr"] = float(self.lr_schedule(step))
                    t_last = now
                    self.logger.log(step, metrics)

                if step % cfg.trainer.checkpoint_every_n_steps == 0:
                    # leaf-at-a-time fetch: a whole-tree device_get of
                    # the ~3x-params TrainState bursts multi-GB over the
                    # device link (checkpoint.fetch_sequential)
                    self.ckpt.save(
                        step, fetch_sequential(state),
                        ema_params=(fetch_sequential(self.ema_params)
                                    if self.ema_decay else None),
                    )

                if (
                    self.media_every_n_steps
                    and step % self.media_every_n_steps == 0
                ):
                    self._log_media(state, batches, step)

                if self.val_fn is not None and step % cfg.trainer.val_check_interval == 0:
                    scores = self.val_fn(state)
                    self.logger.log(step, {f"val/{k}": v for k, v in scores.items()})
                    streams = [("inst", state, scores)]
                    if self.ema_decay:
                        # EMA stream evaluated alongside (diffusion-eval
                        # convention); _replace only aliases, read-only
                        ema_state = state._replace(unet_params=self.ema_params)
                        ema_scores = self.val_fn(ema_state)
                        self.logger.log(
                            step,
                            {f"val_ema/{k}": v for k, v in ema_scores.items()},
                        )
                        streams.append(("ema", ema_state, ema_scores))
                    if self.monitor:
                        self._update_best(step, streams)

                if step >= max_steps:
                    break
        self.ckpt.wait()
        return state
