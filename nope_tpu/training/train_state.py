"""Train state + jitted train step.

The DDP/Lightning training loop of the reference collapses into one
jitted, donated function: forward (symmetrized loss over every dataset
in the combined batch), backward, AdamW update.  Under a data-sharded
mesh XLA inserts the gradient all-reduce itself — the NCCL/`sync_dist`
machinery of the reference (SURVEY §2.8) has no hand-written analogue
here by design.

The VAE is frozen (reference: no-grad encoder): its params live in the
state but receive no optimizer state and no updates.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from nope_tpu.tasks.pose_conditional import PoseConditionalTask


class TrainState(NamedTuple):
    step: jax.Array
    unet_params: Any
    vae_params: Any  # frozen
    opt_state: Any


def create_train_state(
    task: PoseConditionalTask, tx: optax.GradientTransformation, key: jax.Array,
    image_size: int = 256,
) -> TrainState:
    params = task.init(key, image_size=image_size)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        unet_params=params["unet"],
        vae_params=params["vae"],
        opt_state=tx.init(params["unet"]),
    )


def make_train_step(task: PoseConditionalTask, tx: optax.GradientTransformation):
    """Build the jitted train step: state, {dataset: batch} → state', metrics.

    The per-dataset losses and their average are returned exactly like
    the reference logs them (``model.py:169-182``).
    """

    def loss_fn(unet_params, vae_params, batches):
        params = {"unet": unet_params, "vae": vae_params}
        avg, per_dataset = task.multi_dataset_loss(params, batches)
        return avg, per_dataset

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, batches: Dict[str, Dict[str, jax.Array]]
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        (avg, per_dataset), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.unet_params, state.vae_params, batches
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.unet_params)
        unet_params = optax.apply_updates(state.unet_params, updates)
        metrics = {"loss/train_avg": avg}
        metrics.update({f"loss/train_{k}": v for k, v in per_dataset.items()})
        new_state = TrainState(
            step=state.step + 1,
            unet_params=unet_params,
            vae_params=state.vae_params,
            opt_state=opt_state,
        )
        return new_state, metrics

    return train_step
