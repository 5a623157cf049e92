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


GRAD_TRACE_GROUPS = ("pose_mlp", "cond_mlp", "attn", "conv")


def _grad_trace_group(path) -> str:
    """Map a param-tree path to a diagnostic group.

    Groups follow the U-Net's conditioning anatomy (``models/blocks.py``):
    the global pose embedding MLP (``pose_mlp``), the per-block
    conditioning injections (``mlp_dense`` scale/shift Dense +
    ``mlp_ref`` reference-branch Block), attention (``*_attn`` incl.
    their qkv/out convs), and everything else (the conv trunk).
    """
    s = jax.tree_util.keystr(path)
    if "pose_mlp" in s:
        return "pose_mlp"
    if "mlp_dense" in s or "mlp_ref" in s:
        return "cond_mlp"
    if "attn" in s:
        return "attn"
    return "conv"


def _group_norms(tree, prefix: str) -> Dict[str, jax.Array]:
    """Per-group L2 norms (plus global) of a gradient/update pytree."""
    sq = {g: jnp.zeros((), jnp.float32) for g in GRAD_TRACE_GROUPS}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        g = _grad_trace_group(path)
        sq[g] = sq[g] + jnp.sum(jnp.square(leaf.astype(jnp.float32)))
    out = {f"{prefix}/{g}": jnp.sqrt(v) for g, v in sq.items()}
    out[f"{prefix}/global"] = jnp.sqrt(
        sum(v for v in sq.values())
    )
    return out


def make_train_step(
    task: PoseConditionalTask,
    tx: optax.GradientTransformation,
    half_precision: bool = False,
    state_shardings: Any = None,
    grad_trace: bool = False,
    ema_decay: float = 0.0,
):
    """Build the jitted train step: state, {dataset: batch} → state', metrics.

    The per-dataset losses and their average are returned exactly like
    the reference logs them (``model.py:169-182``).

    ``state_shardings`` (a ``TrainState``-shaped pytree of
    ``NamedSharding``, e.g. from
    :func:`nope_tpu.parallel.zero.zero1_state_shardings`) pins the
    output state's layout so a ZeRO-sharded optimizer state stays
    sharded across steps instead of drifting to whatever GSPMD
    propagation picks; metrics stay unconstrained.

    ``half_precision`` runs forward+backward in bfloat16 while the
    master weights and the full optimizer state stay float32: params and
    batch are cast at the loss boundary, so the gradients JAX returns
    (the transpose of the f32→bf16 convert) are already float32 and feed
    AdamW unchanged.  bf16 shares float32's exponent range, so no loss
    scaling is needed (unlike fp16 AMP); the update differs from fp32
    only by bf16 rounding in the matmuls the MXU would run at bf16-class
    precision anyway.

    ``ema_decay`` > 0 changes the signature to
    ``(state, batches, ema_params) → (state', metrics, ema_params')``
    with the EMA update (ema ← β·ema + (1−β)·params', the reference's
    ``model_utils.py:175-195`` semantics on the POST-update params)
    fused into the same dispatch — a separate per-step jitted EMA call
    would double the per-step host dispatch count, which on a
    ~25 ms-latency tunnelled TPU costs ~30 min per 64k steps.

    ``grad_trace`` adds per-parameter-group L2 norms of the RAW
    gradients (pre-clipping — spike detection wants the unclipped
    signal) and of the APPLIED updates (post-clip, post-Adam) to the
    metrics: ``gnorm/{pose_mlp,cond_mlp,attn,conv,global}`` and
    ``unorm/...``.  Costs a few reductions per step — negligible next
    to the backward pass; the instrumented runs behind the round-5
    transient-collapse root-cause live in docs/PERFORMANCE.md.
    """
    from nope_tpu.tasks.pose_conditional import cast_half

    def loss_fn(unet_params, vae_params, batches):
        params = {"unet": unet_params, "vae": vae_params}
        # uint8 wire format (machine-side: datasets with
        # wire_dtype="uint8" ship raw crops): normalize on device, fused
        # into the step.  4x less host->device traffic than f32 images —
        # on a bandwidth-limited link the difference between a
        # data-starved and a compute-bound step (serving's
        # engine._device_images applies the same convention).
        batches = jax.tree.map(
            lambda x: x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
            if x.dtype == jnp.uint8 else x,
            batches,
        )
        if half_precision:
            params = cast_half(params)
            batches = cast_half(batches)
        avg, per_dataset = task.multi_dataset_loss(params, batches)
        return avg.astype(jnp.float32), jax.tree.map(
            lambda x: x.astype(jnp.float32), per_dataset
        )

    _grads_replicated = None
    if state_shardings is not None:
        # Constraint barrier at the grads boundary: without it GSPMD
        # propagates the ZeRO-sharded moment layout UP through tx.update
        # into the attention backward (qkv concat/split transpose ops),
        # where it cannot reconcile with the batch-sharded activations
        # and falls back to "involuntary full rematerialization" —
        # replicate-then-reshard on every step (round-4 verdict #4,
        # MULTICHIP_r04.json tail).  Post-psum data-parallel grads are
        # replicated anyway, so pinning that here is free; the
        # replicated→sharded hop into the moment update is a local slice.
        _mesh = jax.tree.leaves(state_shardings)[0].mesh
        _grads_replicated = jax.sharding.NamedSharding(
            _mesh, jax.sharding.PartitionSpec()
        )

    def _step_core(state, batches):
        (avg, per_dataset), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.unet_params, state.vae_params, batches
        )
        if _grads_replicated is not None:
            grads = jax.lax.with_sharding_constraint(grads, _grads_replicated)
        updates, opt_state = tx.update(grads, state.opt_state, state.unet_params)
        unet_params = optax.apply_updates(state.unet_params, updates)
        metrics = {"loss/train_avg": avg}
        metrics.update({f"loss/train_{k}": v for k, v in per_dataset.items()})
        if grad_trace:
            metrics.update(_group_norms(grads, "gnorm"))
            metrics.update(_group_norms(updates, "unorm"))
        new_state = TrainState(
            step=state.step + 1,
            unet_params=unet_params,
            vae_params=state.vae_params,
            opt_state=opt_state,
        )
        return new_state, metrics

    jit_kwargs = {}
    if ema_decay:
        if state_shardings is not None:
            # EMA params live replicated like the master params
            jit_kwargs["out_shardings"] = (
                state_shardings, None, _grads_replicated
            )

        @functools.partial(jax.jit, donate_argnums=(0, 2), **jit_kwargs)
        def train_step_ema(
            state: TrainState,
            batches: Dict[str, Dict[str, jax.Array]],
            ema_params: Any,
        ) -> Tuple[TrainState, Dict[str, jax.Array], Any]:
            new_state, metrics = _step_core(state, batches)
            new_ema = jax.tree.map(
                lambda e, p: e * ema_decay + p * (1.0 - ema_decay),
                ema_params, new_state.unet_params,
            )
            return new_state, metrics, new_ema

        return train_step_ema

    if state_shardings is not None:
        # metrics sharding stays None (= let GSPMD choose; they are
        # scalars, effectively replicated)
        jit_kwargs["out_shardings"] = (state_shardings, None)

    @functools.partial(jax.jit, donate_argnums=(0,), **jit_kwargs)
    def train_step(
        state: TrainState, batches: Dict[str, Dict[str, jax.Array]]
    ) -> Tuple[TrainState, Dict[str, jax.Array]]:
        return _step_core(state, batches)

    return train_step
