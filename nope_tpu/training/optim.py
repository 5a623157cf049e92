"""Optimizer + LR schedule matching the reference recipe.

Reference (``/root/reference/src/model/model.py:70-94``;
``configs/model/vae_base.yaml:18-24``):

- AdamW, lr 5e-5, weight_decay 5e-4 (SGD+momentum 0.9 as alternative)
- linear warm-up: lr = step / warm_up_steps * base_lr for the first
  ``warm_up_steps`` optimizer steps (500 by default)
- MultiStepLR over *epochs*: x0.5 at epochs [10, 30, 50, 100]

The epoch-indexed milestones are converted to steps via
``steps_per_epoch`` (the reference steps its scheduler once per epoch).
"""

from __future__ import annotations

from typing import Optional, Sequence

import optax


def make_lr_schedule(
    base_lr: float = 5e-5,
    warm_up_steps: int = 500,
    milestones_epochs: Sequence[int] = (10, 30, 50, 100),
    gamma: float = 0.5,
    steps_per_epoch: Optional[int] = None,
) -> optax.Schedule:
    import jax.numpy as jnp

    milestone_steps = (
        jnp.asarray(sorted(int(e * steps_per_epoch) for e in milestones_epochs))
        if steps_per_epoch
        else None
    )

    w = max(int(warm_up_steps), 0)

    def schedule(step):
        step = jnp.asarray(step)
        # MultiStepLR semantics as actually driven by the reference
        # (verified by executing model.py:70-94 under Lightning's loop,
        # tests/test_reference_train_parity.py):
        # - warm_up_lr overwrites pg["lr"] every step < warm_up_steps,
        #   so milestones whose epoch ends during warmup are LOST (the
        #   scheduler multiplied a value that gets overwritten)
        # - the post-warmup base is the LAST warmup write,
        #   (w-1)/w * base_lr, not base_lr itself (nothing restores it)
        if milestone_steps is not None:
            applied = (milestone_steps >= w) & (step >= milestone_steps)
            factor = gamma ** jnp.sum(applied)
        else:
            factor = 1.0
        if w <= 0:
            return base_lr * factor
        decayed = base_lr * (w - 1) / w * factor
        warm = step.astype(jnp.float32) / w * base_lr
        return jnp.where(step < w, warm, decayed)

    return schedule


def skip_spike_updates(
    inner: optax.GradientTransformation,
    factor: float = 20.0,
    norm_ema: float = 0.99,
    warmup_steps: int = 200,
) -> optax.GradientTransformation:
    """Wrap ``inner`` so anomalous-gradient steps are SKIPPED entirely.

    Motivation (docs/PERFORMANCE.md, round-5 collapse root-cause): the
    512-object runs hit single-step raw-gradient spikes of ~1e5x the
    running norm (step 7896 of the 64k run: global grad norm 50,766 vs
    a ~0.5 baseline, concentrated in the conv trunk), which scramble
    eval retrieval to ~100 deg for ~2k steps.  Global-norm CLIPPING
    makes them survivable but still admits a burst of direction-
    scrambled, unit-norm updates and poisons Adam's second moment (the
    ~2k-step recovery is the beta2 memory draining).  Skipping isolates
    the event: when the gradient global norm exceeds ``factor`` x the
    bias-corrected EMA of past norms, the update is zeroed AND the
    inner optimizer state is left untouched — no parameter motion, no
    moment poisoning, and the spike does not contaminate the norm EMA.

    The reference has no analogue (its recipe neither clips nor skips);
    this is the TPU-rebuild's production-hardening knob
    (``OptimConfig.skip_spike_factor``).
    """
    import jax
    import jax.numpy as jnp

    def init(params):
        return {
            "inner": inner.init(params),
            "gnorm_ema": jnp.zeros((), jnp.float32),
            "count": jnp.zeros((), jnp.int32),
        }

    def update(grads, state, params=None):
        g = optax.global_norm(grads).astype(jnp.float32)
        count = state["count"]
        # bias-corrected running norm (Adam-style correction so the
        # reference level is meaningful from the first steps)
        corr = 1.0 - norm_ema ** jnp.maximum(count, 1).astype(jnp.float32)
        ref = state["gnorm_ema"] / corr
        spike = (count >= warmup_steps) & (g > factor * ref)
        new_updates, new_inner = inner.update(grads, state["inner"], params)
        updates = jax.tree.map(
            lambda u: jnp.where(spike, jnp.zeros_like(u), u), new_updates
        )
        inner_state = jax.tree.map(
            lambda new, old: jnp.where(spike, old, new),
            new_inner, state["inner"],
        )
        new_state = {
            "inner": inner_state,
            # a spike must not contaminate its own anomaly reference
            "gnorm_ema": jnp.where(
                spike,
                state["gnorm_ema"],
                state["gnorm_ema"] * norm_ema + (1.0 - norm_ema) * g,
            ),
            "count": count + 1,
        }
        return updates, new_state

    return optax.GradientTransformation(init, update)


def make_optimizer(
    optim_name: str = "AdamW",
    base_lr: float = 5e-5,
    weight_decay: float = 5e-4,
    warm_up_steps: int = 500,
    milestones_epochs: Sequence[int] = (10, 30, 50, 100),
    gamma: float = 0.5,
    steps_per_epoch: Optional[int] = None,
    clip_grad_norm: float = 0.0,
    skip_spike_factor: float = 0.0,
) -> optax.GradientTransformation:
    """``clip_grad_norm`` > 0 prepends global-norm gradient clipping.
    Off by default — the reference recipe carries no clipping
    (``model.py:70-94``) and the default stays parity-exact — but the
    unclipped recipe is loss-spike-prone once the data is diverse
    enough: the round-3 64-object hardware probe blew up to loss 44 at
    step ~2750 and never recovered retrieval (docs/PERFORMANCE.md
    "object-count ablation"), which clipping at 1.0 prevents.

    ``skip_spike_factor`` > 0 additionally wraps the whole chain in
    :func:`skip_spike_updates`: steps whose raw gradient norm exceeds
    that factor times the running norm are skipped outright (no param
    motion, no Adam-moment update) — the round-5 mitigation for the
    single-step 1e5x spikes behind the transient eval collapses."""
    schedule = make_lr_schedule(
        base_lr, warm_up_steps, milestones_epochs, gamma, steps_per_epoch
    )
    if optim_name == "SGD":
        tx = optax.chain(
            optax.add_decayed_weights(weight_decay),
            optax.sgd(schedule, momentum=0.9),
        )
    elif optim_name == "AdamW":
        tx = optax.adamw(schedule, weight_decay=weight_decay)
    else:
        raise ValueError(optim_name)
    if clip_grad_norm and clip_grad_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(clip_grad_norm), tx)
    if skip_spike_factor and skip_spike_factor > 0:
        tx = skip_spike_updates(tx, factor=skip_spike_factor)
    return tx


def ema_update(ema_params, new_params, beta: float = 0.995):
    """Exponential moving average of params (``model_utils.py:175-195``
    EMA semantics): ema ← beta·ema + (1-beta)·new."""
    import jax

    return jax.tree.map(lambda e, p: e * beta + p * (1.0 - beta), ema_params, new_params)
