"""First-stage (VAE) pretraining.

The reference assumes a downloaded Stable-Diffusion first-stage
checkpoint (``AutoencoderKL.py:16-19`` loads
``stable-diffusion-v1-5_vae.pth``) and ships no way to produce one.
This module closes that gap for domains without a pretrained codec:
standard VAE training — reconstruction plus a beta-weighted KL against
N(0, 1), the non-adversarial core of latent-diffusion first-stage
training — as one jitted, donated optax step.

Typical flow (also driven by ``tests/test_learning.py`` and the
hardware learning probe in docs/PERFORMANCE.md)::

    vae = StableDiffusionVAE()
    state = create_vae_pretrain_state(vae, tx, key, image_size=256)
    step = make_vae_pretrain_step(vae, tx)
    for batch in loader:                    # (B, H, W, 3) in [-1, 1]
        state, metrics = step(state, batch)
    params["vae"] = state.params            # hand to PoseConditionalTask
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class VAEPretrainState(NamedTuple):
    step: jax.Array
    params: Dict
    opt_state: optax.OptState
    rng: jax.Array


def create_vae_pretrain_state(
    vae, tx: optax.GradientTransformation, key: jax.Array, image_size: int = 256
) -> VAEPretrainState:
    init_key, sample_key = jax.random.split(key)
    params = vae.init(init_key, jnp.zeros((1, image_size, image_size, 3)))["params"]
    return VAEPretrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=sample_key,
    )


def make_vae_pretrain_step(
    vae,
    tx: optax.GradientTransformation,
    recon_loss: str = "l1",
    kl_weight: float = 1e-6,
    half_precision: bool = False,
):
    """Build the jitted pretrain step: ``state, images -> state', metrics``.

    ``recon_loss``: "l1" | "l2" pixel reconstruction on the sampled
    latent's decode (sampling, not the mode, so the decoder sees the
    posterior spread the diffusion-side ``encode_image(mode=None)`` path
    will later produce).  ``kl_weight`` defaults to latent-diffusion's
    1e-6 — enough to keep the posterior bounded without collapsing the
    latent capacity the retrieval metric depends on.

    ``half_precision`` mirrors ``make_train_step``: forward+backward in
    bf16 against f32 master weights, no loss scaling.
    """
    from nope_tpu.tasks.pose_conditional import cast_half

    if recon_loss not in ("l1", "l2"):
        raise ValueError(f"recon_loss must be 'l1' or 'l2', got {recon_loss!r}")

    def loss_fn(params, images, sample_key):
        if images.dtype == jnp.uint8:
            # uint8 wire format (datasets with wire_dtype="uint8"):
            # normalize on device, same convention as make_train_step
            images = images.astype(jnp.float32) / 255.0 * 2.0 - 1.0
        apply_params, apply_images = params, images
        if half_precision:
            apply_params = cast_half(params)
            apply_images = cast_half(images)
        dist = vae.apply(
            {"params": apply_params}, apply_images, method=vae.encode
        )
        z = dist.sample(sample_key)
        recon = vae.apply({"params": apply_params}, z, method=vae.decode)
        diff = recon.astype(jnp.float32) - images.astype(jnp.float32)
        rec = (
            jnp.mean(jnp.abs(diff)) if recon_loss == "l1" else jnp.mean(diff * diff)
        )
        kl = jnp.mean(dist.kl().astype(jnp.float32))
        loss = rec + kl_weight * kl
        return loss, {"loss": loss, "recon": rec, "kl": kl}

    def pretrain_step(
        state: VAEPretrainState, images: jax.Array
    ) -> Tuple[VAEPretrainState, Dict[str, jax.Array]]:
        step_key, next_rng = jax.random.split(state.rng)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, images, step_key
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            VAEPretrainState(state.step + 1, params, opt_state, next_rng),
            metrics,
        )

    return jax.jit(pretrain_step, donate_argnums=(0,))
