"""Stable-Diffusion VAE (AutoencoderKL) in Flax, NHWC.

The frozen first-stage codec the reference drives through diffusers
(``/root/reference/src/model/encoder/AutoencoderKL.py``): a KL-VAE with
GroupNorm/SiLU ResNet stacks, single mid-block spatial attention, f8
spatial reduction and a 4-channel latent.  Latents are scaled by the SD
constant 0.18215 on encode and unscaled on decode
(``AutoencoderKL.py:33,45``).

The architecture matches the SD v1-5 VAE checkpoint layout so the
PyTorch→Flax port tool can load ``diffusion_pytorch_model.bin`` weights
(conv kernels transposed OIHW→HWIO); see
:mod:`nope_tpu.training.port`.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from nope_tpu.models.distributions import DiagonalGaussian

SD_LATENT_SCALE = 0.18215


class VAEResnetBlock(nn.Module):
    """GN32 → SiLU → conv3x3 → GN32 → SiLU → conv3x3 (+1x1 shortcut)."""

    dim_out: int
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.dim_out, (3, 3), padding=1, name="conv2")(h)
        if x.shape[-1] != self.dim_out:
            x = nn.Conv(self.dim_out, (1, 1), name="conv_shortcut")(x)
        return x + h


class VAEAttnBlock(nn.Module):
    """Single-head spatial self-attention with 1/sqrt(C) scaling."""

    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="to_q")(h)
        k = nn.Dense(c, name="to_k")(h)
        v = nn.Dense(c, name="to_v")(h)
        attn = jax.nn.softmax(
            jnp.einsum("bic,bjc->bij", q, k) * (c**-0.5), axis=-1
        )
        out = jnp.einsum("bij,bjc->bic", attn, v)
        out = nn.Dense(c, name="to_out")(out).reshape(b, hh, ww, c)
        return x + out


class VAEDownsample(nn.Module):
    """conv3x3 stride 2 with diffusers' asymmetric (0,1,0,1) padding."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(
            self.dim_out, (3, 3), strides=(2, 2), padding="VALID", name="conv"
        )(x)


class VAEUpsample(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.dim_out, (3, 3), padding=1, name="conv")(x)


class VAEEncoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    groups: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        chans = self.block_out_channels
        x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(x)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block):
                x = VAEResnetBlock(ch, groups=self.groups, name=f"down_{i}_res_{j}")(x)
            if i < len(chans) - 1:
                x = VAEDownsample(ch, name=f"down_{i}_downsample")(x)
        x = VAEResnetBlock(chans[-1], groups=self.groups, name="mid_res_0")(x)
        x = VAEAttnBlock(groups=self.groups, name="mid_attn")(x)
        x = VAEResnetBlock(chans[-1], groups=self.groups, name="mid_res_1")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(2 * self.latent_channels, (3, 3), padding=1, name="conv_out")(x)


class VAEDecoder(nn.Module):
    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    out_channels: int = 3
    groups: int = 32

    @nn.compact
    def __call__(self, z: jax.Array) -> jax.Array:
        chans = list(reversed(self.block_out_channels))  # (512, 512, 256, 128)
        x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(z)
        x = VAEResnetBlock(chans[0], groups=self.groups, name="mid_res_0")(x)
        x = VAEAttnBlock(groups=self.groups, name="mid_attn")(x)
        x = VAEResnetBlock(chans[0], groups=self.groups, name="mid_res_1")(x)
        for i, ch in enumerate(chans):
            for j in range(self.layers_per_block + 1):
                x = VAEResnetBlock(ch, groups=self.groups, name=f"up_{i}_res_{j}")(x)
            if i < len(chans) - 1:
                x = VAEUpsample(ch, name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-6, name="conv_norm_out")(x)
        x = nn.silu(x)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="conv_out")(x)


class StableDiffusionVAE(nn.Module):
    """Full AutoencoderKL with quant/post-quant 1x1 convs and the SD
    latent scaling baked into :meth:`encode_image`/:meth:`decode_latent`
    — the API surface the task model consumes
    (``encoder/AutoencoderKL.py:28-47``)."""

    block_out_channels: Sequence[int] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    sample_channels: int = 3
    groups: int = 32

    def setup(self):
        self.encoder = VAEEncoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            latent_channels=self.latent_channels,
            groups=self.groups,
        )
        self.decoder = VAEDecoder(
            block_out_channels=self.block_out_channels,
            layers_per_block=self.layers_per_block,
            out_channels=self.sample_channels,
            groups=self.groups,
        )
        self.quant_conv = nn.Conv(2 * self.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.latent_channels, (1, 1), name="post_quant_conv"
        )

    @property
    def latent_dim(self) -> int:
        return self.latent_channels

    def encode(self, image: jax.Array) -> DiagonalGaussian:
        moments = self.quant_conv(self.encoder(image))
        return DiagonalGaussian.from_parameters(moments)

    def decode(self, latent: jax.Array) -> jax.Array:
        return self.decoder(self.post_quant_conv(latent))

    def encode_image(
        self, image: jax.Array, mode: Optional[str] = "mode"
    ):
        """mode="mode" → scaled latent mean; mode=None → the full
        distribution with its *mean pre-scaled* (the reference's KL
        training path quirk, ``AutoencoderKL.py:34-38``)."""
        dist = self.encode(image)
        if mode == "mode":
            return dist.mode() * SD_LATENT_SCALE
        if mode is None:
            return DiagonalGaussian(dist.mean * SD_LATENT_SCALE, dist.logvar)
        raise NotImplementedError(mode)

    def decode_latent(self, latent: jax.Array) -> jax.Array:
        return self.decode(latent / SD_LATENT_SCALE)

    def __call__(self, image: jax.Array) -> jax.Array:
        """Autoencode (mode latent); used for init/shape-checking."""
        return self.decode(self.encode(image).mode())
