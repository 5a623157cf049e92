"""LDM-style pose-conditioned U-Net (cross-attention variant).

Flax/NHWC re-implementation of the reference's second backend
(``/root/reference/src/model/u_net/ldm/adapt_openaimodel.py`` over the
vendored Stable-Diffusion ``UNetModel``,
``src/model/u_net/ldm/openaimodel.py``): the pose embedding becomes a
single cross-attention context token; the diffusion timestep path is
*disabled* — the per-ResBlock embedding is a zero vector (so only the
embedding-layer biases act) unless ``injecting_condition_twice`` maps
the pose into the time embedding too (``adapt_openaimodel.py:141-145``).

Config defaults mirror ``configs/model/vae_cin_ldm.yaml``: 32x32x4
latents, model_channels 256, channel_mult (1,2,4), attention at every
downsampling factor, transformer depth 1, context_dim 512.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from nope_tpu.models.blocks import PoseMLP


def _zero_init():
    return nn.initializers.zeros


class LDMResBlock(nn.Module):
    """GN32→SiLU→conv / +emb (or FiLM) / GN32→SiLU→zero-conv + skip
    (``openaimodel.py:177-288``)."""

    out_channels: int
    emb_channels: int
    use_scale_shift_norm: bool = False
    up: bool = False
    down: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, emb: jax.Array) -> jax.Array:
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="in_norm")(x)
        h = nn.silu(h)

        def resample(t):
            if self.up:
                return jnp.repeat(jnp.repeat(t, 2, axis=1), 2, axis=2)
            if self.down:
                return nn.avg_pool(t, (2, 2), strides=(2, 2))
            return t

        if self.up or self.down:
            h = resample(h)
            x = resample(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="in_conv")(h)

        emb_out = nn.Dense(
            self.out_channels * (2 if self.use_scale_shift_norm else 1),
            name="emb_dense",
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(emb_out[:, None, None, :], 2, axis=-1)
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
            h = h * (1 + scale) + shift
            h = nn.silu(h)
        else:
            h = h + emb_out[:, None, None, :]
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
            h = nn.silu(h)
        h = nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=_zero_init(), name="out_conv",
        )(h)

        if x.shape[-1] != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="skip_conv")(x)
        return x + h


class LDMCrossAttention(nn.Module):
    """Multi-head attention over tokens; self-attention when context is
    None (``ldm/attention.py:149-189``)."""

    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        context = x if context is None else context
        inner = self.heads * self.dim_head
        q = nn.Dense(inner, use_bias=False, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, name="to_v")(context)
        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.heads, self.dim_head)
        k = k.reshape(b, m, self.heads, self.dim_head)
        v = v.reshape(b, m, self.heads, self.dim_head)
        sim = jnp.einsum("bnhd,bmhd->bhnm", q, k) * (self.dim_head**-0.5)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, inner)
        return nn.Dense(x.shape[-1], name="to_out")(out)


class LDMFeedForward(nn.Module):
    """GEGLU feed-forward (``ldm/attention.py:53-71``)."""

    mult: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        inner = dim * self.mult
        h = nn.Dense(inner * 2, name="geglu")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        return nn.Dense(dim, name="proj")(h)


class LDMTransformerBlock(nn.Module):
    heads: int
    dim_head: int

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        h = nn.LayerNorm(name="norm1")(x)
        x = x + LDMCrossAttention(self.heads, self.dim_head, name="attn1")(h)
        h = nn.LayerNorm(name="norm2")(x)
        x = x + LDMCrossAttention(self.heads, self.dim_head, name="attn2")(h, context)
        h = nn.LayerNorm(name="norm3")(x)
        return x + LDMFeedForward(name="ff")(h)


class LDMSpatialTransformer(nn.Module):
    """NCHW→tokens→transformer blocks→NCHW + residual
    (``ldm/attention.py:232-277``), NHWC here."""

    heads: int
    dim_head: int
    depth: int = 1

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        residual = x
        x = nn.GroupNorm(num_groups=32, epsilon=1e-6, name="norm")(x)
        x = nn.Conv(self.heads * self.dim_head, (1, 1), name="proj_in")(x)
        x = x.reshape(b, h * w, -1)
        for i in range(self.depth):
            x = LDMTransformerBlock(self.heads, self.dim_head, name=f"block_{i}")(
                x, context
            )
        x = x.reshape(b, h, w, -1)
        x = nn.Conv(c, (1, 1), kernel_init=_zero_init(), name="proj_out")(x)
        return x + residual


class LDMPoseUNet(nn.Module):
    """UNetModelPose: LDM U-Net with pose-token cross-attention
    (``adapt_openaimodel.py:14-158``)."""

    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4)
    num_head_channels: int = 32
    context_dim: int = 512
    transformer_depth: int = 1
    rot_representation_dim: int = 6
    pose_mlp_name: str = "single_layer"
    injecting_condition_twice: bool = False

    @property
    def channels(self) -> int:
        return self.in_channels

    @property
    def u_net_dim(self) -> int:  # API parity with PoseUNet
        return self.model_channels

    @nn.compact
    def __call__(self, x: jax.Array, pose: jax.Array) -> jax.Array:
        time_embed_dim = self.model_channels * 4
        if self.injecting_condition_twice:
            emb = PoseMLP(time_embed_dim, kind=self.pose_mlp_name,
                          posenc_trim=True, name="pose_mlp_timesteps")(pose)
        else:
            emb = jnp.zeros((x.shape[0], time_embed_dim), x.dtype)
        context = PoseMLP(self.context_dim, kind=self.pose_mlp_name,
                          posenc_trim=True, name="pose_mlp")(pose)[:, None, :]

        def attn(h, ch, name):
            heads = ch // self.num_head_channels
            return LDMSpatialTransformer(
                heads=heads,
                dim_head=self.num_head_channels,
                depth=self.transformer_depth,
                name=name,
            )(h, context)

        hs = []
        ch = self.model_channels
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(x)
        hs.append(h)
        ds = 1
        # input blocks
        for level, mult in enumerate(self.channel_mult):
            out_ch = self.model_channels * mult
            for i in range(self.num_res_blocks):
                h = LDMResBlock(out_ch, time_embed_dim,
                                name=f"down_{level}_res_{i}")(h, emb)
                ch = out_ch
                if ds in self.attention_resolutions:
                    h = attn(h, ch, f"down_{level}_attn_{i}")
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                h = nn.Conv(ch, (3, 3), strides=(2, 2),
                            padding=((1, 1), (1, 1)), name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2

        # middle
        h = LDMResBlock(ch, time_embed_dim, name="mid_res_0")(h, emb)
        h = attn(h, ch, "mid_attn")
        h = LDMResBlock(ch, time_embed_dim, name="mid_res_1")(h, emb)

        # output blocks
        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            out_ch = self.model_channels * mult
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = LDMResBlock(out_ch, time_embed_dim,
                                name=f"up_{level}_res_{i}")(h, emb)
                ch = out_ch
                if ds in self.attention_resolutions:
                    h = attn(h, ch, f"up_{level}_attn_{i}")
                if level and i == self.num_res_blocks:
                    b, hh, ww, cc = h.shape
                    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                    h = nn.Conv(cc, (3, 3), padding=1,
                                name=f"up_{level}_upsample")(h)
                    ds //= 2

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(
            self.out_channels, (3, 3), padding=1,
            kernel_init=_zero_init(), name="out_conv",
        )(h)
