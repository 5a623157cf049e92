"""ADM-style pose-conditioned U-Net (guided-diffusion variant).

Flax/NHWC re-implementation of the reference's third backend
(``/root/reference/src/model/u_net/guided_diffusion/adapt_u_net.py``
over the vendored OpenAI ADM ``UNetModel``,
``guided_diffusion/u_net.py``): the pose MLP output *is* the time
embedding (``adapt_u_net.py:85-97``), FiLM conditioning
(use_scale_shift_norm), residual up/down blocks, and plain QKV
self-attention at the deeper scales.

Config defaults mirror ``configs/model/vae_guidedDiffusion.yaml``:
model_channels 256, channel_mult (1,1,2,2,4,4), attention at ds
(32,16,8), num_head_channels 64.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from nope_tpu.models.blocks import PoseMLP
from nope_tpu.models.ldm_unet import LDMResBlock, _zero_init


class ADMAttentionBlock(nn.Module):
    """GN32 → qkv 1x1 conv (legacy per-head [q,k,v] channel layout) →
    scaled dot-product → zero 1x1 proj → +x
    (``guided_diffusion/u_net.py`` AttentionBlock + QKVAttentionLegacy)."""

    num_heads: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        dh = c // self.num_heads
        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="norm")(x)
        qkv = nn.Conv(c * 3, (1, 1), name="qkv")(h).reshape(b, n, self.num_heads, 3, dh)
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(dh, x.dtype)))
        sim = jnp.einsum("bihd,bjhd->bhij", q * scale, k * scale)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, hh, ww, c)
        out = nn.Conv(c, (1, 1), kernel_init=_zero_init(), name="proj_out")(out)
        return x + out


class ADMPoseUNet(nn.Module):
    in_channels: int = 4
    out_channels: int = 4
    model_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (32, 16, 8)
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4, 4)
    num_head_channels: int = 64
    num_heads: int = 4
    use_scale_shift_norm: bool = True
    resblock_updown: bool = True
    rot_representation_dim: int = 6
    pose_mlp_name: str = "single_layer"

    @property
    def channels(self) -> int:
        return self.in_channels

    def _heads(self, ch: int) -> int:
        if self.num_head_channels > 0:
            return max(1, ch // self.num_head_channels)
        return self.num_heads

    @nn.compact
    def __call__(self, x: jax.Array, pose: jax.Array) -> jax.Array:
        time_embed_dim = self.model_channels * 4
        emb = PoseMLP(time_embed_dim, kind=self.pose_mlp_name, name="pose_mlp")(pose)

        hs = []
        ch = self.model_channels
        h = nn.Conv(ch, (3, 3), padding=1, name="conv_in")(x)
        hs.append(h)
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            out_ch = self.model_channels * mult
            for i in range(self.num_res_blocks):
                h = LDMResBlock(
                    out_ch, time_embed_dim,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    name=f"down_{level}_res_{i}",
                )(h, emb)
                ch = out_ch
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(self._heads(ch), name=f"down_{level}_attn_{i}")(h)
                hs.append(h)
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = LDMResBlock(
                        ch, time_embed_dim, down=True,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        name=f"down_{level}_downsample",
                    )(h, emb)
                else:
                    h = nn.Conv(ch, (3, 3), strides=(2, 2),
                                padding=((1, 1), (1, 1)),
                                name=f"down_{level}_downsample")(h)
                hs.append(h)
                ds *= 2

        h = LDMResBlock(ch, time_embed_dim,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        name="mid_res_0")(h, emb)
        h = ADMAttentionBlock(self._heads(ch), name="mid_attn")(h)
        h = LDMResBlock(ch, time_embed_dim,
                        use_scale_shift_norm=self.use_scale_shift_norm,
                        name="mid_res_1")(h, emb)

        for level, mult in list(enumerate(self.channel_mult))[::-1]:
            out_ch = self.model_channels * mult
            for i in range(self.num_res_blocks + 1):
                h = jnp.concatenate([h, hs.pop()], axis=-1)
                h = LDMResBlock(
                    out_ch, time_embed_dim,
                    use_scale_shift_norm=self.use_scale_shift_norm,
                    name=f"up_{level}_res_{i}",
                )(h, emb)
                ch = out_ch
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(self._heads(ch), name=f"up_{level}_attn_{i}")(h)
                if level and i == self.num_res_blocks:
                    if self.resblock_updown:
                        h = LDMResBlock(
                            ch, time_embed_dim, up=True,
                            use_scale_shift_norm=self.use_scale_shift_norm,
                            name=f"up_{level}_upsample",
                        )(h, emb)
                    else:
                        b_, hh, ww, cc = h.shape
                        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
                        h = nn.Conv(cc, (3, 3), padding=1,
                                    name=f"up_{level}_upsample")(h)
                    ds //= 2

        h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
        h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=_zero_init(), name="out_conv")(h)
