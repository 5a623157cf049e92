"""LDM half-U-Net encoder (classifier) + CLIP-style attention pooling.

Flax/NHWC re-implementation of the reference's ``EncoderUNetModel``
(``/root/reference/src/model/u_net/ldm/openaimodel.py:795-1009``) and
``AttentionPool2d`` (``openaimodel.py:33-62``).  NOPE itself never
instantiates either (dead code upstream — guided-diffusion uses this
half U-Net as the noisy classifier for classifier guidance), but they
are ported so every §2.3 inventory line is represented by running,
parity-tested code rather than an out-of-scope note.

Unlike the pose U-Nets (which zero the timestep path), the classifier's
timestep conditioning is real: ``__call__(x, timesteps)`` mirrors the
reference signature (``openaimodel.py:986-1009``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from nope_tpu.models.adm_unet import ADMAttentionBlock
from nope_tpu.models.blocks import timestep_embedding
from nope_tpu.models.ldm_unet import LDMResBlock, _zero_init


class AttentionPool2d(nn.Module):
    """CLIP attention pooling (``openaimodel.py:33-62``): prepend the
    mean token, add a learned positional embedding, one "new-order"
    QKV attention pass (``QKVAttention``, ``openaimodel.py:389-425``:
    channel layout [all-q | all-k | all-v], heads-major within each),
    and return the attended mean token."""

    num_head_channels: int
    output_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        heads = c // self.num_head_channels
        dh = c // heads
        t = x.reshape(b, hh * ww, c)
        t = jnp.concatenate([t.mean(axis=1, keepdims=True), t], axis=1)
        n = t.shape[1]
        pos = self.param(
            "positional_embedding", nn.initializers.normal(c**-0.5), (n, c)
        )
        t = t + pos[None].astype(t.dtype)
        qkv = nn.Dense(3 * c, name="qkv_proj")(t).reshape(b, n, 3, heads, dh)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.asarray(dh, t.dtype)))
        sim = jnp.einsum("bihd,bjhd->bhij", q * scale, k * scale)
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(b, n, c)
        out = nn.Dense(self.output_dim or c, name="c_proj")(out)
        return out[:, 0]


class LDMEncoderUNet(nn.Module):
    """Half U-Net with attention + timestep embedding and one of four
    classification heads (``pool``), matching ``EncoderUNetModel``:

    - ``adaptive``: GN → SiLU → global average pool → zero 1x1 conv
    - ``attention``: GN → SiLU → :class:`AttentionPool2d`
    - ``spatial``: concat per-block spatial means → MLP (ReLU)
    - ``spatial_v2``: same features → Dense → GN32 → SiLU → Dense
    """

    out_channels: int
    model_channels: int = 256
    num_res_blocks: int = 2
    attention_resolutions: Sequence[int] = (4, 2, 1)
    channel_mult: Sequence[int] = (1, 2, 4)
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    pool: str = "adaptive"

    def _heads(self, ch: int) -> int:
        if self.num_head_channels == -1:
            return self.num_heads
        return ch // self.num_head_channels

    @nn.compact
    def __call__(self, x: jax.Array, timesteps: jax.Array) -> jax.Array:
        time_embed_dim = self.model_channels * 4
        emb = timestep_embedding(timesteps, self.model_channels).astype(x.dtype)
        emb = nn.Dense(time_embed_dim, name="time_dense_0")(emb)
        emb = nn.Dense(time_embed_dim, name="time_dense_1")(nn.silu(emb))

        def res(h, out_ch, name, down=False):
            return LDMResBlock(
                out_ch, time_embed_dim,
                use_scale_shift_norm=self.use_scale_shift_norm,
                down=down, name=name,
            )(h, emb)

        # the reference collects a spatial-mean feature after EVERY
        # input block (conv-in, each res[+attn] group, each downsample)
        # and after the middle block (openaimodel.py:995-1005)
        spatial = self.pool.startswith("spatial")
        results = []
        h = nn.Conv(self.model_channels, (3, 3), padding=1, name="conv_in")(x)
        if spatial:
            results.append(h.mean(axis=(1, 2)))
        ch = self.model_channels
        ds = 1
        for level, mult in enumerate(self.channel_mult):
            out_ch = self.model_channels * mult
            for i in range(self.num_res_blocks):
                h = res(h, out_ch, f"down_{level}_res_{i}")
                ch = out_ch
                if ds in self.attention_resolutions:
                    h = ADMAttentionBlock(
                        self._heads(ch), name=f"down_{level}_attn_{i}"
                    )(h)
                if spatial:
                    results.append(h.mean(axis=(1, 2)))
            if level != len(self.channel_mult) - 1:
                if self.resblock_updown:
                    h = res(h, ch, f"down_{level}_downsample", down=True)
                else:
                    h = nn.Conv(
                        ch, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        name=f"down_{level}_downsample",
                    )(h)
                ds *= 2
                if spatial:
                    results.append(h.mean(axis=(1, 2)))

        h = res(h, ch, "mid_res_0")
        h = ADMAttentionBlock(self._heads(ch), name="mid_attn")(h)
        h = res(h, ch, "mid_res_1")

        if self.pool == "adaptive":
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
            h = nn.silu(h).mean(axis=(1, 2), keepdims=True)
            h = nn.Conv(
                self.out_channels, (1, 1),
                kernel_init=_zero_init(), name="out_conv",
            )(h)
            return h.reshape(h.shape[0], -1)
        if self.pool == "attention":
            assert self.num_head_channels != -1, "attention pool needs head dims"
            h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
            return AttentionPool2d(
                self.num_head_channels, self.out_channels, name="out_pool"
            )(nn.silu(h))
        if spatial:
            results.append(h.mean(axis=(1, 2)))
            h = jnp.concatenate(results, axis=-1)
            h = nn.Dense(2048, name="out_dense_0")(h)
            if self.pool == "spatial_v2":
                h = nn.GroupNorm(num_groups=32, epsilon=1e-5, name="out_norm")(h)
                h = nn.silu(h)
            else:
                h = nn.relu(h)
            return nn.Dense(self.out_channels, name="out_dense_1")(h)
        raise ValueError(f"unexpected pool {self.pool!r}")
