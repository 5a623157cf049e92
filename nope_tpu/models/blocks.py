"""Flax building blocks for the pose-conditioned U-Nets.

Functional re-implementations (NHWC, TPU-friendly) of the block library
the reference vendors from lucidrains' denoising-diffusion-pytorch
(``/root/reference/src/model/u_net/denoising_diffusion_pytorch/model_utils.py``):
conv+GroupNorm+SiLU blocks with FiLM-style scale/shift, additive
time/pose-conditioned ResNet blocks, linear & full spatial attention,
and the pixel-shuffle style "hard" up/down-sampling.

Layout notes
------------
- Activations are NHWC (XLA TPU's preferred conv layout); the
  PyTorch→Flax weight-port tool (:mod:`nope_tpu.training.port`)
  transposes kernels accordingly.
- Attention head/channel orderings replicate the reference einops
  rearrangements exactly so ported checkpoints are bit-compatible:
  qkv convs emit ``(heads*dim_head)`` with heads-major channel order.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


class Block(nn.Module):
    """conv3x3 → GroupNorm → (scale+1)·x + shift → SiLU
    (``model_utils.py:237-253``)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(self, x: jax.Array, scale_shift=None) -> jax.Array:
        x = nn.Conv(self.dim_out, (3, 3), padding=1, name="proj")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5, name="norm")(x)
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return nn.silu(x)


class ResnetBlock(nn.Module):
    """Two Blocks with an *additive* conditioning embedding between them
    (``model_utils.py:256-279``): ``h = block1(x); h += SiLU→Dense(emb);
    h = block2(h); return h + res_conv(x)``.

    ``fused=True`` routes the whole block through the Pallas fused
    kernel on TPU (:mod:`nope_tpu.ops.experimental.fused_resnet`): one VMEM-resident
    program instead of XLA materialising every conv/GroupNorm
    intermediate in HBM.  The parameter tree is identical in both modes
    (init always runs the module path); gradients flow through an exact
    XLA-recompute VJP."""

    dim_out: int
    groups: int = 8
    use_conditioning: bool = True
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, cond_emb: Optional[jax.Array] = None) -> jax.Array:
        emb = None
        if self.use_conditioning and cond_emb is not None:
            emb = nn.Dense(self.dim_out, name="mlp_dense")(nn.silu(cond_emb))
        if self.fused and not self.is_initializing():
            return self._apply_fused(x, emb)
        h = Block(self.dim_out, groups=self.groups, name="block1")(x)
        if emb is not None:
            h = h + emb[:, None, None, :]
        h = Block(self.dim_out, groups=self.groups, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), name="res_conv")(x)
        else:
            res = x
        return h + res

    def _apply_fused(self, x: jax.Array, emb: Optional[jax.Array]) -> jax.Array:
        from nope_tpu.ops.experimental.fused_resnet import fused_resnet_block

        p = self.variables["params"]
        kernel_params = {
            "w1": p["block1"]["proj"]["kernel"],
            "b1": p["block1"]["proj"]["bias"],
            "g1": p["block1"]["norm"]["scale"],
            "be1": p["block1"]["norm"]["bias"],
            "w2": p["block2"]["proj"]["kernel"],
            "b2": p["block2"]["proj"]["bias"],
            "g2": p["block2"]["norm"]["scale"],
            "be2": p["block2"]["norm"]["bias"],
        }
        if "res_conv" in p:
            kernel_params["res_w"] = p["res_conv"]["kernel"]
            kernel_params["res_b"] = p["res_conv"]["bias"]
        return fused_resnet_block(x, emb, kernel_params, groups=self.groups)


class ConditionalResnetBlock(nn.Module):
    """FiLM variant: concat(time, class) → SiLU→Dense(2·dim_out) →
    scale/shift inside block1 (``model_utils.py:282-314``)."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        time_emb: Optional[jax.Array] = None,
        class_emb: Optional[jax.Array] = None,
    ) -> jax.Array:
        scale_shift = None
        embs = [e for e in (time_emb, class_emb) if e is not None]
        if embs:
            cond = jnp.concatenate(embs, axis=-1)
            cond = nn.Dense(self.dim_out * 2, name="mlp_dense")(nn.silu(cond))
            cond = cond[:, None, None, :]
            scale_shift = (cond[..., : self.dim_out], cond[..., self.dim_out :])
        h = Block(self.dim_out, groups=self.groups, name="block1")(x, scale_shift)
        h = Block(self.dim_out, groups=self.groups, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), name="res_conv")(x)
        else:
            res = x
        return h + res


def _split_heads(t: jax.Array, heads: int) -> jax.Array:
    """(B, N, heads*dh) → (B, heads, dh, N) with the reference's
    heads-major channel split (einops ``b (h c) ... -> b h c ...``)."""
    b, n, hd = t.shape
    dh = hd // heads
    return jnp.transpose(t.reshape(b, n, heads, dh), (0, 2, 3, 1))


class LinearAttention(nn.Module):
    """Efficient linear attention (``model_utils.py:393-418``):
    softmax(q over channels) · scale, softmax(k over tokens),
    context = k·vᵀ, out = contextᵀ·q, then 1x1 conv + GroupNorm(1).

    ``fused=True`` routes the inner chain through the Pallas kernel
    (:mod:`nope_tpu.ops.experimental.linear_attention`) — one VMEM-resident pass
    instead of XLA's multiple HBM round-trips."""

    heads: int = 4
    dim_head: int = 32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, hidden * 3)

        if self.fused:
            from nope_tpu.ops.experimental.linear_attention import linear_attention_inner

            out = linear_attention_inner(qkv, self.heads, self.dim_head)
            out = out.reshape(b, hh, ww, hidden)
        else:
            q, k, v = jnp.split(qkv, 3, axis=-1)
            q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))  # (b, h, d, n)

            q = jax.nn.softmax(q, axis=-2)
            k = jax.nn.softmax(k, axis=-1)
            q = q * (self.dim_head**-0.5)

            context = jnp.einsum("bhdn,bhen->bhde", k, v)
            out = jnp.einsum("bhde,bhdn->bhen", context, q)  # (b, h, e, n)
            out = jnp.transpose(out, (0, 3, 1, 2)).reshape(b, hh, ww, hidden)
        out = nn.Conv(x.shape[-1], (1, 1), name="to_out_conv")(out)
        return nn.GroupNorm(num_groups=1, epsilon=1e-5, name="to_out_norm")(out)


class Attention(nn.Module):
    """Full spatial self-attention (``model_utils.py:367-390``) with the
    reference's stop-gradient max-subtraction before softmax."""

    heads: int = 4
    dim_head: int = 32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, hh, ww, c = x.shape
        n = hh * ww
        hidden = self.heads * self.dim_head
        qkv = nn.Conv(hidden * 3, (1, 1), use_bias=False, name="to_qkv")(x)
        qkv = qkv.reshape(b, n, hidden * 3)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q, k, v = (_split_heads(t, self.heads) for t in (q, k, v))  # (b, h, d, n)

        q = q * (self.dim_head**-0.5)
        sim = jnp.einsum("bhdi,bhdj->bhij", q, k)
        sim = sim - jax.lax.stop_gradient(jnp.max(sim, axis=-1, keepdims=True))
        attn = jax.nn.softmax(sim, axis=-1)
        out = jnp.einsum("bhij,bhdj->bhid", attn, v)  # (b, h, n, d)
        # reference folds back as "b h (x y) d -> b (h d) x y": heads-major
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(b, hh, ww, hidden)
        return nn.Conv(x.shape[-1], (1, 1), name="to_out")(out)


class ResidualPreNormAttention(nn.Module):
    """``Residual(PreNorm(dim, *Attention(dim)))`` fused into one module
    (``model_utils.py:198-234`` composition): GroupNorm(1) → attention →
    +x.  ``linear=True`` selects LinearAttention, else full Attention."""

    linear: bool = True
    heads: int = 4
    dim_head: int = 32
    fused: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        h = nn.GroupNorm(num_groups=1, epsilon=1e-5, name="norm")(x)
        if self.linear:
            h = LinearAttention(
                heads=self.heads, dim_head=self.dim_head, fused=self.fused,
                name="attn",
            )(h)
        else:
            h = Attention(heads=self.heads, dim_head=self.dim_head, name="attn")(h)
        return h + x


class HardDownsample(nn.Module):
    """Pixel-unshuffle (space-to-depth, reference channel order
    ``b c (h p1) (w p2) -> b (c p1 p2) h w``) + 1x1 conv
    (``model_utils.py:168-172``)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # output channel index = c*4 + p1*2 + p2 (torch NCHW rearrange order)
        x = jnp.transpose(x, (0, 1, 3, 5, 2, 4)).reshape(b, h // 2, w // 2, c * 4)
        return nn.Conv(self.dim_out, (1, 1), name="conv")(x)


class HardUpsample(nn.Module):
    """Nearest-neighbour 2x upsample + conv3x3 (``model_utils.py:161-165``)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
        return nn.Conv(self.dim_out, (3, 3), padding=1, name="conv")(x)


class Downsample(nn.Module):
    """Strided conv4x4/2 (``model_utils.py:129-136``)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Conv(
            self.dim_out, (4, 4), strides=(2, 2), padding=((1, 1), (1, 1)), name="conv"
        )(x)


class Upsample(nn.Module):
    """ConvTranspose 4x4/2 matching torch's
    ``nn.ConvTranspose2d(k=4, s=2, p=1)`` geometry
    (``model_utils.py:119-126``)."""

    dim_out: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        # flax ConvTranspose padding is in input-dilated coordinates:
        # torch's output-crop p maps to k-1-p = 2 per side (H: 2x upsample)
        return nn.ConvTranspose(
            self.dim_out,
            (4, 4),
            strides=(2, 2),
            padding=((2, 2), (2, 2)),
            transpose_kernel=True,
            name="conv",
        )(x)


class SinusoidalPosEmb(nn.Module):
    """Batched sinusoidal embedding over a d-dimensional pose vector
    (``/root/reference/src/model/utils.py:36-53``): per-component
    frequencies then sin/cat(cos), optionally trimmed to ``max_dim``."""

    dim: int
    max_dim: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        half_dim = self.dim // 2
        emb_scale = math.log(10000) / (half_dim - 1)
        freqs = jnp.exp(jnp.arange(half_dim) * -emb_scale)
        emb = x[:, :, None] * freqs[None, None, :]
        emb = emb.reshape(x.shape[0], -1)
        emb = jnp.concatenate((jnp.sin(emb), jnp.cos(emb)), axis=-1)
        if self.max_dim is not None:
            emb = emb[:, : self.max_dim]
        return emb


class PoseMLP(nn.Module):
    """Pose → conditioning embedding
    (``denoising_diffusion_pytorch/u_net.py:63-76``): ``single_layer``
    (default), ``two_layers`` (+GELU) or ``posEncoding``.

    ``posenc_trim`` selects the LDM adapter's sinusoidal variant
    (``adapt_openaimodel.py:114-118``): per-component dim // 6 + 1,
    trimmed to ``out_dim`` — supporting out_dim not divisible by 6
    (e.g. context_dim 512).  The default-U-Net variant requires
    divisibility, like the reference's assert (``u_net.py:75``)."""

    out_dim: int
    kind: str = "single_layer"
    posenc_trim: bool = False

    @nn.compact
    def __call__(self, pose: jax.Array) -> jax.Array:
        if self.kind == "single_layer":
            return nn.Dense(self.out_dim, name="fc0")(pose)
        if self.kind == "two_layers":
            h = nn.Dense(self.out_dim, name="fc0")(pose)
            return nn.Dense(self.out_dim, name="fc1")(nn.gelu(h, approximate=False))
        if self.kind == "posEncoding":
            if self.posenc_trim:
                return SinusoidalPosEmb(
                    dim=self.out_dim // 6 + 1, max_dim=self.out_dim
                )(pose)
            if self.out_dim % 6 != 0:
                raise ValueError("out_dim must be divisible by 6 for posEncoding")
            return SinusoidalPosEmb(dim=self.out_dim // 6)(pose)
        raise ValueError(f"unknown pose_mlp kind {self.kind!r}")


class DualConditionalResnetBlock(nn.Module):
    """FiLM block conditioned on (time+class) embeddings *and* a
    reference feature map (``model_utils.py:317-364``
    DualConditionalResnetBlockv4): the embedding MLP and a Block-encoded
    reference map are summed into one scale/shift."""

    dim_out: int
    groups: int = 8

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        ref: Optional[jax.Array] = None,
        time_emb: Optional[jax.Array] = None,
        class_emb: Optional[jax.Array] = None,
    ) -> jax.Array:
        scale_shift = None
        if ref is not None and time_emb is not None and class_emb is not None:
            cond = jnp.concatenate([time_emb, class_emb], axis=-1)
            cond = nn.Dense(self.dim_out * 2, name="mlp_dense")(nn.silu(cond))
            cond = cond[:, None, None, :]
            ref_emb = Block(self.dim_out * 2, groups=self.groups, name="mlp_ref")(ref)
            cond = cond + ref_emb
            scale_shift = (cond[..., : self.dim_out], cond[..., self.dim_out :])
        h = Block(self.dim_out, groups=self.groups, name="block1")(x, scale_shift)
        h = Block(self.dim_out, groups=self.groups, name="block2")(h)
        if x.shape[-1] != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), name="res_conv")(x)
        else:
            res = x
        return h + res


def timestep_embedding(timesteps: jax.Array, dim: int, max_period: int = 10000) -> jax.Array:
    """Sinusoidal timestep embedding (``ldm/util.py:139-159``): kept for
    diffusion-style extensions; NOPE's pose forward bypasses it."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half) / half)
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class ChannelLayerNorm(nn.Module):
    """imagen-style LayerNorm with learned gain only, over an arbitrary
    axis (``model_utils.py:421-439``): (x - mean) * rsqrt(var + eps) * g."""

    axis: int = -1
    stable: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.stable:
            x = x / jax.lax.stop_gradient(jnp.max(x, axis=self.axis, keepdims=True))
        eps = 1e-5 if x.dtype == jnp.float32 else 1e-3
        var = jnp.var(x, axis=self.axis, keepdims=True)
        mean = jnp.mean(x, axis=self.axis, keepdims=True)
        g = self.param("g", nn.initializers.ones, (x.shape[self.axis],))
        shape = [1] * x.ndim
        shape[self.axis] = -1
        return (x - mean) * jax.lax.rsqrt(var + eps) * g.reshape(shape)


class ImagenCrossAttention(nn.Module):
    """imagen-lineage cross-attention with null key/value (classifier-
    free guidance) and cosine-sim scaled QK (``model_utils.py:442-518``).
    Unused by the NOPE forward path; provided for block-library parity
    and extensions."""

    heads: int = 8
    dim_head: int = 64
    scale: float = 8.0

    @nn.compact
    def __call__(self, x: jax.Array, context: jax.Array,
                 mask: Optional[jax.Array] = None) -> jax.Array:
        b, n, dim = x.shape
        inner = self.heads * self.dim_head
        x_n = ChannelLayerNorm(name="norm")(x)
        q = nn.Dense(inner, use_bias=False, name="to_q")(x_n)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(context)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_split(t):
            return t.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = heads_split(q), heads_split(k), heads_split(v)
        null_kv = self.param(
            "null_kv", nn.initializers.normal(1.0), (2, self.dim_head)
        )
        nk = jnp.broadcast_to(null_kv[0], (b, self.heads, 1, self.dim_head))
        nv = jnp.broadcast_to(null_kv[1], (b, self.heads, 1, self.dim_head))
        k = jnp.concatenate([nk, k], axis=2)
        v = jnp.concatenate([nv, v], axis=2)

        def l2norm(t):
            return t / jnp.linalg.norm(t, axis=-1, keepdims=True).clip(1e-12)

        q_scale = self.param("q_scale", nn.initializers.ones, (self.dim_head,))
        k_scale = self.param("k_scale", nn.initializers.ones, (self.dim_head,))
        q = l2norm(q) * q_scale
        k = l2norm(k) * k_scale
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * self.scale
        if mask is not None:
            mask = jnp.pad(mask, ((0, 0), (1, 0)), constant_values=True)
            sim = jnp.where(mask[:, None, None, :], sim, jnp.finfo(sim.dtype).min)
        attn = jax.nn.softmax(sim.astype(jnp.float32), axis=-1).astype(sim.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = nn.Dense(dim, use_bias=False, name="to_out")(out)
        return ChannelLayerNorm(name="out_norm")(out)
