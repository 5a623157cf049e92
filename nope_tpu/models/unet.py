"""The default pose-conditioned U-Net (lucidrains-style).

Flax/NHWC re-implementation of the reference's default backend
(``/root/reference/src/model/u_net/denoising_diffusion_pytorch/u_net.py:26-198``):
a latent-space U-Net (4-ch, 32x32 for 256-px inputs through the SD-VAE)
whose *pose* embedding plays the role diffusion models give the
timestep — an additive bias inside every ResnetBlock.

Architecture (u_net_dim=192, dim_mults=(1,2,4,8) by default):

- init conv3x3 → residual copy ``r``
- 4 down stages: [ResnetBlock, ResnetBlock, Residual(PreNorm(LinearAttention)),
  HardDownsample] (last stage uses a conv3x3 instead of downsampling)
- bottleneck: ResnetBlock / Residual(PreNorm(Attention)) / ResnetBlock —
  executed **twice** when ``double_bottleneck=True``, reproducing the
  reference's duplicated lines (``u_net.py:177-183``) for checkpoint
  parity; set False for the corrected single pass.
- 4 up stages mirroring down with skip concatenation
- final ResnetBlock on concat(x, r) then 1x1 conv back to latent dim.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from nope_tpu.models.blocks import (
    Downsample,
    HardDownsample,
    HardUpsample,
    PoseMLP,
    ResidualPreNormAttention,
    ResnetBlock,
    Upsample,
)


class PoseUNet(nn.Module):
    """Pose-conditioned U-Net operating on VAE latents.

    Args mirror the reference ctor (``u_net.py:27-39``); ``channels`` is
    the latent dim (the reference reads it off its encoder).
    """

    u_net_dim: int = 192
    channels: int = 4
    rot_representation_dim: int = 6
    pose_mlp_name: str = "single_layer"
    dim_mults: Sequence[int] = (1, 2, 4, 8)
    resnet_block_groups: int = 8
    use_hard_up_down: bool = True
    double_bottleneck: bool = True
    fused_attention: bool = False  # Pallas linear-attention inner (TPU)
    # fused ResnetBlock Pallas kernel (TPU): whole conv+GN+SiLU chain in
    # one VMEM-resident program; applied to blocks whose weights fit
    # VMEM (dim_out <= fused_resnet_max_channels)
    fused_resnet: bool = False
    fused_resnet_max_channels: int = 512
    remat: bool = False  # rematerialize ResnetBlocks (memory ↓, FLOPs ↑)
    out_dim: int | None = None

    @nn.compact
    def __call__(self, x: jax.Array, pose: jax.Array) -> jax.Array:
        """x: (B, H, W, C) latents; pose: (B, rot_representation_dim)."""
        classes_dim = self.u_net_dim * 4
        init_dim = self.u_net_dim
        dims = [init_dim] + [self.u_net_dim * m for m in self.dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))
        groups = self.resnet_block_groups

        down_klass = HardDownsample if self.use_hard_up_down else Downsample
        up_klass = HardUpsample if self.use_hard_up_down else Upsample
        # gradient rematerialization trades FLOPs for activation memory
        # (the jax.checkpoint analogue of LDM's hand-rolled checkpoint
        # util the reference vendors but never enables)
        block_klass = nn.remat(ResnetBlock) if self.remat else ResnetBlock

        def fuse(dim_out: int) -> bool:
            return self.fused_resnet and dim_out <= self.fused_resnet_max_channels

        c = PoseMLP(classes_dim, kind=self.pose_mlp_name, name="pose_mlp")(pose)

        x = nn.Conv(init_dim, (3, 3), padding=1, name="init_conv")(x)
        r = x

        hs = []
        num_resolutions = len(in_out)
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_resolutions - 1
            x = block_klass(dim_in, groups=groups, fused=fuse(dim_in),
                            name=f"downs_{ind}_block1")(x, c)
            hs.append(x)
            x = block_klass(dim_in, groups=groups, fused=fuse(dim_in),
                            name=f"downs_{ind}_block2")(x, c)
            x = ResidualPreNormAttention(
                linear=True, fused=self.fused_attention, name=f"downs_{ind}_attn"
            )(x)
            hs.append(x)
            if is_last:
                x = nn.Conv(dim_out, (3, 3), padding=1, name=f"downs_{ind}_down")(x)
            else:
                x = down_klass(dim_out, name=f"downs_{ind}_down")(x)

        mid_dim = dims[-1]
        mid_block1 = block_klass(mid_dim, groups=groups, fused=fuse(mid_dim),
                                 name="mid_block1")
        mid_attn = ResidualPreNormAttention(linear=False, name="mid_attn")
        mid_block2 = block_klass(mid_dim, groups=groups, fused=fuse(mid_dim),
                                 name="mid_block2")

        passes = 2 if self.double_bottleneck else 1
        for _ in range(passes):  # u_net.py:177-183 runs the bottleneck twice
            x = mid_block1(x, c)
            x = mid_attn(x)
            x = mid_block2(x, c)

        for ind, (dim_in, dim_out) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            x = jnp.concatenate((x, hs.pop()), axis=-1)
            x = block_klass(dim_out, groups=groups, fused=fuse(dim_out),
                            name=f"ups_{ind}_block1")(x, c)
            x = jnp.concatenate((x, hs.pop()), axis=-1)
            x = block_klass(dim_out, groups=groups, fused=fuse(dim_out),
                            name=f"ups_{ind}_block2")(x, c)
            x = ResidualPreNormAttention(
                linear=True, fused=self.fused_attention, name=f"ups_{ind}_attn"
            )(x)
            if is_last:
                x = nn.Conv(dim_in, (3, 3), padding=1, name=f"ups_{ind}_up")(x)
            else:
                x = up_klass(dim_in, name=f"ups_{ind}_up")(x)

        x = jnp.concatenate((x, r), axis=-1)
        x = block_klass(self.u_net_dim, groups=groups, fused=fuse(self.u_net_dim),
                        name="final_res_block")(x, c)
        x = ResnetBlock(
            self.u_net_dim, groups=groups, use_conditioning=False,
            fused=fuse(self.u_net_dim), name="final_conv_block"
        )(x)
        out_dim = self.out_dim if self.out_dim is not None else self.channels
        return nn.Conv(out_dim, (1, 1), name="final_conv_out")(x)
