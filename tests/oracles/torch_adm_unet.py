"""PyTorch oracle of the ADM (guided-diffusion) pose U-Net (test
fixture).  Architecture semantics of
``/root/reference/src/model/u_net/guided_diffusion/{u_net,adapt_u_net}.py``
with reference state-dict key names, written independently."""

import torch
from torch import nn

from tests.oracles.torch_ldm_unet import ResBlock, _Down, _Up


class AttentionBlock(nn.Module):
    """GN → qkv conv1d (legacy per-head [q,k,v] layout) → attention →
    zero proj conv1d → +x."""

    def __init__(self, channels, num_head_channels):
        super().__init__()
        self.num_heads = channels // num_head_channels
        self.norm = nn.GroupNorm(32, channels)
        self.qkv = nn.Conv1d(channels, channels * 3, 1)
        self.proj_out = nn.Conv1d(channels, channels, 1)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x):
        b, c, h, w = x.shape
        t = h * w
        qkv = self.qkv(self.norm(x).reshape(b, c, t))  # (b, 3c, t)
        # legacy layout: reshape (b*heads, 3*dh, t) then split
        dh = c // self.num_heads
        qkv = qkv.reshape(b * self.num_heads, 3 * dh, t)
        q, k, v = qkv.split(dh, dim=1)
        scale = 1 / (dh ** 0.25)
        weight = torch.einsum("bct,bcs->bts", q * scale, k * scale)
        weight = weight.softmax(dim=-1)
        a = torch.einsum("bts,bcs->bct", weight, v)
        a = a.reshape(b, c, t)
        return x + self.proj_out(a).reshape(b, c, h, w)


class _Seq(nn.Module):
    def __init__(self, *mods):
        super().__init__()
        for i, m in enumerate(mods):
            self.add_module(str(i), m)
        self.mods = mods

    def forward(self, x, emb):
        for m in self.mods:
            if isinstance(m, ResBlock):
                x = m(x, emb)
            else:
                x = m(x)
        return x


class TorchADMPoseUNet(nn.Module):
    def __init__(self, in_channels=4, model_channels=32, num_res_blocks=1,
                 attention_resolutions=(2,), channel_mult=(1, 2),
                 num_head_channels=16, rot_dim=6, resblock_updown=True,
                 use_scale_shift_norm=True):
        super().__init__()
        emb_dim = model_channels * 4
        self.pose_mlp = nn.Sequential(nn.Linear(rot_dim, emb_dim))
        ssn = use_scale_shift_norm

        def attn(ch):
            return AttentionBlock(ch, num_head_channels)

        self.input_blocks = nn.ModuleList(
            [_Seq(nn.Conv2d(in_channels, model_channels, 3, padding=1))]
        )
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            out_ch = model_channels * mult
            for _ in range(num_res_blocks):
                mods = [ResBlock(ch, emb_dim, out_ch, use_scale_shift_norm=ssn)]
                ch = out_ch
                if ds in attention_resolutions:
                    mods.append(attn(ch))
                self.input_blocks.append(_Seq(*mods))
            if level != len(channel_mult) - 1:
                if resblock_updown:
                    self.input_blocks.append(
                        _Seq(ResBlock(ch, emb_dim, ch, use_scale_shift_norm=ssn, down=True))
                    )
                else:
                    self.input_blocks.append(_Seq(_Down(ch)))
                ds *= 2

        self.middle_block = _Seq(
            ResBlock(ch, emb_dim, ch, use_scale_shift_norm=ssn),
            attn(ch),
            ResBlock(ch, emb_dim, ch, use_scale_shift_norm=ssn),
        )

        chs = [model_channels]
        c2 = model_channels
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                c2 = model_channels * mult
                chs.append(c2)
            if level != len(channel_mult) - 1:
                chs.append(c2)
        self.output_blocks = nn.ModuleList()
        for level, mult in list(enumerate(channel_mult))[::-1]:
            out_ch = model_channels * mult
            for i in range(num_res_blocks + 1):
                ich = chs.pop()
                mods = [ResBlock(ch + ich, emb_dim, out_ch, use_scale_shift_norm=ssn)]
                ch = out_ch
                if ds in attention_resolutions:
                    mods.append(attn(ch))
                if level and i == num_res_blocks:
                    if resblock_updown:
                        mods.append(
                            ResBlock(ch, emb_dim, ch, use_scale_shift_norm=ssn, up=True)
                        )
                    else:
                        mods.append(_Up(ch))
                    ds //= 2
                self.output_blocks.append(_Seq(*mods))

        self.out = nn.Sequential(
            nn.GroupNorm(32, ch), nn.SiLU(),
            nn.Conv2d(ch, in_channels, 3, padding=1),
        )

    def forward(self, x, pose):
        emb = self.pose_mlp(pose)
        hs = []
        h = x
        for module in self.input_blocks:
            h = module(h, emb)
            hs.append(h)
        h = self.middle_block(h, emb)
        for module in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            h = module(h, emb)
        return self.out(h)
