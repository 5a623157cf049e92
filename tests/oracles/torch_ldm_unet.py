"""PyTorch oracle of the LDM pose U-Net (test fixture only).

Implements the architecture semantics of
``/root/reference/src/model/u_net/ldm/{openaimodel,attention,adapt_openaimodel}.py``
with reference state-dict key names (``input_blocks.N.M...``), written
independently and compactly to validate the production port tool.
"""

import torch
from torch import nn


class ResBlock(nn.Module):
    def __init__(self, channels, emb_channels, out_channels,
                 use_scale_shift_norm=False, up=False, down=False):
        super().__init__()
        self.use_scale_shift_norm = use_scale_shift_norm
        self.up, self.down = up, down
        self.in_layers = nn.Sequential(
            nn.GroupNorm(32, channels), nn.SiLU(),
            nn.Conv2d(channels, out_channels, 3, padding=1),
        )
        self.emb_layers = nn.Sequential(
            nn.SiLU(),
            nn.Linear(emb_channels, out_channels * (2 if use_scale_shift_norm else 1)),
        )
        self.out_layers = nn.Sequential(
            nn.GroupNorm(32, out_channels), nn.SiLU(), nn.Identity(),
            nn.Conv2d(out_channels, out_channels, 3, padding=1),
        )
        nn.init.zeros_(self.out_layers[3].weight)
        nn.init.zeros_(self.out_layers[3].bias)
        self.skip_connection = (
            nn.Conv2d(channels, out_channels, 1)
            if channels != out_channels
            else nn.Identity()
        )

    def forward(self, x, emb):
        if self.up or self.down:
            rest, conv = self.in_layers[:-1], self.in_layers[-1]
            h = rest(x)
            resample = (
                (lambda t: torch.nn.functional.interpolate(t, scale_factor=2, mode="nearest"))
                if self.up
                else (lambda t: torch.nn.functional.avg_pool2d(t, 2))
            )
            h = resample(h)
            x = resample(x)
            h = conv(h)
        else:
            h = self.in_layers(x)
        emb_out = self.emb_layers(emb)[:, :, None, None]
        if self.use_scale_shift_norm:
            norm, rest = self.out_layers[0], self.out_layers[1:]
            scale, shift = torch.chunk(emb_out, 2, dim=1)
            h = norm(h) * (1 + scale) + shift
            h = rest(h)
        else:
            h = h + emb_out
            h = self.out_layers(h)
        return self.skip_connection(x) + h


class CrossAttention(nn.Module):
    def __init__(self, dim, context_dim, heads, dim_head):
        super().__init__()
        inner = heads * dim_head
        self.heads, self.dim_head = heads, dim_head
        self.to_q = nn.Linear(dim, inner, bias=False)
        self.to_k = nn.Linear(context_dim, inner, bias=False)
        self.to_v = nn.Linear(context_dim, inner, bias=False)
        self.to_out = nn.Sequential(nn.Linear(inner, dim), nn.Identity())

    def forward(self, x, context=None):
        context = x if context is None else context
        b, n, _ = x.shape
        m = context.shape[1]
        q = self.to_q(x).reshape(b, n, self.heads, self.dim_head)
        k = self.to_k(context).reshape(b, m, self.heads, self.dim_head)
        v = self.to_v(context).reshape(b, m, self.heads, self.dim_head)
        sim = torch.einsum("bnhd,bmhd->bhnm", q, k) * self.dim_head**-0.5
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, -1)
        return self.to_out(out)


class GEGLU(nn.Module):
    def __init__(self, dim, inner):
        super().__init__()
        self.proj = nn.Linear(dim, inner * 2)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return h * torch.nn.functional.gelu(gate)


class TransformerBlock(nn.Module):
    def __init__(self, dim, context_dim, heads, dim_head):
        super().__init__()
        self.attn1 = CrossAttention(dim, dim, heads, dim_head)
        self.attn2 = CrossAttention(dim, context_dim, heads, dim_head)
        self.ff = nn.Module()
        self.ff.net = nn.Sequential(GEGLU(dim, dim * 4), nn.Identity(), nn.Linear(dim * 4, dim))
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)

    def forward(self, x, context):
        x = x + self.attn1(self.norm1(x))
        x = x + self.attn2(self.norm2(x), context)
        x = x + self.ff.net(self.norm3(x))
        return x


class SpatialTransformer(nn.Module):
    def __init__(self, channels, context_dim, heads, dim_head, depth=1):
        super().__init__()
        inner = heads * dim_head
        self.norm = nn.GroupNorm(32, channels, eps=1e-6)
        self.proj_in = nn.Conv2d(channels, inner, 1)
        self.transformer_blocks = nn.ModuleList(
            [TransformerBlock(inner, context_dim, heads, dim_head) for _ in range(depth)]
        )
        self.proj_out = nn.Conv2d(inner, channels, 1)
        nn.init.zeros_(self.proj_out.weight)
        nn.init.zeros_(self.proj_out.bias)

    def forward(self, x, context):
        b, c, h, w = x.shape
        residual = x
        x = self.proj_in(self.norm(x))
        x = x.permute(0, 2, 3, 1).reshape(b, h * w, -1)
        for block in self.transformer_blocks:
            x = block(x, context)
        x = x.reshape(b, h, w, -1).permute(0, 3, 1, 2)
        return self.proj_out(x) + residual


class _Seq(nn.Module):
    """Dispatch emb/context like TimestepEmbedSequential."""

    def __init__(self, *mods):
        super().__init__()
        for i, m in enumerate(mods):
            self.add_module(str(i), m)
        self.mods = mods

    def forward(self, x, emb, context):
        for m in self.mods:
            if isinstance(m, ResBlock):
                x = m(x, emb)
            elif isinstance(m, (SpatialTransformer,)):
                x = m(x, context)
            else:
                x = m(x)
        return x


class _Down(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.op = nn.Conv2d(ch, ch, 3, stride=2, padding=1)

    def forward(self, x):
        return self.op(x)


class _Up(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        x = torch.nn.functional.interpolate(x, scale_factor=2, mode="nearest")
        return self.conv(x)


class TorchLDMPoseUNet(nn.Module):
    def __init__(self, in_channels=4, model_channels=32, num_res_blocks=1,
                 attention_resolutions=(2, 1), channel_mult=(1, 2),
                 num_head_channels=16, context_dim=24, transformer_depth=1,
                 rot_dim=6):
        super().__init__()
        self.cfg = dict(num_res_blocks=num_res_blocks, channel_mult=channel_mult,
                        attention_resolutions=attention_resolutions)
        emb_dim = model_channels * 4
        self.time_embed_dim = emb_dim
        self.pose_mlp = nn.Sequential(nn.Linear(rot_dim, context_dim))

        def make_attn(ch):
            return SpatialTransformer(
                ch, context_dim, ch // num_head_channels, num_head_channels,
                transformer_depth,
            )

        self.input_blocks = nn.ModuleList(
            [_Seq(nn.Conv2d(in_channels, model_channels, 3, padding=1))]
        )
        ch = model_channels
        ds = 1
        for level, mult in enumerate(channel_mult):
            out_ch = model_channels * mult
            for _ in range(num_res_blocks):
                mods = [ResBlock(ch, emb_dim, out_ch)]
                ch = out_ch
                if ds in attention_resolutions:
                    mods.append(make_attn(ch))
                self.input_blocks.append(_Seq(*mods))
            if level != len(channel_mult) - 1:
                self.input_blocks.append(_Seq(_Down(ch)))
                ds *= 2

        self.middle_block = _Seq(
            ResBlock(ch, emb_dim, ch), make_attn(ch), ResBlock(ch, emb_dim, ch)
        )

        self.output_blocks = nn.ModuleList()
        skip_chs = []
        # recompute skip channel stack like the forward will pop it
        chs = [model_channels]
        c2 = model_channels
        for level, mult in enumerate(channel_mult):
            for _ in range(num_res_blocks):
                c2 = model_channels * mult
                chs.append(c2)
            if level != len(channel_mult) - 1:
                chs.append(c2)
        for level, mult in list(enumerate(channel_mult))[::-1]:
            out_ch = model_channels * mult
            for i in range(num_res_blocks + 1):
                ich = chs.pop()
                mods = [ResBlock(ch + ich, emb_dim, out_ch)]
                ch = out_ch
                if ds in attention_resolutions:
                    mods.append(make_attn(ch))
                if level and i == num_res_blocks:
                    mods.append(_Up(ch))
                    ds //= 2
                self.output_blocks.append(_Seq(*mods))

        self.out = nn.Sequential(
            nn.GroupNorm(32, ch), nn.SiLU(),
            nn.Conv2d(ch, in_channels, 3, padding=1),
        )
        nn.init.zeros_(self.out[2].weight)
        nn.init.zeros_(self.out[2].bias)

    def forward(self, x, pose):
        emb = torch.zeros(x.shape[0], self.time_embed_dim, device=x.device)
        context = self.pose_mlp(pose).unsqueeze(1)
        hs = []
        h = x
        for module in self.input_blocks:
            h = module(h, emb, context)
            hs.append(h)
        h = self.middle_block(h, emb, context)
        for module in self.output_blocks:
            h = torch.cat([h, hs.pop()], dim=1)
            h = module(h, emb, context)
        return self.out(h)
