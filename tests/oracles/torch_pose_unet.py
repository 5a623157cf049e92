"""PyTorch oracle of the reference's default pose-conditioned U-Net.

Test fixture only.  Implements the architecture semantics documented in
``/root/reference/src/model/u_net/denoising_diffusion_pytorch/{u_net,model_utils}.py``
(lucidrains denoising-diffusion-pytorch lineage) with the reference's
*state-dict key names*, so the production port tool
(:mod:`nope_tpu.training.port`) is exercised against checkpoints shaped
exactly like the reference's.  Written independently and compactly —
this is an oracle, not a vendored copy.
"""

import torch
from torch import nn


class Block(nn.Module):
    def __init__(self, dim, dim_out, groups=8):
        super().__init__()
        self.proj = nn.Conv2d(dim, dim_out, 3, padding=1)
        self.norm = nn.GroupNorm(groups, dim_out)
        self.act = nn.SiLU()

    def forward(self, x, scale_shift=None):
        x = self.norm(self.proj(x))
        if scale_shift is not None:
            scale, shift = scale_shift
            x = x * (scale + 1) + shift
        return self.act(x)


class ResnetBlock(nn.Module):
    def __init__(self, dim, dim_out, time_emb_dim=None, groups=8):
        super().__init__()
        self.mlp = (
            nn.Sequential(nn.SiLU(), nn.Linear(time_emb_dim, dim_out))
            if time_emb_dim is not None
            else None
        )
        self.block1 = Block(dim, dim_out, groups)
        self.block2 = Block(dim_out, dim_out, groups)
        self.res_conv = nn.Conv2d(dim, dim_out, 1) if dim != dim_out else nn.Identity()

    def forward(self, x, emb=None):
        h = self.block1(x)
        if self.mlp is not None and emb is not None:
            h = h + self.mlp(emb)[:, :, None, None]
        h = self.block2(h)
        return h + self.res_conv(x)


class LinearAttention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.heads, self.scale = heads, dim_head**-0.5
        hidden = heads * dim_head
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Sequential(nn.Conv2d(hidden, dim, 1), nn.GroupNorm(1, dim))

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=1)
        q, k, v = (
            t.reshape(b, self.heads, -1, h * w) for t in qkv
        )  # (b, heads, dh, n): heads-major channel split
        q = q.softmax(dim=-2) * self.scale
        k = k.softmax(dim=-1)
        context = torch.einsum("bhdn,bhen->bhde", k, v)
        out = torch.einsum("bhde,bhdn->bhen", context, q)
        out = out.reshape(b, -1, h, w)
        return self.to_out(out)


class Attention(nn.Module):
    def __init__(self, dim, heads=4, dim_head=32):
        super().__init__()
        self.heads, self.scale = heads, dim_head**-0.5
        hidden = heads * dim_head
        self.to_qkv = nn.Conv2d(dim, hidden * 3, 1, bias=False)
        self.to_out = nn.Conv2d(hidden, dim, 1)

    def forward(self, x):
        b, c, h, w = x.shape
        qkv = self.to_qkv(x).chunk(3, dim=1)
        q, k, v = (t.reshape(b, self.heads, -1, h * w) for t in qkv)
        q = q * self.scale
        sim = torch.einsum("bhdi,bhdj->bhij", q, k)
        sim = sim - sim.amax(dim=-1, keepdim=True).detach()
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bhij,bhdj->bhid", attn, v)  # (b, h, n, d)
        out = out.permute(0, 1, 3, 2).reshape(b, -1, h, w)
        return self.to_out(out)


class PreNorm(nn.Module):
    def __init__(self, dim, fn):
        super().__init__()
        self.fn = fn
        self.norm = nn.GroupNorm(1, dim)

    def forward(self, x):
        return self.fn(self.norm(x))


class Residual(nn.Module):
    def __init__(self, fn):
        super().__init__()
        self.fn = fn

    def forward(self, x):
        return self.fn(x) + x


class _PixelUnshuffleCHW(nn.Module):
    """einops 'b c (h p1) (w p2) -> b (c p1 p2) h w'."""

    def forward(self, x):
        b, c, h, w = x.shape
        x = x.reshape(b, c, h // 2, 2, w // 2, 2)
        return x.permute(0, 1, 3, 5, 2, 4).reshape(b, c * 4, h // 2, w // 2)


def hard_downsample(dim, dim_out):
    return nn.Sequential(_PixelUnshuffleCHW(), nn.Conv2d(dim * 4, dim_out, 1))


def hard_upsample(dim, dim_out):
    return nn.Sequential(
        nn.Upsample(scale_factor=2, mode="nearest"),
        nn.Conv2d(dim, dim_out, 3, padding=1),
    )


class TorchPoseUNet(nn.Module):
    """Reference-architecture oracle with reference state-dict keys."""

    def __init__(self, u_net_dim=16, channels=4, rot_dim=6, dim_mults=(1, 2), groups=8):
        super().__init__()
        classes_dim = u_net_dim * 4
        dims = [u_net_dim] + [u_net_dim * m for m in dim_mults]
        in_out = list(zip(dims[:-1], dims[1:]))

        self.pose_mlp = nn.Sequential(nn.Linear(rot_dim, classes_dim))
        self.init_conv = nn.Conv2d(channels, u_net_dim, 3, padding=1)

        def rb(i, o):
            return ResnetBlock(i, o, time_emb_dim=classes_dim, groups=groups)

        self.downs = nn.ModuleList()
        for ind, (ci, co) in enumerate(in_out):
            is_last = ind >= len(in_out) - 1
            self.downs.append(
                nn.ModuleList(
                    [
                        rb(ci, ci),
                        rb(ci, ci),
                        Residual(PreNorm(ci, LinearAttention(ci))),
                        nn.Conv2d(ci, co, 3, padding=1)
                        if is_last
                        else hard_downsample(ci, co),
                    ]
                )
            )
        mid = dims[-1]
        self.mid_block1 = rb(mid, mid)
        self.mid_attn = Residual(PreNorm(mid, Attention(mid)))
        self.mid_block2 = rb(mid, mid)

        self.ups = nn.ModuleList()
        for ind, (ci, co) in enumerate(reversed(in_out)):
            is_last = ind == len(in_out) - 1
            self.ups.append(
                nn.ModuleList(
                    [
                        rb(co + ci, co),
                        rb(co + ci, co),
                        Residual(PreNorm(co, LinearAttention(co))),
                        nn.Conv2d(co, ci, 3, padding=1)
                        if is_last
                        else hard_upsample(co, ci),
                    ]
                )
            )
        self.final_res_block = rb(u_net_dim * 2, u_net_dim)
        self.final_conv = nn.Sequential(
            rb(u_net_dim, u_net_dim), nn.Conv2d(u_net_dim, channels, 1)
        )

    def forward(self, x, pose):
        x = self.init_conv(x)
        r = x.clone()
        c = self.pose_mlp(pose)
        h = []
        for b1, b2, attn, down in self.downs:
            x = b1(x, c)
            h.append(x)
            x = attn(b2(x, c))
            h.append(x)
            x = down(x)
        for _ in range(2):  # double-bottleneck quirk (u_net.py:177-183)
            x = self.mid_block2(self.mid_attn(self.mid_block1(x, c)), c)
        for b1, b2, attn, up in self.ups:
            x = b1(torch.cat((x, h.pop()), dim=1), c)
            x = attn(b2(torch.cat((x, h.pop()), dim=1), c))
            x = up(x)
        x = self.final_res_block(torch.cat((x, r), dim=1), c)
        return self.final_conv(x)
