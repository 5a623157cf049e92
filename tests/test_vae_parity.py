"""SD-VAE port parity against a torch oracle of diffusers AutoencoderKL
(tiny config), including the 0.18215 latent-scaling quirks."""

import numpy as np
import torch
from torch import nn

import jax
import jax.numpy as jnp

from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.training import port

CH = (8, 16)
GROUPS = 4
LAT = 2


class TorchVAEResnet(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = nn.GroupNorm(GROUPS, cin, eps=1e-6)
        self.conv1 = nn.Conv2d(cin, cout, 3, padding=1)
        self.norm2 = nn.GroupNorm(GROUPS, cout, eps=1e-6)
        self.conv2 = nn.Conv2d(cout, cout, 3, padding=1)
        self.conv_shortcut = nn.Conv2d(cin, cout, 1) if cin != cout else None

    def forward(self, x):
        h = self.conv1(torch.nn.functional.silu(self.norm1(x)))
        h = self.conv2(torch.nn.functional.silu(self.norm2(h)))
        sc = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return sc + h


class TorchVAEAttn(nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.group_norm = nn.GroupNorm(GROUPS, ch, eps=1e-6)
        self.to_q = nn.Linear(ch, ch)
        self.to_k = nn.Linear(ch, ch)
        self.to_v = nn.Linear(ch, ch)
        self.to_out = nn.Sequential(nn.Linear(ch, ch))

    def forward(self, x):
        b, c, h, w = x.shape
        t = self.group_norm(x).reshape(b, c, h * w).permute(0, 2, 1)
        q, k, v = self.to_q(t), self.to_k(t), self.to_v(t)
        attn = torch.softmax(torch.einsum("bic,bjc->bij", q, k) * c**-0.5, dim=-1)
        out = self.to_out(torch.einsum("bij,bjc->bic", attn, v))
        return x + out.permute(0, 2, 1).reshape(b, c, h, w)


class _Wrap(nn.Module):
    """Nest modules under diffusers-style key paths."""

    def __init__(self, **children):
        super().__init__()
        for k, v in children.items():
            setattr(self, k, v)


class TorchTinyVAE(nn.Module):
    """diffusers AutoencoderKL layout: encoder.down_blocks.i.resnets.j,
    mid_block.{resnets, attentions}, decoder.up_blocks..., quant convs."""

    def __init__(self):
        super().__init__()
        layers = 1
        enc = _Wrap()
        enc.conv_in = nn.Conv2d(3, CH[0], 3, padding=1)
        enc.down_blocks = nn.ModuleList()
        cin = CH[0]
        for i, ch in enumerate(CH):
            block = _Wrap()
            block.resnets = nn.ModuleList(
                [TorchVAEResnet(cin if j == 0 else ch, ch) for j in range(layers)]
            )
            if i < len(CH) - 1:
                ds = _Wrap()
                ds.conv = nn.Conv2d(ch, ch, 3, stride=2, padding=0)
                block.downsamplers = nn.ModuleList([ds])
            block = block
            enc.down_blocks.append(block)
            cin = ch
        enc.mid_block = _Wrap(
            resnets=nn.ModuleList([TorchVAEResnet(CH[-1], CH[-1]),
                                   TorchVAEResnet(CH[-1], CH[-1])]),
            attentions=nn.ModuleList([TorchVAEAttn(CH[-1])]),
        )
        enc.conv_norm_out = nn.GroupNorm(GROUPS, CH[-1], eps=1e-6)
        enc.conv_out = nn.Conv2d(CH[-1], 2 * LAT, 3, padding=1)
        self.encoder = enc

        dec = _Wrap()
        rev = list(reversed(CH))
        dec.conv_in = nn.Conv2d(LAT, rev[0], 3, padding=1)
        dec.mid_block = _Wrap(
            resnets=nn.ModuleList([TorchVAEResnet(rev[0], rev[0]),
                                   TorchVAEResnet(rev[0], rev[0])]),
            attentions=nn.ModuleList([TorchVAEAttn(rev[0])]),
        )
        dec.up_blocks = nn.ModuleList()
        cin = rev[0]
        for i, ch in enumerate(rev):
            block = _Wrap()
            block.resnets = nn.ModuleList(
                [TorchVAEResnet(cin if j == 0 else ch, ch) for j in range(layers + 1)]
            )
            if i < len(rev) - 1:
                us = _Wrap()
                us.conv = nn.Conv2d(ch, ch, 3, padding=1)
                block.upsamplers = nn.ModuleList([us])
            dec.up_blocks.append(block)
            cin = ch
        dec.conv_norm_out = nn.GroupNorm(GROUPS, rev[-1], eps=1e-6)
        dec.conv_out = nn.Conv2d(rev[-1], 3, 3, padding=1)
        self.decoder = dec

        self.quant_conv = nn.Conv2d(2 * LAT, 2 * LAT, 1)
        self.post_quant_conv = nn.Conv2d(LAT, LAT, 1)

    def encode_mode(self, x):
        h = self.encoder.conv_in(x)
        for i, block in enumerate(self.encoder.down_blocks):
            for res in block.resnets:
                h = res(h)
            if hasattr(block, "downsamplers"):
                h = torch.nn.functional.pad(h, (0, 1, 0, 1))
                h = block.downsamplers[0].conv(h)
        h = self.encoder.mid_block.resnets[0](h)
        h = self.encoder.mid_block.attentions[0](h)
        h = self.encoder.mid_block.resnets[1](h)
        h = torch.nn.functional.silu(self.encoder.conv_norm_out(h))
        moments = self.quant_conv(self.encoder.conv_out(h))
        mean, _ = torch.chunk(moments, 2, dim=1)
        return mean * 0.18215  # AutoencoderKL.py:33

    def decode_latent(self, z):
        z = z / 0.18215
        h = self.decoder.conv_in(self.post_quant_conv(z))
        h = self.decoder.mid_block.resnets[0](h)
        h = self.decoder.mid_block.attentions[0](h)
        h = self.decoder.mid_block.resnets[1](h)
        for block in self.decoder.up_blocks:
            for res in block.resnets:
                h = res(h)
            if hasattr(block, "upsamplers"):
                h = torch.nn.functional.interpolate(h, scale_factor=2, mode="nearest")
                h = block.upsamplers[0].conv(h)
        h = torch.nn.functional.silu(self.decoder.conv_norm_out(h))
        return self.decoder.conv_out(h)


def test_vae_port_parity(rng):
    torch.manual_seed(0)
    oracle = TorchTinyVAE()
    with torch.no_grad():
        for p in oracle.parameters():
            p.normal_(0, 0.05)
    oracle.eval()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}

    flax_vae = StableDiffusionVAE(
        block_out_channels=CH, layers_per_block=1, latent_channels=LAT,
        groups=GROUPS,
    )
    ported = port.port_sd_vae(sd, num_blocks=len(CH), layers_per_block=1)
    template = flax_vae.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    with torch.no_grad():
        lat_ref = oracle.encode_mode(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        lat = flax_vae.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            "mode",
            method=flax_vae.encode_image,
        )
    lat_nchw = np.transpose(np.asarray(lat), (0, 3, 1, 2))
    assert lat_nchw.shape == lat_ref.shape == (2, LAT, 8, 8)
    np.testing.assert_allclose(lat_nchw, lat_ref, atol=5e-5, rtol=1e-3)

    with torch.no_grad():
        rgb_ref = oracle.decode_latent(torch.from_numpy(lat_ref)).numpy()
    with jax.default_matmul_precision("highest"):
        rgb = flax_vae.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            lat, method=flax_vae.decode_latent,
        )
    rgb_nchw = np.transpose(np.asarray(rgb), (0, 3, 1, 2))
    np.testing.assert_allclose(rgb_nchw, rgb_ref, atol=5e-5, rtol=1e-3)


def test_vae_old_attention_key_naming(rng):
    """diffusers<=0.14 used query/key/value/proj_attn names; the port
    must accept both."""
    torch.manual_seed(1)
    oracle = TorchTinyVAE()
    sd = {k: v.detach().numpy() for k, v in oracle.state_dict().items()}
    renames = {
        ".attentions.0.to_q.": ".attentions.0.query.",
        ".attentions.0.to_k.": ".attentions.0.key.",
        ".attentions.0.to_v.": ".attentions.0.value.",
        ".attentions.0.to_out.0.": ".attentions.0.proj_attn.",
    }
    old_sd = {}
    for k, v in sd.items():
        for new, old in renames.items():
            if new in k:
                k = k.replace(new, old)
        old_sd[k] = v
    ported = port.port_sd_vae(old_sd, num_blocks=len(CH), layers_per_block=1)
    flax_vae = StableDiffusionVAE(
        block_out_channels=CH, layers_per_block=1, latent_channels=LAT, groups=GROUPS
    )
    template = flax_vae.init(jax.random.key(0), jnp.zeros((1, 16, 16, 3)))["params"]
    port.assert_tree_shapes_match(ported, template)
