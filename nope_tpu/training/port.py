"""PyTorch → Flax weight porting.

Replaces the reference's checkpoint surgery
(``/root/reference/src/utils/weight.py:6-37``: prefix remap +
shape-filtered partial load) with explicit, audited layout conversion:

- Conv2d kernels:          OIHW → HWIO
- Linear kernels:          (O, I) → (I, O)
- ConvTranspose2d kernels: (I, O, kh, kw) → HWIO with
  ``transpose_kernel=True`` on the Flax side
- GroupNorm/Norm scale+bias: copied as-is (grouping order matches)

Entry points take a flat ``{torch_key: np.ndarray}`` state dict (use
:func:`load_torch_state_dict` for ``.pth``/``.bin`` files) and return a
Flax params pytree for the corresponding ``nope_tpu.models`` module.

Key layouts supported:
- :func:`port_pose_unet` — the reference's default U-Net
  (``src/model/u_net/denoising_diffusion_pytorch/u_net.py`` module
  naming: ``downs.{i}.{0..3}``, ``mid_*``, ``ups.{i}.{0..3}``, ...).
- :func:`port_sd_vae` — diffusers ``AutoencoderKL`` checkpoints (both
  the 0.14-era ``query/key/value/proj_attn`` attention naming and the
  newer ``to_q/to_k/to_v/to_out.0``).
"""

from __future__ import annotations

import logging
from typing import Dict, Mapping, Sequence

import numpy as np

Array = np.ndarray
StateDict = Mapping[str, Array]


def load_torch_state_dict(path: str, checkpoint_key: str | None = None,
                          prefix: str = "") -> Dict[str, Array]:
    """Read a torch checkpoint into numpy (CPU, no grad), optionally
    descending into ``checkpoint_key`` and stripping ``prefix`` —
    the knobs ``weight.py:6-14`` exposes."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if checkpoint_key is not None:
        ckpt = ckpt[checkpoint_key]
    out = {}
    for k, v in ckpt.items():
        if prefix and k.startswith(prefix):
            k = k[len(prefix):]
        if hasattr(v, "detach"):
            out[k] = v.detach().cpu().numpy()
    return out


# ---------------------------------------------------------------------------
# primitive converters
# ---------------------------------------------------------------------------


def conv_kernel(w: Array) -> Array:
    """OIHW → HWIO."""
    return np.transpose(w, (2, 3, 1, 0))


def conv_transpose_kernel(w: Array) -> Array:
    """torch ConvTranspose2d (I, O, kh, kw) → flax ``transpose_kernel=True``
    layout (kh, kw, O, I)."""
    return np.transpose(w, (2, 3, 1, 0))


def linear_kernel(w: Array) -> Array:
    """(O, I) → (I, O)."""
    return np.transpose(w, (1, 0))


def _conv(sd: StateDict, key: str) -> dict:
    p = {"kernel": conv_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _dense_from_conv1x1(sd: StateDict, key: str) -> dict:
    """1x1 Conv2d/Conv1d weights → Dense params (VAE attention, the
    LDM encoder's AttentionPool2d projections)."""
    w = sd[f"{key}.weight"]
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    elif w.ndim == 3:
        w = w[:, :, 0]
    p = {"kernel": linear_kernel(w)}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _linear(sd: StateDict, key: str) -> dict:
    p = {"kernel": linear_kernel(sd[f"{key}.weight"])}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def _norm(sd: StateDict, key: str) -> dict:
    return {"scale": sd[f"{key}.weight"], "bias": sd[f"{key}.bias"]}


# ---------------------------------------------------------------------------
# default pose U-Net
# ---------------------------------------------------------------------------


def _resnet_block(sd: StateDict, key: str, with_mlp: bool = True) -> dict:
    out = {
        "block1": {"proj": _conv(sd, f"{key}.block1.proj"),
                   "norm": _norm(sd, f"{key}.block1.norm")},
        "block2": {"proj": _conv(sd, f"{key}.block2.proj"),
                   "norm": _norm(sd, f"{key}.block2.norm")},
    }
    if with_mlp and f"{key}.mlp.1.weight" in sd:
        out["mlp_dense"] = _linear(sd, f"{key}.mlp.1")
    if f"{key}.res_conv.weight" in sd:
        out["res_conv"] = _conv(sd, f"{key}.res_conv")
    return out


def _attn_block(sd: StateDict, key: str, linear_attention: bool) -> dict:
    """Residual(PreNorm(Linear/Full Attention)) subtree: reference keys
    ``{key}.fn.norm`` (PreNorm GN) and ``{key}.fn.fn.*`` map onto our
    fused ``ResidualPreNormAttention`` {norm, attn} params."""
    inner: dict = {"to_qkv": {"kernel": conv_kernel(sd[f"{key}.fn.fn.to_qkv.weight"])}}
    if linear_attention:
        inner["to_out_conv"] = _conv(sd, f"{key}.fn.fn.to_out.0")
        inner["to_out_norm"] = _norm(sd, f"{key}.fn.fn.to_out.1")
    else:
        inner["to_out"] = _conv(sd, f"{key}.fn.fn.to_out")
    return {"norm": _norm(sd, f"{key}.fn.norm"), "attn": inner}


def port_pose_unet(
    sd: StateDict,
    dim_mults: Sequence[int] = (1, 2, 4, 8),
    use_hard_up_down: bool = True,
    pose_mlp_name: str = "single_layer",
) -> dict:
    """Reference default-U-Net state dict → ``PoseUNet`` params.

    Note: the reference's ``final_conv.0`` ResnetBlock carries an ``mlp``
    that is never called (``u_net.py:154-157`` wraps it in nn.Sequential
    which passes no embedding); those dead weights are intentionally
    dropped here.
    """
    num = len(dim_mults)
    params: dict = {
        "init_conv": _conv(sd, "init_conv"),
        "final_res_block": _resnet_block(sd, "final_res_block"),
        "final_conv_block": _resnet_block(sd, "final_conv.0", with_mlp=False),
        "final_conv_out": _conv(sd, "final_conv.1"),
        "mid_block1": _resnet_block(sd, "mid_block1"),
        "mid_block2": _resnet_block(sd, "mid_block2"),
        "mid_attn": _attn_block(sd, "mid_attn", linear_attention=False),
    }
    if pose_mlp_name == "single_layer":
        params["pose_mlp"] = {"fc0": _linear(sd, "pose_mlp.0")}
    elif pose_mlp_name == "two_layers":
        params["pose_mlp"] = {"fc0": _linear(sd, "pose_mlp.0"),
                              "fc1": _linear(sd, "pose_mlp.2")}
    elif pose_mlp_name != "posEncoding":  # posEncoding has no params
        raise ValueError(pose_mlp_name)

    for i in range(num):
        params[f"downs_{i}_block1"] = _resnet_block(sd, f"downs.{i}.0")
        params[f"downs_{i}_block2"] = _resnet_block(sd, f"downs.{i}.1")
        params[f"downs_{i}_attn"] = _attn_block(sd, f"downs.{i}.2", True)
        is_last = i == num - 1
        if is_last:
            params[f"downs_{i}_down"] = _conv(sd, f"downs.{i}.3")
        elif use_hard_up_down:
            # HardDownsample = Sequential(Rearrange, Conv1x1) → index 1
            params[f"downs_{i}_down"] = {"conv": _conv(sd, f"downs.{i}.3.1")}
        else:
            params[f"downs_{i}_down"] = {"conv": _conv(sd, f"downs.{i}.3")}

        params[f"ups_{i}_block1"] = _resnet_block(sd, f"ups.{i}.0")
        params[f"ups_{i}_block2"] = _resnet_block(sd, f"ups.{i}.1")
        params[f"ups_{i}_attn"] = _attn_block(sd, f"ups.{i}.2", True)
        if is_last:
            params[f"ups_{i}_up"] = _conv(sd, f"ups.{i}.3")
        elif use_hard_up_down:
            # HardUpsample = Sequential(Upsample, Conv3x3) → index 1
            params[f"ups_{i}_up"] = {"conv": _conv(sd, f"ups.{i}.3.1")}
        else:
            k = f"ups.{i}.3"
            params[f"ups_{i}_up"] = {
                "conv": {
                    "kernel": conv_transpose_kernel(sd[f"{k}.weight"]),
                    "bias": sd[f"{k}.bias"],
                }
            }
    return params


# ---------------------------------------------------------------------------
# SD VAE (diffusers AutoencoderKL)
# ---------------------------------------------------------------------------


def _vae_resnet(sd: StateDict, key: str) -> dict:
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if f"{key}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    elif f"{key}.nin_shortcut.weight" in sd:  # LDM naming
        out["conv_shortcut"] = _conv(sd, f"{key}.nin_shortcut")
    return out


def _vae_attn(sd: StateDict, key: str) -> dict:
    if f"{key}.to_q.weight" in sd:  # modern diffusers naming
        names = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out": "to_out.0"}
    else:  # diffusers<=0.14 AttentionBlock naming
        names = {"to_q": "query", "to_k": "key", "to_v": "value", "to_out": "proj_attn"}
    return {
        "group_norm": _norm(sd, f"{key}.group_norm"),
        **{ours: _dense_from_conv1x1(sd, f"{key}.{theirs}") for ours, theirs in names.items()},
    }


def port_sd_vae(sd: StateDict, num_blocks: int = 4, layers_per_block: int = 2) -> dict:
    """diffusers ``AutoencoderKL`` state dict → ``StableDiffusionVAE``
    params (the checkpoint the reference loads at
    ``encoder/AutoencoderKL.py:16-19``)."""
    enc: dict = {
        "conv_in": _conv(sd, "encoder.conv_in"),
        "mid_res_0": _vae_resnet(sd, "encoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "mid_res_1": _vae_resnet(sd, "encoder.mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, "encoder.conv_norm_out"),
        "conv_out": _conv(sd, "encoder.conv_out"),
    }
    for i in range(num_blocks):
        for j in range(layers_per_block):
            enc[f"down_{i}_res_{j}"] = _vae_resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}"
            )
        if i < num_blocks - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }

    dec: dict = {
        "conv_in": _conv(sd, "decoder.conv_in"),
        "mid_res_0": _vae_resnet(sd, "decoder.mid_block.resnets.0"),
        "mid_attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "mid_res_1": _vae_resnet(sd, "decoder.mid_block.resnets.1"),
        "conv_norm_out": _norm(sd, "decoder.conv_norm_out"),
        "conv_out": _conv(sd, "decoder.conv_out"),
    }
    for i in range(num_blocks):
        for j in range(layers_per_block + 1):
            dec[f"up_{i}_res_{j}"] = _vae_resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < num_blocks - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


# ---------------------------------------------------------------------------
# verification helper
# ---------------------------------------------------------------------------


def assert_tree_shapes_match(ported: dict, template: dict, path: str = "") -> None:
    """Fail loudly (like weight.py's key accounting, but strict) when
    the ported tree and a freshly-initialised params template disagree."""
    t_keys = set(template)
    p_keys = set(ported)
    if t_keys != p_keys:
        missing, extra = t_keys - p_keys, p_keys - t_keys
        raise ValueError(f"at {path or '<root>'}: missing={sorted(missing)} extra={sorted(extra)}")
    for k in t_keys:
        t, p = template[k], ported[k]
        if isinstance(t, dict):
            assert_tree_shapes_match(p, t, f"{path}/{k}")
        else:
            if tuple(np.shape(p)) != tuple(np.shape(t)):
                raise ValueError(
                    f"at {path}/{k}: ported shape {np.shape(p)} != expected {np.shape(t)}"
                )
    logging.debug("port shape check ok at %s", path or "<root>")


# ---------------------------------------------------------------------------
# LDM / ADM U-Nets (openaimodel / guided_diffusion checkpoints)
# ---------------------------------------------------------------------------


def _ldm_resblock(sd: StateDict, key: str) -> dict:
    out = {
        "in_norm": _norm(sd, f"{key}.in_layers.0"),
        "in_conv": _conv(sd, f"{key}.in_layers.2"),
        "emb_dense": _linear(sd, f"{key}.emb_layers.1"),
        "out_norm": _norm(sd, f"{key}.out_layers.0"),
        "out_conv": _conv(sd, f"{key}.out_layers.3"),
    }
    if f"{key}.skip_connection.weight" in sd:
        out["skip_conv"] = _conv(sd, f"{key}.skip_connection")
    return out


def _ldm_cross_attention(sd: StateDict, key: str) -> dict:
    return {
        "to_q": {"kernel": linear_kernel(sd[f"{key}.to_q.weight"])},
        "to_k": {"kernel": linear_kernel(sd[f"{key}.to_k.weight"])},
        "to_v": {"kernel": linear_kernel(sd[f"{key}.to_v.weight"])},
        "to_out": _linear(sd, f"{key}.to_out.0"),
    }


def _ldm_transformer(sd: StateDict, key: str, depth: int) -> dict:
    out = {
        "norm": _norm(sd, f"{key}.norm"),
        "proj_in": _conv(sd, f"{key}.proj_in"),
        "proj_out": _conv(sd, f"{key}.proj_out"),
    }
    for d in range(depth):
        tb = f"{key}.transformer_blocks.{d}"
        out[f"block_{d}"] = {
            "norm1": _norm(sd, f"{tb}.norm1"),
            "norm2": _norm(sd, f"{tb}.norm2"),
            "norm3": _norm(sd, f"{tb}.norm3"),
            "attn1": _ldm_cross_attention(sd, f"{tb}.attn1"),
            "attn2": _ldm_cross_attention(sd, f"{tb}.attn2"),
            "ff": {
                "geglu": _linear(sd, f"{tb}.ff.net.0.proj"),
                "proj": _linear(sd, f"{tb}.ff.net.2"),
            },
        }
    return out


def port_ldm_unet(
    sd: StateDict,
    channel_mult: Sequence[int] = (1, 2, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    transformer_depth: int = 1,
    pose_mlp_name: str = "single_layer",
    injecting_condition_twice: bool = False,
) -> dict:
    """LDM ``UNetModelPose`` state dict → ``LDMPoseUNet`` params.

    Walks input/middle/output block indices in the same order the torch
    ModuleList was assembled (``openaimodel.py:428-792``).  The unused
    ``time_embed`` MLP (bypassed by the pose forward,
    ``adapt_openaimodel.py:141-144``) is intentionally dropped.
    """
    params: dict = {
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
        "mid_res_0": _ldm_resblock(sd, "middle_block.0"),
        "mid_attn": _ldm_transformer(sd, "middle_block.1", transformer_depth),
        "mid_res_1": _ldm_resblock(sd, "middle_block.2"),
    }
    if pose_mlp_name == "single_layer":
        params["pose_mlp"] = {"fc0": _linear(sd, "pose_mlp.0")}
        if injecting_condition_twice:
            params["pose_mlp_timesteps"] = {"fc0": _linear(sd, "pose_mlp_timesteps.0")}
    elif pose_mlp_name == "two_layers":
        params["pose_mlp"] = {"fc0": _linear(sd, "pose_mlp.0"),
                              "fc1": _linear(sd, "pose_mlp.2")}

    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            params[f"down_{level}_res_{i}"] = _ldm_resblock(sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                params[f"down_{level}_attn_{i}"] = _ldm_transformer(
                    sd, f"input_blocks.{idx}.1", transformer_depth
                )
            idx += 1
        if level != len(channel_mult) - 1:
            params[f"down_{level}_downsample"] = _conv(sd, f"input_blocks.{idx}.0.op")
            idx += 1
            ds *= 2

    jdx = 0
    for level in list(range(len(channel_mult)))[::-1]:
        for i in range(num_res_blocks + 1):
            params[f"up_{level}_res_{i}"] = _ldm_resblock(sd, f"output_blocks.{jdx}.0")
            sub = 1
            if ds in attention_resolutions:
                params[f"up_{level}_attn_{i}"] = _ldm_transformer(
                    sd, f"output_blocks.{jdx}.{sub}", transformer_depth
                )
                sub += 1
            if level and i == num_res_blocks:
                params[f"up_{level}_upsample"] = _conv(
                    sd, f"output_blocks.{jdx}.{sub}.conv"
                )
                ds //= 2
            jdx += 1
    return params


def _adm_attention(sd: StateDict, key: str) -> dict:
    return {
        "norm": _norm(sd, f"{key}.norm"),
        "qkv": _conv_1d_as_2d(sd, f"{key}.qkv"),
        "proj_out": _conv_1d_as_2d(sd, f"{key}.proj_out"),
    }


def _conv_1d_as_2d(sd: StateDict, key: str) -> dict:
    """ADM attention uses conv_nd(1, ...) over flattened tokens; our
    NHWC module uses an equivalent 1x1 Conv2d."""
    w = sd[f"{key}.weight"]
    if w.ndim == 3:  # (O, I, 1)
        w = w[:, :, :, None]
    p = {"kernel": conv_kernel(w)}
    if f"{key}.bias" in sd:
        p["bias"] = sd[f"{key}.bias"]
    return p


def port_adm_unet(
    sd: StateDict,
    channel_mult: Sequence[int] = (1, 1, 2, 2, 4, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (32, 16, 8),
    resblock_updown: bool = True,
    pose_mlp_name: str = "single_layer",
) -> dict:
    """guided-diffusion ``UNetModelPose`` state dict → ``ADMPoseUNet``
    params (``guided_diffusion/u_net.py:389-660`` assembly order)."""
    params: dict = {
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "out_norm": _norm(sd, "out.0"),
        "out_conv": _conv(sd, "out.2"),
        "mid_res_0": _ldm_resblock(sd, "middle_block.0"),
        "mid_attn": _adm_attention(sd, "middle_block.1"),
        "mid_res_1": _ldm_resblock(sd, "middle_block.2"),
    }
    if pose_mlp_name == "single_layer":
        params["pose_mlp"] = {"fc0": _linear(sd, "pose_mlp.0")}
    elif pose_mlp_name == "two_layers":
        params["pose_mlp"] = {"fc0": _linear(sd, "pose_mlp.0"),
                              "fc1": _linear(sd, "pose_mlp.2")}

    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            params[f"down_{level}_res_{i}"] = _ldm_resblock(sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                params[f"down_{level}_attn_{i}"] = _adm_attention(
                    sd, f"input_blocks.{idx}.1"
                )
            idx += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                params[f"down_{level}_downsample"] = _ldm_resblock(
                    sd, f"input_blocks.{idx}.0"
                )
            else:
                params[f"down_{level}_downsample"] = _conv(
                    sd, f"input_blocks.{idx}.0.op"
                )
            idx += 1
            ds *= 2

    jdx = 0
    for level in list(range(len(channel_mult)))[::-1]:
        for i in range(num_res_blocks + 1):
            params[f"up_{level}_res_{i}"] = _ldm_resblock(sd, f"output_blocks.{jdx}.0")
            sub = 1
            if ds in attention_resolutions:
                params[f"up_{level}_attn_{i}"] = _adm_attention(
                    sd, f"output_blocks.{jdx}.{sub}"
                )
                sub += 1
            if level and i == num_res_blocks:
                if resblock_updown:
                    params[f"up_{level}_upsample"] = _ldm_resblock(
                        sd, f"output_blocks.{jdx}.{sub}"
                    )
                else:
                    params[f"up_{level}_upsample"] = _conv(
                        sd, f"output_blocks.{jdx}.{sub}.conv"
                    )
                ds //= 2
            jdx += 1
    return params


def port_ldm_encoder_unet(
    sd: StateDict,
    channel_mult: Sequence[int] = (1, 2, 4),
    num_res_blocks: int = 2,
    attention_resolutions: Sequence[int] = (4, 2, 1),
    resblock_updown: bool = False,
    pool: str = "adaptive",
) -> dict:
    """LDM ``EncoderUNetModel`` state dict → ``LDMEncoderUNet`` params
    (``openaimodel.py:795-1009`` assembly order; the four ``pool``
    heads map per ``openaimodel.py:940-975``)."""
    params: dict = {
        "time_dense_0": _linear(sd, "time_embed.0"),
        "time_dense_1": _linear(sd, "time_embed.2"),
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "mid_res_0": _ldm_resblock(sd, "middle_block.0"),
        "mid_attn": _adm_attention(sd, "middle_block.1"),
        "mid_res_1": _ldm_resblock(sd, "middle_block.2"),
    }
    idx = 1
    ds = 1
    for level in range(len(channel_mult)):
        for i in range(num_res_blocks):
            params[f"down_{level}_res_{i}"] = _ldm_resblock(sd, f"input_blocks.{idx}.0")
            if ds in attention_resolutions:
                params[f"down_{level}_attn_{i}"] = _adm_attention(
                    sd, f"input_blocks.{idx}.1"
                )
            idx += 1
        if level != len(channel_mult) - 1:
            if resblock_updown:
                params[f"down_{level}_downsample"] = _ldm_resblock(
                    sd, f"input_blocks.{idx}.0"
                )
            else:
                params[f"down_{level}_downsample"] = _conv(
                    sd, f"input_blocks.{idx}.0.op"
                )
            idx += 1
            ds *= 2

    if pool == "adaptive":
        params["out_norm"] = _norm(sd, "out.0")
        params["out_conv"] = _conv(sd, "out.3")
    elif pool == "attention":
        params["out_norm"] = _norm(sd, "out.0")
        params["out_pool"] = {
            # torch stores (embed_dim, spacial**2 + 1); ours is (n, c)
            "positional_embedding": np.transpose(
                sd["out.2.positional_embedding"], (1, 0)
            ),
            "qkv_proj": _dense_from_conv1x1(sd, "out.2.qkv_proj"),
            "c_proj": _dense_from_conv1x1(sd, "out.2.c_proj"),
        }
    elif pool == "spatial":
        params["out_dense_0"] = _linear(sd, "out.0")
        params["out_dense_1"] = _linear(sd, "out.2")
    elif pool == "spatial_v2":
        params["out_dense_0"] = _linear(sd, "out.0")
        params["out_norm"] = _norm(sd, "out.1")
        params["out_dense_1"] = _linear(sd, "out.3")
    else:
        raise ValueError(f"unexpected pool {pool!r}")
    return params


# ---------------------------------------------------------------------------
# template encoder (ResNet-50 + projector)
# ---------------------------------------------------------------------------


def _frozen_bn(sd: StateDict, key: str) -> dict:
    return {
        "scale": sd[f"{key}.weight"],
        "bias": sd[f"{key}.bias"],
        "mean": sd[f"{key}.running_mean"],
        "var": sd[f"{key}.running_var"],
    }


def port_template_encoder(
    sd: StateDict, layers: Sequence[int] = (3, 4, 6, 3)
) -> dict:
    """Template-pose ``FeatureExtractor`` state dict →
    ``TemplateFeatureExtractor`` params (``encoder/template.py:24-53``:
    ResNet-50 backbone + projector.{1,3} 1x1 convs)."""
    backbone: dict = {
        "conv1": _conv(sd, "backbone.conv1"),
        "bn1": _frozen_bn(sd, "backbone.bn1"),
    }
    for li, n_blocks in enumerate(layers):
        for bi in range(n_blocks):
            key = f"backbone.layer{li + 1}.{bi}"
            block = {
                "conv1": _conv(sd, f"{key}.conv1"),
                "bn1": _frozen_bn(sd, f"{key}.bn1"),
                "conv2": _conv(sd, f"{key}.conv2"),
                "bn2": _frozen_bn(sd, f"{key}.bn2"),
            }
            if f"{key}.conv3.weight" in sd:
                block["conv3"] = _conv(sd, f"{key}.conv3")
                block["bn3"] = _frozen_bn(sd, f"{key}.bn3")
            if f"{key}.downsample.0.weight" in sd:
                block["downsample_conv"] = _conv(sd, f"{key}.downsample.0")
                block["downsample_bn"] = _frozen_bn(sd, f"{key}.downsample.1")
            backbone[f"layer{li + 1}_{bi}"] = block
    return {
        "backbone": backbone,
        "proj1": _conv(sd, "projector.1"),
        "proj2": _conv(sd, "projector.3"),
    }


def port_base_feature_extractor(sd: StateDict) -> dict:
    """``BaseFeatureExtractor`` state dict → flax params
    (``encoder/base_template.py:78-100``): the tiny conv encoder is an
    ``nn.Sequential`` named ``encoder`` with layer1 at index 0, layer2
    at 2, and the 1x1 projector pair nested at 4.{0,2}."""
    return {
        "layer1": _conv(sd, "encoder.0"),
        "layer2": _conv(sd, "encoder.2"),
        "proj1": _conv(sd, "encoder.4.0"),
        "proj2": _conv(sd, "encoder.4.2"),
    }


# ---------------------------------------------------------------------------
# generic shape-filtered partial load (weight.py semantics)
# ---------------------------------------------------------------------------


def partial_load(target: dict, ported: dict) -> tuple[dict, dict]:
    """Shape-filtered partial parameter update — the generic analogue of
    the reference's ``load_checkpoint`` surgery (``weight.py:6-37``):
    leaves present in both trees with matching shapes are taken from
    ``ported``; everything else keeps the ``target`` value.  Returns
    (merged_tree, report) where report lists loaded / skipped /
    missing-in-ported leaf paths.
    """
    report = {"loaded": [], "shape_mismatch": [], "not_in_ported": [], "extra": []}

    def walk(t: dict, p: dict, path: str) -> dict:
        out = {}
        for k, tv in t.items():
            kp = f"{path}/{k}" if path else str(k)
            if k not in p:
                report["not_in_ported"].append(kp)
                out[k] = tv
            elif isinstance(tv, dict):
                out[k] = walk(tv, p[k], kp)
            elif tuple(np.shape(p[k])) == tuple(np.shape(tv)):
                report["loaded"].append(kp)
                out[k] = p[k]
            else:
                report["shape_mismatch"].append(kp)
                out[k] = tv
        for k in p:
            if k not in t:
                report["extra"].append(f"{path}/{k}" if path else str(k))
        return out

    merged = walk(target, ported, "")
    logging.info(
        "partial_load: %d loaded, %d shape-mismatch, %d not updated, %d extra",
        len(report["loaded"]), len(report["shape_mismatch"]),
        len(report["not_in_ported"]), len(report["extra"]),
    )
    return merged, report
