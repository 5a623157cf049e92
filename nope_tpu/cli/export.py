"""Export CLI: reference torch checkpoints → one orbax params directory.

Snapshots a (U-Net [, VAE]) pair into the single params checkpoint the
serving engine and eval CLIs consume — the deployment handoff the
reference leaves to ad-hoc checkpoint surgery.

Usage::

    python -m nope_tpu.cli.export --out /ckpts/nope_flagship \
        --unet nope_unet.pth [--vae sd-vae/ or sd_vae.bin] \
        [model.u_net.u_net_dim=192 ...]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", required=True)
    parser.add_argument("--unet", required=True,
                        help="reference-format torch checkpoint (.pth)")
    parser.add_argument("--vae", default=None,
                        help="diffusers VAE dir or .bin (optional)")
    parser.add_argument("--config", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    import jax

    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from nope_tpu.training import port
    from nope_tpu.training.checkpoint import save_params

    cfg = load_config(args.config, args.overrides)
    task = build_task(cfg.model)
    params = task.init(jax.random.key(0), image_size=cfg.model.img_size)

    sd = port.load_torch_state_dict(args.unet)
    # accept both bare U-Net dicts and full-model dicts (u_net. prefix)
    unet_sd = {k[len("u_net."):]: v for k, v in sd.items() if k.startswith("u_net.")}
    ported = port.port_pose_unet(
        unet_sd or sd,
        dim_mults=cfg.model.u_net.dim_mults,
        pose_mlp_name=cfg.model.u_net.pose_mlp_name,
    )
    port.assert_tree_shapes_match(ported, jax.device_get(params["unet"]))
    params["unet"] = jax.tree.map(np.asarray, ported)
    logging.info("ported U-Net from %s", args.unet)

    if args.vae:
        bin_path = (
            os.path.join(args.vae, "diffusion_pytorch_model.bin")
            if os.path.isdir(args.vae)
            else args.vae
        )
        vae_sd = port.load_torch_state_dict(bin_path)
        ported_vae = port.port_sd_vae(vae_sd)
        port.assert_tree_shapes_match(ported_vae, jax.device_get(params["vae"]))
        params["vae"] = jax.tree.map(np.asarray, ported_vae)
        logging.info("ported VAE from %s", bin_path)

    save_params(args.out, jax.device_get(params))
    print(f"exported params -> {os.path.abspath(args.out)}")


if __name__ == "__main__":
    main()
