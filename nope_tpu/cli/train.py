"""Training CLI (the reference's ``train.py`` equivalent).

Usage::

    python -m nope_tpu.cli.train [--config cfg.yaml] [key=value ...]

e.g.::

    python -m nope_tpu.cli.train name_exp=run1 \
        data.datasets.shapeNet.root_dir=/data/shapenet \
        machine.batch_size=16 model.u_net.pretrained_path=unet.pth

Warm-start paths accept either orbax directories or reference-format
torch checkpoints (ported on the fly via nope_tpu.training.port).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def _maybe_warm_start(task, params, cfg):
    """Load pretrained U-Net / encoder weights (train.py:47-60)."""
    import jax

    unet_path = cfg.model.u_net.pretrained_path
    if cfg.use_pretrained and unet_path:
        from nope_tpu.training import port

        if os.path.isdir(unet_path):  # orbax
            from nope_tpu.training.checkpoint import restore_params

            params["unet"] = restore_params(unet_path, params["unet"])
        else:  # torch checkpoint in the reference layout
            sd = port.load_torch_state_dict(unet_path)
            params["unet"] = jax.tree.map(
                np.asarray,
                port.port_pose_unet(
                    sd,
                    dim_mults=cfg.model.u_net.dim_mults,
                    pose_mlp_name=cfg.model.u_net.pose_mlp_name,
                ),
            )
        logging.info("warm-started U-Net from %s", unet_path)
    enc_path = cfg.model.encoder.pretrained_path
    if cfg.use_pretrained and enc_path and cfg.model.encoder.kind == "vae":
        from nope_tpu.training import port

        # a diffusers VAE directory (the reference's documented layout)
        # contains diffusion_pytorch_model.bin; anything else that is a
        # directory is treated as an orbax checkpoint
        diffusers_bin = os.path.join(enc_path, "diffusion_pytorch_model.bin")
        if os.path.isfile(enc_path) or os.path.isfile(diffusers_bin):
            sd = port.load_torch_state_dict(
                diffusers_bin if os.path.isfile(diffusers_bin) else enc_path
            )
            params["vae"] = jax.tree.map(np.asarray, port.port_sd_vae(sd))
        else:
            from nope_tpu.training.checkpoint import restore_params

            params["vae"] = restore_params(enc_path, params["vae"])
        logging.info("loaded frozen encoder from %s", enc_path)
    return params


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--max-steps", type=int, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from nope_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    from nope_tpu.configs import load_config
    from nope_tpu.data.builder import build_train_loaders, build_val_loaders
    from nope_tpu.evaluation.geodesic import evaluate_geodesic
    from nope_tpu.models.factory import build_task
    from nope_tpu.parallel.mesh import initialize_distributed
    from nope_tpu.training.trainer import Trainer

    initialize_distributed()
    cfg = load_config(args.config, args.overrides)
    os.makedirs(cfg.save_dir, exist_ok=True)
    logging.info("experiment %s -> %s", cfg.name_exp, cfg.save_dir)

    task = build_task(cfg.model)
    train_loaders = build_train_loaders(cfg)
    val_loaders = build_val_loaders(cfg)

    def val_fn(state):
        params = {"unet": state.unet_params, "vae": state.vae_params}
        scores = {}
        for name, loader in val_loaders.items():
            s = evaluate_geodesic(task, params, loader, tag=name, max_batches=8)
            scores.update({f"{name}/{k}": v for k, v in s.items()})
        return scores

    trainer = Trainer(cfg, task, train_loaders, val_fn=val_fn)
    state = trainer.init_state()
    params = {"unet": state.unet_params, "vae": state.vae_params}
    params = _maybe_warm_start(task, params, cfg)
    state = state._replace(unet_params=params["unet"], vae_params=params["vae"])
    state = trainer.fit(state, max_steps=args.max_steps)

    # end-of-run params-only exports: what serving/eval tooling loads
    # (restore_params) without rebuilding the optimizer tree — the
    # orbax analogue of the probes' --params-out.  With EMA on, the EMA
    # stream exports alongside (diffusion-eval convention).
    import jax

    from nope_tpu.training.checkpoint import fetch_sequential, save_params

    final_dir = os.path.join(cfg.save_dir, "checkpoints", "final_params")
    save_params(
        final_dir,
        fetch_sequential({"unet": state.unet_params, "vae": state.vae_params}),
        overwrite=True,
    )
    logging.info("final params -> %s", final_dir)
    if trainer.ema_params is not None:
        ema_dir = os.path.join(cfg.save_dir, "checkpoints", "final_params_ema")
        save_params(
            ema_dir,
            fetch_sequential(
                {"unet": trainer.ema_params, "vae": state.vae_params}
            ),
            overwrite=True,
        )
        logging.info("final EMA params -> %s", ema_dir)
    logging.info("training done")


if __name__ == "__main__":
    main()
