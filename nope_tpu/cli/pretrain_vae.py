"""First-stage (VAE) pretraining CLI.

The reference's documented setup downloads a pretrained SD first-stage
checkpoint (``AutoencoderKL.py:16-19``); for domains where none exists
this CLI trains one on the experiment's own datasets and writes an
orbax params dir that ``cli.train`` / ``cli.test_shapenet`` consume via
``model.encoder.pretrained_path``::

    python -m nope_tpu.cli.pretrain_vae --steps 20000 --out ckpts/vae \
        data.datasets.shapeNet.root_dir=/data/nope/shapeNet

Batches come from the same train loaders as ``cli.train``; each step
trains on the query+reference images of one combined batch.
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

import numpy as np


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--steps", type=int, default=20000)
    parser.add_argument("--out", required=True, help="orbax output dir")
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--recon-loss", default="l1", choices=("l1", "l2"))
    parser.add_argument("--kl-weight", type=float, default=1e-6)
    parser.add_argument("--half-precision", action="store_true")
    parser.add_argument("--log-every", type=int, default=100)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from nope_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import optax

    from nope_tpu.configs import load_config
    from nope_tpu.data.builder import build_train_loaders
    from nope_tpu.data.pipeline import CombinedLoader
    from nope_tpu.models.factory import build_encoder
    from nope_tpu.training.checkpoint import save_params
    from nope_tpu.training.pretrain_vae import (
        create_vae_pretrain_state,
        make_vae_pretrain_step,
    )

    cfg = load_config(args.config, args.overrides)
    if cfg.model.encoder.kind != "vae":
        parser.error(
            f"pretrain_vae requires model.encoder.kind=vae "
            f"(got {cfg.model.encoder.kind!r})"
        )
    vae = build_encoder(cfg.model.encoder)
    loaders = build_train_loaders(cfg)
    combined = CombinedLoader(loaders)

    tx = optax.adamw(args.lr)
    state = create_vae_pretrain_state(
        vae, tx, jax.random.key(cfg.trainer.seed), image_size=cfg.model.img_size
    )
    step_fn = make_vae_pretrain_step(
        vae,
        tx,
        recon_loss=args.recon_loss,
        kl_weight=args.kl_weight,
        half_precision=args.half_precision,
    )

    t0 = time.perf_counter()
    step = 0
    while step < args.steps:
        for batches in combined:
            if step >= args.steps:
                break
            images = jnp.concatenate(
                [
                    jnp.asarray(b[k])
                    for b in batches.values()
                    for k in ("query", "reference")
                ]
            )
            state, metrics = step_fn(state, images)
            step += 1
            if step % args.log_every == 0 or step == args.steps:
                m = jax.tree.map(np.asarray, metrics)
                logging.info(
                    "step %d/%d recon=%.4f kl=%.1f (%.2f s/step)",
                    step, args.steps, float(m["recon"]), float(m["kl"]),
                    (time.perf_counter() - t0) / step,
                )

    save_params(args.out, jax.tree.map(np.asarray, state.params))
    logging.info("VAE params written to %s", args.out)


if __name__ == "__main__":
    main()
