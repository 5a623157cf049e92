"""First-stage (VAE) pretraining CLI.

The reference's documented setup downloads a pretrained SD first-stage
checkpoint (``AutoencoderKL.py:16-19``); for domains where none exists
this CLI trains one on the experiment's own datasets and writes an
orbax params dir that ``cli.train`` / ``cli.test_shapenet`` consume via
``model.encoder.pretrained_path``::

    python -m nope_tpu.cli.pretrain_vae --steps 20000 --out ckpts/vae \
        data.datasets.shapeNet.root_dir=/data/nope/shapeNet

Batches come from the same train loaders as ``cli.train``; each step
trains on the query+reference images of one dataset's batch (datasets
round-robin, so mixed image sizes across datasets are fine).  Batches
are sharded over the machine's data mesh axis (gradients all-reduce
exactly like the trainer's data-parallel step) and host→device
transfer is double-buffered.  The destination is validated before any
training happens; ``--save-every`` re-saves the params periodically so
a crash late in a long run cannot lose everything.
"""

from __future__ import annotations

import argparse
import logging
import os
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
    parser.add_argument("--save-every", type=int, default=1000,
                        help="periodic params re-save interval (0 = only at the end)")
    parser.add_argument("--overwrite", action="store_true",
                        help="replace an existing checkpoint at --out")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    out = os.path.abspath(args.out)
    if os.path.exists(out) and not args.overwrite:
        # fail BEFORE training: orbax refuses existing destinations, and
        # discovering that after a 20k-step run would lose all the work
        parser.error(f"--out {out} already exists (pass --overwrite to replace)")

    logging.basicConfig(level=logging.INFO)
    from nope_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import optax

    from nope_tpu.configs import load_config
    from nope_tpu.data.builder import build_train_loaders
    from nope_tpu.data.pipeline import CombinedLoader, device_prefetch
    from nope_tpu.models.factory import build_encoder
    from nope_tpu.parallel.mesh import (
        create_mesh,
        data_sharding,
        initialize_distributed,
        replicate,
    )
    from nope_tpu.training.checkpoint import save_params
    from nope_tpu.training.pretrain_vae import (
        create_vae_pretrain_state,
        make_vae_pretrain_step,
    )

    initialize_distributed()
    cfg = load_config(args.config, args.overrides)
    if cfg.model.encoder.kind != "vae":
        parser.error(
            f"pretrain_vae requires model.encoder.kind=vae "
            f"(got {cfg.model.encoder.kind!r})"
        )
    vae = build_encoder(cfg.model.encoder)
    loaders = build_train_loaders(cfg)
    combined = CombinedLoader(loaders)
    mesh = create_mesh(
        data=cfg.machine.mesh_data, template=cfg.machine.mesh_template
    )

    tx = optax.adamw(args.lr)
    state = create_vae_pretrain_state(
        vae, tx, jax.random.key(cfg.trainer.seed), image_size=cfg.model.img_size
    )
    state = jax.device_put(state, replicate(mesh))
    step_fn = make_vae_pretrain_step(
        vae,
        tx,
        recon_loss=args.recon_loss,
        kl_weight=args.kl_weight,
        half_precision=args.half_precision,
    )

    def image_batches():
        # one step per dataset batch (no cross-dataset concat: datasets
        # may use different image sizes); query+reference both train the
        # codec
        while True:
            for batches in combined:
                for b in batches.values():
                    yield np.concatenate(
                        [np.asarray(b["query"]), np.asarray(b["reference"])]
                    )

    sharded = (
        jax.device_put(x, data_sharding(mesh, x.ndim)) for x in image_batches()
    )

    def save(params):
        save_params(out, jax.tree.map(np.asarray, params), overwrite=True)

    t0 = time.perf_counter()
    step = 0
    for images in device_prefetch(sharded, sharding=None, depth=2):
        if step >= args.steps:
            break
        state, metrics = step_fn(state, images)
        step += 1
        if step == 1:
            # fetch to fence: on the tunnelled backend the first step
            # blocks on a SERVER-side compile (the client persistent
            # cache does not cover it) that can take minutes; surface
            # it so a compile stall is distinguishable from a loader
            # stall in the logs
            np.asarray(metrics["recon"])
            logging.info(
                "first step done in %.1f s (server-side compile included)",
                time.perf_counter() - t0,
            )
        if step % args.log_every == 0 or step == args.steps:
            m = jax.tree.map(np.asarray, metrics)
            logging.info(
                "step %d/%d recon=%.4f kl=%.1f (%.2f s/step)",
                step, args.steps, float(m["recon"]), float(m["kl"]),
                (time.perf_counter() - t0) / step,
            )
        if args.save_every and step % args.save_every == 0 and step < args.steps:
            save(state.params)
            logging.info("periodic params save at step %d -> %s", step, out)

    save(state.params)
    logging.info("VAE params written to %s", out)


if __name__ == "__main__":
    main()
