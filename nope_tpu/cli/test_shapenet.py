"""ShapeNet unseen-category inference CLI.

The evaluation entry point the reference documents but never ships
(``README.md:82`` names ``test_shapeNet.py``; SURVEY appendix item 1).
Runs the full single-image pose-estimation pipeline per unseen category:
template-bank generation → retrieval → symmetry-aware geodesic scores.

Usage::

    python -m nope_tpu.cli.test_shapenet \
        data.datasets.shapeNet.root_dir=/data/shapenet \
        model.checkpoint_path=/path/to/orbax_or_torch_ckpt \
        [categories=bottle,mug] [fast=true]

Outputs per-category and mean Acc@15/Acc@30 (top-1/3/5) + medians as one
JSON document (stdout + ``<save_dir>/scores.json``).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", default=None)
    parser.add_argument("--categories", default=None, help="comma-separated")
    parser.add_argument("--max-batches", type=int, default=None)
    parser.add_argument("--chunk-size", type=int, default=None)
    parser.add_argument("--mesh-data", type=int, default=None,
                        help="shard eval over a (data, template) mesh")
    parser.add_argument("--mesh-template", type=int, default=1)
    parser.add_argument("--refine-steps", type=int, default=0,
                        help="continuous pose-refinement steps from the "
                             "retrieved top-1 (0 = grid-snapped, the "
                             "reference protocol); adds 'refined, *' scores")
    parser.add_argument("--refine-lr", type=float, default=2e-2)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from nope_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from nope_tpu.configs import load_config
    from nope_tpu.data.categories import TEST_CATEGORIES
    from nope_tpu.data.builder import build_dataset
    from nope_tpu.data.pipeline import DataLoader
    from nope_tpu.evaluation.geodesic import evaluate_geodesic_full
    from nope_tpu.models.factory import build_task

    cfg = load_config(args.config, args.overrides)
    cfg.name_exp = cfg.name_exp or "test_shapeNet"
    os.makedirs(cfg.save_dir, exist_ok=True)

    task = build_task(cfg.model)
    params = task.init(jax.random.key(0), image_size=cfg.model.img_size)

    ckpt = cfg.model.checkpoint_path
    if ckpt:
        if os.path.isdir(ckpt):
            from nope_tpu.training.checkpoint import restore_params

            params = restore_params(ckpt, params)
        else:
            from nope_tpu.training import port

            sd = port.load_torch_state_dict(ckpt, checkpoint_key="state_dict")
            unet_sd = {
                k[len("u_net."):]: v for k, v in sd.items() if k.startswith("u_net.")
            }
            params["unet"] = jax.tree.map(
                np.asarray,
                port.port_pose_unet(
                    unet_sd or sd,
                    dim_mults=cfg.model.u_net.dim_mults,
                    pose_mlp_name=cfg.model.u_net.pose_mlp_name,
                ),
            )
            vae_sd = {
                k[len("u_net.encoder.encoder."):]: v
                for k, v in sd.items()
                if k.startswith("u_net.encoder.encoder.")
            }
            if vae_sd:
                params["vae"] = jax.tree.map(np.asarray, port.port_sd_vae(vae_sd))
        logging.info("loaded checkpoint %s", ckpt)

    categories = (
        args.categories.split(",") if args.categories else TEST_CATEGORIES
    )
    base = cfg.data.datasets["shapeNet"]

    def loader_factory(category):
        import dataclasses

        ds_cfg = dataclasses.replace(base, split=category)
        return DataLoader(
            build_dataset(ds_cfg),
            batch_size=cfg.machine.batch_size,
            shuffle=False,
            drop_last=False,  # the protocol scores every query image
            num_workers=cfg.machine.num_workers,
        )

    mesh = None
    if args.mesh_data or args.mesh_template > 1:
        from nope_tpu.parallel.mesh import create_mesh

        mesh = create_mesh(data=args.mesh_data, template=args.mesh_template)
        logging.info("eval mesh: %s", dict(mesh.shape))

    results = evaluate_geodesic_full(
        task,
        params,
        loader_factory,
        categories,
        chunk_size=args.chunk_size,
        max_batches=args.max_batches,
        save_dir=os.path.join(cfg.save_dir, "predictions"),
        mesh=mesh,
        refine_steps=args.refine_steps,
        refine_lr=args.refine_lr,
    )
    out_path = os.path.join(cfg.save_dir, "scores.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))
    logging.info("scores written to %s", out_path)


if __name__ == "__main__":
    main()
