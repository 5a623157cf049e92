"""BOP / T-LESS VSD evaluation CLI.

The reference runs this protocol inside Lightning ``test_step``
(``model.py:550-576``) with a broken data contract (SURVEY appendix
item 5).  Here: device side (template bank + retrieval, template-
sharded when a mesh is available) → per-frame VSD records → host
pyrender pool → BOP'19 recall@0.3 for top-1/3/5.

Usage::

    python -m nope_tpu.cli.test_bop \
        data.datasets.tless.root_dir=/data/tless \
        data.datasets.tless.split=test_primesense \
        model.checkpoint_path=... [--num-workers 8]

Requires trimesh+pyrender (EGL) on the host for depth rendering.
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
    parser.add_argument("--max-batches", type=int, default=None)
    parser.add_argument("--num-workers", type=int, default=0)
    parser.add_argument("--renderer", default="auto",
                        choices=("auto", "pyrender", "numpy"),
                        help="depth backend: pyrender EGL or the numpy rasteriser")
    parser.add_argument("--chunk-size", type=int, default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from nope_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from nope_tpu.configs import load_config
    from nope_tpu.data.builder import build_dataset
    from nope_tpu.data.pipeline import DataLoader
    from nope_tpu.evaluation.vsd import build_vsd_frames, evaluate_vsd_batch
    from nope_tpu.evaluation.vsd_metrics import vsd_scores
    from nope_tpu.models.factory import build_task

    cfg = load_config(args.config, args.overrides)
    os.makedirs(cfg.save_dir, exist_ok=True)
    task = build_task(cfg.model)
    params = task.init(jax.random.key(0), image_size=cfg.model.img_size)
    if cfg.model.checkpoint_path:
        from nope_tpu.training.checkpoint import restore_params

        params = restore_params(cfg.model.checkpoint_path, params)

    ds_cfg = cfg.data.datasets["tless"]
    dataset = build_dataset(ds_cfg)
    cad_paths = {oid: info["cad_path"] for oid, info in dataset.cads.items()}
    loader = DataLoader(
        dataset, batch_size=cfg.machine.batch_size, shuffle=False,
        num_workers=cfg.machine.num_workers, drop_last=False,
    )

    eval_fn = jax.jit(
        lambda p, ref, q, bank_R: task.retrieval(
            p, q, task.generate_template_bank(p, ref, bank_R,
                                              chunk_size=args.chunk_size)
        )
    )

    all_errors = []
    for i, batch in enumerate(loader):
        if args.max_batches is not None and i >= args.max_batches:
            break
        sim, nearest = eval_fn(
            params, batch["reference"], batch["query"], batch["all_relativeR"]
        )
        frames = build_vsd_frames(
            batch,
            np.asarray(nearest),
            np.asarray(batch["template_poses"][0]),
            cad_paths,
        )
        errors = evaluate_vsd_batch(frames, num_workers=args.num_workers,
                                    renderer_backend=args.renderer)
        all_errors.append(errors)
        logging.info("batch %d: mean top-1 vsd=%.3f", i, float(errors[:, 0].mean()))

    errors = np.concatenate(all_errors, axis=0)
    scores = vsd_scores(errors)
    out_path = os.path.join(cfg.save_dir, "vsd_scores.json")
    with open(out_path, "w") as f:
        json.dump(scores, f, indent=2)
    print(json.dumps(scores, indent=2))


if __name__ == "__main__":
    main()
