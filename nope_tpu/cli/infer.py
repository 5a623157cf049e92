"""Single-image inference CLI.

The minimal user journey NOPE promises: one reference image of a novel
object + query images → relative 3D rotation.  Wraps the serving engine
(:mod:`nope_tpu.serving`).

Usage::

    python -m nope_tpu.cli.infer --reference ref.png \
        --queries q1.png q2.png --checkpoint /ckpts/exported \
        [--fast] [--out poses.json] [model.* overrides]

Images are RGB(A) files; RGBA is composited over black like the
training data.  Outputs per-query top-k rotations (3x3 + rotation-6d)
and the (N,) viewpoint-bin similarity distribution.
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys

import numpy as np


def _load_image(path: str, img_size: int) -> np.ndarray:
    from PIL import Image

    from nope_tpu import native

    img = Image.open(path)
    # normalise palette / LA / grayscale modes before array conversion
    if "A" in img.mode or "transparency" in img.info:
        img = img.convert("RGBA")
    else:
        img = img.convert("RGB")
    arr = np.asarray(img)
    if arr.shape[2] == 4:
        arr = native.composite_rgba_black(arr)
    img = Image.fromarray(arr).resize((img_size, img_size), Image.BILINEAR)
    return (np.asarray(img).astype(np.float32) / 255.0) * 2.0 - 1.0


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser()
    parser.add_argument("--reference", required=True)
    parser.add_argument("--queries", nargs="+", required=True)
    parser.add_argument("--checkpoint", default=None, help="orbax params dir")
    parser.add_argument("--config", default=None)
    parser.add_argument("--fast", action="store_true",
                        help="26-template fast grid instead of 341")
    parser.add_argument("--refine-steps", type=int, default=0,
                        help="gradient pose-refinement steps from the "
                             "retrieved top-1 (continuous, off-grid ΔR)")
    parser.add_argument("--out", default=None)
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO)
    from nope_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    import jax

    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from nope_tpu.serving import PoseEstimator

    cfg = load_config(args.config, args.overrides)
    task = build_task(cfg.model)
    params = task.init(jax.random.key(0), image_size=cfg.model.img_size)
    if args.checkpoint:
        from nope_tpu.training.checkpoint import restore_params

        params = restore_params(args.checkpoint, params)
        logging.info("loaded %s", args.checkpoint)
    else:
        logging.warning("no checkpoint given — random weights (smoke mode)")

    est = PoseEstimator(task, params, fast_evaluation=args.fast)
    est.register_object("object", _load_image(args.reference, cfg.model.img_size))
    queries = np.stack(
        [_load_image(p, cfg.model.img_size) for p in args.queries]
    )
    result = est.estimate("object", queries, refine_steps=args.refine_steps)

    report = []
    for i, qpath in enumerate(args.queries):
        rel = result.relative_rotations[i]
        entry = {
            "query": qpath,
            "topk_template_idx": result.nearest_idx[i].tolist(),
            # ΔR taking the reference view to the query view — the
            # quantity NOPE estimates
            "topk_relative_rotations": rel.tolist(),
            "topk_relative_rotation6d": rel[:, :2, :]
            .reshape(len(rel), 6)
            .tolist(),
            # the retrieved grid poses (absolute only if the object
            # truly sat at the registered reference pose)
            "topk_template_rotations": result.rotations[i].tolist(),
            "similarity": result.similarity[i].tolist(),
        }
        if result.refined_relative_rotation is not None:
            # continuous (off-grid) refinement of the top-1 ΔR
            entry["refined_relative_rotation"] = (
                result.refined_relative_rotation[i].tolist()
            )
        report.append(entry)
    payload = {"num_templates": est.num_templates, "results": report}
    out = json.dumps(payload, indent=2)
    if args.out:
        with open(args.out, "w") as f:
            f.write(out)
        logging.info("wrote %s", args.out)
    else:
        print(out)


if __name__ == "__main__":
    main()
