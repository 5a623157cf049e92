"""Geodesic evaluation harness (the ShapeNet unseen-category protocol).

Host-side orchestration around the jitted
``PoseConditionalTask.eval_geodesic_step`` device program: iterate a
test loader, aggregate symmetry-aware accuracy@threshold / medians, and
optionally dump per-batch predictions (similarity heatmaps + poses) as
``.npz`` like the reference (``model.py:361-376``).

This is the evaluation the reference promises in ``test_shapeNet.py``
but never ships (SURVEY appendix item 1).
"""

from __future__ import annotations

import logging
import os
import time
from typing import Any, Dict, Iterable, Optional

import numpy as np
import jax


def _merge_across_processes(
    errors: np.ndarray, loss_sum: float, loss_count: int, k: int
):
    """All-gather per-process eval results so every process computes the
    same global scores (the reference logs with ``sync_dist=True``,
    ``model.py:184-191``).  Per-process image counts may differ
    (disjoint loader shards), so rows are zero-padded to the global max
    before the gather and sliced back by each process's gathered row
    count — padding never masquerades as data (a legitimately-NaN error
    row survives the merge).  ``k`` must be the configured retrieval_k
    on every process (a rank with zero rows still has to gather the
    same shape)."""
    from jax.experimental import multihost_utils

    from nope_tpu.parallel.mesh import process_barrier

    # re-align ranks before the FIRST Gloo collective: compile-time skew
    # between processes (warm vs cold persistent cache) easily exceeds
    # Gloo's ~30 s context-rendezvous timeout
    process_barrier("eval_merge")
    counts = np.asarray(
        multihost_utils.process_allgather(np.asarray([errors.shape[0]]))
    ).reshape(-1)
    max_n = int(counts.max())
    padded = np.zeros((max_n, k), dtype=np.float32)
    padded[: errors.shape[0]] = errors
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    gathered = gathered.reshape(len(counts), max_n, k)
    merged_errors = np.concatenate(
        [gathered[p, : counts[p]] for p in range(len(counts))], axis=0
    )
    loss_stats = np.asarray(
        multihost_utils.process_allgather(
            np.asarray([loss_sum, float(loss_count)], dtype=np.float64)
        )
    ).reshape(-1, 2)
    return merged_errors, float(loss_stats[:, 0].sum()), int(loss_stats[:, 1].sum())


def evaluate_geodesic(
    task,
    params,
    loader: Iterable[Dict[str, np.ndarray]],
    chunk_size: Optional[int] = None,
    save_dir: Optional[str] = None,
    tag: str = "eval",
    max_batches: Optional[int] = None,
    mesh=None,
    sync_processes: bool = True,
    refine_steps: int = 0,
    refine_lr: float = 2e-2,
) -> Dict[str, float]:
    """Run the geodesic eval over a loader; returns aggregated scores
    (mean over batches of accuracy, median over all errors, mean loss).

    ``refine_steps > 0`` also refines every retrieved top-1 pose
    continuously (tasks/refinement.py) inside the same device program
    and adds ``refined, median`` / ``refined, accuracy_15/30`` scores —
    the off-grid capability the reference's grid-snapped retrieval
    cannot offer.

    With ``mesh`` (a (data, template) Mesh) the batch is sharded over
    the data axis and the template bank over the template axis, so the
    N-template U-Net sweep spreads across chips.

    Under multi-process runs each process scores its own loader shard;
    prediction/media files are rank-suffixed (``model.py:146,365``) and
    with ``sync_processes`` the final scores are the all-gathered global
    ones, identical on every process."""
    step_fn = jax.jit(
        task.eval_geodesic_step,
        static_argnames=("chunk_size", "refine_steps", "refine_lr"),
    )
    # rank-suffix all written artifacts so multi-host runs never collide
    # on shared storage (reference model.py:146,365)
    rank = jax.process_index()

    if mesh is not None:
        from nope_tpu.parallel.mesh import replicate, shard_eval_batch

        # restored checkpoints arrive committed to a single device; the
        # jit refuses mixed placements, so replicate explicitly
        params = jax.device_put(params, replicate(mesh))

    def place(batch):
        if mesh is None:
            return batch
        from nope_tpu.parallel.mesh import shard_eval_batch

        return shard_eval_batch(batch, mesh)

    all_errors = []
    all_refined = []
    losses = []
    steady_batch = None
    t0 = time.perf_counter()
    for i, batch in enumerate(loader):
        if max_batches is not None and i >= max_batches:
            break
        device_batch = {
            k: v
            for k, v in batch.items()
            # numeric arrays the eval step consumes; gt_templates is a
            # host-side visualization bank the device never reads
            if isinstance(v, np.ndarray) and v.dtype.kind in "fiub"
            and k != "gt_templates"
        }
        # every query counts (drop_last=False loaders): pad ragged tail
        # batches back to the steady batch size (avoids a retrace and
        # keeps mesh divisibility), then trim the outputs
        valid = len(device_batch["query"])
        if steady_batch is None:
            steady_batch = valid
        if valid < steady_batch:
            pad = steady_batch - valid

            def _pad(v):
                if np.ndim(v) >= 1 and len(v) == valid:
                    reps = np.repeat(v[-1:], pad, axis=0)
                    return np.concatenate([v, reps], axis=0)
                return v

            device_batch = {k: _pad(v) for k, v in device_batch.items()}
        out = step_fn(
            params,
            place(device_batch),
            chunk_size=chunk_size,
            refine_steps=refine_steps,
            refine_lr=refine_lr,
        )
        all_errors.append(np.asarray(out["errors_topk"])[:valid])
        if refine_steps:
            all_refined.append(np.asarray(out["refined_error_deg"])[:valid])
        if valid == steady_batch:  # padded-batch losses would be skewed
            losses.append(float(out["loss"]))

        if save_dir is not None:
            os.makedirs(save_dir, exist_ok=True)
            dump = dict(
                similarity=np.asarray(out["similarity"])[:valid],
                nearest_idx=np.asarray(out["nearest_idx"])[:valid],
                error_deg=np.asarray(out["error_deg"])[:valid],
                query_pose=np.asarray(batch["query_pose"]),
            )
            if refine_steps:
                dump["refined_R"] = np.asarray(out["refined_R"])[:valid]
                dump["refined_error_deg"] = np.asarray(
                    out["refined_error_deg"]
                )[:valid]
            np.savez(
                os.path.join(save_dir, f"pred_{tag}_batch{i}_rank{rank}.npz"),
                **dump,
            )
            # retrieval panel (reference model.py:325-351) for the first
            # batch, when the dataset was built with load_gt_templates
            if i == 0 and "gt_templates" in batch:
                try:
                    from nope_tpu.utils.visualization import (
                        save_image_grid,
                        unnormalize,
                    )

                    top1 = np.asarray(out["nearest_idx"])[:valid, 0]
                    retrieved = batch["gt_templates"][
                        np.arange(len(top1)), top1
                    ]
                    save_image_grid(
                        [
                            unnormalize(batch["reference"][:8]),
                            unnormalize(batch["query"][:8]),
                            unnormalize(retrieved[:8]),
                        ],
                        os.path.join(save_dir, f"retrieved_{tag}_rank{rank}.png"),
                    )
                    # text-labelled variant (visualization_utils.py:60-78),
                    # matplotlib-gated like the reference
                    try:
                        from nope_tpu.utils.visualization import draw_grid_text

                        n_show = min(4, valid)
                        top1_sim = np.take_along_axis(
                            np.asarray(out["similarity"])[:n_show],
                            top1[:n_show, None],
                            axis=1,
                        )
                        panel = np.stack(
                            [
                                unnormalize(batch["query"][:n_show]),
                                unnormalize(batch["reference"][:n_show]),
                                np.zeros_like(unnormalize(retrieved[:n_show])),
                                unnormalize(retrieved[:n_show]),
                            ],
                            axis=1,
                        )
                        draw_grid_text(
                            panel,
                            top1_sim,
                            os.path.join(
                                save_dir, f"retrieved_text_{tag}_rank{rank}.png"
                            ),
                        )
                    except ImportError:
                        pass
                except Exception as e:
                    logging.warning("retrieval panel failed: %s", e)
        # symmetry-aware top-k accuracies are recomputed globally below;
        # keep per-batch logging light
        if i % 10 == 0:
            logging.info("eval %s batch %d: loss=%.4f", tag, i, losses[-1])

    k = int(getattr(task.config, "retrieval_k", 5))
    errors = (
        np.concatenate(all_errors, axis=0) if all_errors else np.zeros((0, k))
    )  # (num_images, k)
    if refine_steps:
        refined = (
            np.concatenate(all_refined, axis=0)
            if all_refined
            else np.zeros((0,))
        )
        # ride the top-k gather as an extra column so the cross-process
        # merge stays one collective
        errors = np.concatenate([errors, refined[:, None]], axis=1)
    elapsed = time.perf_counter() - t0
    loss_sum, loss_count = float(np.sum(losses)), len(losses)
    merged = sync_processes and jax.process_count() > 1
    if merged:
        errors, loss_sum, loss_count = _merge_across_processes(
            errors.astype(np.float32), loss_sum, loss_count, errors.shape[1]
        )
    if refine_steps:
        errors, refined = errors[:, :k], errors[:, k]
    scores: Dict[str, float] = {
        "loss": loss_sum / loss_count if loss_count else float("nan"),
        # after a merge both counters are GLOBAL (all processes ran
        # concurrently, so global images over local wall time is the
        # aggregate rate), keeping num_images / images_per_sec coherent
        "images_per_sec": len(errors) / elapsed if elapsed > 0 else 0.0,
        "num_images": float(len(errors)),  # global after a merge
    }
    if len(errors):
        for k in (1, 3, 5):
            if k > errors.shape[1]:
                continue
            best = np.min(errors[:, :k], axis=1)
            for threshold in (15.0, 30.0):
                scores[f"top{k}, accuracy_{int(threshold)}"] = float(
                    np.mean(best <= threshold) * 100
                )
            scores[f"top{k}, median"] = float(np.sort(best)[(len(best) - 1) // 2])
        if refine_steps:
            for threshold in (15.0, 30.0):
                scores[f"refined, accuracy_{int(threshold)}"] = float(
                    np.mean(refined <= threshold) * 100
                )
            scores["refined, median"] = float(
                np.sort(refined)[(len(refined) - 1) // 2]
            )
    return scores


def evaluate_geodesic_full(
    task,
    params,
    loader_factory,
    categories,
    **kwargs,
) -> Dict[str, Dict[str, float]]:
    """Multi-category sweep (BASELINE config #4): one loader per unseen
    category, per-category + mean scores."""
    results: Dict[str, Any] = {}
    for cat in categories:
        loader = loader_factory(cat)
        results[cat] = evaluate_geodesic(task, params, loader, tag=cat, **kwargs)
        logging.info("category %s: %s", cat, results[cat])
    keys = [k for k in next(iter(results.values())) if k.startswith("top")]
    results["mean"] = {
        k: float(np.mean([results[c][k] for c in categories])) for k in keys
    }
    return results
