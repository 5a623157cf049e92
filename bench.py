"""Headline benchmark: query+scoring throughput, images/sec/chip.

Measures the full per-query-image inference cost of the NOPE pipeline on
the flagship model (192-dim pose-conditioned U-Net, SD-VAE f8 latents,
26-template fast-eval grid — BASELINE.md "fast vs full eval"):

    per image = VAE encode(reference) + N U-Net forwards (template bank)
              + VAE encode(query) + (B, N) similarity + top-k

Two execution models of the SAME work run on the SAME chip:

- ``baseline``  — the reference's execution shape (SURVEY §3.2): a
  sequential Python loop over templates, re-encoding the reference
  image every iteration, unbatched fp32 similarity at the end.
- ``optimized`` — this framework's path: one batched jitted program
  (encode once, template axis folded into the batch, fused retrieval).

``vs_baseline`` is the throughput ratio optimized/baseline, i.e. the
measured speedup toward the BASELINE.json >=10x north star.

The baseline denominator is FROZEN (``FROZEN_BASELINE``): the sequential
loop's ~56 host dispatches make its live timing hostage to tunnel
weather (round 1/2 driver runs swung 15.5x-25.6x across identical
code), while the optimized numerator is stable to <0.5%.  Pass
``--remeasure-baseline`` to time the reference shape live instead.

Prints exactly one JSON line.  ``--tiny`` shrinks the model for smoke
runs on CPU; real numbers come from the driver's TPU run.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np

# Median of 5 dedicated runs on the target v5e chip (2026-08-17, warm
# compile cache, 3 fenced iterations each; runs: 5.3785 / 5.2329 /
# 5.0912 / 5.1925 / 5.6645 img/s).  Config: full flagship model
# (192-dim U-Net + SD-VAE at 256^2), N=26 fast-eval grid, fp32, per-image
# sequential template loop with per-iteration reference re-encode — the
# reference's model.py:193-252 execution shape.
FROZEN_BASELINE = {
    "images_per_sec": 5.2329,
    "measured": "2026-08-17",
    "runs": [5.3785, 5.2329, 5.0912, 5.1925, 5.6645],
}

# ``--full``: the FULL 341-template protocol (level-2 upper grid — the
# shape the paper evaluates, shapeNet.py:252-263 + model.py:268-376).
# Baseline = the same sequential reference execution shape at N=341
# (341 per-template dispatches per image, re-encoding the reference
# every iteration).  Same freeze protocol as FROZEN_BASELINE: median of
# 5 dedicated v5e runs, each the median of 3 fenced iterations.
# Median of 5 dedicated v5e runs (2026-08-18, warm compile cache, 3
# fenced iterations each).  Run 5's 0.4188 is the tunnel-weather
# outlier the freeze protocol exists to absorb (runs 1-4 sit within
# 2.4% of each other).  Optimized-side medians across the same 5 runs:
# 10.3942 img/s -> headline ratio 17.1x on the full 341 protocol.
FROZEN_BASELINE_FULL = {
    "images_per_sec": 0.6083,
    "measured": "2026-08-18",
    "runs": [0.6102, 0.6083, 0.6115, 0.5973, 0.4188],
}


def build(tiny: bool, full: bool = False):
    import jax
    import jax.numpy as jnp
    from nope_tpu.models.unet import PoseUNet
    from nope_tpu.models.vae import StableDiffusionVAE
    from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
    from nope_tpu.geometry import so3_grid, rotations, transforms

    if tiny:
        img, unet_dim, mults, groups = 32, 8, (1, 2), 4
        vae_kw = dict(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                      latent_channels=4, groups=4)
        n_templates = 12 if full else 8
        batch = 2
        fp32_batch = 2
        baseline_batch = 2
    else:
        img, unet_dim, mults, groups = 256, 192, (1, 2, 4, 8), 8
        vae_kw = dict()  # full SD VAE
        if full:
            # full protocol: 341 upper level-2 templates, streaming
            # (the materialized (64, 341) bank cannot compile on 16G)
            n_templates = 341
            batch = 64
            baseline_batch = 1  # 341 dispatches/image: keep the loop short
        else:
            n_templates = 26  # fast-eval grid (idx_upper_level0_in_level2)
            batch = 128  # measured best bf16 throughput point on v5e
            baseline_batch = 2  # per-image sequential: batch-invariant
        # the fp32 anchor runs at batch 64: the fp32 batch-128 program
        # alone needs 16.4G and does not COMPILE on a 16G v5e (bf16
        # fits); both modes report img/s so the numbers stay comparable
        fp32_batch = 64

    unet = PoseUNet(u_net_dim=unet_dim, channels=4, dim_mults=mults,
                    resnet_block_groups=groups)
    vae = StableDiffusionVAE(**vae_kw)
    task = PoseConditionalTask(unet, vae, TaskConfig())
    params = task.init(jax.random.key(0), image_size=img)

    rng = np.random.default_rng(0)
    reference = jnp.asarray(rng.uniform(-1, 1, (batch, img, img, 3)).astype(np.float32))
    query = jnp.asarray(rng.uniform(-1, 1, (batch, img, img, 3)).astype(np.float32))

    # real grid ΔRs: full = the 341-pose upper level-2 grid; fast = level 0
    if full and not tiny:
        grid = so3_grid.get_obj_poses_from_template_level(2, "upper")[:, :3, :3]
        grid = grid.astype(np.float32)
    else:
        grid = so3_grid.load_obj_poses(0)[:, :3, :3].astype(np.float32)
        grid = np.concatenate([grid] * (-(-n_templates // len(grid))))  # tile for tiny-full
    sel = grid[:n_templates]
    rel = transforms.relative_rotation_jax(
        jnp.asarray(sel)[None].repeat(batch, 0),
        jnp.broadcast_to(jnp.asarray(grid[0]), (batch, n_templates, 3, 3)),
    )
    bank_R = rotations.matrix_to_rotation_6d(rel)
    return task, params, reference, query, bank_R, fp32_batch, baseline_batch


def time_fn(fn, *args, iters=3, warmup=1):
    """Median-of-iters timing fenced by a device→host fetch of the
    outputs: block_until_ready alone does not reliably fence on
    tunnelled/remote backends (axon), so every iteration materialises
    its (small) result on the host.  The median (not mean) absorbs the
    tunnel's occasional multi-hundred-ms dispatch outliers that made
    round-1's vs_baseline swing 13-28x."""
    import jax

    def sync(out):
        return jax.tree.map(np.asarray, out)

    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--full", action="store_true",
                    help="FULL 341-template protocol (streaming bf16) "
                         "against the sequential-341 reference shape")
    ap.add_argument("--fp32-only", action="store_true",
                    help="skip the bf16 headline (fp32 parity anchor only)")
    ap.add_argument("--remeasure-baseline", action="store_true",
                    help="time the reference execution shape live instead "
                         "of using the frozen committed median")
    args = ap.parse_args()
    if args.full and args.fp32_only:
        ap.error("--full is bf16 streaming only (the materialized fp32 "
                 "341-bank cannot compile on a 16G v5e)")

    if args.tiny:
        # CPU smoke mode must not grab the tunnelled TPU (the
        # JAX_PLATFORMS env var is ignored on this host — the axon
        # sitecustomize pins the tunnel; the config update is reliable)
        import jax

        jax.config.update("jax_platforms", "cpu")

    from nope_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    from nope_tpu.ops.similarity import retrieve
    from nope_tpu.tasks.pose_conditional import cast_half

    task, params, reference, query, bank_R, fp32_batch, baseline_batch = build(
        args.tiny, args.full)
    batch, n_templates = bank_R.shape[0], bank_R.shape[1]

    # ---- optimized: one jitted program ---------------------------------
    # bf16 inference is the headline (accuracy guardrail:
    # tests/test_learning.py pins Acc@15/top-1 agreement vs fp32); the
    # fp32 number is the reference-checkpoint parity anchor
    def make_optimized(bf16: bool):
        @jax.jit
        def optimized(params, reference, query, bank_R):
            if bf16:
                reference, query, bank_R = (
                    x.astype(jnp.bfloat16) for x in (reference, query, bank_R)
                )
            bank = task.generate_template_bank(params, reference, bank_R)
            sim, idx = task.retrieval(params, query, bank)
            return sim, idx

        return optimized

    if args.full:
        # streaming: the bank never materialises (docs/PERFORMANCE.md
        # "Full-grid eval streams"); chunk 31 divides 341 evenly
        chunk = 4 if args.tiny else 31

        @jax.jit
        def optimized_full(params, reference, query, bank_R):
            reference, query, bank_R = (
                x.astype(jnp.bfloat16) for x in (reference, query, bank_R)
            )
            return task.retrieve_streaming(
                params, query, reference, bank_R, chunk_size=chunk)

        t_opt = time_fn(optimized_full, cast_half(params), reference, query,
                        bank_R, iters=args.iters)
        opt_batch, t_fp32 = batch, None
    else:
        t_fp32 = time_fn(
            make_optimized(False), params, reference[:fp32_batch],
            query[:fp32_batch], bank_R[:fp32_batch], iters=args.iters,
        )
        if args.fp32_only:
            t_opt, opt_batch = t_fp32, fp32_batch
        else:
            t_opt = time_fn(make_optimized(True), cast_half(params), reference,
                            query, bank_R, iters=args.iters)
            opt_batch = batch

    # ---- baseline: reference execution shape ----------------------------
    # one template at a time, re-encoding the reference every iteration
    # (model.py:193-252 + sample() at model.py:113-121), per-image loop
    @jax.jit
    def ref_one_template(params, reference_1, relativeR_1):
        ref_latent = task.encode(params, reference_1, "mode")  # re-encoded!
        return task.predict_latent(params, ref_latent, relativeR_1)

    @jax.jit
    def ref_score(params, query_1, bank_1):
        q = task.encode(params, query_1, "mode")
        return retrieve(q, bank_1, k=5, metric="l2")

    def baseline(params, reference, query, bank_R):
        # per-image sequential (the reference's loop shape): throughput
        # is batch-invariant, so measure a small batch
        outs = []
        for b in range(baseline_batch):
            preds = [
                ref_one_template(params, reference[b : b + 1], bank_R[b : b + 1, i])
                for i in range(n_templates)
            ]
            bank_1 = jnp.stack(preds, axis=1)
            outs.append(ref_score(params, query[b : b + 1], bank_1))
        return outs

    imgs_per_sec = opt_batch / t_opt
    frozen = FROZEN_BASELINE_FULL if args.full else FROZEN_BASELINE
    if args.tiny or args.remeasure_baseline or frozen["images_per_sec"] is None:
        # live baseline: median over >=3 iterations (single-iteration
        # baselines showed 13-28x run-to-run variance from tunnel
        # dispatch noise); always live in --tiny CPU smoke mode where
        # the frozen TPU constant is meaningless, and in --full mode
        # until its denominator is frozen
        t_base = time_fn(baseline, params, reference, query, bank_R,
                         iters=max(3, args.iters // 2))
        base_imgs_per_sec = baseline_batch / t_base
        baseline_provenance = "live"
    else:
        base_imgs_per_sec = frozen["images_per_sec"]
        baseline_provenance = f"frozen {frozen['measured']}"
    mode = "bf16 streaming" if args.full else (
        "fp32" if args.fp32_only else "bf16")
    result = {
        "metric": "query+scoring images/sec/chip "
                  f"({mode}, N={n_templates} templates, batch={opt_batch})",
        "value": round(imgs_per_sec, 4),
        "unit": "images/sec",
        "vs_baseline": round(imgs_per_sec / base_imgs_per_sec, 3),
        "fp32_images_per_sec": (
            None if t_fp32 is None else round(fp32_batch / t_fp32, 4)),
        "baseline_images_per_sec": round(base_imgs_per_sec, 4),
        "baseline_provenance": baseline_provenance,
        "backend": jax.default_backend(),
    }

    if not args.full and not args.fp32_only and not args.tiny:
        # The default (driver-captured) run also measures the FULL
        # 341-template streaming protocol — the shape the paper
        # evaluates — so every round's BENCH json pins BOTH headline
        # ratios against their frozen denominators without a hand-run
        # of --full (round-4 verdict: the 17.1x ratio lived only in
        # docs).  Skipped in --tiny (CPU smoke keeps its compile budget)
        # where --full --tiny covers the streaming path separately.
        (task_f, params_f, reference_f, query_f, bank_R_f, _,
         _) = build(False, True)
        # chunk 31 divides 341 evenly; the fallback only fires under
        # test monkeypatching where build is forced tiny (N=12 -> 4)
        n_full = int(bank_R_f.shape[1])
        chunk_f = 31 if n_full % 31 == 0 else max(1, n_full // 3)

        @jax.jit
        def optimized_full_d(params, reference, query, bank_R):
            reference, query, bank_R = (
                x.astype(jnp.bfloat16) for x in (reference, query, bank_R)
            )
            return task_f.retrieve_streaming(
                params, query, reference, bank_R, chunk_size=chunk_f)

        t_full = time_fn(optimized_full_d, cast_half(params_f), reference_f,
                         query_f, bank_R_f, iters=args.iters)
        full_ips = bank_R_f.shape[0] / t_full
        result["full_protocol"] = {
            "images_per_sec": round(full_ips, 4),
            "vs_baseline": round(
                full_ips / FROZEN_BASELINE_FULL["images_per_sec"], 3),
            "n_templates": int(bank_R_f.shape[1]),
            "batch": int(bank_R_f.shape[0]),
            "baseline_images_per_sec": FROZEN_BASELINE_FULL["images_per_sec"],
            "baseline_provenance":
                f"frozen {FROZEN_BASELINE_FULL['measured']}",
        }

    print(json.dumps(result))


if __name__ == "__main__":
    main()
