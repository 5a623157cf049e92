"""Hardware tuning sweep for continuous pose refinement (round 4).

The round-3 refinement defaults (steps=60, lr=2e-2) were tuned on a
tiny CPU model; on the flagship 128-object checkpoint they move the
pose AWAY from the truth while still lowering the latent objective
(probe_refinement round-4 first run: 341-top-1 12.9° -> refined 22.4°).
This script tunes (lr, steps, objective) ON HARDWARE by recording the
full geodesic-error-vs-step TRAJECTORY for each config in one program:
a lax.scan variant of the refiner emits the 6d pose iterate at every
step, so one run per lr answers every steps choice at once.

Run:  python scripts/tune_refinement.py --ckpt /tmp/probe128_params.npz
Emits one JSON line per (config, init, group) with the median-error
trajectory sampled every 5 steps.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from nope_tpu.utils.env import enable_compilation_cache

enable_compilation_cache()

import numpy as np
import jax
import jax.numpy as jnp
import optax

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _probe_common import render_crop, load_params_leaves

from nope_tpu.scripts.generate_data import sample_camera_poses
from nope_tpu.geometry import so3_grid
from nope_tpu.geometry.rotations import (
    matrix_to_rotation_6d, rotation_6d_to_matrix,
)
from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig, cast_half
from nope_tpu.tasks.refinement import _per_sample_objective


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


IMG = 256
CKPT = _arg("--ckpt", "/tmp/probe128_params.npz", str)
STEPS = _arg("--steps", 40)
N_QUERY = 6

vae = StableDiffusionVAE()
task = PoseConditionalTask(
    PoseUNet(u_net_dim=192, channels=4, dim_mults=(1, 2, 4, 8), resnet_block_groups=8),
    vae,
    TaskConfig(),
)
_init = task.init(jax.random.key(2), image_size=IMG)
with np.load(CKPT, allow_pickle=False) as z:
    ckpt_step = int(z["probe_step"])
    params_h = jax.tree.unflatten(
        jax.tree.structure(cast_half({"unet": _init["unet"], "vae": _init["vae"]})),
        [jnp.asarray(l) for l in load_params_leaves(z)],
    )
print(f"loaded ckpt at step {ckpt_step}", flush=True)


# eval views: 8 train objects (held-out VIEWS) + 4 held-out objects,
# seeds identical to probe_refinement.py
VIEW_OBJS = list(range(8))
HO_OBJS = list(range(24, 28))
grid341 = so3_grid.get_obj_poses_from_template_level(2, "upper")[:, :3, :3]
grid341 = grid341.astype(np.float32)
_idx26_ids = so3_grid.load_index_level0_in_level2("upper")
_id2pos = so3_grid.load_mapping_id_templates_to_idx_pose_distribution(2, "upper")
idx26 = np.array([_id2pos[int(i)] for i in _idx26_ids])

t0 = time.time()
q_imgs, refs, b341s, gt_rel, group = [], [], [], [], []
for o in VIEW_OBJS + HO_OBJS:
    prng = np.random.default_rng(5000 + o)
    poses_q = sample_camera_poses(prng, N_QUERY, 1.0)
    pose_r = sample_camera_poses(prng, 1, 1.0)[0]
    ref = render_crop(o, pose_r)
    rel = np.einsum("nij,kj->nik", grid341, pose_r[:3, :3])
    b341 = np.asarray(matrix_to_rotation_6d(jnp.asarray(rel)), np.float32)
    for p in poses_q:
        q_imgs.append(render_crop(o, p)); refs.append(ref)
        b341s.append(b341)
        gt_rel.append(p[:3, :3] @ pose_r[:3, :3].T)
        group.append("views" if o in VIEW_OBJS else "objects")
B = len(q_imgs)
gt_rel = np.stack(gt_rel)
group = np.array(group)
print(f"rendered {B} queries ({time.time()-t0:.0f}s)", flush=True)

q = jnp.asarray(np.stack(q_imgs), jnp.bfloat16)
r = jnp.asarray(np.stack(refs), jnp.bfloat16)
b341 = jnp.asarray(np.stack(b341s), jnp.bfloat16)

_stream341 = jax.jit(
    lambda p, q, r, bR: task.retrieve_streaming(p, q, r, bR, chunk_size=31))
_encode = jax.jit(lambda p, x: task.encode(p, x, "mode"))

t0 = time.time()
sim341, i341 = _stream341(params_h, q, r, b341)
sim341, i341 = np.asarray(sim341), np.asarray(i341)
print(f"341 sweep {time.time()-t0:.0f}s", flush=True)
q_lat = _encode(params_h, q)
r_lat = _encode(params_h, r)

b341_np = np.stack(b341s).astype(np.float32)
init6_341 = b341_np[np.arange(B), i341[:, 0]]
# 26-sweep top-1 init: rank the 341 scores restricted to the 26 subset
# (identical result to running the 26-template sweep, zero extra cost;
# scores are similarities — higher is better)
sim26 = sim341[:, idx26]
init6_26 = b341_np[np.arange(B), idx26[np.argmax(sim26, axis=1)]]


def geo_deg(a, b):
    tr = np.einsum("...ij,...kj->...ik", np.asarray(a, np.float64),
                   np.asarray(b, np.float64))
    cos = (np.trace(tr, axis1=-2, axis2=-1) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def make_traj_refiner(lr, objective):
    """scan variant of tasks/refinement.make_pose_refiner: emits the
    6d iterate at EVERY step so one run answers all steps choices."""
    dist_fn = _per_sample_objective(objective)
    opt = optax.adam(lr)

    @jax.jit
    def run(params, query_latent, reference_latent, init6):
        target = query_latent.astype(jnp.float32)
        in_dtype = reference_latent.dtype

        def total_loss(r6):
            pred = task.predict_latent(params, reference_latent,
                                       r6.astype(in_dtype))
            return jnp.sum(dist_fn(pred.astype(jnp.float32), target))

        grad_fn = jax.grad(total_loss)

        def body(carry, _):
            r6, opt_state = carry
            grads = grad_fn(r6)
            updates, opt_state = opt.update(grads, opt_state, r6)
            r6 = optax.apply_updates(r6, updates)
            return (r6, opt_state), r6

        r6_0 = init6.astype(jnp.float32)
        _, traj = jax.lax.scan(body, (r6_0, opt.init(r6_0)), None, length=STEPS)
        return traj  # (STEPS, B, 6)

    return run


CONFIGS = [
    (1e-3, "l2"), (3e-3, "l2"), (1e-2, "l2"), (2e-2, "l2"), (3e-3, "l1"),
]
for lr, obj in CONFIGS:
    refiner = make_traj_refiner(lr, obj)
    for init_name, init6 in (("341", init6_341), ("26", init6_26)):
        t0 = time.time()
        traj = np.asarray(refiner(params_h, q_lat, r_lat, jnp.asarray(init6)))
        dt = time.time() - t0
        R_traj = np.asarray(rotation_6d_to_matrix(jnp.asarray(traj)))  # (S,B,3,3)
        err0 = geo_deg(np.asarray(rotation_6d_to_matrix(jnp.asarray(init6))), gt_rel)
        errs = geo_deg(R_traj, gt_rel[None])  # (S, B)
        for gname in ("views", "objects"):
            m = group == gname
            med = [round(float(np.median(err0[m])), 2)] + [
                round(float(np.median(errs[s][m])), 2)
                for s in range(4, STEPS, 5)
            ]
            best_s = int(np.argmin(np.median(errs[:, m], axis=1))) + 1
            print(json.dumps({
                "lr": lr, "objective": obj, "init": init_name,
                "group": gname, "median_traj(step0,5,10,...)": med,
                "best_step": best_s,
                "best_median": round(float(np.median(errs[best_s - 1][m])), 2),
                "acc15_at_best": round(float(np.mean(errs[best_s - 1][m] <= 15)), 3),
                "run_s": round(dt, 1),
            }), flush=True)
print("DONE", flush=True)
