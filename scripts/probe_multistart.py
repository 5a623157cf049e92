"""Hardware measurement: multi-start (top-K) pose refinement (round 5).

Round-4 finding (docs/PERFORMANCE.md): WHICH single refinement init
wins is checkpoint-dependent — 26-top-1+refine beats the 341 sweep on
an overfit model, 341-top-1+refine wins on a generalizing one.  The
multi-start refiner (tasks/refinement.make_multistart_refiner, serving
knob ``refine_topk``) refines from the top-K retrieved poses in one
K×-wider batched program and keeps the per-query winner by final latent
objective — the policy hedge.  This script measures, per checkpoint:

  341-sweep top-1            (the retrieval ceiling, grid-snapped)
  341-top-1 + single refine  (round-4 policy A)
  26-top-1  + single refine  (round-4 policy B)
  341-top-5 multi-start      (the hedge; K=5 — model.py:254-266's topk)

on the probe protocol's held-out-VIEWS (8 train objects x 6 queries)
and held-out-OBJECTS (4 unseen objects x 6 queries) groups, with
per-query wall cost for each.

Run:  python scripts/probe_multistart.py --ckpt /tmp/probe512_32k/params_32k.npz
      python scripts/probe_multistart.py --ckpt /tmp/probe512_64k/best.npz
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

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _probe_common import render_crop, load_params_leaves

from nope_tpu.scripts.generate_data import sample_camera_poses
from nope_tpu.geometry import so3_grid
from nope_tpu.geometry.rotations import matrix_to_rotation_6d
from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig, cast_half
from nope_tpu.tasks.refinement import make_multistart_refiner, make_pose_refiner


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


IMG = 256
CKPT = _arg("--ckpt", "/tmp/probe512_32k/params_32k.npz", str)
STEPS = _arg("--steps", 24)
LR = _arg("--lr", 2e-2, float)
K = _arg("--topk", 5)
N_QUERY = 6

vae = StableDiffusionVAE()
task = PoseConditionalTask(
    PoseUNet(u_net_dim=192, channels=4, dim_mults=(1, 2, 4, 8), resnet_block_groups=8),
    vae,
    TaskConfig(),
)
_init = task.init(jax.random.key(2), image_size=IMG)
if os.path.isdir(CKPT):
    from nope_tpu.training.checkpoint import restore_params

    ckpt_step = -1
    params_h = cast_half(jax.device_put(restore_params(
        CKPT, jax.device_get({"unet": _init["unet"], "vae": _init["vae"]}))))
else:
    with np.load(CKPT, allow_pickle=False) as z:
        ckpt_step = int(z["probe_step"])
        params_h = jax.tree.unflatten(
            jax.tree.structure(cast_half({"unet": _init["unet"], "vae": _init["vae"]})),
            [jnp.asarray(l) for l in load_params_leaves(z)],
        )
print(f"loaded {CKPT} at step {ckpt_step}", flush=True)

# identical eval protocol to tune_refinement.py (round-4 comparability)
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
rel341 = np.stack(b341s).astype(np.float32)  # (B, 341, 6)
print(f"rendered {B} queries ({time.time()-t0:.0f}s)", flush=True)

q = jnp.asarray(np.stack(q_imgs), jnp.bfloat16)
r = jnp.asarray(np.stack(refs), jnp.bfloat16)
b341 = jnp.asarray(rel341, jnp.bfloat16)

_stream341 = jax.jit(
    lambda p, q, r, bR: task.retrieve_streaming(p, q, r, bR, chunk_size=31))
_encode = jax.jit(lambda p, x: task.encode(p, x, "mode"))


def timed(f, *a):
    out = jax.tree.map(np.asarray, f(*a))  # compile
    t = time.time()
    out = jax.tree.map(np.asarray, f(*a))
    return out, time.time() - t


(sim341, i341), t_sweep = timed(_stream341, params_h, q, r, b341)
print(f"341 sweep: {t_sweep/B*1000:.1f} ms/query", flush=True)
q_lat = _encode(params_h, q)
r_lat = _encode(params_h, r)

from nope_tpu.geometry.rotations import rotation_6d_to_matrix

ar = np.arange(B)
R_341top1 = np.asarray(rotation_6d_to_matrix(jnp.asarray(rel341[ar, i341[:, 0]])))
sim26 = np.asarray(sim341)[:, idx26]
R_26top1 = np.asarray(rotation_6d_to_matrix(
    jnp.asarray(rel341[ar, idx26[np.argmax(sim26, axis=1)]])))
R_topk = np.asarray(rotation_6d_to_matrix(jnp.asarray(
    rel341[ar[:, None], i341[:, :K]])))  # (B, K, 3, 3)

single = jax.jit(make_pose_refiner(task, steps=STEPS, lr=LR))
multi = jax.jit(make_multistart_refiner(task, steps=STEPS, lr=LR))

(Rr341, _), t_r341 = timed(single, params_h, q_lat, r_lat, jnp.asarray(R_341top1))
(Rr26, _), t_r26 = timed(single, params_h, q_lat, r_lat, jnp.asarray(R_26top1))
(Rms, _, sel), t_ms = timed(multi, params_h, q_lat, r_lat, jnp.asarray(R_topk))
print(f"refine: single {t_r341/B*1000:.1f} ms/q, multi-start K={K} "
      f"{t_ms/B*1000:.1f} ms/q", flush=True)


def geo_deg(a, b):
    tr = np.einsum("...ij,...kj->...ik", np.asarray(a, np.float64),
                   np.asarray(b, np.float64))
    cos = (np.trace(tr, axis1=-2, axis2=-1) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


methods = {
    "341_sweep_top1": (geo_deg(R_341top1, gt_rel), t_sweep),
    "341top1_refine": (geo_deg(np.asarray(Rr341), gt_rel), t_sweep + t_r341),
    "26top1_refine": (geo_deg(np.asarray(Rr26), gt_rel), t_sweep + t_r26),
    f"top{K}_multistart": (geo_deg(np.asarray(Rms), gt_rel), t_sweep + t_ms),
}
for gname in ("views", "objects"):
    m = group == gname
    for name, (err, cost) in methods.items():
        print(json.dumps({
            "ckpt": os.path.basename(CKPT), "ckpt_step": ckpt_step,
            "group": gname, "method": name, "steps": STEPS, "lr": LR,
            "median_deg": round(float(np.median(err[m])), 2),
            "acc15": round(float(np.mean(err[m] <= 15)), 3),
            "acc30": round(float(np.mean(err[m] <= 30)), 3),
            "ms_per_query": round(cost / B * 1000, 1),
        }), flush=True)
sel = np.asarray(sel)
print(json.dumps({"multistart_winner_histogram":
                  {int(k): int((sel == k).sum()) for k in range(K)}}),
      flush=True)
print("DONE", flush=True)
