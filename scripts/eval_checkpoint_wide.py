"""Wide held-out-object evaluation of an exported probe checkpoint.

The probe's held-out-object group is 4 fixed objects × 6 queries
(n=24) — wide confidence intervals.  This script evaluates a
``--params-out`` checkpoint on a WIDER never-seen set: ``--per-fam``
fresh objects per family (ids 9100+, never used by any training or
probe eval) × ``--queries`` views each, full-341 streaming retrieval,
reported per family and pooled.  Used in round 4 to compare the 128-
vs 256-object checkpoints on a common, larger query set
(docs/PERFORMANCE.md).

Run:  python scripts/eval_checkpoint_wide.py --ckpt /tmp/probe256_params.npz
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


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


IMG = 256
CKPT = _arg("--ckpt", "", str)          # probe --params-out npz format
ORBAX = _arg("--orbax", "", str)        # params-only orbax dir
                                        # (cli/train.py final_params /
                                        # final_params_ema, or a
                                        # Trainer best-checkpoint dir)
PER_FAM = _arg("--per-fam", 4)
N_QUERY = _arg("--queries", 12)

vae = StableDiffusionVAE()
task = PoseConditionalTask(
    PoseUNet(u_net_dim=192, channels=4, dim_mults=(1, 2, 4, 8), resnet_block_groups=8),
    vae,
    TaskConfig(),
)
_init = task.init(jax.random.key(2), image_size=IMG)
if ORBAX:
    from nope_tpu.training.checkpoint import restore_params

    CKPT = ORBAX
    ckpt_step = -1  # orbax params-only dirs carry no step metadata
    params_h = cast_half(
        jax.device_put(
            restore_params(
                ORBAX, jax.device_get({"unet": _init["unet"], "vae": _init["vae"]})
            )
        )
    )
else:
    with np.load(CKPT, allow_pickle=False) as z:
        ckpt_step = int(z["probe_step"])
        params_h = jax.tree.unflatten(
            jax.tree.structure(cast_half({"unet": _init["unet"], "vae": _init["vae"]})),
            [jnp.asarray(l) for l in load_params_leaves(z)],
        )
print(f"loaded {CKPT} at step {ckpt_step}", flush=True)


# fresh never-seen ids: 9100 + k, chosen so id%4 cycles the families
OBJ_IDS = [9100 + 4 * j + f for f in range(4) for j in range(PER_FAM)]

grid341 = so3_grid.get_obj_poses_from_template_level(2, "upper")[:, :3, :3]
grid341 = grid341.astype(np.float32)

t0 = time.time()
q_imgs, refs, rel_mats, gt_rel, fams = [], [], [], [], []
for o in OBJ_IDS:
    prng = np.random.default_rng(6000 + o)
    poses_q = sample_camera_poses(prng, N_QUERY, 1.0)
    pose_r = sample_camera_poses(prng, 1, 1.0)[0]
    ref = render_crop(o, pose_r)
    rel = np.einsum("nij,kj->nik", grid341, pose_r[:3, :3])  # ΔR_n = T_n R_refᵀ
    for p in poses_q:
        q_imgs.append(render_crop(o, p)); refs.append(ref)
        rel_mats.append(rel.astype(np.float32))
        gt_rel.append(p[:3, :3] @ pose_r[:3, :3].T)
        fams.append(o % 4)
B = len(q_imgs)
gt_rel = np.stack(gt_rel)
rel_mats = np.stack(rel_mats)  # (B, 341, 3, 3)
fams = np.array(fams)
print(f"rendered {len(OBJ_IDS)} objects x {N_QUERY} queries = {B} "
      f"({time.time()-t0:.0f}s)", flush=True)

_stream341 = jax.jit(
    lambda p, q, r, bR: task.retrieve_streaming(p, q, r, bR, chunk_size=31))
q = np.stack(q_imgs)
r = np.stack(refs)
b341 = np.asarray(matrix_to_rotation_6d(jnp.asarray(rel_mats)).astype(jnp.bfloat16))
# chunk the query axis: one B=192 dispatch (U-Net chunk batch 192x31)
# is past the envelope validated on the 16 GB v5e (~128, see
# probe_gallery.py); CH=48 divides both the 144- and 192-query runs so
# every chunk compiles once, and chunking is numerically invisible
# (queries are independent)
CH = 48
t0 = time.time()
idx_parts = []
for s in range(0, B, CH):
    part = _stream341(params_h,
                      jnp.asarray(q[s:s + CH], jnp.bfloat16),
                      jnp.asarray(r[s:s + CH], jnp.bfloat16),
                      jnp.asarray(b341[s:s + CH]))[1]
    idx_parts.append(np.asarray(part))
idx = np.concatenate(idx_parts)
print(f"341 sweep {time.time()-t0:.0f}s", flush=True)


def geo_deg(a, b):
    tr = np.einsum("...ij,...kj->...ik", np.asarray(a, np.float64),
                   np.asarray(b, np.float64))
    cos = (np.trace(tr, axis1=-2, axis2=-1) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


ar = np.arange(B)
err1 = geo_deg(rel_mats[ar, idx[:, 0]], gt_rel)               # top-1
err5 = np.min(
    np.stack([geo_deg(rel_mats[ar, idx[:, k]], gt_rel) for k in range(5)]),
    axis=0,
)                                                             # best-of-top-5
floor = np.min(geo_deg(rel_mats, gt_rel[:, None]), axis=1)    # grid floor


def report(mask, label):
    print(json.dumps({
        "ckpt": os.path.basename(CKPT), "ckpt_step": ckpt_step,
        "label": label, "n": int(mask.sum()),
        "top1_median_deg": round(float(np.median(err1[mask])), 2),
        "top5_median_deg": round(float(np.median(err5[mask])), 2),
        "acc15": round(float(np.mean(err1[mask] <= 15)), 3),
        "acc30": round(float(np.mean(err1[mask] <= 30)), 3),
        "grid_floor_median_deg": round(float(np.median(floor[mask])), 2),
    }), flush=True)


for f, name in enumerate(["A_blob", "B_elongated", "C_platelet", "D_ring"]):
    report(fams == f, f"fam_{name}")
report(np.ones(B, bool), "pooled")
print("DONE", flush=True)
