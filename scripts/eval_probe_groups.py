"""Probe-protocol evaluation of ANY checkpoint (round 5).

Replicates `probe_unseen_objects.py`'s eval groups bit-for-bit —
heldout VIEWS of the first 24 train objects (24 x 6 = 144 queries),
heldout OBJECTS (ids 24-27, 4 x 6), optional never-seen FAMILIES
(9002/9003/9006/9007) — so a checkpoint trained through the PRODUCT
stack (cli/train.py -> Trainer.fit on make_product_root.py roots) can
be compared against the probe runs' history.json at matched step
counts.  Accepts the probe `--params-out` npz format or a params-only
orbax dir (cli/train.py's checkpoints/final_params[_ema]).

Run:  python scripts/eval_probe_groups.py --ckpt <npz-or-orbax-dir>
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
from _probe_common import make_points, crop_u8, norm_np, load_params_leaves

from tests.fixtures import render_procedural
from nope_tpu.scripts.generate_data import sample_camera_poses
from nope_tpu.geometry import so3_grid
from nope_tpu.geometry.rotations import matrix_to_rotation_6d
from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig, cast_half


def _arg(name, default, cast=str):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


IMG = 256
CKPT = _arg("--ckpt", "/tmp/probe512_64k/best.npz")
NEWFAM = int(_arg("--newfam", "1"))
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

# identical seeds/groups to probe_unseen_objects.py
VIEW_OBJS = list(range(24))
HO_OBJS = list(range(24, 28))
NEWFAM_OBJS = [9002, 9003, 9006, 9007] if NEWFAM else []
grid341 = so3_grid.get_obj_poses_from_template_level(2, "upper")[:, :3, :3]
grid341 = grid341.astype(np.float32)

_eval_jit = jax.jit(
    lambda p, q, r, bR: task.retrieve_streaming(p, q, r, bR, chunk_size=31))


def eval_group(objs, label):
    t0 = time.time()
    q_imgs, refs, bank_Rs, gt_R, floor = [], [], [], [], []
    for o in objs:
        pts, cols = make_points(o)
        prng = np.random.default_rng(5000 + o)
        poses_q = sample_camera_poses(prng, N_QUERY, 1.0)
        pose_r = sample_camera_poses(prng, 1, 1.0)[0]
        ref = crop_u8(render_procedural(pose_r, pts, cols, img_px=512), pose_r)
        rel = np.einsum("nij,kj->nik", grid341, pose_r[:3, :3])
        b6 = np.asarray(matrix_to_rotation_6d(jnp.asarray(rel)), np.float32)
        for p in poses_q:
            q_imgs.append(
                crop_u8(render_procedural(p, pts, cols, img_px=512), p))
            refs.append(ref); bank_Rs.append(b6)
            gt_R.append(p[:3, :3])
            tr = np.einsum("nij,kj->nik", grid341, p[:3, :3])
            ang = np.degrees(np.arccos(np.clip(
                (np.trace(tr, axis1=1, axis2=2) - 1) / 2, -1, 1)))
            floor.append(ang.min())
    B = len(q_imgs)
    idxs = []
    for lo in range(0, B, 12):
        sl = slice(lo, min(lo + 12, B))
        _, idx = _eval_jit(
            params_h,
            jnp.asarray(norm_np(np.stack(q_imgs[sl])), jnp.bfloat16),
            jnp.asarray(norm_np(np.stack(refs[sl])), jnp.bfloat16),
            jnp.asarray(np.stack(bank_Rs[sl]), jnp.bfloat16),
        )
        idxs.append(np.asarray(idx))
    idx = np.concatenate(idxs)
    pred_R = grid341[idx]
    gt = np.stack(gt_R)
    e = []
    for k in range(5):
        m = np.einsum("bij,bkj->bik", pred_R[:, k], gt)
        e.append(np.degrees(np.arccos(np.clip(
            (np.trace(m, axis1=1, axis2=2) - 1) / 2, -1, 1))))
    e = np.stack(e, axis=1)
    res = {
        "ckpt": os.path.basename(CKPT.rstrip("/")), "ckpt_step": ckpt_step,
        "label": label, "n": B,
        "top1_median_deg": round(float(np.median(e[:, 0])), 2),
        "top5_median_deg": round(float(np.median(e.min(axis=1))), 2),
        "acc15": round(float(np.mean(e[:, 0] <= 15.0)), 3),
        "acc30": round(float(np.mean(e[:, 0] <= 30.0)), 3),
        "grid_floor_median_deg": round(float(np.median(floor)), 2),
        "eval_s": round(time.time() - t0, 1),
    }
    print(json.dumps(res), flush=True)
    return res


eval_group(VIEW_OBJS, "heldout_views")
eval_group(HO_OBJS, "heldout_objects")
if NEWFAM_OBJS:
    eval_group(NEWFAM_OBJS, "heldout_newfam")
print("DONE", flush=True)
