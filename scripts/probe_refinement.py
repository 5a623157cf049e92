"""Hardware probe: continuous pose refinement at flagship scale.

Loads a checkpoint written by ``probe_unseen_objects.py`` (its final
``save_ckpt``), regenerates the deterministic held-out query/reference
views, and measures what gradient refinement (tasks/refinement.py)
buys on the v5e:

- full-341 retrieval top-1  vs  341-top-1 + refine
- fast-26 retrieval top-1   vs   26-top-1 + refine  (the cheap-sweep
  deployment shape: 26 U-Net forwards + K fwd+bwd steps instead of a
  341-forward sweep)

Run:  python scripts/probe_refinement.py --ckpt /tmp/probe_heroclip/ckpt.npz \
          --n-train-obj 64 --clip 1.0 [--steps 60] [--lr 2e-2]
(For a FULL TrainState checkpoint the model AND optimizer flags must
match the writing run — they determine the treedef the leaves unflatten
into.  For a ``--params-out`` params-only checkpoint only the MODEL
construction matters; optimizer flags like --clip are irrelevant since
no optimizer state is unflattened.)
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

from tests.fixtures import render_procedural

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from _probe_common import make_points, crop_u8, norm_np, load_params_leaves

from nope_tpu.scripts.generate_data import sample_camera_poses
from nope_tpu.geometry import so3_grid
from nope_tpu.geometry.rotations import matrix_to_rotation_6d
from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig, cast_half
from nope_tpu.tasks.refinement import make_pose_refiner
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import create_train_state


def _arg(name, default, cast=int):
    return cast(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


IMG = 256
CKPT = _arg("--ckpt", "/tmp/probe_heroclip/ckpt.npz", str)
N_TRAIN_OBJ = _arg("--n-train-obj", 64)
CLIP = _arg("--clip", 1.0, float)
STEPS = _arg("--steps", 60)
LR = _arg("--lr", 2e-2, float)
N_EVAL_TRAIN_OBJ = _arg("--n-eval-obj", 8)  # held-out VIEWS of these
HELDOUT_OBJS = list(range(24, 28))
N_QUERY = 6

# ---------------------------------------------------------------------------
# model + checkpoint (same construction as probe_unseen_objects.py)
# ---------------------------------------------------------------------------
vae = StableDiffusionVAE()
task = PoseConditionalTask(
    PoseUNet(u_net_dim=192, channels=4, dim_mults=(1, 2, 4, 8), resnet_block_groups=8),
    vae,
    TaskConfig(),
)
tx = make_optimizer(base_lr=2e-4, warm_up_steps=100, clip_grad_norm=CLIP)
state = create_train_state(task, tx, jax.random.key(2), image_size=IMG)
treedef = jax.tree.structure(state)
with np.load(CKPT, allow_pickle=False) as z:
    ckpt_step = int(z["probe_step"])
    n_leaves = int(z["n_leaves"])
    if "params_only" in z.files:
        # bf16 params-only export (probe_unseen_objects --params-out)
        params_h = jax.tree.unflatten(
            jax.tree.structure(
                cast_half({"unet": state.unet_params, "vae": state.vae_params})
            ),
            [jnp.asarray(l) for l in load_params_leaves(z)],
        )
    else:
        leaves = [z[f"leaf_{i}"] for i in range(n_leaves)]
        state = jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])
        params_h = cast_half({"unet": state.unet_params, "vae": state.vae_params})
print(f"loaded ckpt at step {ckpt_step}", flush=True)

# ---------------------------------------------------------------------------
# deterministic eval views (seeds identical to probe_unseen_objects.py)
# ---------------------------------------------------------------------------
TRAIN_IDS = list(range(min(24, N_TRAIN_OBJ))) + list(
    range(28, 28 + max(0, N_TRAIN_OBJ - 24))
)


t0 = time.time()
eval_objs = TRAIN_IDS[:N_EVAL_TRAIN_OBJ] + HELDOUT_OBJS
data = {}
for obj in eval_objs:
    pts, cols = make_points(obj)
    prng = np.random.default_rng(5000 + obj)
    poses_query = sample_camera_poses(prng, N_QUERY, 1.0)
    poses_ref = sample_camera_poses(prng, 1, 1.0)

    def r(pose):
        return crop_u8(render_procedural(pose, pts, cols, img_px=512), pose)

    data[obj] = {
        "queries": np.stack([r(p) for p in poses_query]),
        "query_R": poses_query[:, :3, :3].astype(np.float32),
        "ref": r(poses_ref[0]),
        "ref_R": poses_ref[0, :3, :3].astype(np.float32),
    }
print(f"rendered {len(eval_objs)} objects ({time.time()-t0:.0f}s)", flush=True)

grid341 = so3_grid.get_obj_poses_from_template_level(2, "upper")[:, :3, :3]
grid341 = grid341.astype(np.float32)
# load_index_level0_in_level2 returns template IDS into the full 642
# level-2 grid; map them to POSITIONS within the upper-filtered 341
# subset (poses/utils.py:115-127 semantics) before indexing grid341.
_idx26_ids = so3_grid.load_index_level0_in_level2("upper")
_id2pos = so3_grid.load_mapping_id_templates_to_idx_pose_distribution(2, "upper")
idx26 = np.array([_id2pos[int(i)] for i in _idx26_ids])
grid26 = grid341[idx26]


# jitted programs ------------------------------------------------------------
_stream341 = jax.jit(
    lambda p, q, r, bR: task.retrieve_streaming(p, q, r, bR, chunk_size=31)
)
_refiner = make_pose_refiner(task, steps=STEPS, lr=LR)


@jax.jit
def _sweep26_refine(p, q_img, r_img, bank_R26):
    """Encode once, 26-template sweep, top-1, refine — ONE program."""
    q_lat = task.encode(p, q_img, "mode")
    r_lat = task.encode(p, r_img, "mode")
    bank = task.generate_template_bank(p, None, bank_R26, reference_latent=r_lat)
    sim, idx = task.retrieval(p, None, bank, query_latent=q_lat)
    init6 = jnp.take_along_axis(bank_R26, idx[:, :1, None], axis=1)[:, 0]
    from nope_tpu.geometry.rotations import rotation_6d_to_matrix

    init_R = rotation_6d_to_matrix(init6.astype(jnp.float32))
    R_hat, _ = _refiner(p, q_lat, r_lat, init_R)
    return idx, R_hat


@jax.jit
def _refine_from(p, q_img, r_img, init_R):
    q_lat = task.encode(p, q_img, "mode")
    r_lat = task.encode(p, r_img, "mode")
    return _refiner(p, q_lat, r_lat, init_R)


def geo_deg(a, b):
    tr = np.einsum("bij,bkj->bik", np.asarray(a, np.float64), np.asarray(b, np.float64))
    cos = (np.trace(tr, axis1=1, axis2=2) - 1.0) / 2.0
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def run_group(objs, label):
    q_imgs, refs, rel341, rel26, gtR, refR = [], [], [], [], [], []
    for o in objs:
        d = data[o]
        rel = np.einsum("nij,kj->nik", grid341, d["ref_R"])
        b341 = np.asarray(matrix_to_rotation_6d(jnp.asarray(rel)), np.float32)
        for i in range(N_QUERY):
            q_imgs.append(d["queries"][i]); refs.append(d["ref"])
            rel341.append(b341); rel26.append(b341[idx26])
            gtR.append(d["query_R"][i]); refR.append(d["ref_R"])
    B = len(q_imgs)
    gtR = np.stack(gtR); refR = np.stack(refR)
    gt_rel = np.einsum("bij,bkj->bik", gtR, refR)  # ΔR* = R_q R_ref^T

    q = jnp.asarray(norm_np(np.stack(q_imgs)), jnp.bfloat16)
    r = jnp.asarray(norm_np(np.stack(refs)), jnp.bfloat16)
    b341 = jnp.asarray(np.stack(rel341), jnp.bfloat16)
    b26 = jnp.asarray(np.stack(rel26), jnp.bfloat16)

    # full-341 streaming retrieval (+ optional refine from its top-1)
    t = time.time()
    _, i341 = _stream341(params_h, q, r, b341)
    i341 = np.asarray(i341)
    t341 = time.time() - t
    err341 = geo_deg(grid341[i341[:, 0]] @ np.swapaxes(refR, -1, -2), gt_rel)

    init341 = jnp.asarray(
        np.stack(rel341)[np.arange(B), i341[:, 0]], jnp.float32
    )
    from nope_tpu.geometry.rotations import rotation_6d_to_matrix as r6m

    t = time.time()
    Rh341, _ = _refine_from(params_h, q, r, r6m(init341))
    Rh341 = np.asarray(Rh341)
    tr341 = time.time() - t
    errR341 = geo_deg(Rh341, gt_rel)

    # fast-26 sweep + refine, one program
    t = time.time()
    i26, Rh26 = _sweep26_refine(params_h, q, r, b26)
    i26, Rh26 = np.asarray(i26), np.asarray(Rh26)
    t26 = time.time() - t
    err26 = geo_deg(grid26[i26[:, 0]] @ np.swapaxes(refR, -1, -2), gt_rel)
    errR26 = geo_deg(Rh26, gt_rel)

    res = {
        "label": label, "n": B, "ckpt_step": ckpt_step,
        "grid341_top1_median": round(float(np.median(err341)), 2),
        "refined_from341_median": round(float(np.median(errR341)), 2),
        "grid26_top1_median": round(float(np.median(err26)), 2),
        "refined_from26_median": round(float(np.median(errR26)), 2),
        "acc15_grid341": round(float(np.mean(err341 <= 15)), 3),
        "acc15_refined341": round(float(np.mean(errR341 <= 15)), 3),
        "acc15_grid26": round(float(np.mean(err26 <= 15)), 3),
        "acc15_refined26": round(float(np.mean(errR26 <= 15)), 3),
        "improved_341": round(float(np.mean(errR341 < err341)), 3),
        "improved_26": round(float(np.mean(errR26 < err26)), 3),
        "t_sweep341_s": round(t341, 2),
        "t_refine341_s": round(tr341, 2),
        "t_sweep26_plus_refine_s": round(t26, 2),
    }
    print(json.dumps(res), flush=True)
    return res


results = [
    run_group(TRAIN_IDS[:N_EVAL_TRAIN_OBJ], "heldout_views"),
    run_group(HELDOUT_OBJS, "heldout_objects"),
]
# warm-run the timed programs once more for honest warm numbers
results.append(run_group(TRAIN_IDS[:N_EVAL_TRAIN_OBJ], "heldout_views_warm"))
print("DONE", flush=True)
