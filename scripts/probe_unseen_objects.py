"""Hardware probe: unseen-OBJECT generalization (rounds 3-4).

Full from-scratch two-stage recipe at flagship scale on the v5e:
procedural objects in 2-4 shape families (4 families once train ids
reach >= 68, i.e. the 128/256-object runs); codec + pose task trained
on N objects, FULL 341-grid streaming retrieval evaluated on (a) seen
training views (diagnostic), (b) held-out VIEWS of training objects,
(c) 4 objects NEVER seen in training — the capability NOPE actually
claims (reference README.md:31-35, src/model/model.py:106-124) — and
optionally (d, ``--newfam-ho 1``) 4 objects from never-seen FAMILIES.

Checkpoints every 500 optimizer steps to --out (atomic rename), resumes
from the latest checkpoint including the numpy batch-stream state, so a
session death costs at most 500 steps.  Results stream to stdout as
JSON lines and accumulate in <out>/history.json; the summary table
lives in docs/PERFORMANCE.md ("Round-3 unseen-object generalization").

Round-4 additions: ``--ema <beta>`` maintains a beta-EMA of the U-Net
params on device and evaluates it alongside the instantaneous weights
(history[i]["ema"]); ``--best-params-out <path>`` exports the params
at the best heldout-VIEWS (validation) eval point — instantaneous or
EMA, whichever won — as a params-only npz (probe_step = winning step,
plus best_views_top1 / best_stream metadata).

Run (v5e, ~2 h):  python scripts/probe_unseen_objects.py
Ablation:         python scripts/probe_unseen_objects.py --n-train-obj 8 \
                      --out /tmp/probe_unseen_ablate8
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
# shared zoo + crop pipeline (single source of truth for all probe
# scripts; bit-exactness contract documented there)
from _probe_common import make_points, crop_u8, norm_np

from nope_tpu.scripts.generate_data import sample_camera_poses
from nope_tpu.geometry import so3_grid
from nope_tpu.geometry.rotations import matrix_to_rotation_6d
from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig, cast_half
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import TrainState, create_train_state, make_train_step
from nope_tpu.training.pretrain_vae import (
    create_vae_pretrain_state, make_vae_pretrain_step,
)

def _arg(name, default):
    return int(sys.argv[sys.argv.index(name) + 1]) if name in sys.argv else default


IMG = 256
N_TRAIN_OBJ = _arg("--n-train-obj", 24)  # ablation: vary the train-set size
# 512 puts ~2.7 GB of uint8 training views on the device (27 frames x
# 196 KB x 516 objects) beside the ~1.5 GB train state — measured fine
# on a 16 GB v5e; the cap guards the next doubling, not this one
assert 4 <= N_TRAIN_OBJ <= 512
HELDOUT_OBJS = list(range(24, 28))       # fixed across ablations for comparability
# round-4: an optional SECOND held-out group drawn from the two shape
# families that only exist for train ids >= 68 (families C/D below) —
# never-seen-FAMILY transfer, one step harder than never-seen-object.
# ids 9002/9003/9006/9007 hit families C,D,C,D under the id%4 rule and
# can never collide with a train id (train ids top out at 259)
NEWFAM_HO = _arg("--newfam-ho", 0)
HELDOUT_NEWFAM = [9002, 9003, 9006, 9007] if NEWFAM_HO else []
# train ids: 0..23, then 28.. for runs larger than the original 24 —
# object ids 24..27 stay held-out in EVERY run so the transfer numbers
# are comparable across the 8/24/64 ablation
TRAIN_IDS = list(range(min(24, N_TRAIN_OBJ))) + list(range(28, 28 + max(0, N_TRAIN_OBJ - 24)))
# widened held-out-object eval: K extra query views per held-out object,
# drawn from a SEPARATE rng stream (6000+obj) so the standard protocol's
# draws (and hence cross-run comparability) are untouched
EXTRA_HO_QUERIES = _arg("--extra-ho-queries", 0)
# recipe variant: append K CONTINUOUS random training views per object
# (rng 8000+obj).  The default recipe trains on grid-view pairs only, so
# the dR distribution is the discrete grid x grid set; query-time dR is
# continuous — this flag closes that train/test distribution gap the way
# the reference's random-view ShapeNet renders do (SURVEY §2.6)
RAND_VIEWS = _arg("--rand-views", 0)
N_TRAIN_VIEWS = 26 + RAND_VIEWS  # 26 = fast grid (+ optional random views)
N_QUERY, N_REF = 6, 1
STEPS_VAE = _arg("--steps-vae", 700)
STEPS_POSE = _arg("--steps", 8000)
# global-norm gradient clipping (0 = off, the reference-parity default).
# The unclipped 2e-4 recipe is loss-spike-prone once the training set is
# diverse enough: the 64-object run blew up to loss 44 at step ~2750
# (docs/PERFORMANCE.md round-3); clipping is the probe-only mitigation
CLIP = (float(sys.argv[sys.argv.index("--clip") + 1])
        if "--clip" in sys.argv else 0.0)
# evaluation-time EMA (0 = off): maintain beta-EMA of the U-Net params
# on device and evaluate it ALONGSIDE the instantaneous weights each
# eval point (groups land under history[i]["ema"]).  Diffusion-style
# training conventionally evals an EMA; the 512-object runs' transient
# eval collapses (docs/PERFORMANCE.md) motivated measuring it here.
EMA = (float(sys.argv[sys.argv.index("--ema") + 1])
       if "--ema" in sys.argv else 0.0)
# round-5 collapse instrumentation (--trace-grads): per-250-step RAW
# grad norms and APPLIED update norms per parameter group (pose_mlp /
# cond_mlp / attn / conv — training/train_state.py grad_trace), plus an
# on-device running max of the global grad norm BETWEEN prints (a
# single-step spike cannot hide from the 250-step sampling), plus
# conditioning-output RMS at eval cadence.  Lines stream to
# <out>/gradtrace.jsonl
TRACE = "--trace-grads" in sys.argv
EVAL_EVERY = _arg("--eval-every", 2000)
CKPT_EVERY = _arg("--ckpt-every", 2000)  # a 2 GB state fetch over the tunnel
                   # is ~13 min; checkpoint on the eval cadence or coarser
BATCH = 16

OUT = sys.argv[sys.argv.index("--out") + 1] if "--out" in sys.argv else \
    "/tmp/probe_unseen_out4"
os.makedirs(OUT, exist_ok=True)
CKPT = os.path.join(OUT, "ckpt.npz")
# optional params-only bf16 export at the end of the run: ~6x smaller
# than the full TrainState fetch (no optimizer state, half precision) —
# what probe_refinement.py needs, without the multi-GB tunnel fetch
# that CLAUDE.md flags as wedge-prone
PARAMS_OUT = (sys.argv[sys.argv.index("--params-out") + 1]
              if "--params-out" in sys.argv else "")
# checkpoint selection: export the params at the BEST heldout-VIEWS
# (validation group — never the heldout-objects test group) eval point
# seen during the run.  The snapshot lives on device in bf16 between
# evals; the host fetch happens once, at the end
BEST_OUT = (sys.argv[sys.argv.index("--best-params-out") + 1]
            if "--best-params-out" in sys.argv else "")


# ---------------------------------------------------------------------------
# data: render + crop (two shape families; seeds fixed => fully
# deterministic dataset, so resume regenerates identical arrays)
# ---------------------------------------------------------------------------

t0 = time.time()
# training views = the 26-fast-grid TEMPLATE poses (the recipe the
# round-2 probe converged with: discrete grid views, dense dR pair set)
_tidx = so3_grid.load_index_level0_in_level2("upper")
_tmpl44 = so3_grid.load_obj_poses(2)[_tidx].copy()
_tmpl44[:, :3, 3] *= 2.0  # grid stores 0.5 m camera distance; match radius 1.0

data = {}  # per object: dict(train_views, train_R, queries, query_R, ref, ref_R)
for obj in TRAIN_IDS + HELDOUT_OBJS + HELDOUT_NEWFAM:  # skip unused in ablations
    pts, cols = make_points(obj)
    prng = np.random.default_rng(5000 + obj)
    poses_train = _tmpl44
    if RAND_VIEWS and obj in TRAIN_IDS:
        rrng = np.random.default_rng(8000 + obj)
        poses_train = np.concatenate(
            [_tmpl44, sample_camera_poses(rrng, RAND_VIEWS, 1.0)])
    poses_query = sample_camera_poses(prng, N_QUERY, 1.0)
    poses_ref = sample_camera_poses(prng, N_REF, 1.0)

    def r(pose):
        return crop_u8(render_procedural(pose, pts, cols, img_px=512), pose)

    data[obj] = ({
        "train_views": np.stack([r(p) for p in poses_train]),
        "train_R": poses_train[:, :3, :3].astype(np.float32),
        "queries": np.stack([r(p) for p in poses_query]),
        "query_R": poses_query[:, :3, :3].astype(np.float32),
        "ref": r(poses_ref[0]),
        "ref_R": poses_ref[0, :3, :3].astype(np.float32),
    })
    if EXTRA_HO_QUERIES and obj in HELDOUT_OBJS:
        erng = np.random.default_rng(6000 + obj)
        poses_extra = sample_camera_poses(erng, EXTRA_HO_QUERIES, 1.0)
        data[obj]["queries"] = np.concatenate(
            [data[obj]["queries"], np.stack([r(p) for p in poses_extra])])
        data[obj]["query_R"] = np.concatenate(
            [data[obj]["query_R"], poses_extra[:, :3, :3].astype(np.float32)])
    print(f"rendered obj {obj} ({time.time()-t0:.0f}s)", flush=True)

grid341 = so3_grid.get_obj_poses_from_template_level(2, "upper")[:, :3, :3]
grid341 = grid341.astype(np.float32)
N_T = len(grid341)

# [data-gen ends] — tests/test_probe_script.py execs everything above
# this sentinel to guard the dataset plumbing without the model build

# ---------------------------------------------------------------------------
# models + optimizer (constructed before checkpoint logic so the
# TrainState treedef exists to unflatten into)
# ---------------------------------------------------------------------------
vae = StableDiffusionVAE()
task = PoseConditionalTask(
    PoseUNet(u_net_dim=192, channels=4, dim_mults=(1, 2, 4, 8), resnet_block_groups=8),
    vae,
    TaskConfig(),
)
tx = make_optimizer(base_lr=2e-4, warm_up_steps=100, clip_grad_norm=CLIP)
state = create_train_state(task, tx, jax.random.key(2), image_size=IMG)
step_fn = make_train_step(task, tx, grad_trace=TRACE)

rng = np.random.default_rng(7)
history = []
start_step = 0
ema_params = None  # set below iff EMA > 0
_best_resume = None  # restored best-checkpoint tracker (ADVICE round-4)

if os.path.exists(CKPT):
    # resume: leaves in flatten order + numpy batch-stream state
    treedef = jax.tree.structure(state)
    with np.load(CKPT, allow_pickle=False) as z:
        leaves = [z[f"leaf_{i}"] for i in range(z["n_leaves"])]
        start_step = int(z["probe_step"])
        rng_state = json.loads(str(z["rng_state"]))
        if EMA and "ema_n" in z:
            ema_params = jax.tree.unflatten(
                jax.tree.structure(state.unet_params),
                [jnp.asarray(z[f"ema_leaf_{i}"]) for i in range(z["ema_n"])],
            )
        if "best_n" in z:
            import ml_dtypes
            bmask = z["best_bf16_mask"]
            bl = [jnp.asarray(z[f"best_leaf_{i}"].view(ml_dtypes.bfloat16)
                              if bmask[i] else z[f"best_leaf_{i}"])
                  for i in range(int(z["best_n"]))]
            _best_resume = {
                "params": jax.tree.unflatten(
                    jax.tree.structure(
                        {"unet": state.unet_params, "vae": state.vae_params}),
                    bl),
                "step": int(z["best_step"]),
                "views_top1": float(z["best_views_top1"]),
                "stream": str(z["best_stream"]),
            }
    state = jax.tree.unflatten(treedef, [jnp.asarray(l) for l in leaves])
    rng_state["state"] = {k: int(v) for k, v in rng_state["state"].items()}
    rng.bit_generator.state = rng_state
    if os.path.exists(os.path.join(OUT, "history.json")):
        history = json.load(open(os.path.join(OUT, "history.json")))
    print(f"RESUMED at step {start_step} ({time.time()-t0:.0f}s)", flush=True)
else:
    # -------------------------------------------------------------------
    # stage 1: VAE pretraining on TRAIN objects' TRAIN views only
    # -------------------------------------------------------------------
    import optax
    vae_imgs = np.concatenate(
        [data[o]["train_views"] for o in TRAIN_IDS]
        + [data[o]["queries"] for o in TRAIN_IDS]
        + [data[o]["ref"][None] for o in TRAIN_IDS]
    )
    print(f"stage1: {len(vae_imgs)} images", flush=True)
    vtx = optax.adamw(2e-4)
    vstate = create_vae_pretrain_state(vae, vtx, jax.random.key(0), image_size=IMG)
    vstep = make_vae_pretrain_step(vae, vtx)

    # the whole (uint8) image set lives on device; per-step host->device
    # traffic is 8 indices, not 6 MB of floats (the tunnel is ~10 MB/s)
    vae_dev = jnp.asarray(vae_imgs)

    @jax.jit
    def vstep_idx(vstate, imgs_u8, sel):
        return vstep(vstate, imgs_u8[sel].astype(jnp.float32) / 255.0 * 2.0 - 1.0)

    vrng = np.random.default_rng(1)
    for step in range(STEPS_VAE):
        sel = vrng.integers(0, len(vae_imgs), 8)
        vstate, vmetrics = vstep_idx(vstate, vae_dev, jnp.asarray(sel))
        if step % 100 == 0 or step == STEPS_VAE - 1:
            print(f"vae step {step}: recon={float(vmetrics['recon']):.4f}", flush=True)
    state = state._replace(vae_params=vstate.params)
    # Free stage-1 device memory before stage 2: at 512 objects vae_dev
    # is ~3.3 GB of uint8 (33 views x 512 objects) that the pose loop
    # never touches — leaving it resident is what OOMed the first
    # --ema 64k launch (EMA copy + best stash pushed the static set
    # past the 16 GB HBM).  The jit cache keeps the compiled vstep
    # executable alive but not the donated buffers.
    del vae_dev, vstate, vmetrics, vstep_idx, vae_imgs


def save_ckpt(state, probe_step):
    leaves = [np.asarray(l) for l in jax.tree.leaves(state)]
    rng_state = dict(rng.bit_generator.state)
    rng_state["state"] = {k: str(v) for k, v in rng_state["state"].items()}
    extra = {}
    if ema_params is not None:
        eleaves = [np.asarray(l) for l in jax.tree.leaves(ema_params)]
        extra["ema_n"] = len(eleaves)
        extra.update({f"ema_leaf_{i}": l for i, l in enumerate(eleaves)})
    if best["params"] is not None:
        # persist the best-checkpoint tracker: without it a resume would
        # silently restart selection at "best since resume" while the
        # export metadata still claimed run-best (round-4 ADVICE)
        import ml_dtypes
        bleaves = [np.asarray(l) for l in jax.tree.leaves(best["params"])]
        bmask = np.asarray(
            [l.dtype == ml_dtypes.bfloat16 for l in bleaves], bool)
        extra.update(
            best_n=len(bleaves), best_bf16_mask=bmask, best_step=best["step"],
            best_views_top1=best["views_top1"], best_stream=best["stream"],
            **{f"best_leaf_{i}": (l.view(np.uint16) if bmask[i] else l)
               for i, l in enumerate(bleaves)})
    tmp = CKPT + ".tmp.npz"
    np.savez(
        tmp,
        n_leaves=len(leaves),
        probe_step=probe_step,
        rng_state=json.dumps(rng_state),
        **{f"leaf_{i}": l for i, l in enumerate(leaves)},
        **extra,
    )
    os.replace(tmp, CKPT)


# ---------------------------------------------------------------------------
# stage 2: pose task on train objects' grid-view pairs
# ---------------------------------------------------------------------------

def make_batch(rng):
    """Per-step host->device traffic is 3x BATCH int64s: the images stay
    resident on device (views_dev) and the gather + normalize + relative-
    rotation math runs inside the jitted step.  The rng consumption is
    identical to the original host-side sampler, so checkpoints from
    either variant resume onto the same batch stream."""
    objs = rng.integers(0, N_TRAIN_OBJ, BATCH)
    vi, vj = [], []
    for o in objs:
        i, j = rng.choice(N_TRAIN_VIEWS, 2, replace=False)
        vi.append(i); vj.append(j)
    return (jnp.asarray(objs), jnp.asarray(np.asarray(vi)),
            jnp.asarray(np.asarray(vj)))


# device-resident training set: (N_TRAIN_OBJ, 26, IMG, IMG, 3) uint8
# (stacked in TRAIN_IDS order; make_batch indexes positions, not ids)
views_dev = jnp.asarray(np.stack([data[o]["train_views"] for o in TRAIN_IDS]))
Rs_dev = jnp.asarray(np.stack([data[o]["train_R"] for o in TRAIN_IDS]))

import functools


@functools.partial(jax.jit, donate_argnums=(0, 1, 2, 3), static_argnums=(10,))
def step_indexed(state, ema, gmax, gmax_step, views_u8, Rs, objs, vi, vj, step,
                 with_ema):
    """gmax/gmax_step: running max of the global grad norm (and the
    step it occurred at) since the last host fetch — accumulated inside
    the same dispatch so tracing adds zero extra host round-trips.
    The EMA update is FUSED into the same dispatch (``with_ema``): a
    separate per-step jitted _ema_step call would pay the ~25 ms tunnel
    dispatch latency 64k times (~30 min of pure overhead on the v5e)."""
    hi = jax.lax.Precision.HIGHEST
    norm = lambda x: x.astype(jnp.float32) / 255.0 * 2.0 - 1.0
    Rq, Rr = Rs[objs, vi], Rs[objs, vj]
    rel = jnp.matmul(Rq, jnp.swapaxes(Rr, -1, -2), precision=hi)
    rel_inv = jnp.matmul(Rr, jnp.swapaxes(Rq, -1, -2), precision=hi)
    batch = {"proc": {
        "query": norm(views_u8[objs, vi]),
        "reference": norm(views_u8[objs, vj]),
        "relativeR": matrix_to_rotation_6d(rel),
        "relativeR_inv": matrix_to_rotation_6d(rel_inv),
    }}
    new_state, metrics = step_fn(state, batch)
    g = metrics.get("gnorm/global", jnp.zeros((), jnp.float32))
    gmax_step = jnp.where(g > gmax, step, gmax_step)
    gmax = jnp.maximum(gmax, g)
    if with_ema:
        ema = jax.tree.map(lambda a, b: a * EMA + b * (1.0 - EMA),
                           ema, new_state.unet_params)
    return new_state, ema, gmax, gmax_step, metrics


# ---------------------------------------------------------------------------
# eval: full-341 streaming retrieval, bf16
# ---------------------------------------------------------------------------

_eval_jit = jax.jit(
    lambda p, q, r, bR: task.retrieve_streaming(p, q, r, bR, chunk_size=31)
)


def eval_group(params_h, objs, label, use_train_views=False, n_queries=None):
    """objs: list of object indexes; queries = their held-out query
    views (or, diagnostic, the first N_QUERY SEEN training views),
    reference = their single held-out reference view."""
    q_imgs, refs, bank_Rs, gt_R, floor = [], [], [], [], []
    for o in objs:
        d = data[o]
        rel = np.einsum("nij,kj->nik", grid341, d["ref_R"])  # T_i @ R_ref^T
        b6 = np.asarray(matrix_to_rotation_6d(jnp.asarray(rel)), np.float32)
        qs = d["train_views"] if use_train_views else d["queries"]
        qR = d["train_R"] if use_train_views else d["query_R"]
        for i in range(n_queries if n_queries is not None else N_QUERY):
            q_imgs.append(qs[i]); refs.append(d["ref"])
            bank_Rs.append(b6); gt_R.append(qR[i])
            tr = np.einsum("nij,kj->nik", grid341, qR[i])
            ang = np.degrees(np.arccos(np.clip(
                (np.trace(tr, axis1=1, axis2=2) - 1) / 2, -1, 1)))
            floor.append(ang.min())
    B = len(q_imgs)
    idxs = []
    CH = 12
    for lo in range(0, B, CH):
        sl = slice(lo, min(lo + CH, B))
        _, idx = _eval_jit(
            params_h,
            jnp.asarray(norm_np(np.stack(q_imgs[sl])), jnp.bfloat16),
            jnp.asarray(norm_np(np.stack(refs[sl])), jnp.bfloat16),
            jnp.asarray(np.stack(bank_Rs[sl]), jnp.bfloat16),
        )
        idxs.append(np.asarray(idx))
    idx = np.concatenate(idxs)
    pred_R = grid341[idx]  # (B, 5, 3, 3)
    gt = np.stack(gt_R)
    # top-k geodesic errors
    e = []
    for k in range(5):
        m = np.einsum("bij,bkj->bik", pred_R[:, k], gt)
        ang = np.degrees(np.arccos(np.clip(
            (np.trace(m, axis1=1, axis2=2) - 1) / 2, -1, 1)))
        e.append(ang)
    e = np.stack(e, axis=1)  # (B, 5)
    top1 = e[:, 0]
    res = {
        "label": label,
        "n": B,
        "top1_median_deg": round(float(np.median(top1)), 2),
        "top5_median_deg": round(float(np.median(e.min(axis=1))), 2),
        "acc15": round(float(np.mean(top1 <= 15.0)), 3),
        "acc30": round(float(np.mean(top1 <= 30.0)), 3),
        "grid_floor_median_deg": round(float(np.median(floor)), 2),
    }
    print(json.dumps(res), flush=True)
    return res


if EMA and ema_params is None:
    # fresh EMA stream: start from the stage-2 initial U-Net weights.
    # Must be a REAL copy — jnp.asarray aliases, and step_indexed
    # donates the state, which would delete the aliased buffers
    ema_params = jax.tree.map(lambda x: jnp.array(x, copy=True),
                              state.unet_params)

# best-checkpoint tracking (validation group = heldout VIEWS of train
# objects; heldout OBJECTS stay a pure test group).  Winning params are
# DEEP-copied on stash: cast_half passes non-f32 leaves by reference
# and step_indexed donates the state, so an aliased stash would dangle.
# save_ckpt persists the tracker (step/metric/stream + bf16 leaves) and
# resume restores it, so a session death cannot silently reset the
# best-checkpoint selection to "best since resume".
best = {"views_top1": float("inf"), "step": -1, "params": None, "stream": ""}
if _best_resume is not None:
    best.update(_best_resume)
    print(f"best-tracker RESUMED: step {best['step']} ({best['stream']}) "
          f"views top-1 {best['views_top1']}", flush=True)

if TRACE:
    # conditioning-output RMS on a FIXED probe input (the 4 held-out
    # objects' reference latents x 4 fixed grid rotations): every
    # '*mlp*' module's output magnitude, recorded at eval cadence —
    # the "which representation reorganizes" signal for the transient
    # collapse (docs/PERFORMANCE.md round-5)
    _diag_r6 = jnp.asarray(
        np.asarray(matrix_to_rotation_6d(jnp.asarray(grid341[:4]))), jnp.float32)
    _diag_lat = None

    def _diag_fn(p, lat, r6):
        _, st = task.unet.apply(
            {"params": p}, lat, r6,
            capture_intermediates=lambda mdl, meth: "mlp" in (mdl.name or ""))
        return jax.tree.map(
            lambda x: jnp.sqrt(jnp.mean(jnp.square(x.astype(jnp.float32)))),
            st["intermediates"])

    _diag_jit = jax.jit(_diag_fn)

    def cond_rms(state):
        global _diag_lat
        if _diag_lat is None:
            imgs = np.stack([data[o]["ref"] for o in HELDOUT_OBJS])
            _diag_lat = task.encode(
                {"unet": state.unet_params, "vae": state.vae_params},
                jnp.asarray(norm_np(imgs)), "mode")
        rms = jax.tree.map(np.asarray, _diag_jit(state.unet_params, _diag_lat, _diag_r6))
        flat = jax.tree_util.tree_flatten_with_path(rms)[0]
        return {jax.tree_util.keystr(p): round(float(v), 5) for p, v in flat}

    gradtrace_f = open(os.path.join(OUT, "gradtrace.jsonl"), "a")

gmax = jnp.zeros((), jnp.float32)
gmax_step = jnp.zeros((), jnp.int32)

t0 = time.time()
for step in range(start_step, STEPS_POSE + 1):
    if step % EVAL_EVERY == 0 or step == STEPS_POSE:
        params_h = cast_half({"unet": state.unet_params, "vae": state.vae_params})
        print(f"--- step {step} ({time.time()-t0:.0f}s)", flush=True)
        sv = eval_group(params_h, TRAIN_IDS[:4], f"seen_train_views@{step}",
                        use_train_views=True)
        # cap at the first 24 train objects so the group stays
        # protocol-identical (and cost-comparable) across the ablation
        hv = eval_group(params_h, TRAIN_IDS[:24], f"heldout_views@{step}")
        ho = eval_group(params_h, HELDOUT_OBJS, f"heldout_objects@{step}")
        history.append({"step": step, "seen": sv, "views": hv, "objects": ho})
        if HELDOUT_NEWFAM:
            hf = eval_group(params_h, HELDOUT_NEWFAM,
                            f"heldout_newfam@{step}")
            history[-1]["newfam"] = hf
        if EXTRA_HO_QUERIES:
            how = eval_group(params_h, HELDOUT_OBJS,
                             f"heldout_objects_wide@{step}",
                             n_queries=N_QUERY + EXTRA_HO_QUERIES)
            history[-1]["objects_wide"] = how
        candidates = [("inst", params_h, hv)]
        if EMA:
            params_e = cast_half({"unet": ema_params, "vae": state.vae_params})
            ev = eval_group(params_e, TRAIN_IDS[:24], f"heldout_views_ema@{step}")
            eo = eval_group(params_e, HELDOUT_OBJS, f"heldout_objects_ema@{step}")
            history[-1]["ema"] = {"views": ev, "objects": eo}
            if HELDOUT_NEWFAM:
                history[-1]["ema"]["newfam"] = eval_group(
                    params_e, HELDOUT_NEWFAM, f"heldout_newfam_ema@{step}")
            candidates.append(("ema", params_e, ev))
        for stream, p, r in candidates:
            if r["top1_median_deg"] < best["views_top1"]:
                best.update(
                    views_top1=r["top1_median_deg"], step=step, stream=stream,
                    params=jax.tree.map(lambda x: jnp.array(x, copy=True), p))
        # drop the bf16 eval copies before training resumes: two ~250 MB
        # param trees held across 2000 train steps is pure HBM waste
        params_h = params_e = candidates = None
        if TRACE:
            history[-1]["cond_rms"] = cond_rms(state)
        json.dump(history, open(os.path.join(OUT, "history.json"), "w"), indent=1)
    if step < STEPS_POSE:
        state, ema_params, gmax, gmax_step, metrics = step_indexed(
            state, ema_params, gmax, gmax_step, views_dev, Rs_dev,
            *make_batch(rng), jnp.asarray(step, jnp.int32), bool(EMA))
        if (step + 1) % CKPT_EVERY == 0:
            save_ckpt(state, step + 1)
        if step % 250 == 0:
            print(f"step {step}: loss={float(metrics['loss/train_avg']):.4f} "
                  f"({time.time()-t0:.0f}s)", flush=True)
            if TRACE:
                rec = {"step": step,
                       "loss": round(float(metrics["loss/train_avg"]), 4),
                       "gmax_since_last": round(float(gmax), 4),
                       "gmax_step": int(gmax_step)}
                rec.update({k: round(float(v), 5) for k, v in metrics.items()
                            if k.startswith(("gnorm/", "unorm/"))})
                gradtrace_f.write(json.dumps(rec) + "\n")
                gradtrace_f.flush()
                gmax = jnp.zeros((), jnp.float32)
                gmax_step = jnp.zeros((), jnp.int32)

def export_params(path, params_h, probe_step, **meta):
    import ml_dtypes

    pleaves = [np.asarray(l) for l in jax.tree.leaves(params_h)]
    bf16_mask = np.asarray(
        [l.dtype == ml_dtypes.bfloat16 for l in pleaves], bool
    )
    tmp = path + ".tmp.npz"
    np.savez(
        tmp,
        params_only=1,
        probe_step=probe_step,
        n_leaves=len(pleaves),
        bf16_mask=bf16_mask,
        # np.save cannot round-trip ml_dtypes.bfloat16 descr: store raw u16
        **{f"leaf_{i}": (l.view(np.uint16) if bf16_mask[i] else l)
           for i, l in enumerate(pleaves)},
        **meta,
    )
    os.replace(tmp, path)
    print(f"params-only ckpt -> {path}", flush=True)


if PARAMS_OUT:
    export_params(
        PARAMS_OUT,
        cast_half({"unet": state.unet_params, "vae": state.vae_params}),
        # the params are at the last step actually reached: a resume
        # whose start_step already exceeds STEPS_POSE runs zero steps
        probe_step=max(start_step, STEPS_POSE),
    )

if BEST_OUT and best["params"] is not None:
    export_params(
        BEST_OUT, best["params"], probe_step=best["step"],
        best_views_top1=best["views_top1"], best_stream=best["stream"],
    )
    print(f"best checkpoint: step {best['step']} ({best['stream']}) "
          f"views top-1 {best['views_top1']}", flush=True)

print("DONE " + json.dumps(history[-1]))
