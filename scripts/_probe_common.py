"""Shared data-generation helpers for the hardware probe scripts.

Single source of truth for the procedural shape zoo, the render+crop
pipeline, and the ``--params-out`` bf16 checkpoint format — previously
copy-pasted across five probe scripts, which already caused one
measured-results drift (probe_refinement.py shipped with the stale
2-family zoo and needed patching).

BIT-EXACTNESS CONTRACT: every recorded scaling/refinement/serving table
in docs/PERFORMANCE.md regenerates its dataset from these functions
(fixed seeds).  Changing any numeric here invalidates cross-run
comparability of the probe results; tests/test_probe_script.py guards
the semantics.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from tests.fixtures import render_procedural
from nope_tpu.geometry.cropping import crop_frame
from nope_tpu.data.shapenet import SHAPENET_INTRINSIC

IMG = 256  # probe-wide crop resolution


def make_points(obj_id):
    """Procedural shape zoo.  Ids <= 67 keep the round-3 2-family rule
    bit-identical (the 8/24/64 scaling table regenerates exactly); ids
    >= 68 — only reachable by the round-4 128/256/512-object runs — draw
    from FOUR families via id%4, adding flat platelets and noisy rings
    so the train distribution spans genuinely different topologies."""
    rng = np.random.default_rng(4000 + obj_id)
    fam = obj_id % 2 if obj_id <= 67 else obj_id % 4
    if fam == 0:  # family A: isotropic blob (round-2 style)
        pts = rng.normal(size=(60, 3)) * 0.12
    elif fam == 1:  # family B: denser, elongated (bottle-like)
        pts = rng.normal(size=(110, 3)) * np.array([0.055, 0.06, 0.17])
    elif fam == 2:  # family C: flat platelet (tablet-like)
        pts = rng.normal(size=(90, 3)) * np.array([0.145, 0.125, 0.035])
    else:  # family D: noisy ring (torus-like — a hole, unlike A-C)
        th = rng.uniform(0.0, 2.0 * np.pi, 120)
        ring = np.stack([np.cos(th), np.sin(th), np.zeros_like(th)], -1) * 0.13
        pts = ring + rng.normal(size=(120, 3)) * 0.03
    cols = rng.integers(60, 255, (len(pts), 3))
    return pts, cols


def crop_u8(rgba, pose, img=IMG):
    """uint8 virtual-bbox crop of an RGBA render (alpha-composited onto
    black).  Normalization to [-1, 1] happens on device where the
    caller wants it — 4x fewer bytes everywhere and the f32 arithmetic
    is identical either side of the transfer."""
    rgb = rgba[..., :3].astype(np.float32) * (rgba[..., 3:4].astype(np.float32) / 255.0)
    return crop_frame(rgb.astype(np.uint8), mask=None, intrinsic=SHAPENET_INTRINSIC,
                      openCV_pose=pose, image_size=img, virtual_bbox_size=1.0)


def norm_np(u8):
    """uint8 [0,255] → f32 [-1,1] (the host-side twin of the on-device
    normalisation in the probes' indexed train steps)."""
    return (u8.astype(np.float32) / 255.0) * 2.0 - 1.0


def render_crop(obj_id, pose, img=IMG):
    """Full per-view pipeline: zoo points → 512 px render → crop →
    normalised f32 [-1,1].  Convenience for the eval-side scripts that
    render one view at a time."""
    pts, cols = make_points(obj_id)
    return norm_np(crop_u8(render_procedural(pose, pts, cols, img_px=512), pose, img))


def load_params_leaves(z):
    """Leaves of a ``--params-out`` checkpoint (probe_unseen_objects
    save format: ``leaf_{i}`` arrays + ``bf16_mask``; bf16 leaves are
    stored as raw u16 because np.save cannot round-trip the ml_dtypes
    descr) → numpy leaves with the bf16 views restored, in
    ``jax.tree.flatten`` order."""
    import ml_dtypes

    mask = z["bf16_mask"]
    return [
        z[f"leaf_{i}"].view(ml_dtypes.bfloat16) if mask[i] else z[f"leaf_{i}"]
        for i in range(int(z["n_leaves"]))
    ]
