"""Shared synthetic dataset builders for tests."""

import os
import os.path as osp

import numpy as np
from PIL import Image

from nope_tpu.data.categories import SHAPENET_CAT2ID
from nope_tpu.geometry import so3_grid

N_QUERY, N_REF = 3, 2


def make_shapenet_object(root, obj_id, rng, template_indexes, img_px=128):
    obj_dir = osp.join(root, "images", f"obj_{obj_id:06d}")
    os.makedirs(obj_dir, exist_ok=True)
    grid = so3_grid.load_obj_poses(2)

    def save_img(path):
        arr = rng.integers(0, 255, (img_px, img_px, 4), dtype=np.uint8)
        arr[..., 3] = (arr[..., 0] > 64) * 255
        Image.fromarray(arr, "RGBA").save(path)

    def poses(n, scale=2.0):
        sel = grid[rng.integers(0, len(grid), n)].copy()
        sel[:, :3, 3] *= scale
        return sel

    for kind, n in (("query", N_QUERY), ("reference", N_REF)):
        for i in range(n):
            save_img(osp.join(obj_dir, f"{kind}_{i:06d}.png"))
        os.makedirs(osp.join(root, f"object_{kind}_poses"), exist_ok=True)
        np.save(
            osp.join(root, f"object_{kind}_poses", f"obj_{obj_id:06d}.npy"), poses(n)
        )

    for idx in template_indexes:
        save_img(osp.join(obj_dir, f"templates_{idx:06d}.png"))
    os.makedirs(osp.join(root, "object_template_poses"), exist_ok=True)
    template_poses = grid.copy()
    template_poses[:, :3, 3] *= 2.0
    np.save(
        osp.join(root, "object_template_poses", f"obj_{obj_id:06d}.npy"), template_poses
    )


def make_mini_shapenet(root, categories=("bottle", "airplane"), objects_per_cat=2,
                       seed=0):
    """Mini ShapeNet root with template images at the fast-eval indexes."""
    rng = np.random.default_rng(seed)
    tidx = so3_grid.load_index_level0_in_level2("upper")
    cad_names = [
        f"{SHAPENET_CAT2ID[cat]}_cad{j}"
        for cat in categories
        for j in range(objects_per_cat)
    ]
    os.makedirs(root, exist_ok=True)
    with open(osp.join(root, "cad_names.txt"), "w") as f:
        f.write("\n".join(cad_names) + "\n")
    for obj_id in range(len(cad_names)):
        make_shapenet_object(root, obj_id, rng, tidx)
    return root


def render_procedural(pose, points, colors, img_px=512):
    """Deterministic RGBA render of a seeded point cloud under an OpenCV
    object pose with the dataset's K (525/256 at 512^2): a learnable
    stand-in for BlenderProc output."""
    K = np.array([[525.0, 0, 256], [0, 525.0, 256], [0, 0, 1]])
    scale = img_px / 512.0
    cam = points @ pose[:3, :3].T + pose[:3, 3]
    uv = cam @ (K * np.array([[scale], [scale], [1.0]])).T
    uv = (uv[:, :2] / uv[:, 2:3]).astype(int)
    img = np.zeros((img_px, img_px, 4), np.uint8)
    order = np.argsort(-cam[:, 2])  # far to near
    r = max(2, img_px // 64)
    for i in order:
        u, v = uv[i]
        if -r < u < img_px + r and -r < v < img_px + r:
            u0, u1 = max(0, u - r), min(img_px, u + r)
            v0, v1 = max(0, v - r), min(img_px, v + r)
            img[v0:v1, u0:u1, :3] = colors[i]
            img[v0:v1, u0:u1, 3] = 255
    return img


def make_procedural_object(root, obj_id, template_indexes, img_px=512):
    """Like make_shapenet_object but images are rendered from their
    poses, so pose↔pixels is learnable."""
    from PIL import Image

    from nope_tpu.geometry import so3_grid

    obj_dir = osp.join(root, "images", f"obj_{obj_id:06d}")
    os.makedirs(obj_dir, exist_ok=True)
    rng = np.random.default_rng(1000 + obj_id)
    points = rng.normal(size=(60, 3)) * 0.12
    colors = rng.integers(60, 255, (60, 3))

    grid = so3_grid.load_obj_poses(2)
    pose_rng = np.random.default_rng(2000 + obj_id)

    def save(pose, path):
        Image.fromarray(render_procedural(pose, points, colors, img_px), "RGBA").save(path)

    for kind, n in (("query", N_QUERY), ("reference", N_REF)):
        sel = grid[pose_rng.integers(0, len(grid), n)].copy()
        sel[:, :3, 3] *= 2.0
        os.makedirs(osp.join(root, f"object_{kind}_poses"), exist_ok=True)
        np.save(osp.join(root, f"object_{kind}_poses", f"obj_{obj_id:06d}.npy"), sel)
        for i in range(n):
            save(sel[i], osp.join(obj_dir, f"{kind}_{i:06d}.png"))

    template_poses = grid.copy()
    template_poses[:, :3, 3] *= 2.0
    os.makedirs(osp.join(root, "object_template_poses"), exist_ok=True)
    np.save(osp.join(root, "object_template_poses", f"obj_{obj_id:06d}.npy"),
            template_poses)
    for idx in template_indexes:
        save(template_poses[idx], osp.join(obj_dir, f"templates_{idx:06d}.png"))


def make_procedural_shapenet(root, categories=("bottle",), objects_per_cat=2,
                             img_px=512):
    from nope_tpu.data.categories import SHAPENET_CAT2ID
    from nope_tpu.geometry import so3_grid

    tidx = so3_grid.load_index_level0_in_level2("upper")
    cad_names = [
        f"{SHAPENET_CAT2ID[cat]}_cad{j}"
        for cat in categories
        for j in range(objects_per_cat)
    ]
    os.makedirs(root, exist_ok=True)
    with open(osp.join(root, "cad_names.txt"), "w") as f:
        f.write("\n".join(cad_names) + "\n")
    for obj_id in range(len(cad_names)):
        make_procedural_object(root, obj_id, tidx, img_px=img_px)
    return root
