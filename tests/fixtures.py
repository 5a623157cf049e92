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
