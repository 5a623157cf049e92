"""Shared synthetic dataset builders for tests."""

import os
import os.path as osp

import numpy as np
from PIL import Image

from nope_tpu.data.categories import SHAPENET_CAT2ID
from nope_tpu.geometry import so3_grid

N_QUERY, N_REF = 3, 2


def make_shapenet_object(root, obj_id, rng, template_indexes, img_px=128,
                         with_templates=True):
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

    if not with_templates:
        return
    first = None
    for idx in template_indexes:
        path = osp.join(obj_dir, f"templates_{idx:06d}.png")
        if first is None:
            save_img(path)
            first = path
        else:  # hardlink: full-grid template sets stay cheap to build
            os.link(first, path)
    os.makedirs(osp.join(root, "object_template_poses"), exist_ok=True)
    template_poses = grid.copy()
    template_poses[:, :3, 3] *= 2.0
    np.save(
        osp.join(root, "object_template_poses", f"obj_{obj_id:06d}.npy"), template_poses
    )


def write_ascii_ply_box(path, extents=(60.0, 80.0, 100.0)):
    """A real (ascii) PLY box CAD, loadable by evaluation.raster."""
    from nope_tpu.evaluation.raster import box_mesh

    verts, faces = box_mesh(extents)
    with open(path, "w") as fh:
        fh.write("ply\nformat ascii 1.0\n")
        fh.write(f"element vertex {len(verts)}\n")
        fh.write("property float x\nproperty float y\nproperty float z\n")
        fh.write(f"element face {len(faces)}\n")
        fh.write("property list uchar int vertex_indices\nend_header\n")
        for v in verts:
            fh.write(f"{v[0]} {v[1]} {v[2]}\n")
        for f in faces:
            fh.write(f"3 {f[0]} {f[1]} {f[2]}\n")


def make_mini_bop(root, n_frames=6, split="test", img_px=128, seed=0,
                  cad_name="models", real_cad=False):
    """Synthetic BOP-format dataset: one scene with rgb/mask/depth per
    frame + scene_gt/scene_gt_info/scene_camera JSONs + a CAD stub."""
    import json

    rng = np.random.default_rng(seed)
    scene_dir = osp.join(root, split, "000001")
    for sub in ("rgb", "mask", "mask_visib", "depth"):
        os.makedirs(osp.join(scene_dir, sub), exist_ok=True)

    grid = so3_grid.get_obj_poses_from_template_level(2, "upper")
    K = [500.0, 0.0, 64.0, 0.0, 500.0, 64.0, 0.0, 0.0, 1.0]

    scene_gt, scene_gt_info, scene_camera = {}, {}, {}
    for f in range(n_frames):
        pose = grid[rng.integers(0, len(grid))].copy()
        pose[:3, 3] = [0.0, 0.0, 500.0]
        scene_gt[str(f)] = [
            {
                "obj_id": 1,
                "cam_R_m2c": pose[:3, :3].reshape(-1).tolist(),
                "cam_t_m2c": pose[:3, 3].tolist(),
            }
        ]
        scene_gt_info[str(f)] = [
            {"visib_fract": 1.0 if f < n_frames - 1 else 0.5,
             "bbox_obj": [0, 0, 10, 10], "bbox_visib": [0, 0, 10, 10]}
        ]
        scene_camera[str(f)] = {"cam_K": K, "depth_scale": 0.1}

        img = rng.integers(0, 255, (img_px, img_px, 3), dtype=np.uint8)
        Image.fromarray(img).save(osp.join(scene_dir, "rgb", f"{f:06d}.png"))
        mask = np.full((img_px, img_px), 255, np.uint8)
        Image.fromarray(mask).save(osp.join(scene_dir, "mask", f"{f:06d}_000000.png"))
        Image.fromarray(mask).save(
            osp.join(scene_dir, "mask_visib", f"{f:06d}_000000.png")
        )
        depth = rng.integers(4000, 6000, (img_px, img_px), dtype=np.uint16)
        Image.fromarray(depth).save(osp.join(scene_dir, "depth", f"{f:06d}.png"))

    for name, obj in (
        ("scene_gt", scene_gt),
        ("scene_gt_info", scene_gt_info),
        ("scene_camera", scene_camera),
    ):
        with open(osp.join(scene_dir, name + ".json"), "w") as fp:
            json.dump(obj, fp)

    cad_dir = osp.join(root, "models", cad_name)
    os.makedirs(cad_dir, exist_ok=True)
    if real_cad:
        write_ascii_ply_box(osp.join(cad_dir, "obj_000001.ply"))
    else:
        with open(osp.join(cad_dir, "obj_000001.ply"), "w") as fp:
            fp.write("ply\n")  # placeholder; meshes gated behind trimesh
    with open(osp.join(cad_dir, "models_info.json"), "w") as fp:
        json.dump({"1": {"diameter": 100.0}}, fp)
    return root


def make_mini_objaverse(root, n_objects=2, img_px=64, seed=0):
    """Synthetic Objaverse root: 10 RGBA renders per object +
    (10, 4, 4) pose arrays, the layout objaverse.py expects."""
    rng = np.random.default_rng(seed)
    grid = so3_grid.load_obj_poses(2)
    os.makedirs(osp.join(root, "object_poses"), exist_ok=True)
    for obj_id in range(n_objects):
        obj_dir = osp.join(root, "images", f"obj_{obj_id:06d}")
        os.makedirs(obj_dir, exist_ok=True)
        poses = grid[rng.integers(0, len(grid), 10)].copy()
        poses[:, :3, 3] *= 2.0
        np.save(osp.join(root, "object_poses", f"obj_{obj_id:06d}.npy"), poses)
        for k in range(10):
            arr = rng.integers(0, 255, (img_px, img_px, 4), dtype=np.uint8)
            arr[..., 3] = (arr[..., 0] > 64) * 255
            Image.fromarray(arr, "RGBA").save(osp.join(obj_dir, f"{k}.png"))
    return root


def make_mini_shapenet(root, categories=("bottle", "airplane"), objects_per_cat=2,
                       seed=0, img_px=128, with_templates=True,
                       template_set="fast"):
    """Mini ShapeNet root with template images at the fast-eval indexes
    (``template_set="full"`` links images for the whole level-2 grid,
    which the training reference pool samples from)."""
    rng = np.random.default_rng(seed)
    if template_set == "full":
        tidx, _ = so3_grid.get_obj_poses_from_template_level(
            2, "upper", return_index=True
        )
    else:
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
        make_shapenet_object(root, obj_id, rng, tidx, img_px=img_px,
                             with_templates=with_templates)
    return root


def render_procedural(pose, points, colors, img_px=512):
    """Deterministic RGBA render of a seeded point cloud under an OpenCV
    object pose with the dataset's K (525/256 at 512^2): a learnable
    stand-in for BlenderProc output.

    Points render as depth-weighted gaussian splats, so pixels are a
    SMOOTH function of the pose — like a shaded surface render and
    unlike hard sprites, whose pixel-jumps between nearby views make
    the view-embedding map discontinuous and retrieval unlearnable.
    """
    K = np.array([[525.0, 0, 256], [0, 525.0, 256], [0, 0, 1]])
    scale = img_px / 512.0
    cam = (points @ pose[:3, :3].T + pose[:3, 3]).astype(np.float32)
    uv = cam @ (K * np.array([[scale], [scale], [1.0]])).astype(np.float32).T
    uv = uv[:, :2] / uv[:, 2:3]
    sigma = img_px / 36.0
    r = int(3.0 * sigma)
    wsum = np.zeros((img_px, img_px), np.float32)
    crgb = np.zeros((img_px, img_px, 3), np.float32)
    cols_f = colors.astype(np.float32)
    for i in range(len(points)):
        # each splat only touches its +-3 sigma window
        u, v = uv[i]
        u0, u1 = max(0, int(u) - r), min(img_px, int(u) + r + 1)
        v0, v1 = max(0, int(v) - r), min(img_px, int(v) + r + 1)
        if u0 >= u1 or v0 >= v1:
            continue
        xs = np.arange(u0, u1, dtype=np.float32) - u
        ys = np.arange(v0, v1, dtype=np.float32) - v
        d2 = ys[:, None] ** 2 + xs[None, :] ** 2
        # nearer points dominate: inverse-square depth weighting
        w = np.exp(-d2 / (2.0 * sigma * sigma)) / (cam[i, 2] ** 2)
        wsum[v0:v1, u0:u1] += w
        crgb[v0:v1, u0:u1] += w[:, :, None] * cols_f[i]
    rgb = (crgb / (wsum[:, :, None] + 1e-12)).transpose(2, 0, 1)
    alpha = np.clip(wsum * (np.median(cam[:, 2]) ** 2) * 4.0, 0.0, 1.0)
    img = np.zeros((img_px, img_px, 4), np.uint8)
    img[..., :3] = np.clip(rgb * alpha[None], 0, 255).transpose(1, 2, 0)
    img[..., 3] = (alpha * 255).astype(np.uint8)
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
    # query/reference poses are CONTINUOUS upper-hemisphere samples,
    # exactly the reference's render protocol (generate_data.py:50-88:
    # azimuth U(0, 2pi), elevation U(0, pi/2)) — grid-valued queries
    # would quantize the error scale and make untrained baselines
    # degenerate; lower-hemisphere queries would be unretrievable
    # against the upper-only template grid
    from nope_tpu.scripts.generate_data import sample_camera_poses

    pose_rng = np.random.default_rng(2000 + obj_id)

    def save(pose, path):
        Image.fromarray(render_procedural(pose, points, colors, img_px), "RGBA").save(path)

    for kind, n in (("query", N_QUERY), ("reference", N_REF)):
        # radius 1.0 matches the x2.0-scaled grid templates (grid
        # stores 0.5 m camera distance)
        sel = sample_camera_poses(pose_rng, n, 1.0)
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
