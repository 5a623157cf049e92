"""BOP-format dataset base reader (torch-free).

Re-implements ``/root/reference/src/dataloader/baseBOP.py``: walks a
BOP-layout dataset (https://bop.felk.cvut.cz format: per-scene
``scene_gt/scene_gt_info/scene_camera`` JSONs + rgb/mask/depth folders)
into a pandas metaData frame cached as ``{split}_metaData.json``.

CAD meshes are optional here (trimesh is only needed for VSD depth
rendering, which is gated in :mod:`nope_tpu.evaluation.vsd`); object
diameters for the virtual-bbox crop come from ``models_info.json``.
"""

from __future__ import annotations

import glob
import json
import logging
import os
import os.path as osp
import time
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from nope_tpu.geometry.transforms import combine_R_and_T

_METADATA_SHUFFLE_SEED = 2021  # baseBOP.py:253


def load_json(path: str):
    with open(path) as f:
        return json.load(f)


def save_json(path: str, obj) -> None:
    def _cast(o):
        if isinstance(o, np.ndarray):
            return o.tolist()
        if isinstance(o, (np.floating, np.integer)):
            return o.item()
        raise TypeError(type(o))

    with open(path, "w") as f:
        json.dump(obj, f, indent=4, default=_cast)


class BaseBOP:
    def __init__(self, root_dir: str, split: str, **kwargs):
        self.root_dir = root_dir
        self.split = split

    # -- scenes ----------------------------------------------------------------

    def load_list_scene(self, split=None) -> None:
        if isinstance(split, str):
            split_folder = osp.join(self.root_dir, split)
            self.list_scenes = sorted(
                osp.join(split_folder, s)
                for s in os.listdir(split_folder)
                if osp.isdir(osp.join(split_folder, s)) and s != "models"
            )
        elif isinstance(split, (list, tuple)):
            self.list_scenes = sorted(
                osp.join(self.root_dir, s if isinstance(s, str) else f"{s:06d}")
                for s in split
                if osp.isdir(
                    osp.join(self.root_dir, s if isinstance(s, str) else f"{s:06d}")
                )
            )
        else:
            raise NotImplementedError(type(split))
        logging.info("found %d scenes", len(self.list_scenes))

    # -- metaData ---------------------------------------------------------------

    def load_metaData(self, reset_metaData: bool = False, mode: str = "query",
                      split: str = "test", level: int = 2) -> pd.DataFrame:
        """Build (or load the cached) per-object-instance frame table
        (``baseBOP.py:93-260``).  Template neighbour columns
        (idx_template/inplane) are filled when a per-scene
        ``template_level{level}.json`` exists, else left None."""
        start = time.time()
        if mode == "template":
            rows = [
                {"obj_id": obj_id, "idx_template": i}
                for obj_id in self.obj_ids
                for i in range(len(self.templates_poses))
            ]
            self.metaData = pd.DataFrame(rows)
        else:
            cache_path = osp.join(self.root_dir, f"{split}_metaData.json")
            if not reset_metaData and osp.exists(cache_path):
                self.metaData = pd.DataFrame.from_dict(
                    load_json(cache_path), orient="index"
                ).transpose()
            else:
                self.metaData = pd.DataFrame(self._scan_scenes(level))
                save_json(cache_path, {
                    k: list(self.metaData[k]) for k in self.metaData.columns
                })
        self.metaData = self.metaData.sample(
            frac=1, random_state=_METADATA_SHUFFLE_SEED
        ).reset_index(drop=True)
        logging.info(
            "metaData: %d rows in %.2fs", len(self.metaData), time.time() - start
        )
        return self.metaData

    def _scan_scenes(self, level: int) -> List[Dict]:
        rows: List[Dict] = []
        for scene_path in self.list_scenes:
            scene_id = scene_path.split("/")[-1]
            rgb_paths = sorted(glob.glob(osp.join(scene_path, "rgb", "*.png")))
            mask_paths = set(glob.glob(osp.join(scene_path, "mask", "*.png")))
            mask_visib_paths = set(glob.glob(osp.join(scene_path, "mask_visib", "*.png")))
            depth_paths = set(glob.glob(osp.join(scene_path, "depth", "*.png")))

            meta = {}
            for name in ("scene_gt", "scene_gt_info", "scene_camera"):
                p = osp.join(scene_path, name + ".json")
                meta[name] = load_json(p) if osp.exists(p) else None
            template_path = osp.join(scene_path, f"template_level{level}.json")
            templates_meta = load_json(template_path) if osp.exists(template_path) else None

            for rgb_path in rgb_paths:
                frame_id = int(osp.basename(rgb_path).split(".")[0])
                frame_gt = meta["scene_gt"][str(frame_id)]
                frame_info = (
                    meta["scene_gt_info"][str(frame_id)]
                    if meta["scene_gt_info"] is not None
                    else [{}] * len(frame_gt)
                )
                templates_frame = (
                    templates_meta[str(frame_id)] if templates_meta else None
                )
                for idx_obj, gt in enumerate(frame_gt):
                    obj_id = int(gt["obj_id"])
                    pose = combine_R_and_T(gt["cam_R_m2c"], gt["cam_t_m2c"])
                    mask_path = osp.join(
                        scene_path, "mask", f"{frame_id:06d}_{idx_obj:06d}.png"
                    )
                    mask_scene = osp.join(scene_path, "mask", f"{frame_id:06d}.png")
                    mask_visib = osp.join(
                        scene_path, "mask_visib", f"{frame_id:06d}_{idx_obj:06d}.png"
                    )
                    depth = osp.join(scene_path, "depth", f"{frame_id:06d}.png")
                    info = frame_info[idx_obj] if idx_obj < len(frame_info) else {}
                    rows.append(
                        {
                            "scene_id": scene_id,
                            "frame_id": frame_id,
                            "obj_id": obj_id,
                            "idx_obj": idx_obj,
                            "pose": pose.reshape(-1).tolist(),
                            "rgb_path": rgb_path,
                            "mask_path": (
                                mask_path if mask_path in mask_paths
                                else mask_scene if mask_scene in mask_paths
                                else None
                            ),
                            "mask_visib_path": (
                                mask_visib if mask_visib in mask_visib_paths else None
                            ),
                            "depth_path": depth if depth in depth_paths else None,
                            "intrinsic": list(
                                meta["scene_camera"][str(frame_id)]["cam_K"]
                            ),
                            "visib_fract": info.get("visib_fract", 1.0),
                            "bbox_obj": info.get("bbox_obj"),
                            "bbox_visib": info.get("bbox_visib"),
                            "idx_template": (
                                templates_frame[idx_obj]["idx_template"]
                                if templates_frame
                                else None
                            ),
                            "inplane": (
                                templates_frame[idx_obj]["inplane"]
                                if templates_frame
                                else None
                            ),
                        }
                    )
        return rows

    def check_scene(
        self,
        scene_id: str,
        save_path: str,
        n_frames: int = 5,
        points_per_object: int = 500,
        seed: int = 0,
    ) -> List[str]:
        """Debug scene visualization (``baseBOP.py:309-343``): project
        area-sampled CAD surface points through each instance's GT pose
        onto random frames of a scene, one color per object.  Uses
        trimesh meshes when loaded, else the dependency-free loader in
        :mod:`nope_tpu.evaluation.raster`.  Returns the written paths."""
        import cv2

        from nope_tpu.evaluation import raster

        os.makedirs(save_path, exist_ok=True)
        rng = np.random.default_rng(seed)
        scene = self.metaData[self.metaData["scene_id"] == scene_id]
        if not len(scene):
            raise ValueError(f"no metaData rows for scene {scene_id!r}")
        frame_ids = sorted(set(int(f) for f in scene["frame_id"].values))
        chosen = rng.choice(
            frame_ids, size=min(n_frames, len(frame_ids)), replace=False
        )
        colors = {
            cad_id: tuple(int(c) for c in rng.integers(0, 254, 3))
            for cad_id in self.cads
        }
        written: List[str] = []
        for frame_id in chosen:
            fd = scene[scene["frame_id"] == int(frame_id)]
            img = cv2.imread(str(fd["rgb_path"].values[0]))
            K = np.asarray(fd["intrinsic"].values[0], dtype=np.float64).reshape(3, 3)
            h, w = img.shape[:2]
            for _, row in fd.iterrows():
                cad = self.cads[int(row["obj_id"])]
                if cad.get("mesh") is not None:
                    import trimesh

                    pts = trimesh.sample.sample_surface(
                        cad["mesh"], points_per_object
                    )[0]
                else:
                    verts, faces = raster.load_mesh_arrays(cad["cad_path"])
                    pts = raster.sample_surface(verts, faces, points_per_object, rng)
                pose = np.asarray(row["pose"], dtype=np.float64).reshape(4, 4)
                cam = pts @ pose[:3, :3].T + pose[:3, 3]
                front = cam[:, 2] > 1e-6
                uv = cam[front] @ K.T
                uv = (uv[:, :2] / uv[:, 2:3]).astype(int)
                for u, v in uv:
                    if 0 <= u < w and 0 <= v < h:
                        cv2.circle(img, (int(u), int(v)), 1, colors[int(row["obj_id"])], -1)
            out = osp.join(save_path, f"{scene_id}_{int(frame_id)}.png")
            cv2.imwrite(out, img)
            written.append(out)
        return written

    # -- CAD models ---------------------------------------------------------------

    def load_cad(self, cad_name: str = "models") -> Dict[int, Dict]:
        """Model info (diameters etc.) always; trimesh meshes only when
        trimesh is installed (``baseBOP.py:275-301``)."""
        cad_dir = osp.join(self.root_dir, "models", cad_name)
        models_info = load_json(osp.join(cad_dir, "models_info.json"))
        try:
            from nope_tpu.utils.mesh import load_mesh  # trimesh-gated

            have_trimesh = True
        except Exception:
            have_trimesh = False
        self.cads: Dict[int, Dict] = {}
        for fname in sorted(os.listdir(cad_dir)):
            if not fname.endswith(".ply") or fname.endswith("_old.ply"):
                continue
            cad_id = int(fname.split(".")[0].replace("obj_", ""))
            cad_path = osp.join(cad_dir, fname)
            mesh = load_mesh(cad_path) if have_trimesh else None
            info = models_info.get(str(cad_id), models_info.get(cad_id))
            self.cads[cad_id] = {
                "mesh": mesh,
                "cad_path": cad_path,
                "model_info": info,
            }
        logging.info("loaded %d CAD entries", len(self.cads))
        return self.cads
