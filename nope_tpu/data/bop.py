"""BOP training/eval dataset (T-LESS and the texture-training BOP sets).

Re-implements ``/root/reference/src/dataloader/bop.py`` with its drift
fixed: the reference's test branch raises NotImplementedError
(``bop.py:298-299``) even though ``eval_vsd`` consumes test batches —
here the test branch is implemented and emits the per-frame record
schema the VSD evaluator actually needs (query_translation, intrinsic,
depth_path, obj_id, template poses; cf. ``model.py:391-541`` and
``vsd.py:139-161``).

Filters (training): visib_fract >= 0.95 keep, first-90% subsample per
object, optional upper-hemisphere filter; in-plane rotation is stripped
from poses via the nearest-template decomposition before computing ΔR
(``bop.py:234-240,284-287``).
"""

from __future__ import annotations

import json
import logging
import os.path as osp
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from nope_tpu.data.base_bop import BaseBOP, load_json
from nope_tpu.data.shapenet import convert_rotation
from nope_tpu.geometry.cropping import crop_frame
from nope_tpu.geometry.so3_grid import (
    NearestTemplateFinder,
    get_obj_poses_from_template_level,
)
from nope_tpu.geometry.transforms import inverse_transform


class BOPDataset(BaseBOP):
    def __init__(
        self,
        root_dir: str,
        template_dir: Optional[str],
        split: str,
        obj_ids=None,
        img_size: int = 256,
        virtual_bbox_size: Optional[float] = None,
        reset_metaData: bool = False,
        pose_distribution: str = "upper",
        rot_representation: str = "rotation6d",
        isTesting: bool = False,
        bop19_test_list: Optional[str] = None,
        seed: int = 2022,
        **kwargs,
    ):
        super().__init__(root_dir, split)
        self.template_dir = template_dir
        self.rot_representation = rot_representation
        self.pose_distribution = pose_distribution
        self.img_size = img_size
        self.virtual_bbox_size = virtual_bbox_size
        self._seed = seed
        self._epoch = 0
        self._rng = np.random.default_rng(seed)

        if isinstance(obj_ids, str):
            obj_ids = [int(x) for x in obj_ids.split(",")]

        self.load_list_scene(split=split)
        self._load_template_poses()
        self.load_cad(cad_name="models_cad" if "tless" in root_dir else "models")
        self.load_metaData(reset_metaData=reset_metaData, mode="query", split=split)
        self.obj_ids = (
            obj_ids if obj_ids is not None
            else sorted(np.unique(self.metaData["obj_id"]).tolist())
        )
        self.metaData.reset_index(inplace=True)

        self.isTesting = isTesting or split.startswith("test")
        if not self.isTesting and (
            split.startswith("train") or split.startswith("val")
        ):
            self.metaData = self._subsample(self.metaData, 90)
        else:
            self.metaData = self._subsample(self.metaData, 100)
        self._filter_upper_hemisphere()
        if bop19_test_list is not None:
            self._filter_bop19(bop19_test_list)

        self.nearest_pose_finder = NearestTemplateFinder(
            level_templates=2, pose_distribution="upper", return_inplane=True
        )
        self.neighbor_poses = get_obj_poses_from_template_level(
            level=2, pose_distribution="all"
        )
        logging.info(
            "BOP %s: %d items, objects %s", split, len(self.metaData), self.obj_ids
        )

    # -- setup helpers -----------------------------------------------------------

    def _load_template_poses(self):
        if self.template_dir and osp.exists(osp.join(self.template_dir, "obj_poses.npy")):
            self.templates_poses = np.load(osp.join(self.template_dir, "obj_poses.npy"))
        else:
            self.templates_poses = get_obj_poses_from_template_level(2, "all")
        self.testing_indexes, self.testing_templates_poses = (
            get_obj_poses_from_template_level(
                level=2, pose_distribution=self.pose_distribution, return_index=True
            )
        )

    def _subsample(self, df, percentage: int):
        """visib_fract >= 0.95 keep (training) + keep-first percentage
        per object (``bop.py:141-168``)."""
        index = np.arange(len(df))
        selected: List[int] = []
        for obj_id in self.obj_ids:
            if self.isTesting:
                sel = index[df["obj_id"] == obj_id]
            else:
                sel = index[
                    np.logical_and(df["obj_id"] == obj_id, df["visib_fract"] >= 0.95)
                ]
            if percentage > 50:
                sel = sel[: int(percentage / 100 * len(sel))]
            else:
                sel = sel[int((1 - percentage / 100) * len(sel)):]
            selected.extend(sel.tolist())
        out = df.iloc[selected]
        logging.info("subsampled %d -> %d (%d%%)", len(df), len(out), percentage)
        return out.reset_index(drop=True)

    def _filter_upper_hemisphere(self):
        if self.pose_distribution != "upper":
            return
        keep = []
        for idx in range(len(self.metaData)):
            pose = np.asarray(self.metaData.iloc[idx]["pose"]).reshape(4, 4)
            if inverse_transform(pose)[2, 3] >= 0.0:
                keep.append(idx)
        before = len(self.metaData)
        self.metaData = self.metaData.iloc[keep].reset_index(drop=True)
        logging.info("upper-hemisphere filter: %d -> %d", before, len(self.metaData))

    def _filter_bop19(self, list_path: str):
        """Keep only (scene, frame) pairs in the BOP'19 test list.  The
        reference reads a JSON shipped next to the dataloader that is
        absent from its repo (``bop.py:88-109``, SURVEY drift item 4) —
        here the path is explicit."""
        with open(list_path) as f:
            pairs = json.load(f)
        if isinstance(pairs, dict):  # {scene_id: [frame_id...]} or columns
            wanted = {
                (int(s), int(fr)) for s, frames in pairs.items() for fr in np.atleast_1d(frames)
            }
        else:
            wanted = {(int(s), int(fr)) for s, fr in pairs}
        keep = [
            i
            for i in range(len(self.metaData))
            if (int(self.metaData.iloc[i]["scene_id"]), int(self.metaData.iloc[i]["frame_id"]))
            in wanted
        ]
        before = len(self.metaData)
        self.metaData = self.metaData.iloc[keep].reset_index(drop=True)
        logging.info("BOP19 list filter: %d -> %d", before, len(self.metaData))

    def __len__(self) -> int:
        return len(self.metaData)

    def set_epoch(self, epoch: int) -> None:
        """Advance the deterministic reference-sampling stream."""
        self._epoch = epoch

    # -- item loading ----------------------------------------------------------------

    def _crop(self, img: np.ndarray, pose: np.ndarray, K: np.ndarray, diameter: float):
        """Diameter-scaled virtual-bbox crop; BOP poses are in mm —
        convert to meters like the reference (``bop.py:188-210``)."""
        vbox = diameter * 1.2 if self.virtual_bbox_size is None else self.virtual_bbox_size
        pose_m = np.array(pose, dtype=np.float64)
        pose_m[:3, 3] /= 1000.0
        return crop_frame(
            img, None, intrinsic=K, openCV_pose=pose_m,
            image_size=self.img_size, virtual_bbox_size=vbox / 1000.0,
        )

    def _load_image(self, row) -> tuple[np.ndarray, np.ndarray]:
        rgb = Image.open(row["rgb_path"]).convert("RGB")
        mask = Image.open(row["mask_path"])
        mask_arr = np.asarray(mask)
        if mask_arr.ndim == 3:
            mask = Image.fromarray(mask_arr[:, :, 0].astype(np.uint8))
        black = Image.new("RGB", rgb.size, (0, 0, 0))
        black.paste(rgb, mask=mask)
        K = np.asarray(row["intrinsic"], dtype=np.float64).reshape(3, 3)
        pose = np.asarray(row["pose"], dtype=np.float64).reshape(4, 4)
        diameter = self.cads[int(row["obj_id"])]["model_info"]["diameter"]
        return self._crop(np.asarray(black), pose, K, diameter), pose

    def _decompose(self, pose: np.ndarray):
        """Strip in-plane rotation: snap to the nearest grid template
        (``bop.py:234-240``)."""
        idx, inplane = self.nearest_pose_finder.search_nearest_template(
            pose.reshape(-1, 4, 4)
        )
        updated = np.array(self.neighbor_poses[idx[0]])
        updated[:3, 3] = pose[:3, 3]
        return inplane[0], updated

    def _transform(self, img: np.ndarray) -> np.ndarray:
        return (img.astype(np.float32) / 255.0) * 2.0 - 1.0

    def __getitem__(self, idx: int) -> Dict[str, np.ndarray]:
        row = self.metaData.iloc[idx]
        query, query_pose = self._load_image(row)

        # reference: same object, same scene, unoccluded (bop.py:261-282)
        same = np.logical_and(
            self.metaData["obj_id"] == row["obj_id"],
            self.metaData["scene_id"] == row["scene_id"],
        )
        same = np.logical_and(same, self.metaData["visib_fract"] >= 0.95)
        if not np.any(same):
            same = np.logical_and(
                self.metaData["obj_id"] == row["obj_id"],
                self.metaData["visib_fract"] >= 0.95,
            )
        candidates = self.metaData[same].reset_index(drop=True)
        # deterministic, thread-safe draw per (seed, item index, epoch)
        draw = np.random.default_rng(
            [self._seed, idx, self._epoch]
        ).integers(len(candidates))
        ref_row = candidates.iloc[int(draw)]
        reference, reference_pose = self._load_image(ref_row)

        _, q_wo_inp = self._decompose(query_pose)
        _, r_wo_inp = self._decompose(reference_pose)
        rel = q_wo_inp[:3, :3] @ np.linalg.inv(r_wo_inp)[:3, :3]
        rel_inv = r_wo_inp[:3, :3] @ np.linalg.inv(q_wo_inp)[:3, :3]

        item = {
            "query": self._transform(query),
            "reference": self._transform(reference),
            "relativeR": convert_rotation(rel, self.rot_representation),
            "relativeR_inv": convert_rotation(rel_inv, self.rot_representation),
        }
        if not self.isTesting:
            return item

        # test extras for the VSD evaluator (fixes reference drift #5)
        gt_relativeR = item.pop("relativeR")
        all_rel = np.stack(
            [
                convert_rotation(
                    self.testing_templates_poses[i][:3, :3]
                    @ np.linalg.inv(r_wo_inp)[:3, :3],
                    self.rot_representation,
                )
                for i in range(len(self.testing_templates_poses))
            ]
        ).astype(np.float32)
        return {
            **item,
            "gt_relativeR": gt_relativeR,
            "all_relativeR": all_rel,
            "query_pose": q_wo_inp[:3, :3].astype(np.float32),
            "query_translation": np.asarray(query_pose[:3, 3], np.float32),
            "template_poses": self.testing_templates_poses[:, :3, :3].astype(np.float32),
            "intrinsic": np.asarray(row["intrinsic"], np.float32).reshape(3, 3),
            "depth_path": str(row["depth_path"]),
            "obj_id": np.asarray(int(row["obj_id"]), np.int32),
        }
