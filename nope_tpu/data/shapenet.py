"""ShapeNet dataset reader (torch-free).

Re-implements ``/root/reference/src/dataloader/shapeNet.py`` on
numpy/PIL for the TPU input pipeline.  Directory layout (produced by the
offline renderer, ``src/scripts/generate_data.py``):

    root_dir/
      cad_names.txt                      # "synsetid_cadid" per line
      images/obj_{id:06d}/
        query_XXXXXX.png                 # 5 per object, RGBA 512^2
        reference_XXXXXX.png             # 5 per object
        templates_{idx:06d}.png          # 642 per object (level-2 grid)
      object_query_poses/obj_{id:06d}.npy
      object_reference_poses/obj_{id:06d}.npy
      object_template_poses/obj_{id:06d}.npy
      zip/...                            # optional corrupted-PNG rescue

Split semantics (``shapeNet.py:108-154``, seeded with 2023):

- ``training``         — 13 train categories, cads[50:] per category
- ``unseen_training``  — same categories, first 50 cads (val split)
- ``<category name>``  — unseen-category test: first 100 cads of that
  category

Items are dicts of numpy arrays, NHWC, images scaled to [-1, 1]
(matching the reference's ToTensor+2x-1 transform, ``shapeNet.py:64-69``
— but channel-last, the TPU-native layout).
"""

from __future__ import annotations

import glob
import io
import logging
import os
import os.path as osp
import random
import zipfile
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from nope_tpu.data.categories import (
    SHAPENET_ID2CAT,
    TRAIN_CATEGORIES,
    symmetry_class,
)
from nope_tpu.geometry.cropping import crop_frame
from nope_tpu.geometry import so3_grid

SHAPENET_INTRINSIC = np.array(
    [[525, 0, 256], [0, 525, 256], [0, 0, 1]], dtype=np.float64
)  # shapeNet.py:172 / blenderproc.py:104-106

_SPLIT_SEED = 2023  # shapeNet.py:35


def _rotation6d(mat: np.ndarray) -> np.ndarray:
    """matrix → first-two-rows 6d (host-side, numpy)."""
    return np.asarray(mat[:2, :], dtype=np.float32).reshape(6)


def _quaternion(mat: np.ndarray) -> np.ndarray:
    from scipy.spatial.transform import Rotation

    q = Rotation.from_matrix(mat).as_quat()  # x, y, z, w
    return np.asarray([q[3], q[0], q[1], q[2]], dtype=np.float32)


def convert_rotation(mat: np.ndarray, representation: str) -> np.ndarray:
    if representation == "rotation6d":
        return _rotation6d(mat)
    if representation == "quaternion":
        return _quaternion(mat)
    if representation == "euler_angles":
        from scipy.spatial.transform import Rotation

        return Rotation.from_matrix(mat).as_euler("XYZ").astype(np.float32)
    raise ValueError(representation)


class ShapeNetDataset:
    """Map-style dataset: ``len()`` + ``[idx] -> dict of numpy arrays``.

    Training items: query, reference, relativeR, relativeR_inv.
    Test items additionally: gt_relativeR, all_relativeR (N, 6),
    gt_templates (N, H, W, 3), query_pose (3, 3),
    template_poses (N, 3, 3), symmetry ().
    """

    def __init__(
        self,
        root_dir: str,
        split: str,
        pose_distribution: str = "upper",
        rot_representation: str = "rotation6d",
        fast_evaluation: bool = True,
        img_size: int = 256,
        level: int = 2,
        seed: int = _SPLIT_SEED,
        load_gt_templates: bool = False,
        wire_dtype: str = "float32",
        cache_crops: bool = False,
    ):
        self.root_dir = root_dir
        self.split = split
        self.pose_distribution = pose_distribution
        self.rot_representation = rot_representation
        self.fast_evaluation = fast_evaluation
        self.img_size = img_size
        self.level = level
        # "uint8": TRAINING items ship raw uint8 crops; the jitted train
        # step normalizes on device (training/train_state.py) — 4x less
        # host->device traffic.  Testing-split items keep the float
        # convention (the eval programs expect [-1, 1] inputs).
        if wire_dtype not in ("float32", "uint8"):
            raise ValueError(f"wire_dtype={wire_dtype!r}: float32 or uint8")
        self.wire_dtype = wire_dtype
        # the reference loads+crops every template IMAGE per test item
        # (shapeNet.py:287-300) purely for W&B visualization; that's ~26
        # full PNG decodes+warps per item, so it's opt-in here
        self.load_gt_templates = load_gt_templates
        # opt-in RAM cache of decoded+cropped uint8 views: the crop is a
        # pure function of the path (its pose is the path's npy row), so
        # each view decodes+warps once per process.  PNG decode is the
        # single-core host bottleneck (~40 ms/item raw vs ~0.5 ms
        # cached); the reference re-decodes from disk every epoch
        # (shapeNet.py:184).  Plain dict: safe under the thread loader
        # (GIL-atomic get/set; a race costs one duplicate decode).
        self._crop_cache: Optional[Dict[str, np.ndarray]] = (
            {} if cache_crops else None
        )
        self.is_testing_split = split != "training"
        self._rng = random.Random(seed)
        self._item_seed = seed + 1
        self._epoch = 0

        self._load_testing_template_poses()
        self._load_symmetry_mapping()
        self._load_metadata()
        logging.info("ShapeNet %s: %d query images", split, len(self.query_paths))

    # -- template grid -------------------------------------------------------

    def _load_testing_template_poses(self):
        """Fast eval uses the 26 level-0-in-level-2 indices over the
        level-2 grid (``shapeNet.py:252-263``)."""
        level = 0 if self.fast_evaluation else self.level
        self.testing_indexes, self.testing_templates_poses = (
            so3_grid.get_obj_poses_from_template_level(
                level=level,
                pose_distribution=self.pose_distribution,
                return_index=True,
            )
        )
        if self.fast_evaluation and self.level == 2:
            self.testing_indexes = so3_grid.load_index_level0_in_level2(
                self.pose_distribution
            )
        # grid indices used for training-template image paths
        self.train_indexes, _ = so3_grid.get_obj_poses_from_template_level(
            level=self.level,
            pose_distribution=self.pose_distribution,
            return_index=True,
        )

    # -- metadata ------------------------------------------------------------

    def _load_symmetry_mapping(self):
        cad_names_path = osp.join(self.root_dir, "cad_names.txt")
        with open(cad_names_path) as f:
            self.all_cad_names = [line.strip() for line in f if line.strip()]
        self.obj_name2symmetry = {}
        for idx, cad_name in enumerate(self.all_cad_names):
            cat = SHAPENET_ID2CAT[cad_name.split("_")[0]]
            self.obj_name2symmetry[f"obj_{idx:06d}"] = symmetry_class(cat)

    def _selected_object_ids(self) -> List[int]:
        """Seeded per-category shuffle + split slicing
        (``shapeNet.py:115-140``)."""
        selected_cats = (
            TRAIN_CATEGORIES
            if self.split in ("training", "unseen_training")
            else [self.split]
        )
        by_cat: Dict[str, List[int]] = {c: [] for c in selected_cats}
        for obj_id, cad_name in enumerate(self.all_cad_names):
            cat = SHAPENET_ID2CAT[cad_name.split("_")[0]]
            if cat in by_cat:
                by_cat[cat].append(obj_id)
        all_ids: List[int] = []
        for cat in selected_cats:
            self._rng.shuffle(by_cat[cat])
            if self.split == "training":
                all_ids.extend(by_cat[cat][50:])
            elif self.split == "unseen_training":
                all_ids.extend(by_cat[cat][:50])
            else:
                all_ids.extend(by_cat[cat][:100])
        return all_ids

    def _list_images(self, obj_path: str, load_all: bool) -> List[str]:
        imgs = sorted(glob.glob(osp.join(obj_path, "query_*.png")))
        if load_all:  # training uses queries+references+templates alike
            imgs += sorted(glob.glob(osp.join(obj_path, "reference_*.png")))
            imgs += [
                osp.join(obj_path, f"templates_{idx:06d}.png")
                for idx in self.train_indexes
            ]
        self._rng.shuffle(imgs)
        return imgs

    def _load_metadata(self):
        load_all = self.split == "training"
        self.query_paths: List[str] = []
        self.query_to_references: Dict[str, List[str]] = {}
        for obj_id in self._selected_object_ids():
            obj_path = osp.join(self.root_dir, "images", f"obj_{obj_id:06d}")
            if not osp.isdir(obj_path):
                logging.warning("missing object dir %s", obj_path)
                continue
            # the reference pool may include references+templates
            # (training), but anchor items are always the query images
            # (shapeNet.py:142-154: the final get_img_from_paths call
            # passes load_all=False)
            self.query_to_references[f"obj_{obj_id:06d}"] = self._list_images(
                obj_path, load_all
            )
            self.query_paths.extend(
                sorted(glob.glob(osp.join(obj_path, "query_*.png")))
            )
        self._rng.shuffle(self.query_paths)

    def __len__(self) -> int:
        return len(self.query_paths)

    # -- image / pose loading --------------------------------------------------

    def _open_with_rescue(self, path: str) -> Image.Image:
        """PIL open with the corrupted-PNG zip rescue
        (``shapeNet.py:184-210``)."""
        try:
            img = Image.open(path)
            img.load()
            return img
        except Exception:
            logging.info("image %s corrupted; trying zip rescue", path)
            obj_id = int(osp.basename(osp.dirname(path))[4:])
            seg = obj_id // 300
            zip_path = osp.join(
                self.root_dir, f"zip/{seg * 300:06d}_to_{(seg + 1) * 300:06d}.zip"
            )
            with zipfile.ZipFile(zip_path) as archive:
                inner = osp.join(osp.basename(osp.dirname(path)), osp.basename(path))
                img = Image.open(io.BytesIO(archive.read(inner)))
                img.load()
            img.save(path)
            return img

    def open_image(self, path: str) -> np.ndarray:
        """RGBA → RGB over black background (rescue-protected)."""
        img = self._open_with_rescue(path)
        arr = np.asarray(img)
        if arr.ndim == 3 and arr.shape[2] == 4:
            # native C++ composite when built; numpy fallback inside
            from nope_tpu import native

            return native.composite_rgba_black(arr)
        mask = img.getchannel("A")
        black = Image.new("RGB", img.size, (0, 0, 0))
        black.paste(img, mask=mask)
        return np.asarray(black)

    def get_pose(self, path: str) -> np.ndarray:
        obj_name = osp.basename(osp.dirname(path))
        kind = osp.basename(path).split("_")[0]
        if kind == "templates":
            kind = "template"
        idx = int(osp.basename(path).split("_")[1].split(".")[0])
        poses = np.load(osp.join(self.root_dir, f"object_{kind}_poses", obj_name + ".npy"))
        return poses[idx]

    def _crop(self, img: np.ndarray, pose: np.ndarray) -> np.ndarray:
        return crop_frame(
            img,
            mask=None,
            intrinsic=SHAPENET_INTRINSIC,
            openCV_pose=pose,
            image_size=self.img_size,
            virtual_bbox_size=1.0,
        )

    def _cropped(self, path: str, pose: np.ndarray) -> np.ndarray:
        """Decoded-and-cropped uint8 view of ``path`` (see cache_crops)."""
        if self._crop_cache is None:
            return self._crop(self.open_image(path), pose)
        out = self._crop_cache.get(path)
        if out is None:
            out = self._crop(self.open_image(path), pose)
            self._crop_cache[path] = out
        return out

    def _transform(self, img: np.ndarray) -> np.ndarray:
        """uint8 HWC → float32 [-1, 1] NHWC-item (H, W, C)."""
        return (img.astype(np.float32) / 255.0) * 2.0 - 1.0

    def _relative(self, query_pose, ref_pose):
        rel = query_pose[:3, :3] @ np.linalg.inv(ref_pose)[:3, :3]
        rel_inv = ref_pose[:3, :3] @ np.linalg.inv(query_pose)[:3, :3]
        return (
            convert_rotation(rel, self.rot_representation),
            convert_rotation(rel_inv, self.rot_representation),
        )

    def sample_reference(self, query_path: str, index: int = 0) -> str:
        """Reference-image sampling.  Unlike the reference's shared
        global RNG (racy under loader workers), the draw is a pure
        function of (seed, item index, epoch counter) — deterministic
        and thread-safe."""
        rng = random.Random(f"{self._item_seed}/{index}/{self._epoch}")
        obj_dir = osp.dirname(query_path)
        if not self.is_testing_split:
            obj_name = osp.basename(obj_dir)
            return rng.choice(self.query_to_references[obj_name])
        refs = sorted(glob.glob(osp.join(obj_dir, "reference*.png")))
        return rng.choice(refs)

    def set_epoch(self, epoch: int) -> None:
        """Advance the reference-sampling stream between epochs."""
        self._epoch = epoch

    # -- item assembly -----------------------------------------------------------

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        query_path = self.query_paths[index]
        reference_path = self.sample_reference(query_path, index)
        query_pose = self.get_pose(query_path)
        ref_pose = self.get_pose(reference_path)
        if not self.is_testing_split and self.wire_dtype == "uint8":
            # raw uint8 crops over the wire; normalization happens on
            # device inside the jitted train step
            query = self._cropped(query_path, query_pose)
            reference = self._cropped(reference_path, ref_pose)
            rel, rel_inv = self._relative(query_pose, ref_pose)
            return {
                "query": query,
                "reference": reference,
                "relativeR": rel,
                "relativeR_inv": rel_inv,
            }
        query = self._transform(self._cropped(query_path, query_pose))
        reference = self._transform(self._cropped(reference_path, ref_pose))
        rel, rel_inv = self._relative(query_pose, ref_pose)

        if not self.is_testing_split:
            return {
                "query": query,
                "reference": reference,
                "relativeR": rel,
                "relativeR_inv": rel_inv,
            }

        obj_path = osp.dirname(query_path)
        templates = None
        if self.load_gt_templates:
            templates = []
            for idx in self.testing_indexes:
                tpath = osp.join(obj_path, f"templates_{idx:06d}.png")
                templates.append(
                    self._transform(self._cropped(tpath, self.get_pose(tpath)))
                )
        all_rel = np.stack(
            [
                convert_rotation(
                    self.testing_templates_poses[i][:3, :3]
                    @ np.linalg.inv(ref_pose)[:3, :3],
                    self.rot_representation,
                )
                for i in range(len(self.testing_indexes))
            ]
        )
        obj_name = osp.basename(obj_path)
        item = {
            "query": query,
            "reference": reference,
            "gt_relativeR": rel,
            "all_relativeR": all_rel.astype(np.float32),
            "symmetry": np.asarray(self.obj_name2symmetry[obj_name], np.float32),
            "query_pose": query_pose[:3, :3].astype(np.float32),
            "template_poses": self.testing_templates_poses[:, :3, :3].astype(np.float32),
        }
        if templates is not None:
            item["gt_templates"] = np.stack(templates)
        return item


    # -- native fast path ------------------------------------------------------

    def raw_item(self, index: int) -> Dict[str, np.ndarray]:
        """Raw training item for the native collate path: undecoded-crop
        RGBA images + their crop homographies, so a whole batch can be
        composited+warped+normalized in one native call
        (``nope_tpu.native.preprocess_batch``)."""
        from nope_tpu.geometry.cropping import crop_homography

        query_path = self.query_paths[index]
        reference_path = self.sample_reference(query_path, index)
        q_pose = self.get_pose(query_path)
        r_pose = self.get_pose(reference_path)
        rel, rel_inv = self._relative(q_pose, r_pose)

        def rgba(path):
            img = self._open_with_rescue(path)
            arr = np.asarray(img)
            if arr.ndim == 2:
                arr = np.stack([arr] * 3 + [np.full_like(arr, 255)], axis=-1)
            elif arr.shape[2] == 3:
                arr = np.concatenate(
                    [arr, np.full(arr.shape[:2] + (1,), 255, np.uint8)], axis=-1
                )
            return arr

        def hom(pose):
            return crop_homography(
                SHAPENET_INTRINSIC, pose, self.img_size, virtual_bbox_size=1.0
            )

        return {
            "query_rgba": rgba(query_path),
            "query_M": hom(q_pose),
            "reference_rgba": rgba(reference_path),
            "reference_M": hom(r_pose),
            "relativeR": rel,
            "relativeR_inv": rel_inv,
        }


class NativeCollateView:
    """Wraps a ShapeNetDataset for the native batch-preprocess path:
    items are raw RGBA+homography; pair with
    :func:`nope_tpu.data.pipeline.native_collate`."""

    def __init__(self, dataset: "ShapeNetDataset"):
        if dataset.is_testing_split:
            raise ValueError("native collate path is for training items")
        self.dataset = dataset
        self.img_size = dataset.img_size

    def __len__(self) -> int:
        return len(self.dataset)

    def set_epoch(self, epoch: int) -> None:
        self.dataset.set_epoch(epoch)

    def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
        return self.dataset.raw_item(index)
