"""Reference-source parity of the data layer's split semantics.

Executes the reference's OWN ``ShapeNet`` class
(``/root/reference/src/dataloader/shapeNet.py``) against a synthetic
root and asserts our reader makes the identical seeded decisions:

- the per-category ``seed_everything(2023)``-shuffled object selection
  (``shapeNet.py:115-140``: ``[:100]`` unseen-category slice, ``[:50]``
  unseen-instance slice), including SELECTION ORDER — ours consumes a
  ``random.Random(2023)`` stream exactly like the reference consumes
  the freshly-seeded global one;
- the query universe and per-object reference pools
  (``shapeNet.py:88-154``);
- the bottle→class-2 symmetry mapping (``shapeNet.py:156-165``);
- the fast-eval template indexes (26 level-0-in-level-2,
  ``shapeNet.py:252-263``).

The roots use more objects than the split slices (120 bottles vs the
100-cap, 60 airplanes vs the 50-cap) so WHICH objects are selected is a
real seeded decision, not "everything".
"""

import os
import os.path as osp
import random

import numpy as np
import pytest

import refshim

from nope_tpu.data.categories import SHAPENET_CAT2ID
from nope_tpu.data.shapenet import ShapeNetDataset


def _make_root(tmp_path, n_bottle=120, n_airplane=60, n_query=3):
    cads = [f"{SHAPENET_CAT2ID['bottle']}_b{j}" for j in range(n_bottle)] + [
        f"{SHAPENET_CAT2ID['airplane']}_a{j}" for j in range(n_airplane)
    ]
    root = str(tmp_path)
    with open(osp.join(root, "cad_names.txt"), "w") as f:
        f.write("\n".join(cads) + "\n")
    for obj_id in range(len(cads)):
        d = osp.join(root, "images", f"obj_{obj_id:06d}")
        os.makedirs(d)
        for q in range(n_query):
            # metaData scanning only globs filenames; empty files suffice
            open(osp.join(d, f"query_{q:06d}.png"), "wb").close()
    return root


@pytest.mark.parametrize("split", ["bottle", "unseen_training"])
def test_split_selection_matches_reference(tmp_path, split):
    refshim.install()
    from src.dataloader.shapeNet import ShapeNet as RefShapeNet

    root = _make_root(tmp_path)

    # the reference seeds the GLOBAL rng at module import
    # (seed_everything(2023), shapeNet.py:35 — no-op'd by the shim);
    # reproduce it immediately before construction
    random.seed(2023)
    ref_ds = RefShapeNet(root_dir=root, split=split, fast_evaluation=True)
    ours = ShapeNetDataset(root, split=split, img_size=32, fast_evaluation=True)

    # seeded per-category selection: same objects in the same order
    assert list(ours.query_to_references) == list(ref_ds.query_to_references)

    # same query universe (order differs only by the reference's
    # unsorted glob feeding its final shuffle)
    ref_q = {osp.relpath(p, root) for p in ref_ds.query_paths}
    our_q = {osp.relpath(p, root) for p in ours.query_paths}
    assert ref_q == our_q and len(ours.query_paths) == len(ref_ds.query_paths)

    # per-object reference pools agree
    for key, pool in ours.query_to_references.items():
        assert {osp.basename(p) for p in pool} == {
            osp.basename(p) for p in ref_ds.query_to_references[key]
        }

    # symmetry mapping (bottle -> 2) and fast-eval template indexes
    assert ours.obj_name2symmetry == ref_ds.obj_name2symmetry
    np.testing.assert_array_equal(ours.testing_indexes, ref_ds.testing_indexes)
    np.testing.assert_allclose(
        ours.testing_templates_poses, ref_ds.testing_templates_poses
    )


def test_item_pose_math_matches_reference(tmp_path):
    """Full-item parity of the pose math on the testing split: the
    reference's own ``__getitem__`` (real cv2 crops, real pose npys,
    rotation6d) vs ours on an identical root — gt_relativeR, the
    26-template all_relativeR sweep, query_pose, template_poses,
    symmetry.  A single reference image per object forces both readers'
    reference sampling to the same choice."""
    import glob as globmod

    import torch

    refshim.install()
    from src.dataloader.shapeNet import ShapeNet as RefShapeNet

    from tests.fixtures import make_mini_shapenet

    root = make_mini_shapenet(
        str(tmp_path), categories=("bottle", "airplane"), objects_per_cat=2,
        img_px=64,
    )
    for extra in globmod.glob(osp.join(root, "images", "*", "reference_*.png")):
        if not extra.endswith("reference_000000.png"):
            os.remove(extra)

    random.seed(2023)
    ref_ds = RefShapeNet(
        root_dir=root, split="bottle", fast_evaluation=True,
        rot_representation="rotation6d", img_size=32,
    )
    # torchvision is shimmed; give the reference a real hwc-float
    # transform so its tensor stacking/permutes execute (pixels are
    # compared elsewhere — crop_frame has its own reference-parity test)
    ref_ds.img_transform = lambda img: torch.from_numpy(
        np.asarray(img, np.float32)
    )
    ours = ShapeNetDataset(root, split="bottle", img_size=32, fast_evaluation=True)

    assert len(ref_ds) == len(ours)
    our_by_path = {ours.query_paths[i]: i for i in range(len(ours))}
    for ref_idx in range(len(ref_ds)):
        path = ref_ds.query_paths[ref_idx]
        ref_item = ref_ds[ref_idx]
        our_item = ours[our_by_path[path]]
        np.testing.assert_allclose(
            np.asarray(ref_item["gt_relativeR"]), our_item["gt_relativeR"],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ref_item["all_relativeR"]), our_item["all_relativeR"],
            atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(ref_item["query_pose"]), our_item["query_pose"], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ref_item["template_poses"]), our_item["template_poses"],
            atol=1e-6,
        )
        assert float(ref_item["symmetry"]) == float(our_item["symmetry"])


def _bop_root_with_templates(tmp_path, name, all_visible):
    """make_mini_bop + the per-scene template_level2.json both readers
    consume + a template_dir with obj_poses.npy."""
    import json

    from nope_tpu.geometry import so3_grid
    from tests.fixtures import make_mini_bop

    root = make_mini_bop(
        str(tmp_path / name), n_frames=8, split="train_primesense", img_px=32
    )
    scene = osp.join(root, "train_primesense", "000001")
    with open(osp.join(scene, "scene_gt_info.json")) as f:
        info = json.load(f)
    for frame_id, frame in info.items():
        for obj in frame:
            # occlude a MIDDLE frame so the keep-first-90% subsample
            # cannot coincidentally remove it on both sides
            obj["visib_fract"] = 0.5 if (not all_visible and frame_id == "2") else 1.0
    with open(osp.join(scene, "scene_gt_info.json"), "w") as f:
        json.dump(info, f)
    finder = so3_grid.NearestTemplateFinder(
        level_templates=2, pose_distribution="upper", return_inplane=True
    )
    with open(osp.join(scene, "scene_gt.json")) as f:
        gt = json.load(f)
    templates = {}
    for frame_id, objs in gt.items():
        entries = []
        for obj in objs:
            pose = np.eye(4, dtype=np.float32)
            pose[:3, :3] = np.asarray(obj["cam_R_m2c"]).reshape(3, 3)
            pose[:3, 3] = obj["cam_t_m2c"]
            idx, inplane = finder.search_nearest_template(pose[None])
            entries.append(
                {
                    "obj_id": obj["obj_id"],
                    "idx_template": int(idx[0]),
                    "inplane": float(inplane[0]),
                }
            )
        templates[frame_id] = entries
    with open(osp.join(scene, "template_level2.json"), "w") as f:
        json.dump(templates, f)

    tdir = str(tmp_path / f"{name}_templates")
    os.makedirs(tdir, exist_ok=True)
    from nope_tpu.geometry.so3_grid import get_obj_poses_from_template_level

    np.save(osp.join(tdir, "obj_poses.npy"),
            get_obj_poses_from_template_level(2, "all"))
    return root, tdir


def test_bop_metadata_pipeline_matches_reference(tmp_path):
    """The reference's own BOPDataset (baseBOP metaData scan + seeded
    subsample + upper filter) vs ours on an identical BOP root: the
    surviving (scene, frame, obj, idx_obj, idx_template, inplane)
    sequences must match when every frame is fully visible."""
    refshim.install()
    import src.dataloader.baseBOP as ref_basebop
    from src.dataloader.bop import BOPDataset as RefBOP

    from nope_tpu.data.bop import BOPDataset

    # the fixture CAD is a stub ply; mesh geometry is irrelevant to the
    # metaData pipeline under comparison
    ref_basebop.load_mesh = lambda path, **k: None

    root, tdir = _bop_root_with_templates(tmp_path, "vis", all_visible=True)
    ref = RefBOP(
        root_dir=root, template_dir=tdir, split="train_primesense",
        obj_ids=None, img_size=32, reset_metaData=True,
    )
    ours = BOPDataset(
        root_dir=root, template_dir=tdir, split="train_primesense",
        obj_ids=None, img_size=32, reset_metaData=True,
    )
    cols = ["scene_id", "frame_id", "obj_id", "idx_obj", "idx_template", "inplane"]
    ref_rows = [tuple(ref.metaData.iloc[i][c] for c in cols) for i in range(len(ref.metaData))]
    our_rows = [tuple(ours.metaData.iloc[i][c] for c in cols) for i in range(len(ours.metaData))]
    assert len(ref_rows) > 0
    assert [tuple(map(str, r)) for r in ref_rows] == [
        tuple(map(str, r)) for r in our_rows
    ]


def test_bop_visib_filter_divergence_pinned(tmp_path):
    """Reference bug, pinned not reproduced: baseBOP.py:199 tests
    membership of the TYPO key "visib_fact" before reading
    "visib_fract", so every row silently gets visib_fract=1.0 and the
    training occlusion filter (bop.py:153) can never fire.  We read the
    real value — on a root with one occluded frame the reference keeps
    it, we drop it."""
    refshim.install()
    import src.dataloader.baseBOP as ref_basebop
    from src.dataloader.bop import BOPDataset as RefBOP

    from nope_tpu.data.bop import BOPDataset

    ref_basebop.load_mesh = lambda path, **k: None

    root, tdir = _bop_root_with_templates(tmp_path, "occ", all_visible=False)
    ref = RefBOP(
        root_dir=root, template_dir=tdir, split="train_primesense",
        obj_ids=None, img_size=32, reset_metaData=True,
    )
    ours = BOPDataset(
        root_dir=root, template_dir=tdir, split="train_primesense",
        obj_ids=None, img_size=32, reset_metaData=True,
    )
    # the reference recorded 1.0 for every row, including the occluded one
    assert set(np.asarray(ref.metaData["visib_fract"])) == {1.0}
    # so its occlusion filter kept frame 2; ours (the evident intent)
    # read the real 0.5 and dropped it
    assert 2 in set(np.asarray(ref.metaData["frame_id"], int))
    assert 2 not in set(np.asarray(ours.metaData["frame_id"], int))
    assert len(ref.metaData) > len(ours.metaData)


def test_objaverse_metadata_and_pose_math_matches_reference(tmp_path):
    """The reference's own Objaverse reader vs ours: the 10-image
    validity filter selects the same query universe, and the relative
    pose math agrees to 1e-6 on identical (query, reference) pairs."""
    import json

    refshim.install()
    from src.dataloader.objaverse import Objaverse as RefObjaverse

    from nope_tpu.data.objaverse import ObjaverseDataset
    from tests.fixtures import make_mini_objaverse

    root = make_mini_objaverse(str(tmp_path / "objv"), n_objects=3, img_px=32)
    # an invalid object: one render missing -> both readers must drop it
    os.remove(osp.join(root, "images", "obj_000002", "3.png"))
    with open(osp.join(root, "filtered_uids.txt"), "w") as f:
        f.write("uid0\nuid1\nuid2\n")
    with open(osp.join(root, "object_paths.json"), "w") as f:
        json.dump({}, f)

    random.seed(2023)
    ref_ds = RefObjaverse(root_dir=root, img_size=32)
    ref_q = {osp.relpath(p, root) for p in ref_ds.query_paths}

    # ours rebuilds the cache rather than inheriting the reference's
    os.remove(osp.join(root, "img_path.txt"))
    ours = ObjaverseDataset(root, img_size=32)
    our_q = {osp.relpath(p, root) for p in ours.query_paths}
    assert ref_q == our_q
    assert not any("obj_000002" in p for p in our_q)

    # pose math on identical pairs: feed OUR deterministic choice of
    # (query, reference) through the reference's own process()
    for index in (0, len(ours) - 1):
        qp = ours.query_paths[index]
        rp = ours.sample_reference(qp, index)
        our_item = ours[index]
        _, _, ref_rel, ref_rel_inv = ref_ds.process(qp, rp)
        np.testing.assert_allclose(
            np.asarray(ref_rel), our_item["relativeR"], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(ref_rel_inv), our_item["relativeR_inv"], atol=1e-6
        )
