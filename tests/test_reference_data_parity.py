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
