"""Materialize the probe's procedural training objects as on-disk
ShapeNet-format roots for the PRODUCT training stack.

Round-5 directive #2 (VERDICT): every flagship hardware run so far
hand-rolled `make_train_step` loops (scripts/probe_unseen_objects.py);
the product orchestration layer — ``cli/train.py`` → ``Trainer.fit`` →
``CombinedLoader`` over named datasets → orbax cadence → deterministic
resume (the rebuild of ``/root/reference/train.py:19-154`` + the
Lightning fit/DDP/resume stack, ``train.py:142-149``) — had trained
real models only in CPU tests.  This script writes the SAME procedural
objects the probes train on (``_probe_common.make_points``, fixed
seeds) as two ShapeNet-layout roots, so the product CLI trains the
flagship recipe exactly as a user would on real ShapeNet renders, with
joint two-dataset CombinedLoader training.

Layout per root (the reference's ShapeNet convention that
``data/shapenet.py`` reads):
  cad_names.txt                      n_obj + 50 names; the seeded
                                     training split then selects n_obj
  images/obj_XXXXXX/query_*.png      the 26 fast-grid views (raw 512 px
                                     RGBA; the loader crops at 256)
  images/obj_XXXXXX/templates_*.png  hardlinks: every upper-341 template
                                     index points at the NEAREST rendered
                                     grid view, and its pose row in the
                                     npy is snapped to that view's pose —
                                     pose↔pixels stays exact with 26
                                     renders instead of 341 per object
  object_query_poses / object_template_poses  (26,4,4) / (642,4,4) npys

Training items then pair a grid view with a random grid view — the
probes' pair distribution (up to the snapped-template reference
weights), so wide-eval trajectories are comparable to the probe runs at
matched step counts.

Run:  python scripts/make_product_root.py --n-obj 512 \
          --out-a /tmp/product_rootA --out-b /tmp/product_rootB
"""
import os
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np
from PIL import Image

from _probe_common import make_points
from tests.fixtures import render_procedural
from nope_tpu.data.categories import SHAPENET_CAT2ID
from nope_tpu.geometry import so3_grid

CAT = "chair"  # symmetry-free category; irrelevant for training items


def _arg(name, default):
    return sys.argv[sys.argv.index(name) + 1] if name in sys.argv else default


def training_ids(root):
    """Which object ids the PRODUCT training split will select for this
    root (seeded per-category shuffle, ``data/shapenet.py``
    ``_selected_object_ids``) — we materialize exactly those."""
    from nope_tpu.data.shapenet import ShapeNetDataset

    class Probe(ShapeNetDataset):
        def _load_metadata(self):
            self.selected = self._selected_object_ids()
            self.query_paths = []

    return Probe(root, split="training").selected


def materialize_root(root, probe_ids, img_px=512):
    os.makedirs(root, exist_ok=True)
    cads = [f"{SHAPENET_CAT2ID[CAT]}_proc{j}" for j in range(len(probe_ids) + 50)]
    with open(osp.join(root, "cad_names.txt"), "w") as f:
        f.write("\n".join(cads) + "\n")
    sel = sorted(training_ids(root))
    assert len(sel) == len(probe_ids), (len(sel), len(probe_ids))

    grid = so3_grid.load_obj_poses(2)  # (642, 4, 4), 0.5 m camera
    upper_idx, _ = so3_grid.get_obj_poses_from_template_level(
        2, "upper", return_index=True
    )
    t26 = so3_grid.load_index_level0_in_level2("upper")  # 26 grid ids
    # snap every grid index to the nearest rendered view (grid ids in t26)
    R_all, R26 = grid[:, :3, :3], grid[t26, :3, :3]
    cos = (
        np.einsum("nij,mij->nm", R_all, R26)  # trace(R_n R_m^T)
        - 1.0
    ) / 2.0
    snap = np.asarray(t26)[np.argmax(cos, axis=1)]  # (642,) grid ids
    poses = grid.copy()
    poses[:, :3, 3] *= 2.0  # grid stores 0.5 m; probe protocol is 1.0 m
    tmpl_poses = poses[snap]  # row idx -> its snapped view's pose
    q_poses = poses[t26]  # (26, 4, 4)
    view_of_gid = {int(g): j for j, g in enumerate(t26)}

    os.makedirs(osp.join(root, "object_query_poses"), exist_ok=True)
    os.makedirs(osp.join(root, "object_template_poses"), exist_ok=True)
    t0 = time.time()
    for k, (obj_id, probe_id) in enumerate(zip(sel, probe_ids)):
        obj_dir = osp.join(root, "images", f"obj_{obj_id:06d}")
        os.makedirs(obj_dir, exist_ok=True)
        np.save(
            osp.join(root, "object_query_poses", f"obj_{obj_id:06d}.npy"), q_poses
        )
        np.save(
            osp.join(root, "object_template_poses", f"obj_{obj_id:06d}.npy"),
            tmpl_poses,
        )
        pts, cols = make_points(probe_id)
        for j in range(len(t26)):
            Image.fromarray(
                render_procedural(q_poses[j], pts, cols, img_px), "RGBA"
            ).save(osp.join(obj_dir, f"query_{j:06d}.png"))
        for idx in upper_idx:
            dst = osp.join(obj_dir, f"templates_{int(idx):06d}.png")
            if not osp.exists(dst):
                os.link(
                    osp.join(
                        obj_dir, f"query_{view_of_gid[int(snap[idx])]:06d}.png"
                    ),
                    dst,
                )
        if k % 32 == 0:
            print(f"{root}: object {k}/{len(sel)} ({time.time()-t0:.0f}s)",
                  flush=True)
    print(f"{root}: {len(sel)} objects done ({time.time()-t0:.0f}s)", flush=True)


def add_val_objects(root, probe_ids, img_px=512):
    """Additive: materialize ``probe_ids`` at the root's first
    ``unseen_training`` ids (the 50-per-category slice the training
    split skips), giving ``cli.train``'s validation loaders real
    objects.  The probes' forever-held-out ids 24-27 are the natural
    choice — the product val split then measures the same transfer the
    probe's heldout-objects group does."""
    from nope_tpu.data.shapenet import ShapeNetDataset

    class Probe(ShapeNetDataset):
        def _load_metadata(self):
            self.selected = self._selected_object_ids()
            self.query_paths = []

    unseen = sorted(Probe(root, split="unseen_training").selected)
    assert len(unseen) >= len(probe_ids)
    grid = so3_grid.load_obj_poses(2)
    upper_idx, _ = so3_grid.get_obj_poses_from_template_level(
        2, "upper", return_index=True
    )
    t26 = so3_grid.load_index_level0_in_level2("upper")
    R_all, R26 = grid[:, :3, :3], grid[t26, :3, :3]
    cos = (np.einsum("nij,mij->nm", R_all, R26) - 1.0) / 2.0
    snap = np.asarray(t26)[np.argmax(cos, axis=1)]
    poses = grid.copy()
    poses[:, :3, 3] *= 2.0
    tmpl_poses = poses[snap]
    q_poses = poses[t26]
    view_of_gid = {int(g): j for j, g in enumerate(t26)}
    for obj_id, probe_id in zip(unseen, probe_ids):
        obj_dir = osp.join(root, "images", f"obj_{obj_id:06d}")
        os.makedirs(obj_dir, exist_ok=True)
        np.save(
            osp.join(root, "object_query_poses", f"obj_{obj_id:06d}.npy"), q_poses
        )
        np.save(
            osp.join(root, "object_template_poses", f"obj_{obj_id:06d}.npy"),
            tmpl_poses,
        )
        pts, cols = make_points(probe_id)
        for j in range(len(t26)):
            Image.fromarray(
                render_procedural(q_poses[j], pts, cols, img_px), "RGBA"
            ).save(osp.join(obj_dir, f"query_{j:06d}.png"))
        # unseen_training items sample references from reference_*.png
        os.makedirs(osp.join(root, "object_reference_poses"), exist_ok=True)
        np.save(
            osp.join(root, "object_reference_poses", f"obj_{obj_id:06d}.npy"),
            q_poses[:1],
        )
        os.link(
            osp.join(obj_dir, "query_000000.png"),
            osp.join(obj_dir, "reference_000000.png"),
        )
        for idx in upper_idx:
            dst = osp.join(obj_dir, f"templates_{int(idx):06d}.png")
            if not osp.exists(dst):
                os.link(
                    osp.join(
                        obj_dir, f"query_{view_of_gid[int(snap[idx])]:06d}.png"
                    ),
                    dst,
                )
        print(f"{root}: val object {obj_id} <- probe {probe_id}", flush=True)


def main():
    n_obj = int(_arg("--n-obj", 512))
    out_a = _arg("--out-a", "/tmp/product_rootA")
    out_b = _arg("--out-b", "/tmp/product_rootB")
    img_px = int(_arg("--img-px", 512))
    if "--add-val-objs" in sys.argv:
        # probes' forever-held-out objects as product val objects
        add_val_objects(out_a, [24, 26], img_px)
        add_val_objects(out_b, [25, 27], img_px)
        return
    # the probes' id rule: 0..23 train, 24..27 held out forever, 28..
    train_ids = list(range(min(24, n_obj))) + list(
        range(28, 28 + max(0, n_obj - 24))
    )
    # interleave so BOTH roots span all four shape families
    materialize_root(out_a, train_ids[0::2], img_px)
    materialize_root(out_b, train_ids[1::2], img_px)


if __name__ == "__main__":
    main()
