"""Train CLI end-to-end: python -m nope_tpu.cli.train semantics on a
synthetic training-split ShapeNet root (2 steps, tiny model)."""

import json
import os
import os.path as osp

import numpy as np
import pytest
import yaml

from nope_tpu.data.categories import SHAPENET_CAT2ID
from nope_tpu.geometry import so3_grid
from tests.fixtures import make_shapenet_object
from tests.test_end_to_end import TINY_OVERRIDES


@pytest.fixture(scope="module")
def train_root(tmp_path_factory):
    """A root where the 'training' split resolves to 2 materialised
    airplane objects (52 cads, seeded shuffle decides which 2 are in
    cads[50:]), each with the full level-2-upper template set."""
    from nope_tpu.data.shapenet import ShapeNetDataset

    root = str(tmp_path_factory.mktemp("cli_shapenet"))
    rng = np.random.default_rng(0)
    cad_names = [f"{SHAPENET_CAT2ID['airplane']}_c{j}" for j in range(52)]
    with open(osp.join(root, "cad_names.txt"), "w") as f:
        f.write("\n".join(cad_names) + "\n")

    class Probe(ShapeNetDataset):
        def _load_metadata(self):
            self.selected = self._selected_object_ids()
            self.query_paths = []

    train_ids = Probe(root, split="training").selected
    val_ids = Probe(root, split="unseen_training").selected[:2]
    train_idx, _ = so3_grid.get_obj_poses_from_template_level(
        2, "upper", return_index=True
    )
    for obj_id in list(train_ids) + list(val_ids):
        make_shapenet_object(root, obj_id, rng, train_idx, img_px=64)
    return root


def test_train_cli_main(train_root, tmp_path):
    from nope_tpu.cli.train import main

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {
                "data": {
                    "datasets": {
                        "shapeNet": {
                            "name": "shapeNet",
                            "root_dir": train_root,
                            "img_size": 32,
                        }
                    }
                }
            },
            f,
        )
    save_dir = str(tmp_path / "out")
    main(
        ["--config", cfg_path, "--max-steps", "2"]
        + TINY_OVERRIDES
        + [
            f"save_dir={save_dir}",
            "name_exp=cli_train",
            "trainer.num_sanity_val_steps=1",
            "trainer.media_every_n_steps=0",
        ]
    )
    exp_dir = osp.join(save_dir, "cli_train")
    metrics = [json.loads(l) for l in open(osp.join(exp_dir, "metrics.jsonl"))]
    train_losses = [m["loss/train_shapeNet"] for m in metrics if "loss/train_shapeNet" in m]
    assert len(train_losses) >= 2 and np.isfinite(train_losses).all()
    # sanity validation ran (val scores logged before training)
    assert osp.isdir(osp.join(exp_dir, "checkpoints"))
