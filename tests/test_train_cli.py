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


def test_uint8_wire_format(train_root):
    """wire_dtype='uint8' ships raw crops (4x less host->device traffic)
    and the jitted step normalizes on device: items and the training
    loss must match the float32 wire exactly."""
    import jax
    import jax.numpy as jnp

    from nope_tpu.configs import load_config
    from nope_tpu.data.pipeline import collate
    from nope_tpu.data.shapenet import ShapeNetDataset
    from nope_tpu.models.factory import build_task
    from nope_tpu.training.optim import make_optimizer
    from nope_tpu.training.train_state import create_train_state, make_train_step

    ds_f = ShapeNetDataset(train_root, split="training", img_size=32)
    ds_u = ShapeNetDataset(
        train_root, split="training", img_size=32, wire_dtype="uint8"
    )
    it_f, it_u = ds_f[0], ds_u[0]
    assert it_u["query"].dtype == np.uint8
    assert it_f["query"].dtype == np.float32
    np.testing.assert_allclose(
        it_f["query"], it_u["query"].astype(np.float32) / 255.0 * 2.0 - 1.0,
        atol=1e-7,
    )
    np.testing.assert_array_equal(it_f["relativeR"], it_u["relativeR"])

    cfg = load_config(None, TINY_OVERRIDES)
    task = build_task(cfg.model)
    tx = make_optimizer(warm_up_steps=2)
    state = create_train_state(task, tx, jax.random.key(0), image_size=32)
    step = make_train_step(task, tx)
    copy = lambda t: jax.tree.map(lambda x: jnp.array(x, copy=True), t)
    losses = []
    for ds in (ds_f, ds_u):
        batch = {"ds": jax.tree.map(jnp.asarray, collate([ds[0], ds[1]]))}
        _, m = step(copy(state), batch)
        losses.append(float(m["loss/train_avg"]))
    assert np.isclose(losses[0], losses[1], rtol=1e-6), losses

    import pytest as _pytest

    with _pytest.raises(ValueError, match="wire_dtype"):
        ShapeNetDataset(train_root, split="training", wire_dtype="int4")


def test_warm_start_from_torch_checkpoint(tmp_path):
    """_maybe_warm_start must port a reference-format torch .pth into the
    running params."""
    import torch

    import jax
    import jax.numpy as jnp

    from nope_tpu.cli.train import _maybe_warm_start
    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from tests.oracles.torch_pose_unet import TorchPoseUNet

    torch.manual_seed(0)
    oracle = TorchPoseUNet(u_net_dim=8, channels=4, rot_dim=6, dim_mults=(1, 2),
                           groups=4)
    ckpt = str(tmp_path / "unet.pth")
    torch.save(oracle.state_dict(), ckpt)

    cfg = load_config(None, TINY_OVERRIDES + [
        f"model.u_net.pretrained_path={ckpt}",
    ])
    task = build_task(cfg.model)
    params = task.init(jax.random.key(0), image_size=32)
    before = np.asarray(params["unet"]["init_conv"]["kernel"]).copy()
    params = _maybe_warm_start(task, params, cfg)
    after = np.asarray(params["unet"]["init_conv"]["kernel"])
    expected = oracle.init_conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(after, expected, atol=1e-6)
    assert not np.allclose(before, after)


def test_save_restore_params_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from nope_tpu.training.checkpoint import restore_params, save_params

    params = {"a": {"w": jnp.arange(6.0).reshape(2, 3)}, "b": jnp.ones(4)}
    path = str(tmp_path / "params_ckpt")
    save_params(path, jax.device_get(params))
    back = restore_params(path, jax.device_get(params))
    np.testing.assert_allclose(np.asarray(back["a"]["w"]), np.arange(6.0).reshape(2, 3))
    np.testing.assert_allclose(np.asarray(back["b"]), 1.0)


def test_export_cli_roundtrip(tmp_path):
    """export CLI: torch U-Net -> orbax params dir -> test_shapenet-style
    restore."""
    import torch

    import jax

    from nope_tpu.cli.export import main as export_main
    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from nope_tpu.training.checkpoint import restore_params
    from tests.oracles.torch_pose_unet import TorchPoseUNet

    torch.manual_seed(1)
    oracle = TorchPoseUNet(u_net_dim=8, channels=4, rot_dim=6, dim_mults=(1, 2),
                           groups=4)
    ckpt = str(tmp_path / "unet.pth")
    torch.save(oracle.state_dict(), ckpt)
    out = str(tmp_path / "exported")

    export_main(["--out", out, "--unet", ckpt] + TINY_OVERRIDES)

    cfg = load_config(None, TINY_OVERRIDES)
    task = build_task(cfg.model)
    params = task.init(jax.random.key(0), image_size=32)
    restored = restore_params(out, jax.device_get(params))
    expected = oracle.init_conv.weight.detach().numpy().transpose(2, 3, 1, 0)
    np.testing.assert_allclose(
        np.asarray(restored["unet"]["init_conv"]["kernel"]), expected, atol=1e-6
    )


def test_pretrain_vae_cli(train_root, tmp_path):
    """pretrain_vae CLI: train-loader images -> a few VAE steps -> orbax
    params dir loadable as the frozen encoder."""
    import jax
    import yaml

    from nope_tpu.cli.pretrain_vae import main as pretrain_main
    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from nope_tpu.training.checkpoint import restore_params

    cfg_path = str(tmp_path / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(
            {"data": {"datasets": {"shapeNet": {
                "name": "shapeNet", "root_dir": train_root, "img_size": 32,
            }}}},
            f,
        )
    out = str(tmp_path / "vae_params")
    pretrain_main(
        ["--config", cfg_path, "--steps", "3", "--out", out, "--log-every", "1"]
        + TINY_OVERRIDES
    )

    cfg = load_config(cfg_path, TINY_OVERRIDES)
    task = build_task(cfg.model)
    params = task.init(jax.random.key(0), image_size=32)
    restored = restore_params(out, jax.device_get(params["vae"]))
    assert jax.tree.structure(restored) == jax.tree.structure(params["vae"])

    # the documented from-scratch recipe: cli.train warm-starts the
    # frozen codec from the orbax dir pretrain_vae wrote
    import numpy as np

    from nope_tpu.cli.train import main as train_main

    save_dir = str(tmp_path / "train_out")
    train_main(
        ["--config", cfg_path, "--max-steps", "2"]
        + TINY_OVERRIDES
        + [
            f"model.encoder.pretrained_path={out}",
            f"save_dir={save_dir}",
            "name_exp=scratch",
            "trainer.num_sanity_val_steps=0",
            "trainer.media_every_n_steps=0",
        ]
    )
    # the trainer's checkpoint holds the pretrained codec, not the init
    from nope_tpu.training.checkpoint import CheckpointManager
    from nope_tpu.training.optim import make_optimizer
    from nope_tpu.training.train_state import create_train_state

    template = create_train_state(
        task, make_optimizer(warm_up_steps=2), jax.random.key(0), image_size=32
    )
    mgr = CheckpointManager(osp.join(save_dir, "scratch", "checkpoints"))
    saved = mgr.restore(jax.device_get(template))
    mgr.close()
    saved_leaves = jax.tree.leaves(saved.vae_params)
    pretrained_leaves = jax.tree.leaves(restored)
    init_leaves = jax.tree.leaves(jax.device_get(params["vae"]))
    match_pre = all(
        np.allclose(a, b) for a, b in zip(saved_leaves, pretrained_leaves)
    )
    match_init = all(
        np.allclose(a, b) for a, b in zip(saved_leaves, init_leaves)
    )
    assert match_pre and not match_init


def test_pretrain_vae_cli_rejects_existing_out(train_root, tmp_path):
    """The destination is validated BEFORE training: an existing --out
    without --overwrite must fail fast, not after a long run."""
    import pytest

    from nope_tpu.cli.pretrain_vae import main as pretrain_main

    out = tmp_path / "exists"
    out.mkdir()
    with pytest.raises(SystemExit):
        pretrain_main(["--steps", "1", "--out", str(out)])
