"""Config-system tests: YAML presets load, overrides coerce correctly,
partial_load surgery semantics."""

import numpy as np
import pytest

from nope_tpu.configs import load_config, apply_overrides
from nope_tpu.configs.config import ExperimentConfig


def test_shapenet_preset_loads():
    cfg = load_config("configs/train_shapenet.yaml")
    assert cfg.name_exp == "train_shapenet"
    assert cfg.model.u_net.u_net_dim == 192
    assert cfg.model.u_net.dim_mults == (1, 2, 4, 8)
    assert cfg.model.optim_config.lr == 5e-5
    assert cfg.data.datasets["shapeNet"].pose_distribution == "upper"
    assert cfg.trainer.keep_checkpoints is None


def test_train_all_preset_loads():
    cfg = load_config("configs/train_all.yaml")
    assert cfg.train_data_name == ["bop_texture", "shapeNet", "objaverse", "tless"]
    assert cfg.data.datasets["bop_texture"].extra["members"] == [
        "hb", "hope", "icbin", "lm", "ruapc", "tudl"
    ]


def test_ldm_preset_loads():
    cfg = load_config("configs/model_ldm.yaml")
    assert cfg.model.u_net.variant == "vae_cin_ldm"
    assert cfg.model.u_net.channel_mult == (1, 2, 4)


def test_override_coercion():
    cfg = ExperimentConfig()
    apply_overrides(
        cfg,
        [
            "machine.batch_size=32",
            "model.optim_config.lr=0.001",
            "model.u_net.dim_mults=1,2",
            "model.u_net.double_bottleneck=false",
            "machine.mesh_data=4",
            "train_data_name=shapeNet,tless",
            "model.checkpoint_path=null",
        ],
    )
    assert cfg.machine.batch_size == 32
    assert cfg.model.optim_config.lr == 0.001
    assert cfg.model.u_net.dim_mults == (1, 2)
    assert cfg.model.u_net.double_bottleneck is False
    assert cfg.machine.mesh_data == 4
    assert cfg.train_data_name == ["shapeNet", "tless"]
    assert cfg.model.checkpoint_path is None


def test_unknown_yaml_key_rejected(tmp_path):
    p = tmp_path / "bad.yaml"
    p.write_text("model:\n  nonexistent_field: 3\n")
    with pytest.raises(KeyError, match="nonexistent_field"):
        load_config(str(p))


def test_partial_load_semantics():
    from nope_tpu.training.port import partial_load

    target = {
        "a": {"w": np.zeros((2, 2)), "b": np.zeros(3)},
        "c": np.zeros(4),
        "only_target": np.zeros(1),
    }
    ported = {
        "a": {"w": np.ones((2, 2)), "b": np.ones(5)},  # b: shape mismatch
        "c": np.ones(4),
        "only_ported": np.ones(1),
    }
    merged, report = partial_load(target, ported)
    np.testing.assert_array_equal(merged["a"]["w"], np.ones((2, 2)))
    np.testing.assert_array_equal(merged["a"]["b"], np.zeros(3))  # kept
    np.testing.assert_array_equal(merged["c"], np.ones(4))
    assert "only_target" in merged
    assert report["loaded"] == ["a/w", "c"]
    assert report["shape_mismatch"] == ["a/b"]
    assert report["not_in_ported"] == ["only_target"]
    assert report["extra"] == ["only_ported"]
