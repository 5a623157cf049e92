"""Profiling utilities and trainer media logging."""

import os.path as osp

import numpy as np
import jax.numpy as jnp

from nope_tpu.utils import profiling


def test_benchmark_helper():
    stats = profiling.benchmark(lambda x: jnp.sum(x * 2), jnp.ones(128), iters=3, warmup=1)
    assert stats["iters"] == 3.0
    assert 0 < stats["min_s"] <= stats["mean_s"] <= stats["max_s"]


def test_trace_context(tmp_path):
    with profiling.trace(str(tmp_path / "prof")):
        jnp.sum(jnp.ones(64)).block_until_ready()
    # the profiler writes a plugins/profile tree
    assert any(p.name == "plugins" for p in (tmp_path / "prof").iterdir())


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU


def test_trainer_media_logging(tmp_path, rng):
    import jax

    from nope_tpu.configs import load_config
    from nope_tpu.models.factory import build_task
    from nope_tpu.training.trainer import Trainer
    from nope_tpu.data.pipeline import DataLoader
    from nope_tpu.geometry import rotations

    cfg = load_config(None, [
        "model.img_size=32", "model.u_net.u_net_dim=8",
        "model.u_net.dim_mults=1,2", "model.u_net.resnet_block_groups=4",
        "model.encoder.block_out_channels=8,8,8,8",
        "model.encoder.layers_per_block=1", "model.encoder.norm_groups=4",
        f"save_dir={tmp_path}", "name_exp=media", "machine.mesh_data=1",
        "machine.mesh_template=1",
    ])
    task = build_task(cfg.model)

    class Toy:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            mats = np.asarray(rotations.random_rotations(jax.random.key(i), 1))[0]
            return {
                "query": rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32),
                "reference": rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32),
                "relativeR": np.asarray(mats[:2].reshape(6), np.float32),
                "relativeR_inv": np.asarray(mats.T[:2].reshape(6), np.float32),
            }

    trainer = Trainer(cfg, task, {"toy": DataLoader(Toy(), batch_size=2, num_workers=1)})
    state = trainer.init_state(resume=False)
    batch = {"toy": {k: jnp.asarray(np.stack([Toy()[0][k], Toy()[1][k]]))
                     for k in ("query", "reference", "relativeR", "relativeR_inv")}}
    trainer._log_media(state, batch, step=7)
    media = osp.join(cfg.save_dir, "media", "reconst_step7_rank0.png")
    assert osp.exists(media)
