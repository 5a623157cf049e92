"""ZeRO-1 sharded optimizer state (parallel/zero.py): the moment
pytrees shard over the data axis, the training math is bit-compatible
with the replicated layout, and the per-chip moment footprint actually
shrinks.  Runs on the suite's 8-virtual-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import create_train_state, make_train_step
from nope_tpu.parallel.mesh import create_mesh, DATA_AXIS
from nope_tpu.parallel.zero import (
    MIN_SHARD_SIZE,
    sharded_param_bytes,
    zero1_state_shardings,
)
from nope_tpu.geometry import rotations

IMG = 32


@pytest.fixture(scope="module")
def setup():
    task = PoseConditionalTask(
        # u_net_dim=16 so the big conv kernels clear MIN_SHARD_SIZE and
        # carry a 16-multiple channel axis for the 8-wide data axis
        PoseUNet(u_net_dim=16, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
        StableDiffusionVAE(block_out_channels=(8, 8, 8, 8), layers_per_block=1,
                           latent_channels=4, groups=4),
        TaskConfig(),
    )
    tx = make_optimizer(warm_up_steps=2)
    mesh = create_mesh(data=8, template=1)
    return task, tx, mesh


def _batch(step, mesh=None):
    rng = np.random.default_rng(100 + step)
    B = 8
    mats = np.asarray(rotations.random_rotations(jax.random.key(step), B))
    batch = {
        "ds": {
            "query": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
            "reference": rng.uniform(-1, 1, (B, IMG, IMG, 3)).astype(np.float32),
            "relativeR": np.asarray(
                rotations.matrix_to_rotation_6d(jnp.asarray(mats))),
            "relativeR_inv": np.asarray(rotations.matrix_to_rotation_6d(
                jnp.swapaxes(jnp.asarray(mats), -1, -2))),
        }
    }
    if mesh is None:
        return jax.tree.map(jnp.asarray, batch)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def test_zero1_matches_replicated_and_actually_shards(setup):
    task, tx, mesh = setup

    # replicated run (the existing path)
    state_r = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    state_r = jax.device_put(state_r, NamedSharding(mesh, P()))
    step_r = make_train_step(task, tx)

    # ZeRO-1 run: moments sharded over the 8-wide data axis
    state_z = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    # tiny model: lower the size gate so the (3,3,32,32) kernels shard
    shardings = zero1_state_shardings(state_z, mesh, min_size=2048)
    state_z = jax.device_put(state_z, shardings)
    step_z = make_train_step(task, tx, state_shardings=shardings)

    losses_r, losses_z = [], []
    for step in range(3):
        state_r, m_r = step_r(state_r, _batch(step, mesh))
        state_z, m_z = step_z(state_z, _batch(step, mesh))
        losses_r.append(float(m_r["loss/train_avg"]))
        losses_z.append(float(m_z["loss/train_avg"]))
    # identical math, different partitioning: losses and params agree
    np.testing.assert_allclose(losses_z, losses_r, rtol=1e-6)
    for lr, lz in zip(jax.tree.leaves(state_r.unet_params),
                      jax.tree.leaves(state_z.unet_params)):
        np.testing.assert_allclose(np.asarray(lz), np.asarray(lr), rtol=2e-5,
                                   atol=1e-7)

    # the layout must SURVIVE the step (out_shardings pins it): every
    # large moment leaf stays sharded 1/8 on some axis
    n_sharded = 0
    for leaf in jax.tree.leaves(state_z.opt_state):
        if leaf.ndim == 0 or leaf.size < 2048:
            continue
        spec = leaf.sharding.spec
        assert DATA_AXIS in spec, f"large moment leaf replicated: {leaf.shape}"
        axis = spec.index(DATA_AXIS)
        shard_shape = leaf.addressable_shards[0].data.shape
        assert shard_shape[axis] == leaf.shape[axis] // 8, (
            leaf.shape, shard_shape)
        n_sharded += 1
    assert n_sharded >= 4, f"only {n_sharded} sharded moment leaves"

    # params stay replicated (ZeRO-1, not ZeRO-3)
    for leaf in jax.tree.leaves(state_z.unet_params):
        assert leaf.sharding.spec == P(), leaf.sharding

    # footprint accounting: sharded moments cost well under the
    # replicated bytes (exact ratio depends on the small-leaf residue)
    bytes_ = sharded_param_bytes(state_z, mesh, min_size=2048)
    assert bytes_["opt_state_zero1"] < 0.5 * bytes_["opt_state_replicated"]


def test_trainer_zero1_config_knob(tmp_path):
    """machine.zero1=true wires ZeRO-1 through the Trainer: the
    eval_shape-derived sharding pytree matches the real state tree, fit()
    runs, and the large moment leaves come out sharded over the data
    axis."""
    import jax

    from nope_tpu.configs import load_config
    from nope_tpu.data.pipeline import DataLoader
    from nope_tpu.models.factory import build_task
    from nope_tpu.training.trainer import Trainer

    # dim 16 x mults (1,2,4): the (3,3,64,64) conv moments clear the
    # default MIN_SHARD_SIZE gate without a test-only knob
    cfg = load_config(None, [
        "model.img_size=32", "model.u_net.u_net_dim=16",
        "model.u_net.dim_mults=1,2,4", "model.u_net.resnet_block_groups=4",
        "model.encoder.block_out_channels=8,8,8,8",
        "model.encoder.layers_per_block=1", "model.encoder.norm_groups=4",
        f"save_dir={tmp_path}", "name_exp=zero1", "machine.mesh_data=8",
        "machine.mesh_template=1", "machine.zero1=true",
        "trainer.media_every_n_steps=0", "trainer.log_every_n_steps=1",
    ])
    task = build_task(cfg.model)
    rng = np.random.default_rng(0)

    class Toy:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            mats = np.asarray(rotations.random_rotations(jax.random.key(i), 1))[0]
            return {
                "query": rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32),
                "reference": rng.uniform(-1, 1, (IMG, IMG, 3)).astype(np.float32),
                "relativeR": np.asarray(mats[:2].reshape(6), np.float32),
                "relativeR_inv": np.asarray(mats.T[:2].reshape(6), np.float32),
            }

    trainer = Trainer(
        cfg, task, {"toy": DataLoader(Toy(), batch_size=8, num_workers=1)}
    )
    state = trainer.fit(max_steps=2)
    assert int(state.step) == 2

    n_data = trainer.mesh.shape[DATA_AXIS]
    n_sharded = 0
    for leaf in jax.tree.leaves(state.opt_state):
        if leaf.ndim == 0 or leaf.size < MIN_SHARD_SIZE:
            continue
        spec = leaf.sharding.spec
        assert DATA_AXIS in spec, f"large moment leaf replicated: {leaf.shape}"
        axis = spec.index(DATA_AXIS)
        assert (
            leaf.addressable_shards[0].data.shape[axis]
            == leaf.shape[axis] // n_data
        )
        n_sharded += 1
    assert n_sharded >= 4, f"only {n_sharded} sharded moment leaves"
    # params stay replicated and finite
    for leaf in jax.tree.leaves(state.unet_params):
        assert leaf.sharding.spec == P()
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_zero1_flagship_leaves_shard_cleanly():
    """At FLAGSHIP width (192-dim U-Net) every conv/dense moment leaf is
    8-divisible on its channel axis: the strategy reaches ~1/n bytes,
    not a degenerate replicated fallback."""
    mesh = create_mesh(data=8, template=1)
    unet = PoseUNet(u_net_dim=192, channels=4, dim_mults=(1, 2, 4, 8))
    params = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 6))
    )
    import optax

    opt_state = optax.adamw(1e-4).init(params)

    class FakeState:
        def _replace(self, **kw):
            return kw

    fake = FakeState()
    fake.step = jnp.zeros(())
    fake.unet_params = params
    fake.vae_params = {}
    fake.opt_state = opt_state
    shardings = zero1_state_shardings(fake, mesh)["opt_state"]

    replicated_big = [
        l.shape
        for l, s in zip(jax.tree.leaves(opt_state), jax.tree.leaves(shardings))
        if l.size >= MIN_SHARD_SIZE and DATA_AXIS not in s.spec
    ]
    assert not replicated_big, f"big leaves left replicated: {replicated_big}"
    bytes_ = sharded_param_bytes(fake, mesh)
    # >= 7x reduction on the moment bytes at flagship width
    assert bytes_["opt_state_zero1"] * 7 < bytes_["opt_state_replicated"]
