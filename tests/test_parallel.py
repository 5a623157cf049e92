"""Mesh/sharding tests on the 8-virtual-device CPU backend: sharded
eval == single-device eval; data-parallel train step == single-device
step (the DDP-equivalence guarantee)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from nope_tpu.geometry import rotations
from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.parallel.eval import make_sharded_eval_fn
from nope_tpu.parallel.mesh import create_mesh, shard_batch
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
from nope_tpu.training.optim import make_optimizer
from nope_tpu.training.train_state import create_train_state, make_train_step

IMG = 32


@pytest.fixture(scope="module")
def task_and_params():
    task = PoseConditionalTask(
        PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4),
        StableDiffusionVAE(
            block_out_channels=(8, 8, 8, 8), layers_per_block=1,
            latent_channels=4, groups=4,
        ),
        TaskConfig(),
    )
    return task, task.init(jax.random.key(0), image_size=IMG)


def test_sharded_eval_matches_single_device(task_and_params, rng):
    task, params = task_and_params
    b, n = 4, 8
    reference = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    query = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    bank_R = rotations.matrix_to_rotation_6d(
        rotations.random_rotations(jax.random.key(1), b * n)
    ).reshape(b, n, 6)

    bank = task.generate_template_bank(params, reference, bank_R)
    sim_single, idx_single = task.retrieval(params, query, bank)

    mesh = create_mesh(data=4, template=2)
    run = make_sharded_eval_fn(task, mesh)
    sim_sharded, idx_sharded = run(params, reference, query, bank_R)

    np.testing.assert_allclose(
        np.asarray(sim_sharded), np.asarray(sim_single), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_array_equal(np.asarray(idx_sharded), np.asarray(idx_single))


@pytest.mark.parametrize("mesh_shape", [(4, 2), (1, 8)])
def test_sharded_streaming_eval_matches_single_device(task_and_params, rng, mesh_shape):
    """shard_map streaming retrieval (per-device chunked sweep +
    template-axis all-gather) == single-device materialized retrieval,
    on both a mixed (data=4, template=2) and a pure-template (1, 8)
    mesh."""
    from nope_tpu.parallel.eval import make_sharded_streaming_eval_fn

    task, params = task_and_params
    b, n = 4, 16
    reference = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    query = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    bank_R = rotations.matrix_to_rotation_6d(
        rotations.random_rotations(jax.random.key(9), b * n)
    ).reshape(b, n, 6)

    bank = task.generate_template_bank(params, reference, bank_R)
    sim_single, idx_single = task.retrieval(params, query, bank)

    data, template = mesh_shape
    mesh = create_mesh(data=data, template=template)
    run = make_sharded_streaming_eval_fn(task, mesh, chunk_size=2)
    sim_sharded, idx_sharded = run(params, reference, query, bank_R)

    np.testing.assert_allclose(
        np.asarray(sim_sharded), np.asarray(sim_single), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_array_equal(np.asarray(idx_sharded), np.asarray(idx_single))


def test_data_parallel_train_step_matches_single(task_and_params, rng):
    task, _ = task_and_params
    tx = make_optimizer(warm_up_steps=10)

    def batch(b):
        mats = rotations.random_rotations(jax.random.key(2), b)
        return {
            "ds": {
                "query": jnp.asarray(
                    rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)
                ),
                "reference": jnp.asarray(
                    rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)
                ),
                "relativeR": rotations.matrix_to_rotation_6d(mats),
                "relativeR_inv": rotations.matrix_to_rotation_6d(
                    jnp.swapaxes(mats, -1, -2)
                ),
            }
        }

    data = batch(8)
    step_fn = make_train_step(task, tx)

    # single device
    state1 = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    _, metrics_single = step_fn(state1, data)

    # 8-way data parallel over the mesh
    mesh = create_mesh(data=8, template=1)
    state2 = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    state2 = jax.device_put(
        state2, jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    )
    sharded = {"ds": shard_batch(data["ds"], mesh)}
    _, metrics_sharded = step_fn(state2, sharded)

    np.testing.assert_allclose(
        float(metrics_sharded["loss/train_avg"]),
        float(metrics_single["loss/train_avg"]),
        rtol=2e-5,
    )


def test_sharded_eval_with_committed_params_and_ragged_tail(task_and_params, rng):
    """Regression: checkpoint-restored params arrive committed to one
    device — the sharded eval must replicate them itself; ragged final
    batches (drop_last=False) are padded and trimmed."""
    from nope_tpu.evaluation.geodesic import evaluate_geodesic
    from nope_tpu.geometry import so3_grid, transforms

    task, params = task_and_params
    # commit to a single device like orbax restore does
    params = jax.device_put(params, jax.devices()[0])

    n = 8
    grid = so3_grid.load_obj_poses(0)[:n, :3, :3].astype(np.float32)

    def batch(size):
        rel = transforms.relative_rotation_jax(
            jnp.asarray(grid)[None].repeat(size, 0),
            jnp.broadcast_to(jnp.asarray(grid[0]), (size, n, 3, 3)),
        )
        return {
            "query": rng.uniform(-1, 1, (size, IMG, IMG, 3)).astype(np.float32),
            "reference": rng.uniform(-1, 1, (size, IMG, IMG, 3)).astype(np.float32),
            "gt_relativeR": np.asarray(
                rotations.matrix_to_rotation_6d(jnp.asarray(grid[:size]))
            ),
            "all_relativeR": np.asarray(rotations.matrix_to_rotation_6d(rel)),
            "query_pose": grid[:size],
            "template_poses": np.broadcast_to(grid, (size, n, 3, 3)).copy(),
            "symmetry": np.zeros(size, np.float32),
        }

    mesh = create_mesh(data=2, template=2)
    # steady batch of 2, ragged tail of 1 → 3 queries scored
    scores = evaluate_geodesic(task, params, [batch(2), batch(1)], mesh=mesh)
    assert scores["num_images"] == 3.0
    assert np.isfinite(scores["top1, median"])


def test_sharded_eval_harness_with_streaming_chunks(task_and_params, rng):
    """evaluate_geodesic with BOTH a mesh and a chunk_size (the
    streaming scan under jit-SPMD shardings) must score identically to
    the plain single-device materialized harness."""
    from nope_tpu.evaluation.geodesic import evaluate_geodesic
    from nope_tpu.geometry import so3_grid, transforms

    task, params = task_and_params
    n, b = 8, 4
    grid = so3_grid.load_obj_poses(0)[:n, :3, :3].astype(np.float32)
    rel = transforms.relative_rotation_jax(
        jnp.asarray(grid)[None].repeat(b, 0),
        jnp.broadcast_to(jnp.asarray(grid[0]), (b, n, 3, 3)),
    )
    batch = {
        "query": rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32),
        "reference": rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32),
        "gt_relativeR": np.asarray(
            rotations.matrix_to_rotation_6d(jnp.asarray(grid[:b]))
        ),
        "all_relativeR": np.asarray(rotations.matrix_to_rotation_6d(rel)),
        "query_pose": grid[:b],
        "template_poses": np.broadcast_to(grid, (b, n, 3, 3)).copy(),
        "symmetry": np.zeros(b, np.float32),
    }
    plain = evaluate_geodesic(task, params, [batch])
    mesh = create_mesh(data=2, template=2)
    streamed = evaluate_geodesic(task, params, [batch], chunk_size=4, mesh=mesh)
    for key in ("top1, median", "top1, accuracy_15", "num_images"):
        np.testing.assert_allclose(streamed[key], plain[key], rtol=1e-4, err_msg=key)


def test_eval_save_dir_dumps_and_panels(task_and_params, rng, tmp_path):
    """save_dir produces the per-batch .npz dumps plus both retrieval
    panels (plain grid + the text-labelled draw_grid_text variant,
    reference visualization_utils.py:60-78)."""
    import os

    from nope_tpu.evaluation.geodesic import evaluate_geodesic
    from nope_tpu.geometry import so3_grid, transforms

    task, params = task_and_params
    n, b = 8, 2
    grid = so3_grid.load_obj_poses(0)[:n, :3, :3].astype(np.float32)
    rel = transforms.relative_rotation_jax(
        jnp.asarray(grid)[None].repeat(b, 0),
        jnp.broadcast_to(jnp.asarray(grid[0]), (b, n, 3, 3)),
    )
    batch = {
        "query": rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32),
        "reference": rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32),
        "gt_relativeR": np.asarray(
            rotations.matrix_to_rotation_6d(jnp.asarray(grid[:b]))
        ),
        "all_relativeR": np.asarray(rotations.matrix_to_rotation_6d(rel)),
        "query_pose": grid[:b],
        "template_poses": np.broadcast_to(grid, (b, n, 3, 3)).copy(),
        "symmetry": np.zeros(b, np.float32),
        "gt_templates": rng.uniform(-1, 1, (b, n, IMG, IMG, 3)).astype(np.float32),
    }
    scores = evaluate_geodesic(task, params, [batch], save_dir=str(tmp_path))
    assert scores["num_images"] == float(b)
    files = os.listdir(tmp_path)
    assert any(f.startswith("pred_") and f.endswith(".npz") for f in files)
    assert any(f.startswith("retrieved_") and f.endswith(".png") for f in files)
    try:
        import matplotlib  # noqa: F401
    except ImportError:
        pass
    else:
        assert any(f.startswith("retrieved_text_") for f in files)


def test_bank_generation_hlo_is_partitioned(task_and_params, rng):
    """The compiled (post-SPMD) HLO must carry PER-DEVICE shapes for the
    template sweep: the flat U-Net latent batch appears as
    (b*n)/n_devices, never the full b*n — proof the bank compute is
    actually distributed, not replicated (VERDICT round-1 item #8)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from nope_tpu.parallel.mesh import DATA_AXIS, TEMPLATE_AXIS

    task, params = task_and_params
    b, n = 4, 16
    mesh = create_mesh(data=4, template=2)
    n_devices = 8

    reference = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    query = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    bank_R = rotations.matrix_to_rotation_6d(
        rotations.random_rotations(jax.random.key(1), b * n)
    ).reshape(b, n, 6)

    def eval_fn(params, reference, query, bank_R):
        bank = task.generate_template_bank(params, reference, bank_R)
        return task.retrieval(params, query, bank)

    jitted = jax.jit(
        eval_fn,
        in_shardings=(
            NamedSharding(mesh, P()),
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P(DATA_AXIS)),
            NamedSharding(mesh, P(DATA_AXIS, TEMPLATE_AXIS)),
        ),
    )
    hlo = jitted.lower(params, reference, query, bank_R).compile().as_text()
    shard_flat = b * n // n_devices  # 8
    full_flat = b * n  # 64
    assert f"f32[{shard_flat},4,4," in hlo, "no per-shard latent operand in HLO"
    assert f"f32[{full_flat},4,4," not in hlo, "full-size latent operand: replicated sweep"


def test_sharded_streaming_eval_rejects_indivisible_grid(task_and_params, rng):
    """An up-front, actionable error when the pose grid does not divide
    the template mesh axis (XLA's own message only fires post-compile)."""
    from nope_tpu.parallel.eval import make_sharded_streaming_eval_fn

    task, params = task_and_params
    mesh = create_mesh(data=2, template=4)
    run = make_sharded_streaming_eval_fn(task, mesh, chunk_size=2)
    b, n = 2, 10  # 10 % 4 != 0
    reference = jnp.zeros((b, IMG, IMG, 3))
    query = jnp.zeros((b, IMG, IMG, 3))
    bank_R = jnp.zeros((b, n, 6))
    with pytest.raises(ValueError, match="not divisible by the template"):
        run(params, reference, query, bank_R)


def test_process_barrier_single_process_noop():
    """process_barrier must be a no-op outside a distributed job (the
    common single-process path calls it unconditionally)."""
    from nope_tpu.parallel.mesh import process_barrier

    assert jax.process_count() == 1
    process_barrier("unit")  # must not raise or block
    process_barrier("unit")
