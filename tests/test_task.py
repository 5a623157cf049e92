"""Task-model tests on a tiny U-Net + VAE: losses, symmetrized training
step equivalence, template-bank engine (chunked == unchunked ==
sequential), retrieval self-consistency, and the geodesic eval step."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nope_tpu.models.unet import PoseUNet
from nope_tpu.models.vae import StableDiffusionVAE
from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
from nope_tpu.geometry import so3_grid, rotations, transforms

IMG = 32  # -> 4x4 latents


def _tiny_task(**cfg):
    unet = PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4)
    vae = StableDiffusionVAE(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1, latent_channels=4, groups=4
    )
    return PoseConditionalTask(unet, vae, TaskConfig(**cfg))


@pytest.fixture(scope="module")
def task_and_params():
    task = _tiny_task()
    params = task.init(jax.random.key(0), image_size=IMG)
    return task, params


def _batch(rng, b=2, pose_dim=6):
    mats = rotations.random_rotations(jax.random.key(1), b)
    mats_inv = jnp.swapaxes(mats, -1, -2)
    return {
        "query": jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)),
        "reference": jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)),
        "relativeR": rotations.matrix_to_rotation_6d(mats),
        "relativeR_inv": rotations.matrix_to_rotation_6d(mats_inv),
    }


def test_forward_loss_finite_and_positive(task_and_params, rng):
    task, params = task_and_params
    batch = _batch(rng)
    loss = task.forward_loss(params, batch["query"], batch["reference"], batch["relativeR"])
    assert np.isfinite(float(loss)) and float(loss) > 0


def test_symmetrized_loss_matches_two_pass(task_and_params, rng):
    """The stacked-batch symmetrized loss must equal the reference's
    (loss_fwd + loss_inv) / 2 formulation."""
    task, params = task_and_params
    batch = _batch(rng)
    stacked = float(task.train_loss(params, batch))
    fwd = float(
        task.forward_loss(params, batch["query"], batch["reference"], batch["relativeR"])
    )
    inv = float(
        task.forward_loss(params, batch["reference"], batch["query"], batch["relativeR_inv"])
    )
    np.testing.assert_allclose(stacked, (fwd + inv) / 2, rtol=1e-5)


def test_vae_gradient_is_zero(task_and_params, rng):
    """Frozen encoder: no gradient may flow into the VAE subtree."""
    task, params = task_and_params
    batch = _batch(rng)
    grads = jax.grad(task.train_loss)(params, batch)
    vae_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["vae"])
    )
    unet_norm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads["unet"])
    )
    assert vae_norm == 0.0
    assert unet_norm > 0.0


def test_template_bank_engine_consistency(task_and_params, rng):
    """Chunked scan == single batched forward == per-template loop."""
    task, params = task_and_params
    b, n = 2, 8
    reference = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    bank_R = rotations.matrix_to_rotation_6d(
        rotations.random_rotations(jax.random.key(3), b * n)
    ).reshape(b, n, 6)

    full = task.generate_template_bank(params, reference, bank_R)
    chunked = task.generate_template_bank(params, reference, bank_R, chunk_size=4)
    assert full.shape == (b, n, IMG // 8, IMG // 8, 4)
    np.testing.assert_allclose(np.asarray(full), np.asarray(chunked), atol=1e-5)

    # sequential oracle (the reference's loop, minus the re-encode waste)
    ref_latent = task.encode(params, reference, "mode")
    seq = np.stack(
        [
            np.asarray(task.predict_latent(params, ref_latent, bank_R[:, i]))
            for i in range(n)
        ],
        axis=1,
    )
    np.testing.assert_allclose(np.asarray(full), seq, atol=1e-5)


def test_streaming_retrieval_matches_materialized(task_and_params, rng):
    """retrieve_streaming (scan over chunks, bank never materialised)
    must reproduce generate_template_bank + retrieval exactly, for every
    supported metric."""
    import dataclasses as dc

    task, params = task_and_params
    b, n = 2, 8
    reference = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    query = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    bank_R = rotations.matrix_to_rotation_6d(
        rotations.random_rotations(jax.random.key(7), b * n)
    ).reshape(b, n, 6)

    for metric in ("l2", "l2_true", "cosine"):
        t = PoseConditionalTask(
            task.unet, task.vae, dc.replace(task.config, similarity_metric=metric)
        )
        bank = t.generate_template_bank(params, reference, bank_R)
        sim_mat, idx_mat = t.retrieval(params, query, bank)
        sim_str, idx_str = t.retrieve_streaming(
            params, query, reference, bank_R, chunk_size=4
        )
        np.testing.assert_allclose(
            np.asarray(sim_str), np.asarray(sim_mat), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(idx_str), np.asarray(idx_mat))


def test_retrieval_self_consistency(task_and_params, rng):
    """A bank that contains the query's own latent must retrieve it."""
    task, params = task_and_params
    b, n = 1, 6
    query = jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32))
    q_lat = task.encode(params, query, "mode")
    bank = jnp.asarray(rng.normal(size=(b, n, IMG // 8, IMG // 8, 4)).astype(np.float32))
    bank = bank.at[:, 3].set(q_lat)
    sim, idx = task.retrieval(params, query, bank)
    assert int(idx[0, 0]) == 3
    np.testing.assert_allclose(float(sim[0, 3]), 0.0, atol=1e-5)


def test_eval_geodesic_step(task_and_params, rng):
    task, params = task_and_params
    b, n = 2, 8
    grid = so3_grid.load_obj_poses(0)[:n, :3, :3].astype(np.float32)
    gt_idx = np.array([2, 5])
    query_pose = jnp.asarray(grid[gt_idx])
    template_poses = jnp.broadcast_to(jnp.asarray(grid), (b, n, 3, 3))

    ref_pose = grid[0]
    all_rel = transforms.relative_rotation_jax(
        jnp.asarray(grid)[None].repeat(b, 0),
        jnp.broadcast_to(jnp.asarray(ref_pose), (b, n, 3, 3)),
    )
    batch = {
        "query": jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)),
        "reference": jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)),
        "gt_relativeR": rotations.matrix_to_rotation_6d(
            transforms.relative_rotation_jax(query_pose, jnp.asarray([ref_pose] * b))
        ),
        "all_relativeR": rotations.matrix_to_rotation_6d(all_rel),
        "query_pose": query_pose,
        "template_poses": template_poses,
        "symmetry": jnp.zeros(b),
    }
    out = task.eval_geodesic_step(params, batch, chunk_size=4)
    assert out["similarity"].shape == (b, n)
    assert out["nearest_idx"].shape == (b, 5)
    assert out["error_deg"].shape == (b,)
    assert "top1, accuracy_15" in out and "top5, median" in out
    assert np.isfinite(float(out["loss"]))


def test_kl_loss_path(rng):
    task = _tiny_task(loss_type="kl", using_KL=True, use_inv_deltaR=True)
    # KL: U-Net must emit 2*latent channels
    task.unet = PoseUNet(
        u_net_dim=8, channels=4, dim_mults=(1, 2), resnet_block_groups=4, out_dim=8
    )
    params = task.init(jax.random.key(0), image_size=IMG)
    batch = _batch(rng)
    loss = task.train_loss(params, batch)
    assert np.isfinite(float(loss))


def test_half_precision_eval(task_and_params, rng):
    """bf16 eval path runs and retrieves the same top-1 as f32 on a
    well-separated bank."""
    import dataclasses as dc

    task_f32, params = task_and_params
    task_bf16 = _tiny_task(half_precision_eval=True)
    task_bf16.unet, task_bf16.vae = task_f32.unet, task_f32.vae

    b, n = 2, 8
    grid = so3_grid.load_obj_poses(0)[:n, :3, :3].astype(np.float32)
    gt_idx = np.array([1, 4])
    batch = {
        "query": jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)),
        "reference": jnp.asarray(rng.uniform(-1, 1, (b, IMG, IMG, 3)).astype(np.float32)),
        "gt_relativeR": rotations.matrix_to_rotation_6d(jnp.asarray(grid[gt_idx])),
        "all_relativeR": rotations.matrix_to_rotation_6d(
            jnp.broadcast_to(jnp.asarray(grid), (b, n, 3, 3))
        ),
        "query_pose": jnp.asarray(grid[gt_idx]),
        "template_poses": jnp.broadcast_to(jnp.asarray(grid), (b, n, 3, 3)),
        "symmetry": jnp.zeros(b),
    }
    out32 = task_f32.eval_geodesic_step(params, batch)
    out16 = task_bf16.eval_geodesic_step(params, batch)
    assert out16["similarity"].dtype == jnp.float32
    # rankings agree on a random bank (spacing >> bf16 noise)
    assert np.array_equal(
        np.asarray(out16["nearest_idx"][:, 0]), np.asarray(out32["nearest_idx"][:, 0])
    )


def test_half_precision_train_step(task_and_params, rng):
    """bf16 training with f32 master weights: the forward/backward runs
    in bfloat16 but params + AdamW state stay float32, the first-step
    loss matches fp32 within bf16 rounding, and repeated steps still
    learn (loss decreases on a fixed batch)."""
    from nope_tpu.training.optim import make_optimizer
    from nope_tpu.training.train_state import create_train_state, make_train_step

    task, _ = task_and_params
    batch = {"ds": _batch(rng, b=2)}
    tx = make_optimizer(base_lr=1e-3, warm_up_steps=0)

    state32 = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    state16 = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    step32 = make_train_step(task, tx)
    step16 = make_train_step(task, tx, half_precision=True)

    _, m32 = step32(state32, batch)
    state16, m16 = step16(state16, batch)
    assert m16["loss/train_avg"].dtype == jnp.float32
    np.testing.assert_allclose(
        float(m16["loss/train_avg"]), float(m32["loss/train_avg"]), rtol=2e-2
    )
    # master weights and optimizer state never leave f32
    for leaf in jax.tree.leaves((state16.unet_params, state16.opt_state)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32

    first = float(m16["loss/train_avg"])
    for _ in range(5):
        state16, m16 = step16(state16, batch)
    assert float(m16["loss/train_avg"]) < first


def test_quaternion_rotation_representation(rng):
    """End-to-end with rot_representation=quaternion (pose_dim=4)."""
    unet = PoseUNet(u_net_dim=8, channels=4, dim_mults=(1, 2),
                    resnet_block_groups=4, rot_representation_dim=4)
    vae = StableDiffusionVAE(
        block_out_channels=(8, 8, 8, 8), layers_per_block=1, latent_channels=4,
        groups=4,
    )
    task = PoseConditionalTask(unet, vae, TaskConfig())
    params = task.init(jax.random.key(0), image_size=IMG)
    mats = rotations.random_rotations(jax.random.key(5), 2)
    quat = rotations.matrix_to_quaternion(mats)
    quat_inv = rotations.matrix_to_quaternion(jnp.swapaxes(mats, -1, -2))
    batch = {
        "query": jnp.zeros((2, IMG, IMG, 3)),
        "reference": jnp.zeros((2, IMG, IMG, 3)),
        "relativeR": quat,
        "relativeR_inv": quat_inv,
    }
    loss = task.train_loss(params, batch)
    assert np.isfinite(float(loss))
