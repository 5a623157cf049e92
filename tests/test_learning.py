"""Full-pipeline learning test on a *learnable* procedural dataset.

Images are rendered deterministically from their poses (seeded point
clouds under the real K / crop conventions), so the task is solvable:
training the pose-conditioned U-Net must improve template retrieval over
the untrained model.  This exercises the entire stack with real
semantics: reader → crop → ΔR math → train step → template bank →
retrieval → symmetry-aware metric.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.fixtures import make_procedural_shapenet

IMG = 32
STEPS = 120


@pytest.fixture(scope="module")
def procedural_root(tmp_path_factory):
    return make_procedural_shapenet(
        str(tmp_path_factory.mktemp("procedural")), objects_per_cat=2
    )


def test_training_improves_retrieval(procedural_root):
    from nope_tpu.data.shapenet import ShapeNetDataset
    from nope_tpu.models.unet import PoseUNet
    from nope_tpu.models.vae import StableDiffusionVAE
    from nope_tpu.tasks.pose_conditional import PoseConditionalTask, TaskConfig
    from nope_tpu.training.optim import make_optimizer
    from nope_tpu.training.train_state import create_train_state, make_train_step

    ds = ShapeNetDataset(
        procedural_root, split="bottle", img_size=IMG, fast_evaluation=True
    )
    # assemble one eval batch (all queries of both objects)
    items = [ds[i] for i in range(len(ds))]
    eval_batch = {
        k: jnp.asarray(np.stack([it[k] for it in items]))
        for k in items[0]
    }

    task = PoseConditionalTask(
        PoseUNet(u_net_dim=16, channels=4, dim_mults=(1, 2), resnet_block_groups=8),
        StableDiffusionVAE(
            block_out_channels=(16, 16, 16, 16), layers_per_block=1,
            latent_channels=4, groups=8,
        ),
        TaskConfig(half_precision_eval=False),  # fp32 anchor for the guardrail
    )
    tx = make_optimizer(base_lr=2e-3, warm_up_steps=10)
    state = create_train_state(task, tx, jax.random.key(0), image_size=IMG)
    step_fn = make_train_step(task, tx)
    eval_fn = jax.jit(task.eval_geodesic_step)

    def eval_errors(state):
        params = {"unet": state.unet_params, "vae": state.vae_params}
        out = eval_fn(params, eval_batch)
        return np.asarray(out["errors_topk"]), float(out["loss"])

    errors_before, loss_before = eval_errors(state)

    # train on query↔reference pairs of the same objects (overfit regime)
    rng = np.random.default_rng(0)
    train_items = items
    for step in range(STEPS):
        sel = rng.integers(0, len(train_items), 4)
        batch = {
            "ds": {
                "query": jnp.asarray(
                    np.stack([train_items[i]["query"] for i in sel])
                ),
                "reference": jnp.asarray(
                    np.stack([train_items[i]["reference"] for i in sel])
                ),
                "relativeR": jnp.asarray(
                    np.stack([train_items[i]["gt_relativeR"] for i in sel])
                ),
                # ΔR⁻¹: 6d of the transposed relative rotation
                "relativeR_inv": jnp.asarray(
                    np.stack(
                        [
                            _invert_6d(train_items[i]["gt_relativeR"])
                            for i in sel
                        ]
                    )
                ),
            }
        }
        state, metrics = step_fn(state, batch)

    errors_after, loss_after = eval_errors(state)

    med_before = np.median(np.min(errors_before[:, :5], axis=1))
    med_after = np.median(np.min(errors_after[:, :5], axis=1))
    top1_before = np.median(errors_before[:, 0])
    top1_after = np.median(errors_after[:, 0])
    print(f"loss {loss_before:.4f}->{loss_after:.4f}, "
          f"top1 median err {top1_before:.1f}->{top1_after:.1f} deg, "
          f"top5 {med_before:.1f}->{med_after:.1f} deg")
    assert loss_after < 0.7 * loss_before
    # retrieval must be meaningfully better than the untrained model
    # (top-1; top-5 saturates at the grid floor on the smooth renders)
    assert top1_after < top1_before
    assert med_after <= med_before

    # ---- bf16 inference guardrail (VERDICT round-1 #3): on the trained
    # model, half-precision eval must match fp32 retrieval within
    # protocol noise — this is what licenses the bf16 headline bench
    params = {"unet": state.unet_params, "vae": state.vae_params}
    bf16_task = PoseConditionalTask(
        task.unet, task.vae, dataclasses.replace(task.config, half_precision_eval=True)
    )
    out_fp32 = eval_fn(params, eval_batch)
    out_bf16 = jax.jit(bf16_task.eval_geodesic_step)(params, eval_batch)

    idx_fp32 = np.asarray(out_fp32["nearest_idx"])
    idx_bf16 = np.asarray(out_bf16["nearest_idx"])
    top1_agree = float(np.mean(idx_fp32[:, 0] == idx_bf16[:, 0]))
    err_fp32 = np.asarray(out_fp32["errors_topk"])[:, 0]
    err_bf16 = np.asarray(out_bf16["errors_topk"])[:, 0]
    acc15_fp32 = float(np.mean(err_fp32 <= 15.0))
    acc15_bf16 = float(np.mean(err_bf16 <= 15.0))
    print(f"bf16 guardrail: top1 agreement {top1_agree:.2f}, "
          f"Acc@15 {acc15_fp32:.2f} vs {acc15_bf16:.2f}")
    # one item of disagreement is the protocol noise floor here
    assert top1_agree >= 1.0 - 1.0 / len(err_fp32) - 1e-9
    assert abs(acc15_fp32 - acc15_bf16) <= 1.0 / len(err_fp32) + 1e-9


def test_vae_pretraining_improves_reconstruction(procedural_root):
    """First-stage pretraining (training.pretrain_vae): reconstruction
    loss must drop on the procedural renders, and the bf16 variant must
    keep f32 master weights."""
    from nope_tpu.data.shapenet import ShapeNetDataset
    from nope_tpu.models.vae import StableDiffusionVAE
    from nope_tpu.training.pretrain_vae import (
        create_vae_pretrain_state,
        make_vae_pretrain_step,
    )
    import optax

    ds = ShapeNetDataset(procedural_root, split="bottle", img_size=IMG)
    images = jnp.asarray(np.stack([ds[i]["query"] for i in range(4)]))

    vae = StableDiffusionVAE(
        block_out_channels=(16, 16, 16, 16), layers_per_block=1,
        latent_channels=4, groups=8,
    )
    tx = optax.adamw(1e-3)
    state = create_vae_pretrain_state(vae, tx, jax.random.key(0), image_size=IMG)
    step = make_vae_pretrain_step(vae, tx)

    state, first = step(state, images)
    for _ in range(60):
        state, metrics = step(state, images)
    print(f"vae pretrain recon {float(first['recon']):.4f}->"
          f"{float(metrics['recon']):.4f}, kl {float(metrics['kl']):.1f}")
    assert float(metrics["recon"]) < 0.6 * float(first["recon"])
    assert np.isfinite(float(metrics["kl"]))

    # bf16 step: master weights stay f32 and the loss is finite
    hp_state = create_vae_pretrain_state(vae, tx, jax.random.key(1), image_size=IMG)
    hp_step = make_vae_pretrain_step(vae, tx, half_precision=True)
    hp_state, hp_metrics = hp_step(hp_state, images)
    assert all(
        leaf.dtype == jnp.float32 for leaf in jax.tree.leaves(hp_state.params)
    )
    assert np.isfinite(float(hp_metrics["loss"]))


def _invert_6d(d6):
    m = np.zeros((3, 3), np.float32)
    m[:2] = d6.reshape(2, 3)
    m[0] /= np.linalg.norm(m[0])
    m[1] -= m[0] * (m[0] @ m[1])
    m[1] /= np.linalg.norm(m[1])
    m[2] = np.cross(m[0], m[1])
    return m.T[:2].reshape(6).astype(np.float32)
