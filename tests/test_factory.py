"""Model-factory smoke tests: every config variant builds and runs."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from nope_tpu.configs.config import EncoderConfig, ModelConfig, UNetConfig
from nope_tpu.models.factory import build_task


def _tiny_encoder():
    return EncoderConfig(
        kind="vae", latent_dim=4, block_out_channels=(8, 8, 8, 8),
        layers_per_block=1, norm_groups=4,
    )


@pytest.mark.parametrize(
    "unet_cfg",
    [
        UNetConfig(variant="vae_base", u_net_dim=8, dim_mults=(1, 2),
                   resnet_block_groups=4),
        UNetConfig(variant="vae_cin_ldm", model_channels=32,
                   attention_resolutions=(2, 1), num_res_blocks=1,
                   channel_mult=(1, 2), num_head_channels=16, context_dim=24),
        UNetConfig(variant="vae_guidedDiffusion", model_channels=32,
                   gd_attention_resolutions=(2,), num_res_blocks=1,
                   gd_channel_mult=(1, 2), num_head_channels=16),
    ],
    ids=["vae_base", "vae_cin_ldm", "vae_guidedDiffusion"],
)
def test_every_unet_variant_runs(unet_cfg, rng):
    cfg = ModelConfig(u_net=unet_cfg, encoder=_tiny_encoder(), img_size=32)
    task = build_task(cfg)
    params = task.init(jax.random.key(0), image_size=32)
    batch_q = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    batch_r = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    pose = jnp.asarray(rng.normal(size=(2, 6)).astype(np.float32))
    loss = task.forward_loss(params, batch_q, batch_r, pose)
    assert np.isfinite(float(loss))
    # pose actually conditions the prediction.  LDM/ADM variants use
    # zero-init output/projection layers (faithful to the originals), so
    # randomise the U-Net weights first.
    leaves, treedef = jax.tree.flatten(params["unet"])
    keys = jax.random.split(jax.random.key(7), len(leaves))
    params = dict(params)
    params["unet"] = jax.tree.unflatten(
        treedef,
        [0.02 * jax.random.normal(k, l.shape, l.dtype) for k, l in zip(keys, leaves)],
    )
    lat = task.encode(params, batch_r, "mode")
    p1 = task.predict_latent(params, lat, pose)
    p2 = task.predict_latent(params, lat, pose + 1.0)
    assert float(jnp.max(jnp.abs(p1 - p2))) > 1e-6


def test_template_encoder_task(rng):
    cfg = ModelConfig(
        u_net=UNetConfig(variant="template_base", u_net_dim=8, dim_mults=(1, 2),
                         resnet_block_groups=4),
        encoder=EncoderConfig(kind="template", latent_dim=8, descriptor_size=8),
        img_size=32,
    )
    task = build_task(cfg)
    params = task.init(jax.random.key(0), image_size=32)
    q = jnp.asarray(rng.uniform(-1, 1, (1, 32, 32, 3)).astype(np.float32))
    feat = task.encode(params, q, "mode")
    # fully-conv resnet50 (stride 2 stem + 2 stride-2 stages) -> f8
    assert feat.shape == (1, 4, 4, 8)
    loss = task.forward_loss(params, q, q, jnp.zeros((1, 6)))
    assert np.isfinite(float(loss))


def test_template_tiny_encoder(rng):
    """template_tiny = the reference's BaseFeatureExtractor conv stack
    (base_template.py:78-100).  In the template-pose lineage it is a
    standalone retrieval encoder (features scored directly, no U-Net;
    its VALID convs give odd spatial dims the U-Net couldn't take)."""
    from nope_tpu.models.factory import build_encoder
    from nope_tpu.models.template_encoder import occlusion_aware_similarity

    enc = build_encoder(EncoderConfig(kind="template_tiny", latent_dim=8,
                                      descriptor_size=8))
    q = jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
    variables = enc.init(jax.random.key(0), q)
    feat = enc.apply(variables, q)
    # VALID 8x8/2 conv then VALID 5x5: (32-8)/2+1=13 -> 13-4=9
    assert feat.shape == (2, 9, 9, 8)
    # retrieval-style local cosine scoring with occlusion gating
    f = feat.reshape(2, -1, 8)
    sim = jnp.einsum("bnc,bnc->bn", f, f) / (
        jnp.linalg.norm(f, axis=-1) ** 2 + 1e-8
    )
    gated = occlusion_aware_similarity(sim, threshold=0.2)
    assert np.isfinite(np.asarray(gated)).all()


def test_ldm_posencoding_with_indivisible_context_dim(rng):
    """The LDM variant supports posEncoding with context_dim not
    divisible by 6 (adapt_openaimodel.py:114-118 trims)."""
    from nope_tpu.models.ldm_unet import LDMPoseUNet

    m = LDMPoseUNet(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(1,), channel_mult=(1, 2), num_head_channels=16,
        context_dim=20, pose_mlp_name="posEncoding",
    )
    v = m.init(jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 6)))
    out = m.apply(v, jnp.zeros((1, 8, 8, 4)), jnp.ones((1, 6)))
    assert out.shape == (1, 8, 8, 4)
