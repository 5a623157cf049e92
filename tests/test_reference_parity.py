"""Parity tests that execute the ACTUAL reference source.

Round-1 parity tests compared against hand-rewritten torch oracles; a
hand-written oracle can encode the same misreading twice.  These tests
import the real classes from ``/root/reference`` (via
:mod:`tests.refshim`) and assert that the ported JAX implementations
reproduce them at fp32 tolerance:

- default U-Net: ``src/model/u_net/denoising_diffusion_pytorch/u_net.py:26-198``
- GeodesicError: ``src/model/loss.py:14-115`` (all 3 symmetry classes)
- crop_frame:    ``src/poses/utils.py:204-272`` (real cv2 warp)
- retrieval:     ``src/model/model.py:254-266`` (the "l2" quirk metric)
- LDM adapter:   ``src/model/u_net/ldm/adapt_openaimodel.py``
- ADM adapter:   ``src/model/u_net/guided_diffusion/adapt_u_net.py``
"""

import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import refshim

refshim.install()


def _randomize(model, std=0.05, seed=0):
    torch.manual_seed(seed)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, std)
    model.eval()
    return model


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def _stub_encoder(latent_dim=4):
    # duck-typed stand-in for VAE_StableDiffusion: the U-Nets only read
    # .latent_dim/.name at construction (u_net.py:45-47); not an
    # nn.Module so it stays out of state_dict()
    return types.SimpleNamespace(latent_dim=latent_dim, name="stub")


# ---------------------------------------------------------------------------
# default U-Net (denoising_diffusion_pytorch)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pose_mlp_name", ["single_layer", "two_layers"])
def test_default_unet_forward_vs_reference_source(rng, pose_mlp_name):
    from src.model.u_net.denoising_diffusion_pytorch.u_net import UNet

    from nope_tpu.models.unet import PoseUNet
    from nope_tpu.training import port

    torch.manual_seed(0)
    ref = UNet(
        u_net_dim=16,
        rot_representation_dim=6,
        encoder=_stub_encoder(),
        pose_mlp_name=pose_mlp_name,
        dim_mults=(1, 2),
        resnet_block_groups=8,
    )
    ref.eval()

    mine = PoseUNet(
        u_net_dim=16,
        channels=4,
        rot_representation_dim=6,
        dim_mults=(1, 2),
        resnet_block_groups=8,
        pose_mlp_name=pose_mlp_name,
        double_bottleneck=True,  # the reference forward runs the
        # bottleneck twice (u_net.py:180-186)
    )
    ported = port.port_pose_unet(_sd(ref), dim_mults=(1, 2), pose_mlp_name=pose_mlp_name)
    template = mine.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1, 6))
    )["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    pose = rng.normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(pose)).numpy()
    with jax.default_matmul_precision("highest"):
        got = mine.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(pose),
        )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=1e-3)


def test_default_unet_soft_updown_vs_reference_source(rng):
    """use_hard_up_down=False selects the conv-transpose/strided pair
    (u_net.py:55-60) — parity for the alternate resample flavour."""
    from src.model.u_net.denoising_diffusion_pytorch.u_net import UNet

    from nope_tpu.models.unet import PoseUNet
    from nope_tpu.training import port

    torch.manual_seed(1)
    ref = UNet(
        u_net_dim=16,
        rot_representation_dim=6,
        encoder=_stub_encoder(),
        pose_mlp_name="single_layer",
        use_hard_up_down=False,
        dim_mults=(1, 2),
        resnet_block_groups=8,
    )
    ref.eval()
    mine = PoseUNet(
        u_net_dim=16, channels=4, rot_representation_dim=6, dim_mults=(1, 2),
        resnet_block_groups=8, use_hard_up_down=False, double_bottleneck=True,
    )
    ported = port.port_pose_unet(_sd(ref), dim_mults=(1, 2), use_hard_up_down=False)
    template = mine.init(
        jax.random.key(0), jnp.zeros((1, 16, 16, 4)), jnp.zeros((1, 6))
    )["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 4, 16, 16)).astype(np.float32)
    pose = rng.normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(pose)).numpy()
    with jax.default_matmul_precision("highest"):
        got = mine.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(pose),
        )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=3e-4, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# GeodesicError (loss.py)
# ---------------------------------------------------------------------------


def _random_rotations(rng, n):
    from scipy.spatial.transform import Rotation

    return Rotation.random(n, random_state=rng).as_matrix().astype(np.float32)


def test_geodesic_error_top1_vs_reference_source(rng):
    from src.model.loss import GeodesicError as RefGeodesicError

    from nope_tpu.tasks.metrics import GeodesicError

    b = 12
    pred = _random_rotations(rng, b)
    gt = _random_rotations(rng, b)
    # make the first sym-0/sym-1 pairs exactly aligned to exercise the
    # arccos extrapolation floor.  NOT the sym-2 pair: for identical
    # circular-symmetric poses the reference's unclamped
    # torch.acos(cosine_similarity) (loss.py:64-70) returns NaN (cos
    # rounds above 1.0) — we clamp instead (drift fix, see
    # test_geodesic_circle_identity_reference_nan below).
    gt[:2] = pred[:2]
    symmetry = np.array([0, 1, 2] * (b // 3), dtype=np.int32)

    ref_metric = RefGeodesicError(thresholds=[15, 30])
    want_err, want_res = ref_metric(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(symmetry)
    )

    mine = GeodesicError(thresholds=(15, 30))
    got_err, got_res = mine(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(symmetry))

    np.testing.assert_allclose(
        np.asarray(got_err), want_err.numpy(), atol=5e-3, rtol=1e-4
    )
    for key, want in want_res.items():
        assert key in got_res, f"missing result key {key!r}"
        np.testing.assert_allclose(
            float(got_res[key]), float(want), atol=5e-3, rtol=1e-4
        )


def test_geodesic_error_topk_vs_reference_source(rng):
    from src.model.loss import GeodesicError as RefGeodesicError

    from nope_tpu.tasks.metrics import GeodesicError

    b, k = 9, 5
    pred = _random_rotations(rng, b * k).reshape(b, k, 3, 3)
    gt = _random_rotations(rng, b)
    symmetry = np.array([0, 0, 0, 1, 1, 1, 2, 2, 2], dtype=np.int32)

    ref_metric = RefGeodesicError(thresholds=[15])
    want_err, want_res = ref_metric(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(symmetry)
    )
    mine = GeodesicError(thresholds=(15,))
    got_err, got_res = mine(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(symmetry))

    np.testing.assert_allclose(
        np.asarray(got_err), want_err.numpy(), atol=5e-3, rtol=1e-4
    )
    for key, want in want_res.items():
        assert key in got_res, f"missing result key {key!r}"
        np.testing.assert_allclose(
            float(got_res[key]), float(want), atol=5e-3, rtol=1e-4
        )


def test_geodesic_identity_floor_vs_reference_source():
    """pred == gt: the 1-1e-4 cos bound gives a nonzero floor (~0.41°);
    assert we reproduce the reference's exact floor value."""
    from src.model.loss import GeodesicError as RefGeodesicError

    from nope_tpu.tasks.metrics import GeodesicError

    eye = np.tile(np.eye(3, dtype=np.float32), (3, 1, 1))
    symmetry = np.zeros(3, dtype=np.int32)
    want_err, _ = RefGeodesicError()(
        torch.from_numpy(eye), torch.from_numpy(eye), torch.from_numpy(symmetry)
    )
    got_err, _ = GeodesicError()(
        jnp.asarray(eye), jnp.asarray(eye), jnp.asarray(symmetry)
    )
    np.testing.assert_allclose(np.asarray(got_err), want_err.numpy(), atol=1e-3)
    assert float(want_err[0]) > 0.3  # the documented ~0.41° floor


def test_geodesic_circle_identity_reference_nan():
    """Documented drift fix: for identical circular-symmetric (sym=2)
    poses the reference's unclamped ``torch.acos(cosine_similarity)``
    (loss.py:64-70) yields NaN; we clamp the cosine and return 0."""
    from src.model.loss import GeodesicError as RefGeodesicError

    from nope_tpu.tasks.metrics import GeodesicError

    # a generic rotation whose float32 Z-row norm rounds the cosine just
    # above 1.0 (exact identity would give acos(1.0) = 0 instead)
    rot = _random_rotations(np.random.default_rng(0), 3)
    symmetry = np.full(3, 2, dtype=np.int32)
    want_err, _ = RefGeodesicError()(
        torch.from_numpy(rot), torch.from_numpy(rot), torch.from_numpy(symmetry)
    )
    got_err, _ = GeodesicError()(
        jnp.asarray(rot), jnp.asarray(rot), jnp.asarray(symmetry)
    )
    assert np.isnan(want_err.numpy()).any()  # the reference bug, pinned
    np.testing.assert_allclose(np.asarray(got_err), 0.0, atol=1e-3)


# ---------------------------------------------------------------------------
# crop_frame (poses/utils.py)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("keep_inplane", [False, True])
def test_crop_frame_vs_reference_source(rng, keep_inplane):
    from src.poses import utils as ref_utils

    from nope_tpu.geometry import cropping

    intrinsic = np.array(
        [[120.0, 0.0, 32.0], [0.0, 120.0, 32.0], [0.0, 0.0, 1.0]], dtype=np.float64
    )
    for trial in range(4):
        pose = np.eye(4)
        pose[:3, :3] = _random_rotations(rng, 1)[0]
        pose[:3, 3] = [rng.uniform(-0.05, 0.05), rng.uniform(-0.05, 0.05),
                       rng.uniform(0.8, 1.2)]
        img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        mask = (rng.uniform(size=(64, 64)) > 0.5).astype(np.uint8) * 255

        want_img, want_mask = ref_utils.crop_frame(
            img, mask, intrinsic, pose, image_size=32, keep_inplane=keep_inplane
        )
        got_img, got_mask = cropping.crop_frame(
            img, mask, intrinsic, pose, image_size=32, keep_inplane=keep_inplane
        )
        np.testing.assert_array_equal(got_img, want_img)
        np.testing.assert_array_equal(got_mask, want_mask)


# ---------------------------------------------------------------------------
# retrieval quirk metric (model.py:254-266)
# ---------------------------------------------------------------------------


def test_retrieval_quirk_vs_reference_source(rng):
    from src.model.model import PoseConditional

    from nope_tpu.ops.similarity import retrieve

    b, n, c, h, w = 3, 17, 4, 8, 8
    query_feat = rng.normal(size=(b, c, h, w)).astype(np.float32)
    bank = rng.normal(size=(b, n, c, h, w)).astype(np.float32)

    # drive the real unbound method with a duck self: encode_image is
    # identity so the metric sees query_feat exactly
    duck = types.SimpleNamespace(
        testing_config=types.SimpleNamespace(similarity_metric="l2"),
        u_net=types.SimpleNamespace(
            encoder=types.SimpleNamespace(
                encode_image=lambda img, mode=None: img, latent_dim=c, name="id"
            )
        ),
    )
    want_sim, want_idx = PoseConditional.retrieval(
        duck, torch.from_numpy(query_feat), torch.from_numpy(bank)
    )

    got_sim, got_idx = retrieve(
        jnp.asarray(np.transpose(query_feat, (0, 2, 3, 1))),
        jnp.asarray(np.transpose(bank, (0, 1, 3, 4, 2))),
        k=5,
        metric="l2",
    )
    np.testing.assert_allclose(
        np.asarray(got_sim), want_sim.numpy(), atol=1e-3, rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx.numpy())


# ---------------------------------------------------------------------------
# LDM adapter (ldm/adapt_openaimodel.py)
# ---------------------------------------------------------------------------


def test_ldm_adapter_vs_reference_source(rng):
    from src.model.u_net.ldm.adapt_openaimodel import UNetModelPose

    from nope_tpu.models.ldm_unet import LDMPoseUNet
    from nope_tpu.training import port

    kw = dict(
        injecting_condition_twice=False,
        pose_mlp_name="single_layer",
        rot_representation_dim=6,
        encoder=_stub_encoder(),
        image_size=8,
        in_channels=4,
        model_channels=32,
        out_channels=4,
        num_res_blocks=1,
        attention_resolutions=(2, 1),
        channel_mult=(1, 2),
        num_head_channels=16,
        use_spatial_transformer=True,
        transformer_depth=1,
        context_dim=24,
        legacy=False,
    )
    ref = _randomize(UNetModelPose(**kw))

    mine = LDMPoseUNet(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2),
        num_head_channels=16, context_dim=24, transformer_depth=1,
    )
    ported = port.port_ldm_unet(
        _sd(ref), channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2, 1),
    )
    template = mine.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 6))
    )["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    pose = rng.normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(pose)).numpy()
    with jax.default_matmul_precision("highest"):
        got = mine.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(pose),
        )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=5e-4, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# ADM adapter (guided_diffusion/adapt_u_net.py)
# ---------------------------------------------------------------------------


def test_adm_adapter_forward_crashes_in_reference():
    """Documented reference bug: ``adapt_u_net.UNetModelPose.forward``
    calls ``module(h, emb, emb)`` but guided_diffusion's
    ``TimestepEmbedSequential.forward(x, emb)`` (u_net.py:66-78) takes
    two arguments — the forward was copied from the LDM adapter without
    adjusting the call.  Running the reference's guided-diffusion config
    crashes; pin that so the drift fix below stays justified."""
    from src.model.u_net.guided_diffusion.adapt_u_net import UNetModelPose

    ref = UNetModelPose(
        pose_mlp_name="single_layer", rot_representation_dim=6,
        encoder=_stub_encoder(), image_size=8, in_channels=4,
        model_channels=32, out_channels=4, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16,
    )
    ref.eval()
    with pytest.raises(TypeError, match="positional argument"):
        with torch.no_grad():
            ref(torch.zeros(1, 4, 8, 8), torch.zeros(1, 6))


@pytest.fixture
def _patched_adm_sequential(monkeypatch):
    """Make the reference ADM forward runnable by letting
    TimestepEmbedSequential ignore the spurious context argument (the
    author's evident intent — the LDM twin passes context only to
    SpatialTransformer, which the ADM variant doesn't have)."""
    from src.model.u_net.guided_diffusion import u_net as gd_unet

    def forward(self, x, emb, context=None):
        for layer in self:
            if isinstance(layer, gd_unet.TimestepBlock):
                x = layer(x, emb)
            else:
                x = layer(x)
        return x

    monkeypatch.setattr(gd_unet.TimestepEmbedSequential, "forward", forward)


# ---------------------------------------------------------------------------
# LDM EncoderUNetModel + AttentionPool2d (openaimodel.py:795-1009, :33-62)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "pool,resblock_updown",
    [
        ("adaptive", False),
        ("attention", False),
        ("spatial", False),
        ("spatial_v2", True),  # also covers the ResBlock(down=True) path
    ],
)
def test_ldm_encoder_unet_vs_reference_source(rng, pool, resblock_updown):
    """The half-U-Net classifier (all four pooling heads, incl. the CLIP
    AttentionPool2d) against the reference's own EncoderUNetModel with
    ported weights and REAL timestep conditioning."""
    from src.model.u_net.ldm.openaimodel import EncoderUNetModel

    from nope_tpu.models.ldm_encoder import LDMEncoderUNet
    from nope_tpu.training import port

    kw = dict(
        image_size=8, in_channels=4, model_channels=32, out_channels=10,
        num_res_blocks=1, attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, resblock_updown=resblock_updown, pool=pool,
    )
    ref = _randomize(EncoderUNetModel(**kw))

    mine = LDMEncoderUNet(
        out_channels=10, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, resblock_updown=resblock_updown, pool=pool,
    )
    ported = port.port_ldm_encoder_unet(
        _sd(ref), channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), resblock_updown=resblock_updown,
        pool=pool,
    )
    template = mine.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,))
    )["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    t = np.array([3.0, 11.0], dtype=np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(t)).numpy()
    with jax.default_matmul_precision("highest"):
        got = mine.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(t),
        )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), want, atol=5e-4, rtol=1e-3)


# ---------------------------------------------------------------------------
# template-encoder family (encoder/template.py, base_template.py, resnet.py)
# ---------------------------------------------------------------------------


def test_template_resnet50_encoder_vs_reference_source(rng):
    """Full ResNet-50 template FeatureExtractor (encoder/template.py:24-53
    + the reference's own resnet.py), ported weights, forward parity."""
    from src.model.encoder.template import FeatureExtractor

    from nope_tpu.models.template_encoder import TemplateFeatureExtractor
    from nope_tpu.training import port

    ref = _randomize(FeatureExtractor(descriptor_size=8, threshold=0.2, normalize=True))
    with torch.no_grad():  # _randomize leaves BN stats at init; perturb them
        for name, buf in ref.named_buffers():
            if "running_var" in name:
                buf.uniform_(0.5, 1.5)
            elif "running_mean" in name:
                buf.normal_(0, 0.05)
    ref.eval()

    mine = TemplateFeatureExtractor(descriptor_size=8, normalize=True)
    ported = port.port_template_encoder(_sd(ref), layers=(3, 4, 6, 3))
    template = mine.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = ref.encode_image(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got = mine.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            method=mine.encode_image,
        )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-3)


def test_base_feature_extractor_vs_reference_source(rng):
    """The tiny standalone conv encoder (base_template.py:78-100).  The
    reference base class's own forward() references the undefined
    self.backbone, so the feature path is its ``encoder`` sequential."""
    from src.model.encoder.base_template import BaseFeatureExtractor as RefBase

    from nope_tpu.models.template_encoder import BaseFeatureExtractor
    from nope_tpu.training import port

    ref = _randomize(RefBase(descriptor_size=8, threshold=0.2))
    with pytest.raises(AttributeError):  # pin the reference's broken forward
        ref(torch.zeros(1, 3, 32, 32))

    mine = BaseFeatureExtractor(descriptor_size=8)
    ported = port.port_base_feature_extractor(_sd(ref))
    template = mine.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        want = ref.encoder(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        got = mine.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        )
    got = np.transpose(np.asarray(got), (0, 3, 1, 2))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)


def test_info_nce_extra_negatives_vs_reference_source(rng):
    """InfoNCE with BOP↔ShapeNet extra-object negatives
    (base_template.py:44-49) against the reference class.  The
    ShapeNet_ShapeNet branch hard-codes .cuda() (base_template.py:55-57)
    and cannot execute on this box — pinned, and our implementation is
    checked against torch.nn.functional.cross_entropy directly."""
    from src.model.encoder.base_template import InfoNCE as RefInfoNCE

    from nope_tpu.models.template_encoder import info_nce_loss

    b = 6
    pos = rng.normal(size=(b, b)).astype(np.float32)
    neg = rng.normal(size=(b, b)).astype(np.float32)
    extra = rng.normal(size=(b, b)).astype(np.float32)

    ref_loss = RefInfoNCE(tau=0.1, extra_contrast_type="BOP_ShapeNet")
    want_pos, want_neg, want = ref_loss(
        torch.from_numpy(pos), torch.from_numpy(neg), torch.from_numpy(extra)
    )
    got_pos, got_neg, got = info_nce_loss(
        jnp.asarray(pos), jnp.asarray(neg), tau=0.1,
        sim_extra_obj=jnp.asarray(extra), extra_contrast_type="BOP_ShapeNet",
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)
    np.testing.assert_allclose(float(got_pos), float(want_pos), rtol=1e-5)
    np.testing.assert_allclose(float(got_neg), float(want_neg), rtol=1e-5)

    # ShapeNet_ShapeNet: reference branch crashes on CPU (.cuda())
    ref_ss = RefInfoNCE(tau=0.1, extra_contrast_type="ShapeNet_ShapeNet")
    with pytest.raises(Exception):
        ref_ss(torch.from_numpy(pos), torch.from_numpy(neg), torch.from_numpy(extra))

    # semantics check vs torch cross_entropy on the documented layout
    eye = torch.eye(b)
    logits = (1 - eye) * torch.from_numpy(neg) + eye * torch.from_numpy(pos)
    extra_logits = (1 - eye) * torch.from_numpy(extra) + eye * torch.from_numpy(pos)
    full = torch.cat([logits, extra_logits], dim=0) / 0.1
    labels = torch.cat([torch.arange(b), torch.arange(b)])
    want_ss = torch.nn.functional.cross_entropy(full, labels)
    _, _, got_ss = info_nce_loss(
        jnp.asarray(pos), jnp.asarray(neg), tau=0.1,
        sim_extra_obj=jnp.asarray(extra), extra_contrast_type="ShapeNet_ShapeNet",
    )
    np.testing.assert_allclose(float(got_ss), float(want_ss), rtol=1e-5)


def test_occlusion_aware_similarity_vs_reference_source(rng):
    from src.model.encoder.base_template import OcclusionAwareSimilarity

    from nope_tpu.models.template_encoder import occlusion_aware_similarity

    sim = rng.uniform(-1, 1, size=(4, 9)).astype(np.float32)
    want = OcclusionAwareSimilarity(threshold=0.2)(torch.from_numpy(sim.copy())).numpy()
    got = occlusion_aware_similarity(jnp.asarray(sim), threshold=0.2)
    np.testing.assert_array_equal(np.asarray(got), want)


@pytest.mark.parametrize("resblock_updown", [False, True])
def test_adm_adapter_vs_reference_source(rng, resblock_updown, _patched_adm_sequential):
    from src.model.u_net.guided_diffusion.adapt_u_net import UNetModelPose

    from nope_tpu.models.adm_unet import ADMPoseUNet
    from nope_tpu.training import port

    ref = _randomize(
        UNetModelPose(
            pose_mlp_name="single_layer",
            rot_representation_dim=6,
            encoder=_stub_encoder(),
            image_size=8,
            in_channels=4,
            model_channels=32,
            out_channels=4,
            num_res_blocks=1,
            attention_resolutions=(2,),
            channel_mult=(1, 2),
            num_head_channels=16,
            use_scale_shift_norm=True,
            resblock_updown=resblock_updown,
        )
    )
    mine = ADMPoseUNet(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, resblock_updown=resblock_updown,
        use_scale_shift_norm=True,
    )
    ported = port.port_adm_unet(
        _sd(ref), channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), resblock_updown=resblock_updown,
    )
    template = mine.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 6))
    )["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    pose = rng.normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x), torch.from_numpy(pose)).numpy()
    with jax.default_matmul_precision("highest"):
        got = mine.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(pose),
        )
    np.testing.assert_allclose(
        np.transpose(np.asarray(got), (0, 3, 1, 2)), want, atol=5e-4, rtol=1e-3
    )


# ---------------------------------------------------------------------------
# LDM schedule helpers (util.py:9-81)
# ---------------------------------------------------------------------------


def test_beta_and_ddim_schedules_vs_reference_source():
    from src.model.u_net.ldm.util import (
        betas_for_alpha_bar as ref_betas_for_alpha_bar,
        make_beta_schedule as ref_make_beta_schedule,
        make_ddim_sampling_parameters as ref_make_ddim_sampling_parameters,
        make_ddim_timesteps as ref_make_ddim_timesteps,
    )

    from nope_tpu.models import schedules

    for name in ("linear", "cosine", "sqrt_linear", "sqrt"):
        np.testing.assert_allclose(
            schedules.make_beta_schedule(name, 100),
            ref_make_beta_schedule(name, 100),
            rtol=1e-12,
            err_msg=name,
        )

    for method in ("uniform", "quad"):
        steps = schedules.make_ddim_timesteps(method, 10, 100, verbose=False)
        np.testing.assert_array_equal(
            steps, ref_make_ddim_timesteps(method, 10, 100, verbose=False)
        )

    betas = schedules.make_beta_schedule("linear", 100)
    alphacums = np.cumprod(1.0 - betas)
    steps = schedules.make_ddim_timesteps("uniform", 10, 100, verbose=False)
    # the reference indexes alphacums[steps] with steps ending at
    # num_ddpm (the +1 quirk); clamp identically for the comparison
    steps = np.clip(steps, 0, len(alphacums) - 1)
    got = schedules.make_ddim_sampling_parameters(alphacums, steps, eta=0.5)
    want = ref_make_ddim_sampling_parameters(alphacums, steps, eta=0.5, verbose=False)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-12)

    alpha_bar = lambda t: np.cos((t + 0.008) / 1.008 * np.pi / 2) ** 2
    np.testing.assert_allclose(
        schedules.betas_for_alpha_bar(50, alpha_bar),
        ref_betas_for_alpha_bar(50, alpha_bar),
        rtol=1e-12,
    )
