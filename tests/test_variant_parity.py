"""Port parity for the LDM and ADM U-Net variants and the template
encoder, against independent torch oracles with reference key names.

All oracle weights are randomised post-construction so zero-initialised
output layers can't mask mapping errors.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from nope_tpu.models.ldm_unet import LDMPoseUNet
from nope_tpu.models.adm_unet import ADMPoseUNet
from nope_tpu.models.template_encoder import TemplateFeatureExtractor
from nope_tpu.models.resnet import resnet50
from nope_tpu.training import port


def _randomize(model, std=0.05):
    torch.manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.normal_(0, std)
        for name, buf in model.named_buffers():
            if "running_var" in name:
                buf.uniform_(0.5, 1.5)
            elif "running_mean" in name:
                buf.normal_(0, std)
    model.eval()
    return model


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_ldm_unet_parity(rng):
    from tests.oracles.torch_ldm_unet import TorchLDMPoseUNet

    kw = dict(
        in_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2),
        num_head_channels=16, context_dim=24,
    )
    oracle = _randomize(TorchLDMPoseUNet(**kw))
    flax_model = LDMPoseUNet(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2, 1), channel_mult=(1, 2),
        num_head_channels=16, context_dim=24, transformer_depth=1,
    )
    ported = port.port_ldm_unet(
        _sd(oracle), channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2, 1),
    )
    template = flax_model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 6))
    )["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    pose = rng.normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(pose)).numpy()
    with jax.default_matmul_precision("highest"):
        ours = flax_model.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(pose),
        )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


@pytest.mark.parametrize("resblock_updown", [True, False])
def test_adm_unet_parity(rng, resblock_updown):
    from tests.oracles.torch_adm_unet import TorchADMPoseUNet

    oracle = _randomize(
        TorchADMPoseUNet(
            in_channels=4, model_channels=32, num_res_blocks=1,
            attention_resolutions=(2,), channel_mult=(1, 2),
            num_head_channels=16, resblock_updown=resblock_updown,
        )
    )
    flax_model = ADMPoseUNet(
        in_channels=4, out_channels=4, model_channels=32, num_res_blocks=1,
        attention_resolutions=(2,), channel_mult=(1, 2),
        num_head_channels=16, resblock_updown=resblock_updown,
        use_scale_shift_norm=True,
    )
    ported = port.port_adm_unet(
        _sd(oracle), channel_mult=(1, 2), num_res_blocks=1,
        attention_resolutions=(2,), resblock_updown=resblock_updown,
    )
    template = flax_model.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 6))
    )["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 4, 8, 8)).astype(np.float32)
    pose = rng.normal(size=(2, 6)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x), torch.from_numpy(pose)).numpy()
    with jax.default_matmul_precision("highest"):
        ours = flax_model.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
            jnp.asarray(pose),
        )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_template_encoder_parity(rng):
    """ResNet-50 template encoder vs a torchvision-style torch oracle
    (stem maxpool skipped, layer4 stride 1, projector 1x1 convs)."""
    import torch.nn as tnn

    class TorchBottleneck(tnn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = tnn.Conv2d(inplanes, planes, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(planes)
            self.conv2 = tnn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
            self.bn2 = tnn.BatchNorm2d(planes)
            self.conv3 = tnn.Conv2d(planes, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU()
            self.downsample = downsample

        def forward(self, x):
            identity = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + identity)

    class TorchBackbone(tnn.Module):
        def __init__(self, layers=(2, 2, 2, 2), features=8):
            super().__init__()
            self.conv1 = tnn.Conv2d(3, features, 7, stride=2, padding=3, bias=False)
            self.bn1 = tnn.BatchNorm2d(features)
            self.relu = tnn.ReLU()
            inplanes = features
            strides = (1, 2, 2, 1)
            for li, (n, s) in enumerate(zip(layers, strides)):
                planes = features * (2**li)
                blocks = []
                for bi in range(n):
                    st = s if bi == 0 else 1
                    ds = None
                    if st != 1 or inplanes != planes * 4:
                        ds = tnn.Sequential(
                            tnn.Conv2d(inplanes, planes * 4, 1, stride=st, bias=False),
                            tnn.BatchNorm2d(planes * 4),
                        )
                    blocks.append(TorchBottleneck(inplanes, planes, st, ds))
                    inplanes = planes * 4
                setattr(self, f"layer{li + 1}", tnn.Sequential(*blocks))

        def forward(self, x):
            x = self.relu(self.bn1(self.conv1(x)))  # maxpool skipped
            for li in range(1, 5):
                x = getattr(self, f"layer{li}")(x)
            return x

    class TorchExtractor(tnn.Module):
        def __init__(self):
            super().__init__()
            self.backbone = TorchBackbone()
            self.projector = tnn.Sequential(
                tnn.ReLU(), tnn.Conv2d(8 * 8 * 4, 16, 1, bias=False),
                tnn.ReLU(), tnn.Conv2d(16, 4, 1, bias=False),
            )

        def forward(self, x):
            return self.projector(self.backbone(x))

    oracle = _randomize(TorchExtractor())
    # rename projector keys to the reference's projector.{1,3}
    sd = _sd(oracle)

    from nope_tpu.models.resnet import ResNet, Bottleneck

    class TinyExtractor(TemplateFeatureExtractor):
        def setup(self):
            self.backbone = ResNet(
                layers=(2, 2, 2, 2), block=Bottleneck, features=8,
                use_avg_pooling_and_fc=False,
            )
            import flax.linen as nn

            self.proj1 = nn.Conv(16, (1, 1), use_bias=False, name="proj1")
            self.proj2 = nn.Conv(4, (1, 1), use_bias=False, name="proj2")

    flax_model = TinyExtractor(descriptor_size=4)
    ported = port.port_template_encoder(sd, layers=(2, 2, 2, 2))
    template = flax_model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))["params"]
    port.assert_tree_shapes_match(ported, template)

    x = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = oracle(torch.from_numpy(x)).numpy()
    with jax.default_matmul_precision("highest"):
        ours = flax_model.apply(
            {"params": jax.tree.map(jnp.asarray, ported)},
            jnp.asarray(np.transpose(x, (0, 2, 3, 1))),
        )
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    assert ours.shape == ref.shape  # (2, 4, 16, 16): f2 from the stem only...
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=1e-3)


def test_info_nce_matches_torch_cross_entropy(rng):
    from nope_tpu.models.template_encoder import info_nce_loss

    b = 6
    pos = rng.normal(size=(b, b)).astype(np.float32)  # diag used
    neg = rng.normal(size=(b, b)).astype(np.float32)
    _, _, ours = info_nce_loss(jnp.asarray(pos), jnp.asarray(neg), tau=0.1)

    eye = torch.eye(b)
    logits = (1 - eye) * torch.from_numpy(neg) + eye * torch.from_numpy(pos)
    loss = torch.nn.functional.cross_entropy(logits / 0.1, torch.arange(b))
    np.testing.assert_allclose(float(ours), float(loss), rtol=1e-5)
