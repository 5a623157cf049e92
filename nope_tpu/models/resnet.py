"""ResNet backbone (Flax, NHWC) for the template encoder.

Re-implements the reference's vendored torchvision-style ResNet
(``/root/reference/src/model/encoder/resnet.py``) including its
template-pose modifications: ``use_avg_pooling_and_fc=False`` runs
fully-convolutionally — the stem maxpool is skipped and layer4 uses
stride 1, so a 256px input yields a 32x32 feature map (f8, matching the
VAE latent grid).

BatchNorm runs in inference mode with ported statistics (the template
encoder is frozen in NOPE), implemented as a scale/bias affine over
(x - mean) / sqrt(var + eps) with non-trainable stats variables.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


class FrozenBatchNorm(nn.Module):
    """Inference-mode BatchNorm.  Stats live in the ``params``
    collection (not ``batch_stats``) because this backbone is only ever
    used frozen — it receives ported torch statistics and no optimizer
    updates (the task model keeps encoder params out of the optimizer),
    which keeps the single-collection API of the task layer intact."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = self.param("mean", nn.initializers.zeros, (c,))
        var = self.param("var", nn.initializers.ones, (c,))
        inv = jax.lax.rsqrt(var + self.epsilon)
        return (x - mean) * inv * scale + bias


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(out)
        out = FrozenBatchNorm(name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, name="conv3")(out)
        out = FrozenBatchNorm(name="bn3")(out)
        if self.downsample:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        identity = x
        out = nn.Conv(self.planes, (3, 3), strides=(self.stride, self.stride),
                      padding=1, use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False, name="conv2")(out)
        out = FrozenBatchNorm(name="bn2")(out)
        if self.downsample:
            identity = nn.Conv(self.planes, (1, 1),
                               strides=(self.stride, self.stride), use_bias=False,
                               name="downsample_conv")(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(out + identity)


class ResNet(nn.Module):
    """layers=(3,4,6,3) block=Bottleneck == ResNet-50."""

    layers: Sequence[int] = (3, 4, 6, 3)
    block: type = Bottleneck
    features: int = 64
    use_avg_pooling_and_fc: bool = False
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        out = nn.Conv(self.features, (7, 7), strides=(2, 2), padding=3,
                      use_bias=False, name="conv1")(x)
        out = FrozenBatchNorm(name="bn1")(out)
        out = nn.relu(out)
        if self.use_avg_pooling_and_fc:
            out = nn.max_pool(out, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        # layer4 stride 1: fully-convolutional template-pose variant
        strides = (1, 2, 2, 1)
        inplanes = self.features
        for li, (n_blocks, stride) in enumerate(zip(self.layers, strides)):
            planes = self.features * (2**li)
            for bi in range(n_blocks):
                s = stride if bi == 0 else 1
                needs_ds = s != 1 or inplanes != planes * self.block.expansion
                out = self.block(
                    planes, stride=s, downsample=needs_ds,
                    name=f"layer{li + 1}_{bi}",
                )(out)
                inplanes = planes * self.block.expansion

        if self.use_avg_pooling_and_fc:
            out = jnp.mean(out, axis=(1, 2))
            out = nn.Dense(self.num_classes, name="fc")(out)
        return out


def resnet50(**kwargs) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), block=Bottleneck, **kwargs)


def resnet18(**kwargs) -> ResNet:
    return ResNet(layers=(2, 2, 2, 2), block=BasicBlock, **kwargs)


def resnet34(**kwargs) -> ResNet:
    return ResNet(layers=(3, 4, 6, 3), block=BasicBlock, **kwargs)


def resnet101(**kwargs) -> ResNet:
    return ResNet(layers=(3, 4, 23, 3), block=Bottleneck, **kwargs)


def resnet152(**kwargs) -> ResNet:
    return ResNet(layers=(3, 8, 36, 3), block=Bottleneck, **kwargs)
