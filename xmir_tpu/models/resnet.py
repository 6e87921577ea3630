"""ResNet50 backbone in Flax (NHWC), torchvision layout for weight conversion.

Reference model.py:9-39 strips the torchvision classifier and keeps the
global-average-pooled 2048-d feature.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1"
        )(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.planes,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=1,
            use_bias=False,
            name="conv2",
        )(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn2"
        )(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes * self.expansion, (1, 1), use_bias=False, name="conv3")(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn3"
        )(h)
        if self.downsample:
            identity = nn.Conv(
                self.planes * self.expansion,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                name="downsample_bn",
            )(identity)
        return nn.relu(h + identity)


class ResNetBackbone(nn.Module):
    """torchvision ResNet-50 feature extractor.

    Returns {"features": (B, H/32, W/32, 2048) final conv map, "pooled": (B, 2048)}.
    """

    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="bn1"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        planes = 64
        for stage, blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = _Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{stage + 1}_{b}",
                )(x, train)
            planes *= 2

        features = x
        pooled = jnp.mean(x, axis=(1, 2))
        return {"features": features, "pooled": pooled}


def resnet50() -> ResNetBackbone:
    return ResNetBackbone(layers=(3, 4, 6, 3))
