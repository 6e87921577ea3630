"""DenseNet121 backbone in Flax (NHWC, TPU-native layout).

Mirrors the torchvision DenseNet121 graph exactly so CheXNet `model.pt`
checkpoints convert weight-for-weight (reference model.py:42-84 strips the
classifier and appends ReLU + global average pooling). Parameter names follow
the torchvision module tree (conv0/norm0/denseblockN.denselayerM.{norm1,conv1,
norm2,conv2}/transitionN/norm5) to keep the converter mechanical.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class _DenseLayer(nn.Module):
    growth_rate: int
    bn_size: int = 4

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm1"
        )(x)
        h = nn.relu(h)
        h = nn.Conv(
            self.bn_size * self.growth_rate, (1, 1), use_bias=False, name="conv1"
        )(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm2"
        )(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.growth_rate, (3, 3), padding=1, use_bias=False, name="conv2"
        )(h)
        return jnp.concatenate([x, h], axis=-1)


class _DenseBlock(nn.Module):
    num_layers: int
    growth_rate: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_layers):
            x = _DenseLayer(self.growth_rate, name=f"denselayer{i + 1}")(x, train)
        return x


class _Transition(nn.Module):
    out_features: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm"
        )(x)
        x = nn.relu(x)
        x = nn.Conv(self.out_features, (1, 1), use_bias=False, name="conv")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class DenseNetBackbone(nn.Module):
    """torchvision-layout DenseNet feature extractor.

    __call__ returns {"features": (B, H/32, W/32, C) post-norm5 pre-ReLU map,
    "pooled": (B, C) after the reference's appended ReLU + GAP}.
    """

    growth_rate: int = 32
    block_config: Sequence[int] = (6, 12, 24, 16)
    num_init_features: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.num_init_features,
            (7, 7),
            strides=(2, 2),
            padding=3,
            use_bias=False,
            name="conv0",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm0"
        )(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        num_features = self.num_init_features
        for i, num_layers in enumerate(self.block_config):
            x = _DenseBlock(num_layers, self.growth_rate, name=f"denseblock{i + 1}")(
                x, train
            )
            num_features += num_layers * self.growth_rate
            if i != len(self.block_config) - 1:
                num_features //= 2
                x = _Transition(num_features, name=f"transition{i + 1}")(x, train)

        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name="norm5"
        )(x)
        features = x  # pre-ReLU map: what forward hooks capture in the reference
        x = nn.relu(x)
        pooled = jnp.mean(x, axis=(1, 2))
        return {"features": features, "pooled": pooled}


def densenet121() -> DenseNetBackbone:
    return DenseNetBackbone(block_config=(6, 12, 24, 16))
