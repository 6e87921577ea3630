"""ATHNet deep-hashing model (reference ath_model.py:6-108): three small
ResBlocks with spatial attention, a hash layer and a class-type layer."""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class SpatialAttention(nn.Module):
    @nn.compact
    def __call__(self, x):
        avg_out = jnp.mean(x, axis=-1, keepdims=True)
        max_out = jnp.max(x, axis=-1, keepdims=True)
        a = nn.Conv(1, (3, 3), padding=1, use_bias=False, name="conv")(
            jnp.concatenate([avg_out, max_out], axis=-1)
        )
        return nn.sigmoid(a)


class ResBlock(nn.Module):
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        h = nn.Conv(
            self.out_channels, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1",
        )(x)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, use_bias=False, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, momentum=0.9, name="bn2")(h)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = nn.Conv(
                self.out_channels, (3, 3), strides=(self.stride, self.stride),
                padding=1, use_bias=False, name="down_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, name="down_bn"
            )(identity)
        return nn.relu(h + identity)


class ATHNet(nn.Module):
    """Returns (hash_codes (B, hash_size), logits (B, num_classes))."""

    hash_size: int
    num_classes: int
    input_size: int = 256

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.input_size % 8 != 0:
            raise ValueError("input_size must be divisible by 8 for ATHNet.")
        h = ResBlock(16, stride=2, name="block1")(x, train)
        h = nn.max_pool(h, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        h = SpatialAttention(name="sa")(h) * h
        h = ResBlock(8, stride=2, name="block2")(h, train)
        h = nn.avg_pool(h, (3, 3), strides=(1, 1), padding=((1, 1), (1, 1)))
        h = ResBlock(1, stride=2, name="dense")(h, train)
        h = h.reshape(h.shape[0], -1)
        hash_codes = nn.Dense(self.hash_size, name="hashlayer")(h)
        logits = nn.Dense(self.num_classes, name="typelayer")(h)
        return hash_codes, logits
