"""Shared flax building blocks mirroring the reference's net_blocks.py.

Parity target: reference */nnutils/net_blocks.py (fc/conv2d stacks with
BatchNorm + LeakyReLU(0.2) and N(0, 0.02) init) and */nnutils/networks.py
ResLayer_2d / conv3x3 (the texture decoder's residual blocks).

All modules are NHWC. BatchNorm uses flax's batch_stats collection;
`train=True` updates running statistics.
"""
from __future__ import annotations

from typing import Any, Callable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

normal_init = nn.initializers.normal(stddev=0.02)


class ConvBNLeaky(nn.Module):
    """conv2d(batch_norm=True, ...) of net_blocks.py:46-58: Conv(SAME-ish
    padding (k-1)//2) -> BN -> LeakyReLU(0.2)."""

    features: int
    kernel_size: int = 3
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel_size - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.strides, self.strides),
            padding=[(pad, pad), (pad, pad)],
            kernel_init=normal_init,
            dtype=self.dtype,
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.2)


class FCBNLeaky(nn.Module):
    """fc(batch_norm=True) of net_blocks.py:24-35: Linear -> BN1d -> LeakyReLU(0.2)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, kernel_init=normal_init, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(x)
        return nn.leaky_relu(x, 0.2)


class FCStack(nn.Module):
    """fc_stack of net_blocks.py:37-44."""

    features: int
    nlayers: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.nlayers):
            x = FCBNLeaky(self.features, dtype=self.dtype)(x, train=train)
        return x


def conv3x3(features: int, dtype=jnp.float32) -> nn.Conv:
    """networks.py conv3x3: 3x3 conv, bias, default torch init preserved by
    the reference (net_init is not applied to the texture decoder)."""
    return nn.Conv(features, (3, 3), padding=[(1, 1), (1, 1)], dtype=dtype)


class ResLayer2d(nn.Module):
    """networks.py ResLayer_2d: two conv3x3+BN with LeakyReLU; identity skip
    only when in_channels == features * expansion (expansion=1 call sites)."""

    features: int
    expansion: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x.shape[-1] == self.features * self.expansion
        out = conv3x3(self.features, self.dtype)(x)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        out = nn.leaky_relu(out, 0.01)
        out = conv3x3(self.features, self.dtype)(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        if skip:
            out = out + x
        return nn.leaky_relu(out, 0.01)


def upsample2x(x: jax.Array, method: str = "bilinear") -> jax.Array:
    """nn.Upsample(scale_factor=2, mode='bilinear') equivalent (NHWC).

    torch bilinear upsample with align_corners=False == jax.image.resize
    'bilinear' at exactly 2x.
    """
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method=method)


def resize_bilinear(x: jax.Array, h: int, w: int) -> jax.Array:
    """F.interpolate(mode='bilinear', align_corners=False) equivalent (NHWC)."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), method="bilinear")
