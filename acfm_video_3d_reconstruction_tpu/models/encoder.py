"""ResNet-18 trunk + global-code encoder (flax, NHWC).

Parity target: reference monocular/nnutils/mesh_net.py:84-132 /
multiframe/nnutils/mesh_net.py:90-135 — torchvision resnet18 through layer4
(stride 32), an extra 4x4/stride-2 conv to 256ch, and a 2-layer FC stack to
the nz_feat global code. Returns (code, res_feats) where res_feats is the
256 x 4 x 4 spatial map consumed by the camera and texture heads.

Pretrained torchvision weights can be imported with
models/torch_import.py when a checkpoint file is available (no network
access is assumed).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .nn_blocks import ConvBNLeaky, FCStack


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        out = nn.Conv(
            self.features, (3, 3), (self.strides, self.strides),
            padding=[(1, 1), (1, 1)], use_bias=False, dtype=self.dtype,
            name="conv1",
        )(x)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, name="conv2",
        )(out)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn2")(out)
        if self.strides != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features, (1, 1), (self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(x)
            identity = nn.BatchNorm(
                use_running_average=not train, dtype=self.dtype, name="downsample_bn"
            )(identity)
        return nn.relu(out + identity)


class ResNet18(nn.Module):
    """torchvision resnet18 conv trunk (through layer4). Input NHWC."""

    dtype: Any = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        for i, (n_blocks, feats) in enumerate(zip(self.stage_sizes, self.stage_features)):
            for j in range(n_blocks):
                strides = 2 if (i > 0 and j == 0) else 1
                x = BasicBlock(
                    feats, strides=strides, dtype=self.dtype,
                    name=f"layer{i + 1}_{j}",
                )(x, train=train)
        return x


class Encoder(nn.Module):
    """ResNet trunk -> 4x4/2 conv (512->256) -> flatten -> 2-layer FC code."""

    nz_feat: int = 200
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, img, train: bool = False):
        feat = ResNet18(dtype=self.dtype, name="resnet")(img, train=train)
        res_feats = ConvBNLeaky(
            256, kernel_size=4, strides=2, dtype=self.dtype, name="enc_conv1"
        )(feat, train=train)
        flat = res_feats.reshape(res_feats.shape[0], -1)
        code = FCStack(self.nz_feat, 2, dtype=self.dtype, name="enc_fc")(flat, train=train)
        return code, res_feats
