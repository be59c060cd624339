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


def _fold2_weight_map() -> "np.ndarray":
    """Static 0/1 routing tensor for the 2x2 space-to-depth conv identity.

    A 3x3 stride-1 SAME conv on (H, W) equals a 3x3 SAME conv on the
    (H/2, W/2) 2x2-folded layout: output sub-pixel (di, dj), kernel tap
    (u, v) reads input row 2i+di+u-1 = 2(i+pi)+qi, so the folded kernel
    entry (pi+1, pj+1) routes original tap (u, v) from folded in-channel
    block (qi, qj) to folded out-channel block (di, dj), with
    u = 2*pi + qi - di + 1 (and symmetrically v); taps outside [0, 2]
    are zero. Shape (3, 3, 2, 2, 2, 2, 3, 3) = (p, q, qi, qj, di, dj, u, v).
    """
    import numpy as np

    M = np.zeros((3, 3, 2, 2, 2, 2, 3, 3), np.float32)
    for p in range(3):
        for qi in range(2):
            for di in range(2):
                u = 2 * (p - 1) + qi - di + 1
                if not 0 <= u <= 2:
                    continue
                for q in range(3):
                    for qj in range(2):
                        for dj in range(2):
                            v = 2 * (q - 1) + qj - dj + 1
                            if 0 <= v <= 2:
                                M[p, q, qi, qj, di, dj, u, v] = 1.0
    return M


_FOLD2_MAP = _fold2_weight_map()


def fold2_weights(w: jax.Array) -> jax.Array:
    """(3, 3, C, K) HWIO kernel -> the exactly-equivalent (3, 3, 4C, 4K)
    kernel on the 2x2 space-to-depth layout (see _fold2_weight_map)."""
    C, K = w.shape[2], w.shape[3]
    wf = jnp.einsum(
        "pqabcduv,uvCK->pqabCcdK", jnp.asarray(_FOLD2_MAP, w.dtype), w
    )
    return wf.reshape(3, 3, 4 * C, 4 * K)


def apply_conv3x3(conv: nn.Conv, x: jax.Array, fold: int = 1) -> jax.Array:
    """Apply a 3x3 stride-1 SAME nn.Conv, optionally 2x2 space-to-depth
    folded.

    fold=2 computes the SAME result (exact weight-level identity, zero
    borders included) as `conv(x)` via a conv on the (H/2, W/2, 4C)
    folded layout with the fold2_weights kernel: the TPU MXU pads
    channels to 128 lanes, so the narrow decoder-tail convs (C, K <= 32)
    run at ~4% MXU peak unfolded; folding quadruples the dense FLOPs but
    raises lane utilization ~8-16x (README round-4 roofline). Params stay
    in the plain nn.Conv (same pytree: checkpoints/importers unchanged);
    the 1x1 probe call only materializes them and is dead-code-eliminated.
    """
    if fold == 1 or x.shape[1] % 2 or x.shape[2] % 2:
        return conv(x)
    assert fold == 2, fold
    _ = conv(x[:, :1, :1, :])  # bind/create params; result unused (DCE)
    kernel = conv.variables["params"]["kernel"]
    bias = conv.variables["params"]["bias"]
    B, H, W, C = x.shape
    K = kernel.shape[-1]
    dt = conv.dtype or x.dtype
    xf = x.reshape(B, H // 2, 2, W // 2, 2, C)
    xf = xf.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)
    y = jax.lax.conv_general_dilated(
        xf.astype(dt),
        fold2_weights(kernel).astype(dt),
        (1, 1),
        [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y + jnp.tile(bias, 4).astype(dt)
    y = y.reshape(B, H // 2, W // 2, 2, 2, K)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, K)


class ResLayer2d(nn.Module):
    """networks.py ResLayer_2d: two conv3x3+BN with LeakyReLU; identity skip
    only when in_channels == features * expansion (expansion=1 call sites).

    fold=2 runs both convs space-to-depth folded (apply_conv3x3): same
    math and same param tree, but MXU-lane-efficient for narrow channels.
    BN/activations stay in the unfolded layout, so statistics are
    untouched."""

    features: int
    expansion: int = 1
    dtype: Any = jnp.float32
    fold: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        skip = x.shape[-1] == self.features * self.expansion
        out = apply_conv3x3(conv3x3(self.features, self.dtype), x, self.fold)
        out = nn.BatchNorm(use_running_average=not train, dtype=self.dtype)(out)
        out = nn.leaky_relu(out, 0.01)
        out = apply_conv3x3(conv3x3(self.features, self.dtype), out, self.fold)
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
