"""Flow-network primitive ops: cost volume, deformable conv, tri-kernel
up/downsampling, backward warping. NHWC, pure JAX/XLA.

Parity targets: the reference's only native-code component — the
`Correlation` CUDA extension (multiframe/data/optical_flow/model/
correlation_package/, SURVEY.md §2.5) — plus MaskFlownet.py:12-77
(conv/deconv/Upsample/Downsample helpers), torchvision ops.DeformConv2d as
used at MaskFlownet.py:36-37, and the warp() bilinear backward-warping.

TPU-native design for the cost volume: instead of the CUDA kernel's
one-block-per-pixel channel reduction, displacements become static slice
pairs and the channel reduction a dense mean — XLA fuses the whole
(2md+1)^2 loop into a handful of vectorized kernels. A Pallas variant
(flow/correlation_pallas.py) keeps f1 resident in VMEM across all
displacements for the large-feature levels.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.grid_sample import grid_sample


def correlation(f1: jax.Array, f2: jax.Array, md: int = 4) -> jax.Array:
    """Cost volume between feature maps.

    f1, f2: (B, H, W, C). Returns (B, H, W, (2md+1)^2) where channel
    d = (dy+md)*(2md+1)+(dx+md) holds mean_c f1[y, x] * f2[y+dy, x+dx]
    (zero-padded), matching the CUDA extension with pad_size=md,
    kernel_size=1, stride1=stride2=1, corr_multiply=1 (correlation
    normalizes by the full channel count).
    """
    B, H, W, C = f1.shape
    pad = [(0, 0), (md, md), (md, md), (0, 0)]
    f2p = jnp.pad(f2, pad)
    outs = []
    for dy in range(-md, md + 1):
        for dx in range(-md, md + 1):
            shifted = jax.lax.dynamic_slice(
                f2p, (0, dy + md, dx + md, 0), (B, H, W, C)
            )
            outs.append((f1 * shifted).mean(axis=-1))
    return jnp.stack(outs, axis=-1)


def backward_warp(x: jax.Array, flow: jax.Array, mask_valid: bool = True) -> jax.Array:
    """Warp x (B, H, W, C) by flow (B, H, W, 2) [u, v] in pixels.

    Samples x at (x + u, y + v) with align_corners=True bilinear and zeroes
    out-of-bounds samples (MaskFlownet.py warp(): the hard 0.9999 validity
    threshold on a warped all-ones mask).
    """
    B, H, W, C = x.shape
    ys = jnp.arange(H, dtype=flow.dtype)
    xs = jnp.arange(W, dtype=flow.dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    gx = xx[None] + flow[..., 0]
    gy = yy[None] + flow[..., 1]
    gx = 2.0 * gx / max(W - 1, 1) - 1.0
    gy = 2.0 * gy / max(H - 1, 1) - 1.0
    grid = jnp.stack([gx, gy], axis=-1)
    out = grid_sample(x, grid, align_corners=True)
    if mask_valid:
        ones = jnp.ones_like(x[..., :1])
        m = grid_sample(ones, grid, align_corners=True)
        m = jnp.where(m < 0.9999, 0.0, 1.0)
        out = out * m
    return out


def deform_conv3x3(
    x: jax.Array, offsets: jax.Array, kernel: jax.Array, bias: jax.Array | None
) -> jax.Array:
    """torchvision DeformConv2d(k=3, s=1, p=1) equivalent, NHWC.

    x: (B, H, W, Cin); offsets: (B, H, W, 18) ordered as torchvision —
    per kernel tap k (row-major 3x3): (dy_k, dx_k) interleaved; kernel:
    (3, 3, Cin, Cout). Bilinear samples x at p + p_k + offset_k per tap,
    zero padding outside, then contracts taps+channels (one MXU matmul).
    """
    B, H, W, Cin = x.shape
    Cout = kernel.shape[-1]
    ys = jnp.arange(H, dtype=x.dtype)
    xs = jnp.arange(W, dtype=x.dtype)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")

    taps = []
    for k in range(9):
        ky, kx = k // 3 - 1, k % 3 - 1
        dy = offsets[..., 2 * k]
        dx = offsets[..., 2 * k + 1]
        gy = yy[None] + ky + dy
        gx = xx[None] + kx + dx
        # normalized align_corners=True coords; out-of-range -> zeros pad
        gxn = 2.0 * gx / max(W - 1, 1) - 1.0
        gyn = 2.0 * gy / max(H - 1, 1) - 1.0
        grid = jnp.stack([gxn, gyn], axis=-1)
        taps.append(grid_sample(x, grid, align_corners=True))  # (B, H, W, Cin)
    sampled = jnp.stack(taps, axis=-2)  # (B, H, W, 9, Cin)
    w = kernel.reshape(9, Cin, Cout)
    out = jnp.einsum("bhwkc,kco->bhwo", sampled, w)
    if bias is not None:
        out = out + bias
    return out


def _upsample_kernel2d(w: int, dtype=jnp.float32) -> jax.Array:
    """Triangle kernel (MaskFlownet.py:40-44)."""
    c = w // 2
    k = 1.0 - jnp.abs(c - jnp.arange(w, dtype=dtype)) / (c + 1)
    return k[:, None] * k[None, :]


def _downsample_kernel2d(w: int, dtype=jnp.float32) -> jax.Array:
    k = ((w + 1) - jnp.abs(w - jnp.arange(w * 2 + 1, dtype=dtype))) / (2 * w + 1)
    return k[:, None] * k[None, :]


def upsample2d_flow(img: jax.Array, factor: int) -> jax.Array:
    """MaskFlownet Upsample: replicate-pad + triangle-kernel transposed conv.

    img: (B, H, W, C) -> (B, H*factor, W*factor, C).
    """
    if factor == 1:
        return img
    B, H, W, C = img.shape
    x = jnp.pad(img, [(0, 0), (0, 1), (0, 1), (0, 0)], mode="edge")
    x = jnp.moveaxis(x, -1, 1).reshape(B * C, 1, H + 1, W + 1)
    w = factor * 2 - 1
    kern = _upsample_kernel2d(w, img.dtype).reshape(1, 1, w, w)
    out = jax.lax.conv_transpose(
        x, kern, strides=(factor, factor),
        padding=[(factor - 1, factor - 1), (factor - 1, factor - 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out[:, :, :-1, :-1]
    Hu, Wu = out.shape[2], out.shape[3]
    return jnp.moveaxis(out.reshape(B, C, Hu, Wu), 1, -1)


def downsample2d_flow(img: jax.Array, factor: int) -> jax.Array:
    """MaskFlownet Downsample: normalized triangle-kernel strided conv."""
    if factor == 1:
        return img
    B, H, W, C = img.shape
    x = jnp.moveaxis(img, -1, 1).reshape(B * C, 1, H, W)
    w2 = factor // 2
    kern = _downsample_kernel2d(w2, img.dtype).reshape(1, 1, 2 * w2 + 1, 2 * w2 + 1)
    conv = functools.partial(
        jax.lax.conv_general_dilated,
        rhs=kern,
        window_strides=(factor, factor),
        padding=[(w2, w2), (w2, w2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    num = conv(x)
    den = conv(jnp.ones_like(x))
    out = num / den
    Hd, Wd = out.shape[2], out.shape[3]
    return jnp.moveaxis(out.reshape(B, C, Hd, Wd), 1, -1)
