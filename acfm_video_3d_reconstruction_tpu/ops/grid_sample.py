"""Bilinear/nearest grid sampling (torch.nn.functional.grid_sample parity).

Used for: texture-atlas creation from the predicted UV image
(reference monocular/nnutils/mesh_net.py:171), distance-transform lookups in
texture_dt/mask_dt losses (loss_utils.py:117-191), and optical-flow sampling
at projected vertices (loss_utils.py:450).

Channel convention here is NHWC (TPU-native); callers transpose as needed.
`grid[..., 0]` is x (width), `grid[..., 1]` is y (height), both in [-1, 1].
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def grid_sample(
    image: jax.Array,
    grid: jax.Array,
    *,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
) -> jax.Array:
    """Sample `image` (B, H, W, C) at `grid` (B, ..., 2) -> (B, ..., C)."""
    B, H, W, C = image.shape
    out_shape = grid.shape[:-1] + (C,)
    g = grid.reshape(B, -1, 2)
    x = _unnormalize(g[..., 0], W, align_corners)
    y = _unnormalize(g[..., 1], H, align_corners)

    def gather(ix, iy):
        """Gather pixels at integer coords with padding handling -> (B, N, C)."""
        inb = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
        ixc = jnp.clip(ix, 0, W - 1)
        iyc = jnp.clip(iy, 0, H - 1)
        flat = image.reshape(B, H * W, C)
        idx = iyc * W + ixc
        vals = jnp.take_along_axis(flat, idx[..., None], axis=1)
        if padding_mode == "zeros":
            vals = jnp.where(inb[..., None], vals, 0.0)
        return vals

    if mode == "nearest":
        # torch 'nearest' rounds half down via floor(x + 0.5)? It uses
        # round-to-nearest-even historically; floor(x+0.5) matches for the
        # coordinates that arise in practice.
        ix = jnp.floor(x + 0.5).astype(jnp.int32)
        iy = jnp.floor(y + 0.5).astype(jnp.int32)
        out = gather(ix, iy)
    elif mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        v00 = gather(x0i, y0i)
        v01 = gather(x0i + 1, y0i)
        v10 = gather(x0i, y0i + 1)
        v11 = gather(x0i + 1, y0i + 1)
        out = (
            v00 * (1 - wx) * (1 - wy)
            + v01 * wx * (1 - wy)
            + v10 * (1 - wx) * wy
            + v11 * wx * wy
        )
    else:
        raise ValueError(f"unknown mode {mode}")
    return out.reshape(out_shape)
