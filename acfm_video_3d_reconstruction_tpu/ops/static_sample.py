"""Bilinear sampling at STATIC coordinates with a gather-based transpose.

The texture decoder samples its UV color image at the template's fixed
per-face spherical coordinates (reference compute_uvsampler,
monocular/utils/mesh.py:197-238). A generic grid_sample backward is a
scatter-add into the image — the single most expensive op in the fused
train step on TPU (its random-access scatter costs ~100ms at the bench
shape, >3x the whole rasterizer). Because the coordinates never change we
can precompute, in numpy at trace time:

  * the 4 corner pixel indices + bilinear weights per sample point
    (forward = one static gather + weighted sum), and
  * the exact inverse table pixel -> (sample point, weight) entries
    (backward = one static gather + weighted sum — NO scatter).

Both directions are MXU/VPU-friendly dense reads. The inverse table is
padded to the max fan-in (22 entries/pixel for the 1280-face atlas at
128x256) with a dump row.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _tables(coords_key, H: int, W: int, align_corners: bool):
    coords = np.frombuffer(coords_key, dtype=np.float64).reshape(-1, 2)
    P = coords.shape[0]
    if align_corners:
        gx = (coords[:, 0] + 1.0) / 2.0 * (W - 1)
        gy = (coords[:, 1] + 1.0) / 2.0 * (H - 1)
    else:
        gx = ((coords[:, 0] + 1.0) * W - 1.0) / 2.0
        gy = ((coords[:, 1] + 1.0) * H - 1.0) / 2.0
    x0 = np.floor(gx)
    y0 = np.floor(gy)
    fx = gx - x0
    fy = gy - y0

    idx = np.zeros((P, 4), np.int32)
    w = np.zeros((P, 4), np.float32)
    for c, (dy, dx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
        yy = np.clip(y0 + dy, 0, H - 1).astype(np.int64)
        xx = np.clip(x0 + dx, 0, W - 1).astype(np.int64)
        wc = (fy if dy else 1.0 - fy) * (fx if dx else 1.0 - fx)
        idx[:, c] = yy * W + xx
        w[:, c] = wc

    # vectorized inverse table: sort all nonzero (pixel, point, weight)
    # entries by pixel, then place each within its pixel's slot range
    flat_all = idx.reshape(-1).astype(np.int64)
    w_all = w.reshape(-1)
    pt_all = np.repeat(np.arange(P, dtype=np.int64), 4)
    keep = w_all != 0.0
    flat_all, w_all, pt_all = flat_all[keep], w_all[keep], pt_all[keep]
    order = np.argsort(flat_all, kind="stable")
    flat_s, w_s, pt_s = flat_all[order], w_all[order], pt_all[order]
    counts = np.bincount(flat_s, minlength=H * W)
    maxc = int(counts.max()) if counts.size else 1
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    slot = np.arange(flat_s.shape[0]) - starts[flat_s]
    inv_p = np.full((H * W, maxc), P, np.int32)  # P = dump row
    inv_w = np.zeros((H * W, maxc), np.float32)
    inv_p[flat_s, slot] = pt_s
    inv_w[flat_s, slot] = w_s
    return idx, w, inv_p, inv_w, maxc


def make_static_bilinear(coords_xy: np.ndarray, H: int, W: int,
                         align_corners: bool = True):
    """coords_xy (P, 2) in [-1, 1] -> fn(img (B, H, W, C)) -> (B, P, C)."""
    coords = np.ascontiguousarray(np.asarray(coords_xy, np.float64))
    idx_np, w_np, invp_np, invw_np, maxc = _tables(
        coords.tobytes(), H, W, align_corners
    )
    P = coords.shape[0]
    idx = jnp.asarray(idx_np.reshape(-1))
    w = jnp.asarray(w_np)
    inv_p = jnp.asarray(invp_np.reshape(-1))
    inv_w = jnp.asarray(invw_np)

    @jax.custom_vjp
    def sample(img):
        B, _, _, C = img.shape
        flat = img.reshape(B, H * W, C)
        g = jnp.take(flat, idx, axis=1).reshape(B, P, 4, C)
        return (g * w[None, :, :, None].astype(img.dtype)).sum(2)

    def fwd(img):
        return sample(img), None

    def bwd(res, ct):
        del res
        B, _, C = ct.shape
        ct_pad = jnp.concatenate(
            [ct, jnp.zeros((B, 1, C), ct.dtype)], axis=1
        )  # dump row P
        gathered = jnp.take(ct_pad, inv_p, axis=1).reshape(B, H * W, maxc, C)
        g_flat = (gathered * inv_w[None, :, :, None].astype(ct.dtype)).sum(2)
        return (g_flat.reshape(B, H, W, C),)

    sample.defvjp(fwd, bwd)
    return sample
