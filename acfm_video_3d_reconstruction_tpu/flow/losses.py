"""Flow training/eval losses (EPE family).

Parity target: reference MaskFlownet.py:660-707 (EpeLoss, EpeLossWithMask,
MultiscaleEpe). Used by the flow-eval CLI; ACFM training keeps the flow net
frozen.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import ops


def epe_loss(pred: jax.Array, label: jax.Array, eps: float = 0.0) -> jax.Array:
    """Mean endpoint error per sample. pred/label (B, H, W, 2) -> (B,)."""
    err = jnp.sqrt(((pred - label) ** 2).sum(-1) + eps)
    return err.reshape(err.shape[0], -1).mean(-1)


def epe_loss_with_mask(
    pred: jax.Array, label: jax.Array, mask: jax.Array,
    eps: float = 1e-8, q: float | None = None,
) -> jax.Array:
    """Masked EPE; q gives the reference's charbonnier-like |.|^q variant."""
    if q is not None:
        err = (jnp.abs(pred - label).sum(-1) + eps) ** q
    else:
        err = jnp.sqrt(((pred - label) ** 2).sum(-1) + eps)
    err = err * mask
    B = err.shape[0]
    return err.reshape(B, -1).sum(-1) / jnp.maximum(
        mask.reshape(B, -1).sum(-1), 1.0
    )


def multiscale_epe(
    flow: jax.Array,
    mask: jax.Array,
    predictions: list[jax.Array],
    weights=(0.005, 0.01, 0.02, 0.08, 0.32),
    scales=(64, 32, 16, 8, 4),
    match: str = "upsampling",
    eps: float = 1e-8,
    q: float | None = None,
) -> jax.Array:
    """Weighted multi-scale EPE over the pyramid predictions."""
    total = 0.0
    for p, w, s in zip(predictions, weights, scales):
        if match == "upsampling":
            up = ops.upsample2d_flow(p, s)
            total = total + epe_loss_with_mask(up, flow, mask, eps, q) * w
        else:
            down_f = ops.downsample2d_flow(flow, s) / s
            down_m = ops.downsample2d_flow(mask, s)
            total = total + epe_loss_with_mask(p / s, down_f, down_m, eps, q) * w
    return total
