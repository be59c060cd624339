"""LPIPS perceptual distance (AlexNet backbone) in flax.

Parity target: reference loss_utils.py:359-383 (PerceptualTextureLoss_v2):
lpips.LPIPS(net='alex', lpips=False, spatial=True) — i.e. the *baseline*
variant: per-layer unit-normalized feature differences squared, MEAN over
channels (no learned linear weights), upsampled to input size and summed
over layers. Inputs are expected in [-1, 1].

Pretrained AlexNet conv weights can be imported from a torchvision
checkpoint via models/torch_import.py; with no weights file the net runs
randomly initialized (still a valid multi-scale perceptual metric, noted
for parity runs).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

# torchvision AlexNet feature extractor: (out_ch, kernel, stride, pad)
_ALEX_CONVS = [
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
]
# maxpool after conv indices 0, 1 (and 4, unused for features)
_POOL_AFTER = {0, 1}

# lpips shift/scale applied to [-1,1] inputs
_SHIFT = jnp.asarray([-0.030, -0.088, -0.188])
_SCALE = jnp.asarray([0.458, 0.448, 0.450])


class AlexNetFeatures(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        feats = []
        for i, (ch, k, s, p) in enumerate(_ALEX_CONVS):
            x = nn.Conv(
                ch, (k, k), (s, s), padding=[(p, p), (p, p)], dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            x = nn.relu(x)
            feats.append(x)
            if i in _POOL_AFTER:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
        return feats


def _unit_normalize(feat: jax.Array, eps: float = 1e-10) -> jax.Array:
    # sqrt(max(sumsq, eps^2)): an all-zero post-ReLU feature vector at a
    # spatial position otherwise gives sqrt a NaN gradient (0/0); forward
    # matches the reference's feat/(norm+eps) to within eps
    norm = jnp.sqrt(jnp.maximum((feat**2).sum(axis=-1, keepdims=True),
                                eps * eps))
    return feat / (norm + eps)


class LPIPS(nn.Module):
    """Spatial LPIPS map. Inputs NHWC in [-1, 1]; returns (B, H, W, 1)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, y):
        H, W = x.shape[1], x.shape[2]
        net = AlexNetFeatures(dtype=self.dtype, name="alex")
        xs = net((x - _SHIFT) / _SCALE)
        ys = net((y - _SHIFT) / _SCALE)
        total = jnp.zeros(x.shape[:1] + (H, W, 1), self.dtype)
        for fx, fy in zip(xs, ys):
            d = (_unit_normalize(fx) - _unit_normalize(fy)) ** 2
            d = d.mean(axis=-1, keepdims=True)  # baseline (lpips=False)
            d = jax.image.resize(d, (d.shape[0], H, W, 1), method="bilinear")
            total = total + d
        return total.astype(jnp.float32)


def perceptual_texture_loss(
    lpips_apply,
    img_pred: jax.Array,
    img_gt: jax.Array,
    mask_gt: jax.Array,
    reduce: bool = True,
):
    """PerceptualTextureLoss_v2.__call__ (loss_utils.py:364-383).

    Images NHWC in [0, 1]; mask (B, H, W). Only mask_gt is used.
    """
    m = mask_gt[..., None]
    pred = 2.0 * img_pred * m - 1.0
    target = 2.0 * img_gt * m - 1.0
    dist = lpips_apply(pred, target)  # (B, H, W, 1)
    dist = dist * m
    per = dist.mean(axis=(1, 2, 3))
    return per.mean() if reduce else per
