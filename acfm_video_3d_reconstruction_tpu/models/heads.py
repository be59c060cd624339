"""Prediction heads: camera, handle offsets (flax, NHWC).

Parity targets: reference monocular/nnutils/mesh_net.py:183-291 and
multiframe/nnutils/mesh_net.py:182-281 (the multiframe variant adds
LayerNorm in the residual FC blocks and small-init on scale/trans heads,
plus a configurable scale learning-rate multiplier).
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

tiny_init = nn.initializers.normal(stddev=1e-5)


class QuatPredictor(nn.Module):
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        # bias init = small identity rotation: keeps the normalized output
        # well-defined at init (the reference relies on torch's nonzero
        # random bias for the same effect).
        q = nn.Dense(
            4,
            bias_init=lambda *_: jnp.asarray([1e-2, 0.0, 0.0, 0.0], self.dtype),
            dtype=self.dtype,
        )(feat)
        n = jnp.sqrt(jnp.maximum((q * q).sum(-1, keepdims=True), 1e-24))
        return q / n


class ScalePredictor(nn.Module):
    scale_lr: float = 1.0       # multiframe uses opts.scale_lr; monocular 1.0
    small_init: bool = False    # multiframe small-inits the weight
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        kinit = tiny_init if self.small_init else nn.initializers.lecun_normal()
        s = nn.Dense(1, kernel_init=kinit, dtype=self.dtype)(feat)
        return nn.relu(self.scale_lr * s + 1.0) + 1e-12


class TransPredictor(nn.Module):
    small_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        kinit = tiny_init if self.small_init else nn.initializers.lecun_normal()
        return nn.Dense(2, kernel_init=kinit, dtype=self.dtype)(feat)


class CameraPredictor(nn.Module):
    """res_feats (B, 4, 4, 256) -> 7-D camera [s, tx, ty, q].

    4x4 valid conv to 200ch + LeakyReLU, two residual FC blocks
    (LayerNorm'd in the multiframe variant), then scale/trans/quat heads.
    """

    use_layernorm: bool = False
    scale_lr: float = 1.0
    small_init: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, res_feats):
        # Full-extent valid conv (4x4 at the reference's 256^2 input; adapts
        # to the static spatial size so smaller inputs also collapse to 1x1).
        kh, kw = res_feats.shape[1], res_feats.shape[2]
        x = nn.Conv(200, (kh, kw), padding="VALID", dtype=self.dtype, name="conv_c")(res_feats)
        x = nn.leaky_relu(x[:, 0, 0, :], 0.01)
        for i in range(2):
            h = nn.Dense(200, dtype=self.dtype, name=f"fc{i + 1}")(x)
            if self.use_layernorm:
                h = nn.LayerNorm(dtype=self.dtype, name=f"ln{i + 1}")(h)
            x = x + nn.leaky_relu(h, 0.01)
        scale = ScalePredictor(self.scale_lr, self.small_init, self.dtype, name="scale")(x)
        trans = TransPredictor(self.small_init, self.dtype, name="trans")(x)
        q = QuatPredictor(self.dtype, name="quat")(x)
        return jnp.concatenate([scale, trans, q], axis=-1)


class TransformationPredictor(nn.Module):
    """Global code -> per-handle 3D offsets (B, num_lbs, 3), ~zero at init.

    (reference mesh_net.py:227-251, weight std 1e-5 so initial deformation
    vanishes; bias present and zero.)
    """

    num_lbs: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat):
        out = nn.Dense(self.num_lbs * 3, kernel_init=tiny_init, dtype=self.dtype)(feat)
        return out.reshape(feat.shape[0], self.num_lbs, 3)
