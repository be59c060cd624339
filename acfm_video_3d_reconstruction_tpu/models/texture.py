"""Texture predictor: UV color image decoder + fixed spherical atlas sampler.

Parity target: reference monocular/nnutils/mesh_net.py:135-180
(TexturePredictorUV): res_feats (B,4,4,256) -> width x2 -> residual conv
stack with 5 bilinear 2x upsamples -> 3ch UV image (H, 2H) -> grid_sample at
the precomputed per-face spherical uv_sampler -> (tanh+1)/2 per-face atlas
(B, F, T, T, 3); symmetric texture mirrors the last num_sym_faces.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.static_sample import make_static_bilinear
from .nn_blocks import ResLayer2d, apply_conv3x3, conv3x3, upsample2x


def atlas_image_size(num_faces: int, tex_size: int) -> tuple[int, int]:
    """UV image height/width: H = 2^floor(log2(sqrt(F)*T)), W = 2H.

    (reference mesh_net.py:452-453)
    """
    h = int(2 ** np.floor(np.log2(np.sqrt(num_faces) * tex_size)))
    return h, 2 * h


class TexturePredictorUV(nn.Module):
    """Decode res_feats to a per-face texture atlas via a UV color image."""

    uv_sampler: np.ndarray  # (F', T, T, 2) STATIC numpy sampling coords
    num_sym_faces: int = -1  # >=0: append mirrored texture for left faces
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, res_feats, train: bool = False):
        Fp, T, _, _ = self.uv_sampler.shape
        B = res_feats.shape[0]
        x = jax.image.resize(
            res_feats,
            (B, res_feats.shape[1], res_feats.shape[2] * 2, res_feats.shape[3]),
            method="bilinear",
        )
        # ResLayer/upsample pyramid (mesh_net.py:157-163): 4x8 -> 128x256.
        # The <=32-channel tail runs 2x2 space-to-depth folded (exact
        # identity, see nn_blocks.apply_conv3x3): unfolded, these convs
        # use 16-32 of the MXU's 128 lanes (~4% peak, the round-4
        # roofline's decoder-tail row); folded they run 128-lane dense.
        plan = [
            (256, True, 1), (256, False, 1), (256, True, 1),
            (128, True, 1), (64, True, 1), (32, True, 2), (16, False, 2),
        ]
        for feats, up, fold in plan:
            x = ResLayer2d(feats, dtype=self.dtype, fold=fold)(x, train=train)
            if up:
                x = upsample2x(x)
        uvimage = apply_conv3x3(
            conv3x3(3, dtype=self.dtype), x, fold=2
        )  # (B, H, 2H, 3)

        # static-coordinate bilinear sampling: scatter-free VJP (the
        # generic grid_sample backward was the step's top cost on TPU)
        sampler = make_static_bilinear(
            np.asarray(self.uv_sampler).reshape(-1, 2),
            uvimage.shape[1], uvimage.shape[2], align_corners=True,
        )
        tex = sampler(uvimage)  # (B, F'*T*T, 3)
        tex = tex.reshape(B, Fp, T, T, 3)
        tex = (jnp.tanh(tex) + 1.0) / 2.0
        if self.num_sym_faces >= 0:
            tex_left = tex[:, -self.num_sym_faces:]
            tex = jnp.concatenate([tex, tex_left], axis=1)
        return tex
