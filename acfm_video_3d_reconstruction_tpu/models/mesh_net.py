"""MeshNet: the full ACFM model as one flax module.

Parity target: reference monocular/nnutils/mesh_net.py:294-470 and
multiframe/nnutils/mesh_net.py:394-599. Owns:
  - learnable template `mean_v` (half mesh if symmetric), LBS logits,
    vert2kp logits (all initialized from the Template),
  - the ResNet encoder + handle-offset head + camera regressor +
    texture decoder.

The camera-multiplex embedding tables of the multiframe variant are NOT
parameters of this module — they are per-frame optimization state and live
in multiplex/state.py (sharded arrays trained by their own optax chain),
reflecting that a checkpoint pins frame-index <-> embedding-row.
"""
from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.symmetry import symmetrize
from .encoder import Encoder
from .heads import CameraPredictor, TransformationPredictor
from .template import Template
from .texture import TexturePredictorUV


class MeshNet(nn.Module):
    template: Template
    nz_feat: int = 200
    predict_texture: bool = True
    use_camera_layernorm: bool = False  # multiframe: True
    scale_lr: float = 1.0
    small_camera_init: bool = False     # multiframe: True
    learnable_kp: bool = True
    dtype: Any = jnp.float32

    def setup(self):
        t = self.template
        # geometry parameters stay f32 regardless of the conv compute dtype
        self.mean_v = self.param(
            "mean_v", lambda _: jnp.asarray(t.mean_v_init, jnp.float32)
        )
        self.lbs_logits = self.param(
            "lbs_logits", lambda _: jnp.asarray(t.lbs_logits, jnp.float32)
        )
        if t.vert2kp_logits is not None and self.learnable_kp:
            self.vert2kp_logits = self.param(
                "vert2kp_logits", lambda _: jnp.asarray(t.vert2kp_logits, jnp.float32)
            )
        else:
            self.vert2kp_logits = (
                jnp.asarray(t.vert2kp_logits, jnp.float32)
                if t.vert2kp_logits is not None
                else None
            )
        self.encoder = Encoder(nz_feat=self.nz_feat, dtype=self.dtype)
        self.code_predictor = TransformationPredictor(t.num_lbs, dtype=self.dtype)
        self.camera_predictor = CameraPredictor(
            use_layernorm=self.use_camera_layernorm,
            scale_lr=self.scale_lr,
            small_init=self.small_camera_init,
            dtype=self.dtype,
        )
        if self.predict_texture:
            self.texture_predictor = TexturePredictorUV(
                # numpy, not jnp: the static-sample tables are computed
                # host-side from these coordinates at trace time
                uv_sampler=np.asarray(t.uv_sampler, np.float32),
                num_sym_faces=t.num_sym_faces,
                dtype=self.dtype,
            )

    # ---- template state accessors (mesh_net.py:464-470, :573-599) ----
    def get_mean_shape(self) -> jax.Array:
        """Full (V, 3) mean shape, symmetrized if the template is."""
        if self.template.symmetric:
            return symmetrize(self.mean_v, self.template.num_sym)
        return self.mean_v

    def get_lbs(self) -> jax.Array:
        """(K, V) skinning matrix: softmax over vertices, transposed."""
        return jax.nn.softmax(self.lbs_logits, axis=0).T

    def get_vert2kp(self) -> Optional[jax.Array]:
        if self.vert2kp_logits is None:
            return None
        return jax.nn.softmax(self.vert2kp_logits, axis=1)

    def __call__(self, img, train: bool = False):
        """img (B, H, W, 3) -> dict of codes.

        Returns delta_v (B, K, 3) handle offsets, cam_pred (B, 7) regressed
        camera, res_feats, img_feat.
        """
        img_feat, res_feats = self.encoder(img.astype(self.dtype), train=train)
        delta_v = self.code_predictor(img_feat)
        cam_pred = self.camera_predictor(res_feats)
        out = {
            "img_feat": img_feat,
            "res_feats": res_feats,
            # geometry-facing outputs in f32 for the solve/render path
            "delta_v": delta_v.astype(jnp.float32),
            "cam_pred": cam_pred.astype(jnp.float32),
        }
        return out

    def textures(self, res_feats, train: bool = False) -> jax.Array:
        """(B, F, T, T, 3) texture atlas from spatial features (f32 out)."""
        return self.texture_predictor(res_feats, train=train).astype(jnp.float32)

    def init_all(self, img):
        """Init-time entry that touches every submodule so linen creates all
        params (the texture decoder is otherwise only reached via
        `method=textures` at apply time)."""
        out = self(img, train=False)
        if self.predict_texture:
            out["atlas"] = self.textures(out["res_feats"], train=False)
        return out
