"""Weak-perspective (scaled orthographic) camera model, pure JAX.

Camera is a 7-vector [scale, tx, ty, qw, qx, qy, qz].

Parity targets (re-derived):
  reference monocular/nnutils/geom_utils.py:48-79 (orthographic_proj,
  orthographic_proj_withz), multiframe/main.py:97-138 (mirror_cameras,
  transform_cameras), multiframe/nnutils/mesh_net.py:310-385
  (QuatPredictorAzEle / Camera / MultiCamPredictor camera decoders).

Image convention: projected (x, y) live in [-1, 1] with x pointing right and
y pointing *down* (keypoint convention of the reference datasets). The
rasterizer (ops/rasterizer.py) consumes these coordinates directly; the
reference's PyTorch3D y-flip / look_at / R[0,0]*=-1 dance collapses to the
identity in this frame (derivation in ops/rasterizer.py docstring).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from . import quaternion as quat


def orthographic_proj(X: jax.Array, cam: jax.Array) -> jax.Array:
    """Project points, dropping z. X: (..., N, 3), cam: (..., 7) -> (..., N, 2)."""
    return orthographic_proj_withz(X, cam)[..., :2]


def orthographic_proj_withz(X: jax.Array, cam: jax.Array, offset_z: float = 0.0) -> jax.Array:
    """Weak-perspective projection preserving depth.

    x, y = scale * R(q) X + t;  z = scale * (R(q) X)_z + offset_z.
    """
    q = cam[..., 3:7]
    X_rot = quat.quat_rotate(X, q)
    scale = cam[..., 0][..., None, None]
    trans = cam[..., 1:3][..., None, :]
    proj = scale * X_rot
    proj_xy = proj[..., :2] + trans
    proj_z = proj[..., 2:3] + offset_z
    return jnp.concatenate([proj_xy, proj_z], axis=-1)


def project_points(X: jax.Array, cam: jax.Array) -> jax.Array:
    """NeuralRenderer.project_points equivalent: (..., N, 2) in [-1, 1]."""
    return orthographic_proj_withz(X, cam)[..., :2]


def mirror_camera(cam: jax.Array, mirror_flag: jax.Array) -> jax.Array:
    """Transport a camera through a horizontal image flip.

    cam: (..., 7); mirror_flag: (...,) in {0, 1}. Where flagged:
    tx -> -tx, q -> quat(diag(-1,1,-1)) ⊗ standardize(q).
    """
    q_new = quat.mirror_quat(cam[..., 3:7])
    cam_new = jnp.concatenate(
        [cam[..., 0:1], -cam[..., 1:2], cam[..., 2:3], q_new], axis=-1
    )
    flag = mirror_flag[..., None].astype(cam.dtype)
    return (1.0 - flag) * cam + flag * cam_new


def transform_camera(cam: jax.Array, transforms: jax.Array) -> jax.Array:
    """Transport a camera through a 2D affine augmentation.

    transforms: (..., 4) = [zoom, shift_x, shift_y, active_flag] in the
    normalized [-1, 1] image frame. Where active:
    scale *= zoom; tx = tx*zoom + shift_x; ty = ty*zoom + shift_y.
    """
    zoom = transforms[..., 0:1]
    cam_new = jnp.concatenate(
        [
            cam[..., 0:1] * zoom,
            cam[..., 1:2] * zoom + transforms[..., 1:2],
            cam[..., 2:3] * zoom + transforms[..., 2:3],
            cam[..., 3:7],
        ],
        axis=-1,
    )
    flag = transforms[..., 3:4].astype(cam.dtype)
    return (1.0 - flag) * cam + flag * cam_new


def decode_quat_camera(
    raw: jax.Array, scale_lr_decay: float = 0.05
) -> jax.Array:
    """Decode a raw 7-D camera embedding (quaternion multiplex mode).

    scale = relu(scale_lr_decay * raw_s + 1) + 1e-12; q normalized.
    Matches reference multiframe/main.py:572-577.
    """
    scale = jax.nn.relu(scale_lr_decay * raw[..., 0:1] + 1.0) + 1e-12
    trans = raw[..., 1:3]
    q = quat.quat_normalize(raw[..., 3:7])
    return jnp.concatenate([scale, trans, q], axis=-1)


def az_el_to_quat(
    angles: jax.Array,
    az_range_deg: float = 30.0,
    el_range_deg: float = 60.0,
    cyc_range_deg: float = 60.0,
) -> jax.Array:
    """Azimuth/elevation/cyclo-rotation (..., 3) -> quaternion (..., 4).

    azimuth = az_range * a0 about +y; elev = pi - el_range * a1 about +x;
    cyc = cyc_range * a2 about +z; q = q_cyc ⊗ (q_el ⊗ q_az).
    Matches reference multiframe/nnutils/mesh_net.py:310-339.
    """
    deg = jnp.pi / 180.0
    az = (az_range_deg * deg) * angles[..., 0]
    el = jnp.pi - (el_range_deg * deg) * angles[..., 1]
    cyc = (cyc_range_deg * deg) * angles[..., 2]
    ex = jnp.zeros(angles.shape[:-1] + (3,)).at[..., 0].set(1.0)
    ey = jnp.zeros(angles.shape[:-1] + (3,)).at[..., 1].set(1.0)
    ez = jnp.zeros(angles.shape[:-1] + (3,)).at[..., 2].set(1.0)
    q_az = quat.axis_angle_to_quat(ey, az)
    q_el = quat.axis_angle_to_quat(ex, el)
    q_cyc = quat.axis_angle_to_quat(ez, cyc)
    return quat.hamilton_product(q_cyc, quat.hamilton_product(q_el, q_az))


def az_el_quat_biases(num_guesses: int) -> jax.Array:
    """Per-hypothesis quaternion bias chain spreading az-el hypotheses.

    Matches the chain the reference constructs at
    multiframe/nnutils/mesh_net.py:363-370: bias_0 = (0, 1, 0, 0) (180
    deg about +x), bias_g = q_(pi/4 about +y) ⊗ bias_{g-1}. Composed into
    the decoded camera (decode_az_el_camera) so the G hypotheses start 45
    deg apart in azimuth instead of only az_range * g/(G-1) apart.
    Returns (G, 4).
    """
    import numpy as np

    base_rot = np.array([np.cos(np.pi / 8), 0.0, np.sin(np.pi / 8), 0.0])
    biases = [np.array([0.0, 1.0, 0.0, 0.0])]
    for _ in range(1, num_guesses):
        w1, x1, y1, z1 = base_rot
        w2, x2, y2, z2 = biases[-1]
        biases.append(
            np.array(
                [
                    w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
                    w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
                    w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
                    w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
                ]
            )
        )
    return jnp.asarray(np.stack(biases), jnp.float32)


def decode_az_el_camera(
    raw: jax.Array,
    scale_lr_decay: float = 0.05,
    scale_bias: float = 1.0,
    az_range_deg: float = 30.0,
    el_range_deg: float = 60.0,
    cyc_range_deg: float = 60.0,
    quat_bias: jax.Array | None = None,
) -> jax.Array:
    """Decode a raw 6-D camera embedding [s, tx, ty, az, el, cyc] -> 7-D cam.

    quat_bias: optional (..., 4) per-hypothesis rotation bias (from
    az_el_quat_biases, gathered per selected hypothesis) composed as
    q = q_azel ⊗ bias so hypotheses start spread in rotation space.
    """
    scale = scale_lr_decay * raw[..., 0:1] + scale_bias
    trans = raw[..., 1:3]
    q = az_el_to_quat(
        raw[..., 3:6],
        az_range_deg=az_range_deg,
        el_range_deg=el_range_deg,
        cyc_range_deg=cyc_range_deg,
    )
    if quat_bias is not None:
        q = quat.hamilton_product(q, jnp.broadcast_to(quat_bias, q.shape))
    return jnp.concatenate([scale, trans, q], axis=-1)
