"""Quaternion utilities (w, x, y, z convention), pure JAX.

Functional parity targets (re-derived, not translated):
  reference monocular/nnutils/geom_utils.py:107-153 (hamilton_product,
  quat_rotate), monocular/nnutils/loss_utils.py:35-69 (quat_conj, quat2ang),
  pytorch3d.transforms (standardize_quaternion, quaternion_multiply,
  matrix_to_quaternion) as used by main.py mirror_sample.

All functions broadcast over leading batch dims; quaternions live in the
trailing axis of size 4.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def hamilton_product(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Hamilton product qa ⊗ qb. Shapes: (..., 4) x (..., 4) -> (..., 4)."""
    aw, ax, ay, az = jnp.moveaxis(qa, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(qb, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    """Conjugate: negate the vector part."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Unit-normalize along the last axis (torch F.normalize semantics)."""
    # sqrt(max(sumsq, eps^2)): finite gradient at q == 0 (norm's VJP is
    # q/||q|| — NaN at the origin even behind the maximum guard)
    n = jnp.sqrt(jnp.maximum((q * q).sum(-1, keepdims=True), eps * eps))
    return q / n


def standardize_quaternion(q: jax.Array) -> jax.Array:
    """Flip sign so the real part is non-negative (pytorch3d convention)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_rotate(X: jax.Array, q: jax.Array) -> jax.Array:
    """Rotate points by a quaternion.

    Args:
      X: (..., N, 3) points.
      q: (..., 4) quaternion (need not be exactly unit; matches reference
         which rotates with q ⊗ x ⊗ q*).
    Returns:
      (..., N, 3) rotated points.
    """
    qn = q[..., None, :]  # (..., 1, 4)
    Xq = jnp.concatenate([jnp.zeros_like(X[..., :1]), X], axis=-1)
    out = hamilton_product(qn, hamilton_product(Xq, quat_conj(qn)))
    return out[..., 1:]


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit quaternion (..., 4) -> rotation matrix (..., 3, 3)."""
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> unit quaternion (..., 4), w >= 0.

    Branch-free Shepperd-style selection, safe under jit.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate (unnormalized) quaternions, one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 + m11 - m00 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 + m22 - m00 - m11], axis=-1)

    scores = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 + m11 - m00 - m22, 1.0 + m22 - m00 - m11],
        axis=-1,
    )
    idx = jnp.argmax(scores, axis=-1)
    cand = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4cand, 4comp)
    q = jnp.take_along_axis(cand, idx[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    return standardize_quaternion(quat_normalize(q))


def axis_angle_to_quat(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Axis (..., 3) (unit) + angle (...,) -> quaternion (..., 4)."""
    half = angle[..., None] / 2.0
    return jnp.concatenate([jnp.cos(half), axis * jnp.sin(half)], axis=-1)


def quat_geodesic_loss(q1: jax.Array, q2: jax.Array) -> jax.Array:
    """1 - |(q1 ⊗ q2*)_w|, per pair. Shapes (..., 4) -> (...,).

    Matches reference loss_utils.py:262-277 (quat_loss_geodesic).
    """
    q_rel = hamilton_product(q1, quat_conj(q2))
    return 1.0 - jnp.abs(q_rel[..., 0])


# Mirror about the vertical image axis == 180° rotation about y composed in
# front: quaternion of diag(-1, 1, -1) is (0, 0, 1, 0).
MIRROR_QUAT = jnp.asarray([0.0, 0.0, 1.0, 0.0])


def mirror_quat(q: jax.Array) -> jax.Array:
    """Reflect a camera rotation for a horizontally-flipped image.

    Matches reference multiframe/main.py:113-125 (mirror_cameras):
    q' = quat(diag(-1,1,-1)) ⊗ standardize(q).
    """
    q = standardize_quaternion(q)
    return hamilton_product(jnp.broadcast_to(MIRROR_QUAT, q.shape), q)
