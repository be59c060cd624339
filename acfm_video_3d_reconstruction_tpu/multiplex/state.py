"""Camera-multiplex hypothesis state.

Parity target: reference multiframe/nnutils/mesh_net.py:404-451 — per-frame
embedding tables: `num_guesses` camera embeddings (7-D quat mode or 6-D
az-el mode), per-frame hypothesis probabilities, and per-frame deformation
embeddings (plus a mirrored variant).

TPU-first design: instead of G separate nn.Embedding tables inside the
model, the multiplex is one pytree of dense arrays
  cams   (G, N_frames, C)   raw embeddings (C = 7 or 6)
  probs  (N_frames, G)      soft-min hypothesis weights (non-differentiable
                            state, written each step like the reference's
                            `.data` writes)
  deform / deform_mirror (N_frames, K*3)
trained by its own optax transform, gathered per batch with frame indices.
Rows shard trivially over the data mesh axis.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera as cam_utils
from ..geometry import quaternion as quat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class MultiplexState:
    cams: jax.Array                     # (G, N, C)
    probs: jax.Array                    # (N, G)
    deform: Optional[jax.Array]         # (N, K*3) or None
    deform_mirror: Optional[jax.Array]  # (N, K*3) or None

    @property
    def num_guesses(self) -> int:
        return self.cams.shape[0]


def init_quat_multiplex(
    num_frames: int,
    num_guesses: int,
    num_lbs: int,
    seed: int = 0,
    with_deform: bool = True,
) -> MultiplexState:
    """Quaternion-mode init: hypotheses spread over 360° about +y.

    (reference mesh_net.py:423-446: identity quat rotated by
    linspace(0, 360, G) about y, +0.1 uniform noise; trans ~ U(-.05,.05)
    shared per table; scale raw 0; probs 1.)
    """
    rng = np.random.default_rng(seed)
    angles = np.linspace(0.0, 2.0 * np.pi, num_guesses)
    cams = np.zeros((num_guesses, num_frames, 7), np.float32)
    for g in range(num_guesses):
        q = np.array(
            [np.cos(angles[g] / 2.0), 0.0, np.sin(angles[g] / 2.0), 0.0], np.float32
        )
        cams[g, :, 1] = rng.uniform(-0.05, 0.05)
        cams[g, :, 2] = rng.uniform(-0.05, 0.05)
        cams[g, :, 3:] = q[None] + 0.1 * rng.random((num_frames, 4)).astype(np.float32)
    probs = np.ones((num_frames, num_guesses), np.float32)
    deform = np.zeros((num_frames, num_lbs * 3), np.float32) if with_deform else None
    return MultiplexState(
        cams=jnp.asarray(cams),
        probs=jnp.asarray(probs),
        deform=jnp.asarray(deform) if with_deform else None,
        deform_mirror=jnp.asarray(deform) if with_deform else None,
    )


def init_az_el_multiplex(
    num_frames: int, num_guesses: int, num_lbs: int, with_deform: bool = True
) -> MultiplexState:
    """Az-el mode init: azimuth raw value spread over [0, 1] per hypothesis
    (reference mesh_net.py:406-416)."""
    az = np.arange(num_guesses) / max(num_guesses - 1, 1)
    cams = np.zeros((num_guesses, num_frames, 6), np.float32)
    cams[:, :, 3] = az[:, None]
    probs = np.ones((num_frames, num_guesses), np.float32)
    deform = np.zeros((num_frames, num_lbs * 3), np.float32) if with_deform else None
    return MultiplexState(
        cams=jnp.asarray(cams),
        probs=jnp.asarray(probs),
        deform=jnp.asarray(deform) if with_deform else None,
        deform_mirror=jnp.asarray(deform) if with_deform else None,
    )


def gather_cameras(
    state: MultiplexState,
    frame_idx: jax.Array,
    *,
    az_el: bool = False,
    scale_lr_decay: float = 0.05,
    scale_bias: float = 1.0,
    euler_ranges: tuple[float, float, float] = (30.0, 60.0, 60.0),
) -> jax.Array:
    """Decode per-frame hypothesis cameras.

    frame_idx: (B, T) int -> returns (G, B*T, 7) decoded cameras.
    (reference multiframe/main.py:551-577)
    """
    flat = frame_idx.reshape(-1)
    raw = state.cams[:, flat, :]  # (G, BT, C)
    if az_el:
        return cam_utils.decode_az_el_camera(
            raw,
            scale_lr_decay=scale_lr_decay,
            scale_bias=scale_bias,
            az_range_deg=euler_ranges[0],
            el_range_deg=euler_ranges[1],
            cyc_range_deg=euler_ranges[2],
        )
    return cam_utils.decode_quat_camera(raw, scale_lr_decay=scale_lr_decay)


def gather_probs(state: MultiplexState, frame_idx: jax.Array) -> jax.Array:
    """(B, T) -> (BT, G) stored hypothesis probabilities."""
    return state.probs[frame_idx.reshape(-1)]


def gather_deforms(
    state: MultiplexState,
    frame_idx: jax.Array,
    mirror_flag: jax.Array,
    num_lbs: int,
    deform_lr: float = 100.0,
) -> jax.Array:
    """Per-frame optimized handle offsets, mirror-aware.

    (reference multiframe/main.py:531-539). Returns (BT, K, 3).
    """
    flat = frame_idx.reshape(-1)
    d = state.deform[flat].reshape(-1, num_lbs, 3)
    dm = state.deform_mirror[flat].reshape(-1, num_lbs, 3)
    m = mirror_flag.reshape(-1, 1, 1).astype(d.dtype)
    return ((1.0 - m) * d + m * dm) * deform_lr


def topk_hypotheses(
    state: MultiplexState, frame_idx: jax.Array, k: int
) -> jax.Array:
    """Indices (k, BT) of the k most probable hypotheses per frame.

    (reference multiframe/main.py:541-548, hypothesis dropping). Static k
    keeps the train step shape-stable: the schedule selects among a small
    set of pre-compiled step functions.
    """
    probs = gather_probs(state, frame_idx)  # (BT, G)
    _, idx = jax.lax.top_k(probs, k)
    return idx.T.astype(jnp.int32)


def select_hypotheses(arr: jax.Array, sel: jax.Array) -> jax.Array:
    """Gather arr (G, BT, ...) at sel (k, BT) -> (k, BT, ...)."""
    return jnp.take_along_axis(
        arr, sel.reshape(sel.shape + (1,) * (arr.ndim - 2)), axis=0
    )


def scatter_probs(
    state: MultiplexState,
    frame_idx: jax.Array,
    sel: jax.Array,
    new_probs: jax.Array,
) -> MultiplexState:
    """Write softmin probabilities back for the selected hypotheses.

    frame_idx (B, T); sel (k, BT) hypothesis ids; new_probs (k, BT).
    Non-selected hypotheses get 0 (reference multiframe/main.py:737-742).
    """
    flat = frame_idx.reshape(-1)
    G = state.num_guesses
    rows = jnp.zeros((flat.shape[0], G), new_probs.dtype)
    rows = rows.at[jnp.arange(flat.shape[0])[None, :], sel].set(new_probs)
    probs = state.probs.at[flat].set(jax.lax.stop_gradient(rows))
    return dataclasses.replace(state, probs=probs)
