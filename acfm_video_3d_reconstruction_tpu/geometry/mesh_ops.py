"""Mesh operators: edges, Laplacians, smoothing losses, UV sampler.

Parity targets (re-derived for dense TPU-friendly math):
  reference monocular/nnutils/geom_utils.py:159-325 (mesh_laplacian,
  laplacian_cot), pytorch3d laplacian_packed / mesh_laplacian_smoothing as
  called from monocular/main.py:276 and multiframe/main.py:601-608,703,
  monocular/utils/mesh.py:161-238 (compute_edges2verts, get_spherical_coords,
  compute_uvsampler).

All Laplacians are dense (V x V): V=642 for the standard template, so a
dense matmul on the MXU beats any sparse format on TPU.
"""
from __future__ import annotations

import itertools

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- topology --

def compute_edges(faces: np.ndarray) -> np.ndarray:
    """Unique undirected edges (E, 2) from faces (F, 3). Host-side."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    return np.unique(e, axis=0)


def compute_edges2verts(faces: np.ndarray) -> np.ndarray:
    """For each interior edge, [v0, v1, opposite_a, opposite_b] (E, 4).

    Used by the legacy dihedral-angle triangle_loss
    (reference loss_utils.py:292-319).
    """
    edge_dict: dict[tuple[int, int], list[int]] = {}
    for face in faces:
        for e1, e2, o in ((0, 1, 2), (0, 2, 1), (1, 2, 0)):
            key = tuple(sorted((int(face[e1]), int(face[e2]))))
            others = edge_dict.setdefault(key, [])
            if int(face[o]) not in others:
                others.append(int(face[o]))
    rows = [list(k) + v for k, v in edge_dict.items() if len(v) == 2]
    return np.asarray(rows, dtype=np.int64)


# --------------------------------------------------------------- laplacians --

def uniform_laplacian(faces: np.ndarray, num_verts: int) -> np.ndarray:
    """Dense uniform Laplacian, pytorch3d `laplacian_packed` convention:

    L[i, j] = 1/deg(i) for each neighbor j; L[i, i] = -1. Host-side numpy.
    """
    edges = compute_edges(faces)
    A = np.zeros((num_verts, num_verts), dtype=np.float64)
    A[edges[:, 0], edges[:, 1]] = 1.0
    A[edges[:, 1], edges[:, 0]] = 1.0
    deg = A.sum(1)
    L = A / np.maximum(deg, 1.0)[:, None]
    L[np.arange(num_verts), np.arange(num_verts)] = -1.0
    return L.astype(np.float32)


def safe_norm(x: jax.Array, axis=-1, keepdims: bool = False,
              eps: float = 1e-12) -> jax.Array:
    """L2 norm with a finite gradient at 0.

    jnp.linalg.norm's VJP is d/||d|| — NaN when ||d|| == 0 even behind a
    `maximum` guard (the chain multiplies 0 * NaN). sqrt(max(sum sq, eps^2))
    is bit-identical forward for norms >= eps and has gradient exactly 0 at
    the degenerate point (a collapsed edge / degenerate triangle under
    large deformations poisoned a 40-epoch multiframe run otherwise).
    """
    return jnp.sqrt(jnp.maximum((x * x).sum(axis=axis, keepdims=keepdims),
                                eps * eps))


def cot_laplacian_weights(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Dense symmetric cotangent weight matrix W (V, V), differentiable JAX.

    W[i, j] = (cot a_ij + cot b_ij) / 4 on edges, 0 elsewhere. Matches the
    sparse construction of reference geom_utils.py:258-325 (laplacian_cot)
    densified. Area clamped at 1e-12 as in the reference.
    """
    V = verts.shape[0]
    fv = verts[faces]  # (F, 3, 3)
    v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
    A = safe_norm(v1 - v2, axis=1)
    B = safe_norm(v0 - v2, axis=1)
    C = safe_norm(v0 - v1, axis=1)
    s = 0.5 * (A + B + C)
    area = jnp.sqrt(jnp.clip(s * (s - A) * (s - B) * (s - C), 1e-12))
    A2, B2, C2 = A * A, B * B, C * C
    cota = (B2 + C2 - A2) / area
    cotb = (A2 + C2 - B2) / area
    cotc = (A2 + B2 - C2) / area
    cot = jnp.stack([cota, cotb, cotc], axis=1) / 4.0  # (F, 3)

    ii = faces[:, jnp.asarray([1, 2, 0])]
    jj = faces[:, jnp.asarray([2, 0, 1])]
    flat = (ii * V + jj).reshape(-1)
    W = jnp.zeros((V * V,), dtype=verts.dtype).at[flat].add(cot.reshape(-1))
    W = W.reshape(V, V)
    return W + W.T


def cot_laplacian(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Dense cot Laplacian L = W - diag(rowsum(W)).

    Matches reference geom_utils.py:249-255 (`mesh_laplacian(..., 'cot')`:
    L.to_dense() - diag(sparse.sum(L, 1))).
    """
    W = cot_laplacian_weights(verts, faces)
    return W - jnp.diag(W.sum(axis=1))


def uniform_laplacian_smoothing(verts: jax.Array, L: jax.Array) -> jax.Array:
    """pytorch3d mesh_laplacian_smoothing(method='uniform') equivalent.

    verts: (B, V, 3); L: (V, V). loss = mean_b mean_v ||(L v)_i||.
    (pytorch3d: per-vertex norms weighted 1/V per mesh, summed, / N.)
    """
    Lv = jnp.einsum("ij,bjc->bic", L, verts)
    return safe_norm(Lv, axis=-1).mean()


def cot_laplacian_smoothing(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """pytorch3d mesh_laplacian_smoothing(method='cot') equivalent.

    Weights are computed from the mesh itself and treated as constants
    (stop_gradient), matching pytorch3d's torch.no_grad() weight build;
    gradients flow only through the final matmul. loss per vertex:
    ||(W v)_i / rowsum(W)_i - v_i||; mean over verts, mean over batch.
    """

    def one(v):
        W = jax.lax.stop_gradient(cot_laplacian_weights(v, faces))
        norm_w = W.sum(axis=1, keepdims=True)
        norm_w = jnp.where(norm_w > 0, 1.0 / norm_w, 0.0)
        Lv = (W @ v) * norm_w - v
        return safe_norm(Lv, axis=-1).mean()

    return jax.vmap(one)(verts).mean()


# ---------------------------------------------------------------- uv atlas --

def get_spherical_coords(X: np.ndarray) -> np.ndarray:
    """(N, 3) points -> (N, 2) UV in [-1, 1] (azimuth u, inclination v).

    Matches reference monocular/utils/mesh.py:197-209.
    """
    rad = np.linalg.norm(X, axis=1)
    theta = np.arccos(np.clip(X[:, 2] / rad, -1.0, 1.0))
    phi = np.arctan2(X[:, 1], X[:, 0])
    vv = (theta / np.pi) * 2 - 1
    uu = ((phi + np.pi) / (2 * np.pi)) * 2 - 1
    return np.stack([uu, vv], axis=1)


def compute_uvsampler(verts: np.ndarray, faces: np.ndarray, tex_size: int = 2) -> np.ndarray:
    """Per-face barycentric sample points mapped to spherical UV.

    Returns (F, T, T, 2) sampling coords in [-1, 1] for grid-sampling a
    predicted UV image into a per-face texture atlas. Grid cell (a, b)
    corresponds to barycentric weights (alpha_a, beta_b, 1-alpha-beta) on
    (v0, v1, v2). Matches reference monocular/utils/mesh.py:212-238.
    """
    alpha = np.arange(tex_size, dtype=np.float64) / (tex_size - 1)
    beta = np.arange(tex_size, dtype=np.float64) / (tex_size - 1)
    coords = np.stack([p for p in itertools.product(alpha, beta)])  # (T*T, 2)
    vs = verts[faces]
    v2 = vs[:, 2]
    v0v2 = vs[:, 0] - vs[:, 2]
    v1v2 = vs[:, 1] - vs[:, 2]
    # (F, 3, 2) @ (2, T*T) -> (F, 3, T*T)
    samples = np.dstack([v0v2, v1v2]) @ coords.T + v2.reshape(-1, 3, 1)
    samples = np.transpose(samples, (0, 2, 1)).reshape(-1, 3)
    uv = get_spherical_coords(samples)
    return uv.reshape(-1, tex_size, tex_size, 2)


# ------------------------------------------------------------------- misc --

def face_normals(verts: jax.Array, faces: jax.Array) -> jax.Array:
    """Unit face normals (..., F, 3)."""
    fv = verts[..., faces, :]
    n = jnp.cross(fv[..., 1, :] - fv[..., 0, :], fv[..., 2, :] - fv[..., 0, :])
    return n / safe_norm(n, axis=-1, keepdims=True)


def edge_lengths(verts: jax.Array, edges: jax.Array) -> jax.Array:
    """Edge lengths (..., E) given verts (..., V, 3) and edges (E, 2)."""
    v0 = verts[..., edges[:, 0], :]
    v1 = verts[..., edges[:, 1], :]
    return safe_norm(v0 - v1, axis=-1)
