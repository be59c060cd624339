"""Rigid structure-from-motion factorization for camera/template init.

Parity target: the reference's offline MATLAB preprocessing
(*/misc/preprocess/sfm/sfmFactorization.m — rank-3 Tomasi-Kanade rigid
factorization with missing data; sfmFactorizationKnownShape.m;
alignSfmModel.m), which produces the `anno_<split>.mat` sfm_anno cameras
and mean shape consumed at training time. Re-implemented in numpy with
visibility-weighted alternation; emits the same artifacts: per-image
(scale, trans, rot) and a (3, K) mean shape.
"""
from __future__ import annotations

import numpy as np


def _orthonormalize(R: np.ndarray) -> np.ndarray:
    """Project a 2x3 (or 3x3) matrix onto the (scaled) Stiefel manifold."""
    u, _, vt = np.linalg.svd(R, full_matrices=False)
    return u @ vt


def rigid_factorization(
    kps: np.ndarray,
    vis: np.ndarray,
    n_iter: int = 50,
    seed: int = 0,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Rank-3 rigid factorization with missing data.

    Args:
      kps: (N, K, 2) keypoint locations (any consistent image frame).
      vis: (N, K) visibility in {0, 1}.
    Returns:
      (scales (N,), trans (N, 2), rots (N, 3, 3), shape (3, K)):
      kps[i] ~ scales[i] * (rots[i] @ S)[:2] + trans[i].
    """
    N, K, _ = kps.shape
    vis = vis.astype(np.float64)
    rng = np.random.default_rng(seed)

    # per-image visible centroid -> translations
    wsum = np.maximum(vis.sum(1, keepdims=True), 1.0)
    trans = (kps * vis[..., None]).sum(1) / wsum  # (N, 2)
    W = (kps - trans[:, None]) * vis[..., None]   # centered, zeros at missing

    # init: SVD of the stacked measurement matrix with missing entries = 0
    Wf = W.transpose(0, 2, 1).reshape(2 * N, K)
    u, s, vt = np.linalg.svd(Wf, full_matrices=False)
    M = u[:, :3] * s[:3]          # (2N, 3) motion
    S = vt[:3]                    # (3, K) shape

    for _ in range(n_iter):
        # shape update: least squares over visible entries
        lhs = np.zeros((3, 3, K))
        rhs = np.zeros((3, K))
        Ms = M.reshape(N, 2, 3)
        for i in range(N):
            v = vis[i]  # (K,)
            A = Ms[i]   # (2, 3)
            lhs += (A.T @ A)[:, :, None] * v[None, None, :]
            rhs += A.T @ (W[i].T * v[None, :])
        for k in range(K):
            S[:, k] = np.linalg.solve(lhs[:, :, k] + 1e-9 * np.eye(3), rhs[:, k])

        # motion update per image, then metric projection
        for i in range(N):
            v = vis[i][:, None]
            Sv = S * vis[i][None, :]
            G = Sv @ Sv.T + 1e-9 * np.eye(3)
            Mi = (W[i].T * vis[i][None, :]) @ S.T @ np.linalg.inv(G)
            # project to scaled rotation rows
            scale = np.linalg.norm(Mi, ord="fro") / np.sqrt(2.0)
            Ri = _orthonormalize(Mi / max(scale, 1e-9))
            Ms[i] = scale * Ri
        M = Ms.reshape(2 * N, 3)

        # translation refit against the current model (missing-data
        # centroids bias the initial estimate)
        for i in range(N):
            proj = (Ms[i] @ S).T  # (K, 2)
            v = vis[i][:, None]
            trans[i] = ((kps[i] - proj) * v).sum(0) / max(vis[i].sum(), 1.0)
        W = (kps - trans[:, None]) * vis[..., None]

    # decompose: scale + full rotation (third row via cross product)
    scales = np.zeros(N)
    rots = np.zeros((N, 3, 3))
    Ms = M.reshape(N, 2, 3)
    for i in range(N):
        scales[i] = np.linalg.norm(Ms[i], ord="fro") / np.sqrt(2.0)
        R2 = _orthonormalize(Ms[i] / max(scales[i], 1e-9))
        r3 = np.cross(R2[0], R2[1])
        rots[i] = np.vstack([R2, r3])
    return scales, trans, rots, S


def reproj_error(kps, vis, scales, trans, rots, S) -> float:
    """Mean visible reprojection error (reprojMinimize.m's objective)."""
    errs = []
    for i in range(len(kps)):
        proj = scales[i] * (rots[i] @ S)[:2].T + trans[i]
        e = np.linalg.norm((proj - kps[i]) * vis[i][:, None], axis=1)
        errs.append(e[vis[i] > 0])
    return float(np.concatenate(errs).mean())


def align_sfm_model(S: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Canonicalize the mean shape: centered, PCA-aligned, unit scale
    (alignSfmModel.m equivalent). Returns (S_aligned, R_align)."""
    Sc = S - S.mean(1, keepdims=True)
    u, _, _ = np.linalg.svd(Sc @ Sc.T)
    if np.linalg.det(u) < 0:
        u[:, -1] *= -1
    Sa = u.T @ Sc
    Sa = Sa / np.abs(Sa).max()
    return Sa, u.T


def sfm_camera_annotations(kps_px, vis, img_sizes, n_iter=50):
    """Full pipeline: pixel kps -> [-1,1]-frame (scale, trans, quat) per
    image + aligned mean shape — the cub_sfm.m output contract."""
    from ..data.base import quaternion_from_matrix_np

    scales, trans, rots, S = rigid_factorization(np.asarray(kps_px), np.asarray(vis), n_iter)
    S_aligned, R_align = align_sfm_model(S)
    out = []
    for i in range(len(kps_px)):
        R = rots[i] @ R_align.T
        q = quaternion_from_matrix_np(R)
        out.append(
            {"scale": scales[i], "trans": trans[i], "rot": R, "quat": q}
        )
    return out, S_aligned
