"""The complete ACFM loss stack as pure JAX functions.

Parity target: reference */nnutils/loss_utils.py (identical in both apps).
Every loss that the camera multiplex weighs keeps a `reduce=False` path
returning a per-sample vector, so the trainer can hold a
(num_guesses, batch*frames) loss matrix (SURVEY.md §2.3).

Conventions: images are NHWC or (B, H, W); masks (B, H, W); keypoints
(B, K, 3) = [x, y, vis] in [-1, 1]; cameras (B, 7).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..geometry import camera as cam_utils
from ..geometry.mesh_ops import safe_norm
from ..geometry import quaternion as quat
from ..ops import rasterizer as ras
from ..ops.grid_sample import grid_sample


def _reduce_tail(x: jax.Array, reduce: bool) -> jax.Array:
    """Mean over all but the batch axis; then mean if reduce."""
    v = x.reshape(x.shape[0], -1).mean(axis=1)
    return v.mean() if reduce else v


# ------------------------------------------------------------------- masks --

def iou(predict: jax.Array, target: jax.Array, eps: float = 1e-6, reduce: bool = True):
    """Soft IoU (loss_utils.py:18-28)."""
    p = predict.reshape(predict.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    inter = (p * t).sum(1)
    union = (p + t - p * t).sum(1) + eps
    out = inter / union
    return out.mean() if reduce else out


def iou_loss(predict, target, reduce: bool = True):
    return 1.0 - iou(predict, target, reduce=reduce)


def l1_loss(predict, target, reduce: bool = True):
    """Per-sample-reducible L1 (loss_utils.py:72-77); multiframe mask loss."""
    return _reduce_tail(jnp.abs(predict - target), reduce)


def edt_loss(mask_rendered: jax.Array, edt: jax.Array, reduce: bool = True):
    """Silhouette excess: GT-mask distance transform × rendered mask.

    mask_rendered: (B, H, W); edt: (B, 1, H, W) or (B, H, W).
    (loss_utils.py:245-253)
    """
    if edt.ndim == 4:
        edt = edt[:, 0]
    return _reduce_tail(edt * mask_rendered, reduce)


def boundaries_loss(
    proj_verts: jax.Array,
    boundaries: jax.Array,
    vis_verts: jax.Array,
    reduce: bool = True,
    k: int = 1,
):
    """Boundary coverage: each GT mask-boundary point should have a visible
    projected vertex nearby (loss_utils.py:204-237).

    proj_verts: (B, V, 2) projected vertices in [-1, 1].
    boundaries: (B, N, 3) = [x, y, valid] padded boundary points.
    vis_verts:  (B, V) 0/1 visibility (from pix_to_face; see
                ops.rasterizer.visible_vertices).

    The reference randomly subsamples <=1000 boundary points per step; we use
    all padded points (the padded count is the max over the batch, same
    order of magnitude) — subsampling was a CUDA memory concession.
    """
    bds_v = boundaries[..., :2]
    bds_m = boundaries[..., 2]
    # squared euclidean distances (B, N, V) via the |a-b|^2 expansion:
    # this becomes one MXU matmul instead of a gather-heavy cdist.
    d2 = (
        (bds_v**2).sum(-1)[..., None]
        - 2.0 * jnp.einsum("bnc,bvc->bnv", bds_v, proj_verts)
        + (proj_verts**2).sum(-1)[:, None, :]
    )
    vis = vis_verts[:, None, :]
    d2 = (1.0 - vis) * 1000.0 + vis * d2
    if k == 1:
        min_d = d2.min(axis=-1)  # (B, N)
        loss = (min_d * bds_m).mean(-1)
    else:
        neg_topk = jax.lax.top_k(-d2, k)[0]
        loss = ((-neg_topk).mean(-1) * bds_m).mean(-1)
    return loss.mean() if reduce else loss


# --------------------------------------------------------------- keypoints --

def kp_l2_loss(kp_pred: jax.Array, kp_gt: jax.Array, reduce: bool = True):
    """Visibility-masked L1 on projected keypoints (loss_utils.py:341-356)."""
    vis = (kp_gt[..., 2] > 0).astype(kp_pred.dtype)
    loss = jnp.abs(kp_pred - kp_gt[..., :2]).sum(-1) * vis
    loss = loss.mean(-1) / (vis.mean(-1) + 1e-4)
    return loss.mean() if reduce else loss


# ----------------------------------------------------------------- cameras --

def hinge(x: jax.Array, margin: float) -> jax.Array:
    return jnp.maximum(x - margin, 0.0)


def camera_loss(cam_pred: jax.Array, cam_gt: jax.Array, margin: float = 0.0):
    """Geodesic quat distance + L2 scale/trans, hinged (loss_utils.py:280-289)."""
    rot_loss = hinge(quat.quat_geodesic_loss(cam_pred[:, 3:], cam_gt[:, 3:]), margin)
    st = (cam_pred[:, :3] - cam_gt[:, :3]) ** 2
    st_loss = hinge(st.reshape(-1), margin)
    return rot_loss.mean() + st_loss.mean()


# ------------------------------------------------------------------ priors --

def template_edge_loss(verts: jax.Array, template_verts: jax.Array, edges: jax.Array):
    """||(edge_len^2 - template_edge_len^2)||_2 / B (loss_utils.py:80-114)."""
    def sq_len(v):
        d = v[..., edges[:, 0], :] - v[..., edges[:, 1], :]
        return (d * d).sum(-1)

    diff = sq_len(verts) - sq_len(template_verts)
    return safe_norm(diff.reshape(-1)) / verts.shape[0]


def locally_rigid_loss(verts: jax.Array, template_verts: jax.Array, edges: jax.Array):
    """ARAP-like: sum over edges of (len - template_len)^2, / B.

    (loss_utils.py:150-169; note the reference sums over B*E edges then
    divides by B only.)
    """
    def length(v):
        d = v[..., edges[:, 0], :] - v[..., edges[:, 1], :]
        return safe_norm(d, axis=-1)

    diff = length(verts) - length(template_verts)
    return (diff**2).sum() / verts.shape[0]


def deform_l2reg(V: jax.Array):
    """Mean L2 norm of per-handle offsets (loss_utils.py:322-327)."""
    return safe_norm(V.reshape(-1, V.shape[-1]), axis=-1).mean()


def entropy_loss(A: jax.Array):
    """Row-entropy of a (K, V) prob matrix (loss_utils.py:330-338)."""
    ent = -(A * jnp.log(jnp.clip(A, 1e-12))).sum(axis=1)
    return ent.mean()


def triangle_loss(verts: jax.Array, edges2verts: jax.Array):
    """Dihedral flatness via edge->4 vertices (legacy; loss_utils.py:292-319)."""
    vA = verts[..., edges2verts[:, 0], :]
    vB = verts[..., edges2verts[:, 1], :]
    vC = verts[..., edges2verts[:, 2], :]
    vD = verts[..., edges2verts[:, 3], :]
    n1 = jnp.cross(vD - vA, vB - vA)
    n2 = jnp.cross(vB - vA, vC - vA)
    n1 = n1 / safe_norm(n1, axis=-1, keepdims=True)
    n2 = n2 / safe_norm(n2, axis=-1, keepdims=True)
    dot = (n1 * n2).sum(-1)
    return ((1.0 - dot) ** 2).mean()


# ----------------------------------------------------------------- texture --

def texture_loss_l1(img_pred, img_gt, mask_pred, mask_gt):
    """Masked L1 (loss_utils.py:194-201). Images NHWC, masks (B,H,W)."""
    return jnp.abs(img_pred * mask_pred[..., None] - img_gt * mask_gt[..., None]).mean()


def texture_dt_loss_v(texture_flow: jax.Array, dist_transf: jax.Array, reduce=True):
    """Sample the DT image at per-vertex flow coords (loss_utils.py:172-191).

    texture_flow: (B, V, 2) in [-1,1]; dist_transf: (B, H, W) or (B,1,H,W).
    """
    if dist_transf.ndim == 4:
        dist_transf = dist_transf[:, 0]
    vals = grid_sample(dist_transf[..., None], texture_flow, align_corners=True)
    vals = vals[..., 0]
    return vals.mean() if reduce else vals.mean(-1)


def texture_dt_loss(texture_flow: jax.Array, dist_transf: jax.Array):
    """Atlas-flow variant: (B, F, T, T, 2) flow (loss_utils.py:132-147)."""
    B = texture_flow.shape[0]
    if dist_transf.ndim == 4:
        dist_transf = dist_transf[:, 0]
    flow = texture_flow.reshape(B, -1, 2)
    vals = grid_sample(dist_transf[..., None], flow, align_corners=True)
    return vals.mean()


def mask_dt_loss(proj_verts: jax.Array, dist_transf: jax.Array):
    """DT at projected vertices, border padding (loss_utils.py:117-129)."""
    if dist_transf.ndim == 4:
        dist_transf = dist_transf[:, 0]
    vals = grid_sample(
        dist_transf[..., None], proj_verts, align_corners=True, padding_mode="border"
    )
    return vals.mean()


def texture_cycle_loss(textures_colors: jax.Array, batch: int, num_frames: int):
    """Temporal texture consistency across frames of a clip.

    textures_colors: (B*T, F, Ts, Ts, 3). L2 norm of consecutive-frame
    texel differences, mean. (multiframe/main.py:706-712)
    """
    t_c = textures_colors.reshape(batch, num_frames, -1, 3)
    t_c = jnp.swapaxes(t_c, 1, 2)  # (B, F*Ts*Ts, T, 3)
    diff = t_c[..., :-1, :] - t_c[..., 1:, :]
    # safe_norm: adjacent-frame texture colors are exactly equal at init
    # (shared decoder), where norm's VJP would be 0/0
    return safe_norm(diff, axis=-1).mean()


# ------------------------------------------------------------ optical flow --

def optical_flow_loss(
    verts_seq: jax.Array,
    cams_seq: jax.Array,
    flows: jax.Array,
    faces: jax.Array,
    image_size: int,
    pix_to_face: jax.Array | None = None,
    reduce: bool = True,
    face_chunk: int = 128,
    visible: jax.Array | None = None,
):
    """Temporal consistency between projected-vertex motion and sampled flow.

    verts_seq: (B, T, V, 3) per-frame meshes (already posed).
    cams_seq:  (B*T, 7) cameras.
    flows:     (B, T, H, W, 2) GT flow; frame t holds flow t->t-1 in the
               reference layout (flipped before the call), with odd frames
               zeroed. Flow units: pixels.
    faces:     (F, 3).
    pix_to_face: optional (B*T, H, W) precomputed hard z-buffer.

    Returns (loss (B*(T-1),) or scalar-sum, of_pred, visible, proj, sampled)
    matching reference loss_utils.py:419-474 semantics:
      pred motion = W/2 * (p_t - p_{t+1}) in pixels (current - next);
      visibility = hard z-buffer visibility AND nonzero sampled flow,
      taken at frames 1..T-1; per-frame loss = sum_v |err| / H / (#vis + 1).
    """
    B, T, V, _ = verts_seq.shape
    H = W = image_size
    bt = B * T
    verts_flat = verts_seq.reshape(bt, V, 3)
    proj3 = cam_utils.orthographic_proj_withz(verts_flat, cams_seq)
    proj = proj3[..., :2]  # (BT, V, 2) in [-1, 1]

    if visible is not None:
        # caller already holds per-vertex visibility (e.g. from the same
        # soft_silhouette_vis pass that rendered the mask) — skip the extra
        # rasterization the reference pays for (multiframe/main.py:676-690)
        vis = visible.reshape(B, T, V)
    elif pix_to_face is None:
        vis = ras.hard_visibility(
            jax.lax.stop_gradient(proj3), faces, image_size, V,
            face_chunk=face_chunk,
        ).reshape(B, T, V)
    else:
        p2f = pix_to_face.reshape(bt, -1)
        vis = ras.visible_vertices(p2f, faces, V).reshape(B, T, V)

    flows_flat = flows.reshape(bt, H, W, 2)
    sampled = grid_sample(
        flows_flat, jax.lax.stop_gradient(proj), mode="nearest", align_corners=False
    )  # (BT, V, 2)
    sampled = sampled.reshape(B, T, V, 2)

    proj_px = W * (proj.reshape(B, T, V, 2) + 1.0) / 2.0
    of_pred = proj_px[:, :-1] - proj_px[:, 1:]  # (B, T-1, V, 2) current - next

    nonzero = jnp.abs(sampled).sum(-1) != 0
    vis_t = (nonzero & (vis > 0)).astype(proj.dtype)
    vis_t = jax.lax.stop_gradient(vis_t[:, 1:])  # frames 1..T-1
    sampled_t = vis_t[..., None] * sampled[:, 1:]
    of_pred = vis_t[..., None] * of_pred

    err = jnp.abs(sampled_t - of_pred).sum(2)  # (B, T-1, 2) L1 over verts
    loss = (err[..., 0] + err[..., 1]) / H / (vis_t.sum(-1) + 1.0)
    loss = loss.reshape(-1)
    if reduce:
        loss = loss.sum()
    return loss, of_pred, vis_t, proj.reshape(B, T, V, 2), sampled_t
