"""Inference predictor + test-time optimization (TTO).

Parity targets: reference monocular/nnutils/predictor.py:33-174
(MeshPredictor: checkpointed model -> full forward incl. Laplacian solve ->
output dict) and multiframe/nnutils/predictor.py:226-349 (argmax-multiplex
camera, post-processing Adam(5e-3) loop over delta_v_res (+ camera) against
mask + silhouette-consistency + optical-flow losses).

The TTO loop is a single jitted lax.fori_loop over an optax Adam chain —
the solve reuses the one-time Cholesky factorization across all steps
(the system matrix is constant during TTO, a structural win the batched
reference recomputes every iteration).

Note: the reference combines sil_cons as bdt_wt*edt + edt_wt*bdt at
predictor.py:321 — swapped relative to training (multiframe/main.py:722).
We implement the consistent (training) order.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
import optax

from ..geometry import camera as cam_utils
from ..geometry.mesh_ops import cot_laplacian
from ..losses import losses as L
from ..ops import rasterizer as ras


@dataclasses.dataclass(frozen=True)
class TTOConfig:
    num_iter: int = 100
    lr: float = 5e-3
    optimize_camera: bool = False
    mask_wt: float = 1.0
    boundaries_wt: float = 1.0
    edt_wt: float = 0.1
    bdt_wt: float = 2.0
    of_wt: float = 1.0
    offset_z: float = 0.0


def predict_monocular(mods, state, batch, face_chunk: int = 128) -> dict:
    """Monocular MeshPredictor.predict equivalent: full output dict."""
    from ..train import monocular

    _, aux = monocular.forward(
        mods, state.params, state.batch_stats, state.lpips_params, batch,
        train=False, face_chunk=face_chunk,
    )
    model = mods.model
    lbs = model.apply({"params": state.params}, method=model.get_lbs)
    mean_shape = model.apply({"params": state.params}, method=model.get_mean_shape)
    return {
        "lbs": lbs,
        "mean_shape": mean_shape,
        "faces": mods.template.faces,
        "kp_pred": aux["kp_pred"],
        "verts": aux["pred_v"],
        "cam_pred": aux["cam_pred"],
        "mask_pred": aux["mask_pred"],
    }


def make_tto_step_fn(
    mods,
    tto: TTOConfig,
    num_frames: int,
    face_chunk: int = 128,
    trace_vert2kp=None,
):
    """Build the jitted TTO refiner.

    Returns fn(mean_shape, lbs, delta_v_res, cam_pred, batch) ->
    (pred_v, cam_pred, final_loss).

    With trace_vert2kp (the (num_kps, V) kp regressor), the loop runs as a
    scan and the return gains a 4th element: a per-iteration diagnostic dict
    {loss (N,), iou (N, BT), kp_pred (N, BT, K, 2), cam (N, BT, 7)} for
    analyzing TTO dynamics (e.g. the camera-in-the-loop PCK question).
    """
    t = mods.template
    faces = jnp.asarray(t.faces)
    img_size = mods.cfg.model.img_size
    tx = optax.adam(tto.lr)

    def refine(mean_shape, lbs, delta_v_res, cam_pred, batch):
        BT = delta_v_res.shape[0]
        Lcot = jax.lax.stop_gradient(cot_laplacian(mean_shape, faces))
        A = jax.lax.stop_gradient(lbs)
        mean_shape = jax.lax.stop_gradient(mean_shape)
        M = (
            jnp.matmul(Lcot.T, Lcot, precision=jax.lax.Precision.HIGHEST)
            + jnp.matmul(A.T, A, precision=jax.lax.Precision.HIGHEST)
        )
        chol = jsl.cho_factor(M)
        rhs_common = Lcot.T @ (Lcot @ mean_shape)
        handle_base = (A @ mean_shape)[None]

        masks = batch["mask"].reshape(BT, img_size, img_size)
        edts = batch["edt"].reshape(BT, img_size, img_size)
        boundaries = batch["boundaries"].reshape(BT, -1, 3)

        def solve(delta_res):
            target = handle_base + delta_res
            rhs = rhs_common[None] + jnp.einsum(
                "kv,bkc->bvc", A, target, precision=jax.lax.Precision.HIGHEST
            )
            rhs_flat = jnp.moveaxis(rhs, 0, 1).reshape(mean_shape.shape[0], BT * 3)
            sol = jsl.cho_solve(chol, rhs_flat)
            return jnp.moveaxis(sol.reshape(mean_shape.shape[0], BT, 3), 1, 0)

        def decode_cam(opt_params):
            if not tto.optimize_camera:
                return cam_pred
            cam = opt_params["cam"]
            q = cam[..., 3:]
            qn = jnp.sqrt(
                jnp.maximum((q * q).sum(-1, keepdims=True), 1e-24)
            )  # finite grad at q == 0 (norm's VJP is NaN there)
            return jnp.concatenate([cam[..., :3], q / qn], axis=-1)

        def loss_fn(opt_params):
            delta_res = opt_params["delta_v_res"]
            cam = decode_cam(opt_params)
            pred_v = solve(delta_res)
            proj_v = cam_utils.orthographic_proj_withz(pred_v, cam, offset_z=tto.offset_z)
            mask_pred, pix_to_face, vis = ras.soft_silhouette_vis(
                proj_v, faces, img_size, t.num_verts, face_chunk=face_chunk
            )
            mask_loss = L.l1_loss(mask_pred, masks)
            pred_proj = cam_utils.project_points(pred_v, cam)
            edt = L.edt_loss(mask_pred, edts)
            bdt = L.boundaries_loss(pred_proj, boundaries, vis)
            total = tto.mask_wt * mask_loss + tto.boundaries_wt * (
                tto.edt_wt * edt + tto.bdt_wt * bdt
            )
            if tto.of_wt > 0 and "optical_flows" in batch:
                from ..flow.infer import shift_flows_for_loss

                B = BT // num_frames
                verts_seq = pred_v.reshape(B, num_frames, t.num_verts, 3)
                flows = batch["optical_flows"]
                masks_of = masks.reshape(B, num_frames, img_size, img_size)
                flows_f = shift_flows_for_loss(flows) * masks_of[..., None]
                of_loss, *_ = L.optical_flow_loss(
                    verts_seq, cam, flows_f, faces, img_size,
                    face_chunk=face_chunk,
                )
                total = total + tto.of_wt * of_loss
            if trace_vert2kp is None:
                return total
            # per-iteration diagnostics (values only; grads flow from total)
            hard = (mask_pred > 0.5).astype(jnp.float32)
            inter = (hard * masks).sum((1, 2))
            union = jnp.maximum((hard + masks - hard * masks).sum((1, 2)), 1e-9)
            kp_verts = jnp.einsum("kv,bvc->bkc", trace_vert2kp, pred_v)
            aux = {
                "iou": inter / union,
                "kp_pred": cam_utils.project_points(kp_verts, cam),
                "cam": cam,
            }
            return total, aux

        opt_params = {"delta_v_res": jax.lax.stop_gradient(delta_v_res)}
        if tto.optimize_camera:
            opt_params["cam"] = jax.lax.stop_gradient(cam_pred)
        opt_state = tx.init(opt_params)

        if trace_vert2kp is None:
            def body(_, carry):
                opt_params, opt_state = carry
                loss, grads = jax.value_and_grad(loss_fn)(opt_params)
                updates, opt_state = tx.update(grads, opt_state)
                opt_params = optax.apply_updates(opt_params, updates)
                return opt_params, opt_state

            opt_params, _ = jax.lax.fori_loop(
                0, tto.num_iter, body, (opt_params, opt_state)
            )
            final_loss = loss_fn(opt_params)
            pred_v = solve(opt_params["delta_v_res"])
            # decode (quat-normalize) the returned camera: the raw Adam
            # iterate's |q| drifts from 1 and quat_rotate scales by |q|^2,
            # which silently mis-scales every downstream projection (the
            # reference always projects through the normalized quat,
            # multiframe/nnutils/predictor.py:307-309)
            cam_out = decode_cam(opt_params)
            return pred_v, cam_out, final_loss

        def scan_body(carry, _):
            opt_params, opt_state = carry
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                opt_params
            )
            updates, opt_state = tx.update(grads, opt_state)
            opt_params = optax.apply_updates(opt_params, updates)
            return (opt_params, opt_state), {"loss": loss, **aux}

        (opt_params, _), trace = jax.lax.scan(
            scan_body, (opt_params, opt_state), None, length=tto.num_iter
        )
        final_loss, _ = loss_fn(opt_params)
        pred_v = solve(opt_params["delta_v_res"])
        cam_out = decode_cam(opt_params)
        return pred_v, cam_out, final_loss, trace

    return jax.jit(refine)


def argmax_multiplex_camera(mpx, frames_idx, scale_lr_decay: float = 0.05):
    """Best-hypothesis camera for train-split eval (predictor.py:239-252)."""
    from ..multiplex import state as mpx_lib

    sel = mpx_lib.topk_hypotheses(mpx, frames_idx, 1)  # (1, BT)
    raw = mpx_lib.select_hypotheses(mpx.cams[:, frames_idx.reshape(-1)], sel)[0]
    return cam_utils.decode_quat_camera(raw, scale_lr_decay=scale_lr_decay)


def similarity_kabsch(src: jnp.ndarray, dst: jnp.ndarray):
    """Similarity transform (s, R, c) minimizing ||s R src + c - dst||^2.

    src/dst: (N, 3) point sets in correspondence. Returns (s, R (3,3), c (3,))
    with det(R) = +1 (proper rotation; reflections are folded into the sign
    fix of the smallest singular vector, standard Umeyama/Kabsch).

    DIAGNOSTIC helper, no reference analog: the camera multiplex determines
    shape+cameras only up to a global similarity (gauge freedom), so the
    learned canonical frame drifts from the data generator's frame. This
    estimates that drift from the learned mean shape vs the GT template.
    """
    src = jnp.asarray(src, jnp.float32)
    dst = jnp.asarray(dst, jnp.float32)
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    X = src - mu_s
    Y = dst - mu_d
    H = X.T @ Y  # (3, 3)
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([1.0, 1.0, d]))  # standard diag(1,1,d) sign fix
    R = Vt.T @ D @ U.T
    s = (S * jnp.asarray([1.0, 1.0, d])).sum() / jnp.maximum(
        (X * X).sum(), 1e-12
    )
    c = mu_d - s * (R @ mu_s)
    return s, R, c


def gauge_correction(template_verts, mean_shape):
    """Precompute the learned-gauge drift (s_d, q_d, c_d) once per model.

    Both inputs are batch-invariant (the GT template and the learned mean
    shape), so callers evaluating many batches should compute this once and
    apply only the cheap per-batch camera composition below.
    """
    from ..geometry import quaternion as quat

    s_d, R_d, c_d = similarity_kabsch(template_verts, mean_shape)
    return s_d, quat.matrix_to_quat(R_d), c_d


def apply_gauge_correction(cams_gt: jnp.ndarray, corr):
    """Compose a precomputed gauge correction into GT cameras (diagnostic)."""
    from ..geometry import quaternion as quat

    s_d, q_d, c_d = corr
    q_corr = quat.quat_normalize(
        quat.hamilton_product(cams_gt[..., 3:7], quat.quat_conj(q_d))
    )
    scale = cams_gt[..., 0:1] / jnp.maximum(s_d, 1e-12)
    rot_c = quat.quat_rotate(c_d[None, None, :], q_corr)[..., 0, :2]
    trans = cams_gt[..., 1:3] - scale * rot_c
    return jnp.concatenate([scale, trans, q_corr], axis=-1)


def gauge_align_cameras(cams_gt: jnp.ndarray, template_verts, mean_shape):
    """Compose the learned-gauge correction into GT cameras (diagnostic).

    The generator's GT cameras project GT-gauge points: x = s_g R(q_g) v + t_g.
    If the learned mean shape drifted by a similarity, mean_shape ~= s_d R_d
    template + c_d, then projecting LEARNED verts in the GT image frame needs
      scale' = s_g / s_d,  q' = q_g (x) conj(q_d),
      t' = t_g - scale' * (R(q') c_d)_xy.
    Without this correction the GT-camera column is NOT a ceiling — gauge
    drift alone sinks it below the predicted-camera PCK.
    """
    return apply_gauge_correction(cams_gt, gauge_correction(template_verts, mean_shape))
