"""Multiframe trainer: camera-multiplex video training (the flagship).

Parity target: reference multiframe/main.py ShapeTrainer (warmup :438-521,
forward :523-765) + multiframe/nnutils/train_utils.py (init_camera_emb,
pose warmup with Adam(1e-2) on camera embeddings, texture warmup and main
loop both driving `optimizer_full` = Adam over model + embedding tables,
hypothesis-drop schedule rewritten here as explicit per-phase step
functions).

TPU-first structure: one fused XLA program renders all
(hypotheses x batch x frames) meshes and computes the per-(guess, frame)
loss matrix; the soft-min weighting, probability writeback and Adam update
are part of the same program. The hypothesis count k is a static argument —
the drop schedule selects among a handful of pre-compiled steps instead of
mutating flags (reference train_utils.py:236-241).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import optax

from .. import config as cfg_lib
from ..deform.solve import screened_poisson_solve
from ..flow.infer import shift_flows_for_loss
from ..geometry import camera as cam_utils
from ..geometry.mesh_ops import cot_laplacian, cot_laplacian_smoothing
from ..losses import losses as L
from ..models.lpips import LPIPS, perceptual_texture_loss
from ..models.mesh_net import MeshNet
from ..models.template import Template
from ..multiplex import state as mpx_lib
from ..ops import rasterizer as ras
from .monocular import normalize_imagenet


@flax.struct.dataclass
class MFTrainState:
    params: Any
    batch_stats: Any
    opt_state: Any            # Adam over (params, multiplex trainables)
    warmup_opt_state: Any     # Adam over multiplex cams only
    multiplex: mpx_lib.MultiplexState
    lpips_params: Any
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class MFModules:
    model: MeshNet
    lpips: Optional[LPIPS]
    template: Template
    cfg: cfg_lib.Config


def _trainable_mpx(mpx: mpx_lib.MultiplexState) -> dict:
    out = {"cams": mpx.cams}
    if mpx.deform is not None:
        out["deform"] = mpx.deform
        out["deform_mirror"] = mpx.deform_mirror
    return out


def make_optimizer(
    cfg: cfg_lib.Config, steps_per_epoch: Optional[int] = None
) -> optax.GradientTransformation:
    """optimizer_full equivalent (reference train_utils.py:177-189).

    Optional parity features the reference constructs (train_utils.py:181,
    :185) — a separate camera-predictor Adam and a MultiStepLR([5,150],
    gamma=0.1) — wired as working optax transforms. (In the reference's
    shipped loop the scheduler is never .step()ed and optimizer_camera is
    never used; here they actually take effect when enabled.)
    """
    tr = cfg.train

    def lr_at(lr: float):
        if not tr.multistep_lr or not steps_per_epoch:
            return lr
        boundaries = {
            int(m) * steps_per_epoch: tr.lr_gamma for m in tr.lr_milestones
        }
        return optax.piecewise_constant_schedule(lr, boundaries)

    adam = optax.adam(lr_at(tr.learning_rate), b1=tr.beta1, b2=0.999)
    if not tr.separate_camera_opt:
        return adam

    cam_adam = optax.adam(lr_at(tr.camera_learning_rate), b1=tr.beta1, b2=0.999)

    def label_fn(tree):
        def walk(node, is_cam):
            if isinstance(node, dict):
                return {
                    k: walk(v, is_cam or "camera_predictor" in str(k))
                    for k, v in node.items()
                }
            return "camera" if is_cam else "general"

        return walk(tree, False)

    return optax.multi_transform({"general": adam, "camera": cam_adam}, label_fn)


def build(
    cfg: cfg_lib.Config,
    template: Template,
    num_frames_total: int,
    rng: jax.Array,
    steps_per_epoch: Optional[int] = None,
):
    m = cfg.model
    model = MeshNet(
        template=template,
        nz_feat=m.nz_feat,
        predict_texture=m.texture,
        use_camera_layernorm=True,
        scale_lr=m.scale_lr,
        small_camera_init=True,
        learnable_kp=m.learnable_kp,
    )
    dummy = jnp.zeros((1, m.img_size, m.img_size, 3), jnp.float32)
    variables = model.init(rng, dummy, method=model.init_all)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    mp = cfg.multiplex
    # deform tables (and their Adam state) exist only when the run trains
    # them — optimize_deform=False runs carry no N_frames x (K*3) dead state
    if mp.az_el_cam:
        mpx = mpx_lib.init_az_el_multiplex(
            num_frames_total, mp.num_guesses, m.num_lbs,
            with_deform=mp.optimize_deform,
        )
    else:
        mpx = mpx_lib.init_quat_multiplex(
            num_frames_total, mp.num_guesses, m.num_lbs,
            with_deform=mp.optimize_deform,
        )

    lpips = None
    lpips_params = {}
    if m.texture:
        lpips = LPIPS()
        lpips_params = lpips.init(jax.random.fold_in(rng, 1), dummy, dummy)["params"]

    tx_full = make_optimizer(cfg, steps_per_epoch=steps_per_epoch)
    tx_warm = optax.adam(cfg.train.warmup_lr)  # reference train_utils.py:187
    opt_state = tx_full.init({"params": params, "mpx": _trainable_mpx(mpx)})
    warmup_opt_state = tx_warm.init(mpx.cams)
    state = MFTrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        warmup_opt_state=warmup_opt_state,
        multiplex=mpx,
        lpips_params=lpips_params,
        step=jnp.zeros((), jnp.int32),
    )
    mods = MFModules(model=model, lpips=lpips, template=template, cfg=cfg)
    return mods, (tx_full, tx_warm), state


# --------------------------------------------------------------------------
# camera decoding shared by warmup / forward
# --------------------------------------------------------------------------

def decode_selected_cameras(
    mods: MFModules,
    cams_table: jax.Array,
    mpx: mpx_lib.MultiplexState,
    batch: dict,
    k: int,
):
    """Top-k hypothesis selection + decode + mirror/affine transport.

    Returns (cam_pred (k, BT, 7), sel (k, BT)).
    (reference multiframe/main.py:541-582)
    """
    mp = mods.cfg.multiplex
    frames_idx = batch["frames_idx"]  # (B, T)
    flat = frames_idx.reshape(-1)
    G = cams_table.shape[0]
    raw = cams_table[:, flat, :]  # (G, BT, C)
    if k < G:
        sel = mpx_lib.topk_hypotheses(mpx, frames_idx, k)  # (k, BT)
        raw = mpx_lib.select_hypotheses(raw, sel)
    else:
        sel = jnp.tile(jnp.arange(G, dtype=jnp.int32)[:, None], (1, flat.shape[0]))
    if mp.az_el_cam:
        quat_bias = None
        if mp.az_el_quat_bias:
            # per-hypothesis pi/4 rotation-bias chain, gathered for the
            # selected hypotheses (reference mesh_net.py:363-370)
            biases = cam_utils.az_el_quat_biases(G)  # (G, 4)
            quat_bias = biases[sel]  # (k, BT, 4)
        cams = cam_utils.decode_az_el_camera(
            raw, scale_lr_decay=mp.scale_lr_decay, scale_bias=mp.scale_bias,
            az_range_deg=mp.az_euler_range, el_range_deg=mp.el_euler_range,
            cyc_range_deg=mp.cyc_euler_range, quat_bias=quat_bias,
        )
    else:
        cams = cam_utils.decode_quat_camera(raw, scale_lr_decay=mp.scale_lr_decay)
    mirror = batch["mirror_flag"].reshape(-1).astype(cams.dtype)  # (BT,)
    cams = cam_utils.mirror_camera(cams, jnp.broadcast_to(mirror[None], cams.shape[:2]))
    transforms = batch["transforms"].reshape(1, -1, 4)
    cams = cam_utils.transform_camera(cams, jnp.broadcast_to(transforms, cams.shape[:2] + (4,)))
    return cams, sel


def _per_guess_losses(
    mods: MFModules,
    cam_pred: jax.Array,       # (k, BT, 7)
    pred_v: jax.Array,         # (BT, V, 3)
    atlas: Optional[jax.Array],
    lpips_params,
    batch: dict,
    face_chunk: int,
    vert2kp: Optional[jax.Array] = None,  # (K_kp, V) softmaxed assignment
):
    """Render all (guess, frame) pairs and compute the loss matrix.

    Returns (loss_matrix (k, BT), metrics, extras).
    """
    cfg = mods.cfg
    w = cfg.mf_weights
    t = mods.template
    img_size = cfg.model.img_size
    faces = jnp.asarray(t.faces)
    k, BT = cam_pred.shape[:2]
    B, T = batch["frames_idx"].shape

    imgs = batch["img"].reshape(BT, img_size, img_size, 3)
    masks = batch["mask"].reshape(BT, img_size, img_size)
    edts = batch["edt"].reshape(BT, img_size, img_size)
    boundaries = batch["boundaries"]
    if boundaries.ndim == 4:
        boundaries = boundaries.reshape(BT, *boundaries.shape[2:])

    # fuse guesses into the batch: (k*BT, V, 3)
    verts_rep = jnp.tile(pred_v, (k, 1, 1))
    cams_flat = cam_pred.reshape(k * BT, 7)
    proj_v = cam_utils.orthographic_proj_withz(verts_rep, cams_flat, offset_z=0.0)
    tex_pred = None
    if w.tex > 0 and atlas is not None:
        # one rasterization serves mask + visibility + texture sampling
        atlas_rep = jnp.tile(atlas, (k, 1, 1, 1, 1))
        mask_pred, pix_to_face, vis_verts, tex_pred, _ = (
            ras.soft_silhouette_vis_tex(
                proj_v, faces, atlas_rep, img_size, t.num_verts,
                face_chunk=face_chunk,
            )
        )
    else:
        mask_pred, pix_to_face, vis_verts = ras.soft_silhouette_vis(
            proj_v, faces, img_size, t.num_verts, face_chunk=face_chunk
        )

    masks_rep = jnp.tile(masks, (k, 1, 1))
    mask_loss = L.l1_loss(mask_pred, masks_rep, reduce=False).reshape(k, BT)

    pred_proj2d = cam_utils.project_points(verts_rep, cams_flat)
    edt = L.edt_loss(mask_pred, jnp.tile(edts, (k, 1, 1)), reduce=False).reshape(k, BT)
    bdt = L.boundaries_loss(
        pred_proj2d, jnp.tile(boundaries, (k, 1, 1)), vis_verts, reduce=False
    ).reshape(k, BT)
    sil_cons = w.edt * edt + w.bdt * bdt

    loss_matrix = w.mask * mask_loss + w.boundaries * sil_cons
    metrics = {
        "mask_loss": mask_loss, "edt_loss": edt, "bdt_loss": bdt, "sil_cons": sil_cons,
    }
    extras = {"mask_pred": mask_pred, "pix_to_face": pix_to_face}

    if w.of > 0:
        # clip_flows layout (slot t = flow t->t+1) -> loss layout, masked
        # (reference multiframe/main.py:648: flip along T for T=2)
        flows = batch["optical_flows"]  # (B, T, H, W, 2)
        masks_of = masks.reshape(B, T, img_size, img_size)
        flows_f = shift_flows_for_loss(flows) * masks_of[..., None]
        verts_seq = verts_rep.reshape(k * B, T, t.num_verts, 3)
        flows_rep = jnp.tile(flows_f, (k, 1, 1, 1, 1))
        # visibility comes free from the soft_silhouette_vis pass above —
        # the reference re-rasterizes all k*B*T meshes here (main.py:676)
        of_loss, *_ = L.optical_flow_loss(
            verts_seq, cams_flat, flows_rep, faces, img_size,
            reduce=False, face_chunk=face_chunk,
            visible=jax.lax.stop_gradient(vis_verts),
        )  # (k*B*(T-1),)
        of_loss = of_loss.reshape(k, B, T - 1)
        # reference repeats the per-clip loss over the T frames of the clip
        of_loss = jnp.repeat(
            of_loss.mean(-1, keepdims=True) * (T - 1), T, axis=-1
        ).reshape(k, BT)
        loss_matrix = loss_matrix + w.of * of_loss
        metrics["of_loss"] = of_loss

    if w.tex > 0 and atlas is not None:
        imgs_rep = jnp.tile(imgs, (k, 1, 1, 1))
        imgs_f, cams_f, mask_pred_f, masks_f = (
            imgs_rep[:, :, ::-1],
            cam_utils.mirror_camera(cams_flat, jnp.ones((k * BT,))),
            mask_pred[:, :, ::-1],
            masks_rep[:, :, ::-1],
        )
        proj_v_f = cam_utils.orthographic_proj_withz(
            jax.lax.stop_gradient(verts_rep), cams_f, offset_z=0.0
        )
        tex_pred_f, _, _ = ras.render_texture(
            proj_v_f, faces, atlas_rep, img_size, face_chunk=face_chunk
        )
        # one LPIPS pass over [orig; flip] instead of two half-batch passes
        per = perceptual_texture_loss(
            lambda x, y: mods.lpips.apply({"params": lpips_params}, x, y),
            jnp.concatenate([tex_pred, tex_pred_f], 0),
            jnp.concatenate([imgs_rep, imgs_f], 0),
            jnp.concatenate([masks_rep, masks_f], 0),
            reduce=False,
        )
        tex = 0.5 * (per[: k * BT] + per[k * BT :])
        mse = 0.5 * (
            ((tex_pred - imgs_rep) * masks_rep[..., None]) ** 2
            + ((tex_pred_f - imgs_f) * masks_f[..., None]) ** 2
        ).mean(axis=(1, 2, 3))
        tex = (tex + mse).reshape(k, BT)
        loss_matrix = loss_matrix + w.tex * tex
        metrics["tex_loss"] = tex
        extras["tex_pred"] = tex_pred

    if w.kp > 0 and vert2kp is not None:
        # per-(guess, frame) keypoint loss — included in both the main
        # forward (main.py:692-698) and the pose warmup (main.py:503-516)
        kp_verts = jnp.einsum("kv,bvc->bkc", vert2kp, pred_v)  # (BT, K_kp, 3)
        kp_proj = cam_utils.project_points(
            jnp.tile(kp_verts, (k, 1, 1)), cams_flat
        )
        kp_loss = L.kp_l2_loss(
            kp_proj, jnp.tile(batch["kp"].reshape(BT, -1, 3), (k, 1, 1)),
            reduce=False,
        ).reshape(k, BT)
        loss_matrix = loss_matrix + w.kp * kp_loss
        metrics["kp_loss"] = kp_loss
    return loss_matrix, metrics, extras


def forward(
    mods: MFModules,
    params,
    batch_stats,
    mpx_trainable: dict,
    mpx: mpx_lib.MultiplexState,
    lpips_params,
    batch: dict,
    *,
    k: int,
    train: bool,
    drop_deform: bool = False,
    detach_camera: bool = False,
    use_gtpose: bool = False,
    face_chunk: int = 128,
):
    """Full multiframe forward (multiframe/main.py:523-765).

    use_gtpose: project/render with the GT sfm cameras instead of the
    multiplex (reference main.py:610-614; `finetune_camera` flips this off
    at epoch 30 via the driver's schedule). The reference only runs this
    with num_guesses=1, and we do the same (driver forces k=1). Deviation:
    we transport the GT cameras through the affine augmentation
    (transform_camera) — the reference projects with untransported GT cams
    under augmentation, which misaligns them with the augmented images;
    with augmentation off the two are identical.

    Returns (total_loss, aux) where aux carries the new probs writeback.
    """
    cfg = mods.cfg
    mp = cfg.multiplex
    w = cfg.mf_weights
    t = mods.template
    model = mods.model
    img_size = cfg.model.img_size
    B, T = batch["frames_idx"].shape
    BT = B * T

    imgs = batch["img"].reshape(BT, img_size, img_size, 3)
    variables = {"params": params, "batch_stats": batch_stats}
    if train:
        out, new_vars = model.apply(
            variables, normalize_imagenet(imgs), train=True, mutable=["batch_stats"]
        )
        new_batch_stats = new_vars.get("batch_stats", batch_stats)
    else:
        out = model.apply(variables, normalize_imagenet(imgs), train=False)
        new_batch_stats = batch_stats

    delta_v_res = out["delta_v"]       # (BT, K, 3)
    predicted_camera = out["cam_pred"]

    mpx_t = dataclasses.replace(
        mpx,
        cams=mpx_trainable["cams"],
        deform=mpx_trainable.get("deform", mpx.deform),
        deform_mirror=mpx_trainable.get("deform_mirror", mpx.deform_mirror),
    )

    cam_pred, sel = decode_selected_cameras(mods, mpx_t.cams, mpx_t, batch, k)
    if detach_camera:
        cam_pred = jax.lax.stop_gradient(cam_pred)
    if use_gtpose:
        # mirror transport already happened in the dataset (sfm_pose is
        # flipped with the clip); apply the affine transport here
        gt_cams = batch["sfm_pose"].reshape(BT, 7)
        transforms = batch["transforms"].reshape(BT, 4)
        gt_cams = cam_utils.transform_camera(gt_cams, transforms)
        proj_cams = jnp.broadcast_to(gt_cams[None], (k, BT, 7))
    else:
        proj_cams = cam_pred

    mean_shape = model.apply({"params": params}, method=model.get_mean_shape)
    lbs = model.apply({"params": params}, method=model.get_lbs)

    if mp.optimize_deform:
        deforms = mpx_lib.gather_deforms(
            mpx_t, batch["frames_idx"], batch["mirror_flag"], t.num_lbs,
            deform_lr=mp.optimize_deform_lr,
        )
    else:
        deforms = None

    if drop_deform:
        delta = jnp.zeros_like(delta_v_res)
    elif mp.optimize_deform:
        delta = deforms
    else:
        delta = delta_v_res

    # cot Laplacian of the current template (weights constant per step).
    faces = jnp.asarray(t.faces)
    Lcot = jax.lax.stop_gradient(cot_laplacian(mean_shape, faces))
    pred_v = screened_poisson_solve(mean_shape, lbs, delta, Lcot)  # (BT, V, 3)

    atlas = None
    if cfg.model.texture:
        atlas = model.apply(
            {"params": params, "batch_stats": batch_stats},
            out["res_feats"],
            train=False,
            method=model.textures,
        )

    vert2kp = None
    if w.kp > 0:
        vert2kp = model.apply({"params": params}, method=model.get_vert2kp)

    # remat: the per-guess render+loss block holds G*B*T rendered views of
    # activations — recompute them in the backward pass instead of saving
    per_guess = jax.checkpoint(
        lambda cp, pv, at, v2k: _per_guess_losses(
            mods, cp, pv, at, lpips_params, batch, face_chunk, vert2kp=v2k
        ),
        prevent_cse=False,
    )
    loss_matrix, per_guess_metrics, extras = per_guess(
        proj_cams, pred_v, atlas, vert2kp
    )

    # soft-min hypothesis weighting (main.py:736-746)
    probs = jax.lax.stop_gradient(jax.nn.softmax(-loss_matrix, axis=0))
    total = (loss_matrix * probs).sum(0).mean()

    # priors (identical across guesses -> computed once)
    mean_v = jnp.broadcast_to(mean_shape[None], pred_v.shape)
    edges = jnp.asarray(t.edges)
    rigid_loss = L.locally_rigid_loss(pred_v, mean_v, edges)
    triangle_loss = cot_laplacian_smoothing(pred_v, faces)
    handle_deform = L.deform_l2reg(delta_v_res)
    total = total + w.rigid * rigid_loss + w.triangle * triangle_loss
    total = total + w.handle_deform_reg * handle_deform

    metrics = {
        "total_loss": total,
        "rigid_loss": rigid_loss,
        "tri_loss": triangle_loss,
        "handle_deform": handle_deform,
    }
    for name, mat in per_guess_metrics.items():
        metrics[name] = (probs * mat).sum(0).mean()

    if cfg.model.texture and atlas is not None:
        cycle = L.texture_cycle_loss(atlas, B, T)
        total = total + w.deform_reg * cycle
        metrics["cycle_loss"] = cycle

    # camera predictor distillation toward the argmax hypothesis
    argmax = jnp.argmax(probs, axis=0)  # (BT,)
    cam_sel = jnp.take_along_axis(cam_pred, argmax[None, :, None], axis=0)[0]
    cam_loss = L.camera_loss(predicted_camera, jax.lax.stop_gradient(cam_sel), 0.0)
    total = total + w.cam * cam_loss
    metrics["camera_loss"] = cam_loss

    if mp.optimize_deform and deforms is not None:
        deform_loss = ((delta_v_res - jax.lax.stop_gradient(deforms)) ** 2).mean()
        total = total + w.deform * deform_loss
        metrics["deform_loss"] = deform_loss

    metrics["total_loss"] = total
    aux = {
        "metrics": metrics,
        "batch_stats": new_batch_stats,
        "probs": probs,
        "sel": sel,
        "cam_sel": cam_sel,
        "pred_v": pred_v,
        "mask_pred": extras["mask_pred"],
    }
    return total, aux


def warmup_forward(
    mods: MFModules,
    cams_table: jax.Array,
    mpx: mpx_lib.MultiplexState,
    mean_shape: jax.Array,
    batch: dict,
    face_chunk: int = 128,
    vert2kp: Optional[jax.Array] = None,
):
    """Pose-warmup loss: mean shape rendered under every hypothesis.

    (reference multiframe/main.py:438-521; the kp term enters the
    per-hypothesis matrix when kp_loss_wt > 0, main.py:503-516).
    Returns (loss, probs (G, BT)).
    """
    t = mods.template
    G = cams_table.shape[0]
    B, T = batch["frames_idx"].shape
    BT = B * T

    cam_pred, _ = decode_selected_cameras(
        mods, cams_table, mpx, batch, k=G
    )
    pred_v = jnp.broadcast_to(mean_shape[None], (BT, t.num_verts, 3))
    loss_matrix, metrics, _ = _per_guess_losses(
        mods, cam_pred, pred_v, None, None, batch, face_chunk,
        vert2kp=vert2kp,
    )
    probs = jax.lax.stop_gradient(jax.nn.softmax(-loss_matrix, axis=0))
    return loss_matrix.mean(), probs


# --------------------------------------------------------------------------
# jitted steps
# --------------------------------------------------------------------------

def make_train_step(
    mods: MFModules,
    tx_full: optax.GradientTransformation,
    *,
    k: int,
    drop_deform: bool = True,
    detach_camera: bool = False,
    use_gtpose: bool = False,
    face_chunk: int = 128,
    donate: bool = True,
):
    """Main-loop step (optimizer_full over model + multiplex tables).

    donate=False keeps the input state's buffers alive after the call
    (2x state memory) — used by the driver's ACFM_NAN_DUMP_DIR debug mode
    so the pre-step state can be dumped when a step produces NaN."""

    def step(state: MFTrainState, batch: dict):
        def loss_fn(trainables):
            return forward(
                mods, trainables["params"], state.batch_stats, trainables["mpx"],
                state.multiplex, state.lpips_params, batch,
                k=k, train=True, drop_deform=drop_deform,
                detach_camera=detach_camera, use_gtpose=use_gtpose,
                face_chunk=face_chunk,
            )

        trainables = {"params": state.params, "mpx": _trainable_mpx(state.multiplex)}
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainables)
        updates, new_opt = tx_full.update(grads, state.opt_state, trainables)
        new_tr = optax.apply_updates(trainables, updates)
        new_mpx = dataclasses.replace(
            state.multiplex,
            cams=new_tr["mpx"]["cams"],
            deform=new_tr["mpx"].get("deform", state.multiplex.deform),
            deform_mirror=new_tr["mpx"].get(
                "deform_mirror", state.multiplex.deform_mirror
            ),
        )
        new_mpx = mpx_lib.scatter_probs(
            new_mpx, batch["frames_idx"], aux["sel"], aux["probs"]
        )
        new_state = state.replace(
            params=new_tr["params"],
            batch_stats=aux["batch_stats"],
            opt_state=new_opt,
            multiplex=new_mpx,
            step=state.step + 1,
        )
        return new_state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_warmup_step(
    mods: MFModules, tx_warm: optax.GradientTransformation, face_chunk: int = 128
):
    """Pose-warmup step: Adam(1e-2) on the camera tables only."""

    def step(state: MFTrainState, batch: dict):
        mean_shape = mods.model.apply(
            {"params": state.params}, method=mods.model.get_mean_shape
        )
        vert2kp = None
        if mods.cfg.mf_weights.kp > 0:
            vert2kp = mods.model.apply(
                {"params": state.params}, method=mods.model.get_vert2kp
            )

        def loss_fn(cams_table):
            loss, probs = warmup_forward(
                mods, cams_table, state.multiplex, mean_shape, batch,
                face_chunk, vert2kp=vert2kp,
            )
            return loss, probs

        (loss, probs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.multiplex.cams
        )
        updates, new_opt = tx_warm.update(grads, state.warmup_opt_state)
        new_cams = optax.apply_updates(state.multiplex.cams, updates)
        G = new_cams.shape[0]
        sel = jnp.tile(
            jnp.arange(G, dtype=jnp.int32)[:, None],
            (1, batch["frames_idx"].size),
        )
        new_mpx = mpx_lib.scatter_probs(
            dataclasses.replace(state.multiplex, cams=new_cams),
            batch["frames_idx"], sel, probs,
        )
        new_state = state.replace(
            multiplex=new_mpx, warmup_opt_state=new_opt, step=state.step + 1
        )
        return new_state, {"warmup_loss": loss}

    return jax.jit(step, donate_argnums=(0,))


def init_camera_emb(state: MFTrainState, batch: dict, scale_lr_decay: float = 0.05):
    """Write (rescaled) GT sfm cameras into hypothesis table 0.

    (reference multiframe/main.py:419-436 + train_utils init_camera_emb
    pass). Applied per no-augmentation batch.
    """
    cams_gt = batch["sfm_pose"].reshape(-1, 7)
    transforms = batch["transforms"].reshape(-1, 4)
    cams_gt = cam_utils.transform_camera(cams_gt, transforms)
    rescaled = cams_gt.at[:, 0].set((jnp.abs(cams_gt[:, 0]) - 1.0) / scale_lr_decay)
    flat = batch["frames_idx"].reshape(-1)
    new_cams = state.multiplex.cams.at[0, flat].set(rescaled)
    return state.replace(
        multiplex=dataclasses.replace(state.multiplex, cams=new_cams)
    )
