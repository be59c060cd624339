"""Monocular trainer: single-camera CUB-style training (flagship slice 1).

Parity target: reference monocular/main.py ShapeTrainer.forward (:190-293)
+ train_utils.Trainer.train — one fused XLA program per step: encoder ->
handle offsets + camera -> screened-Poisson solve -> soft-silhouette and
texture renders (orig + mirrored) -> full loss stack -> Adam update.

The whole step (render + all losses, fwd + bwd) is one jit region; under a
data mesh the batch axis shards and XLA emits the gradient all-reduce.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any, Optional

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from .. import config as cfg_lib
from ..deform.solve import screened_poisson_solve
from ..geometry import camera as cam_utils
from ..losses import losses as L
from ..models.lpips import LPIPS, perceptual_texture_loss
from ..models.mesh_net import MeshNet
from ..models.template import Template
from ..ops import rasterizer as ras


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    lpips_params: Any
    step: jax.Array


@dataclasses.dataclass(frozen=True)
class MonoModules:
    """Static (non-pytree) pieces passed via closure into the jitted step."""

    model: MeshNet
    lpips: Optional[LPIPS]
    template: Template
    cfg: cfg_lib.Config


def build(cfg: cfg_lib.Config, template: Template, rng: jax.Array):
    """Construct model/optimizer and the initial TrainState."""
    m = cfg.model
    dtype = jnp.bfloat16 if m.dtype == "bfloat16" else jnp.float32
    model = MeshNet(
        template=template,
        nz_feat=m.nz_feat,
        predict_texture=m.texture,
        use_camera_layernorm=m.use_camera_layernorm,
        scale_lr=m.scale_lr,
        small_camera_init=m.small_camera_init,
        learnable_kp=m.learnable_kp,
        dtype=dtype,
    )
    dummy = jnp.zeros((1, m.img_size, m.img_size, 3), jnp.float32)
    variables = model.init(rng, dummy, method=model.init_all)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    lpips = None
    lpips_params = {}
    if m.texture:
        lpips = LPIPS(dtype=dtype)
        lp_vars = lpips.init(
            jax.random.fold_in(rng, 1), dummy, dummy
        )
        lpips_params = lp_vars["params"]

    tx = optax.adam(cfg.train.learning_rate, b1=cfg.train.beta1, b2=0.999)
    opt_state = tx.init(params)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        lpips_params=lpips_params,
        step=jnp.zeros((), jnp.int32),
    )
    return MonoModules(model=model, lpips=lpips, template=template, cfg=cfg), tx, state


def normalize_imagenet(img: jax.Array) -> jax.Array:
    mean = jnp.asarray(cfg_lib.IMAGENET_MEAN)
    std = jnp.asarray(cfg_lib.IMAGENET_STD)
    return (img - mean) / std


def mirror_batch(imgs, cams, mask_pred, masks):
    """Horizontal flip of images/masks + camera transport.

    (reference monocular/main.py:57-74 mirror_sample)
    """
    imgs_f = imgs[:, :, ::-1]
    mask_pred_f = mask_pred[:, :, ::-1]
    masks_f = masks[:, :, ::-1]
    cams_f = cam_utils.mirror_camera(cams, jnp.ones(cams.shape[:-1], cams.dtype))
    return imgs_f, cams_f, mask_pred_f, masks_f


def forward(
    mods: MonoModules,
    params,
    batch_stats,
    lpips_params,
    batch: dict,
    train: bool,
    face_chunk: int = 128,
):
    """Full monocular forward; returns (total_loss, aux dict)."""
    cfg = mods.cfg
    t = mods.template
    model = mods.model
    w = cfg.mono_weights
    img_size = cfg.model.img_size

    faces = jnp.asarray(t.faces)
    edges = jnp.asarray(t.edges)
    Lap = jnp.asarray(t.uniform_L)

    imgs = batch["img"]            # (B, H, W, 3) in [0, 1]
    masks = batch["mask"]          # (B, H, W)
    kps = batch["kp"]              # (B, K, 3)
    cams_gt = batch["sfm_pose"]    # (B, 7)
    edts = batch["edt"]            # (B, H, W) unnormalized DT
    boundaries = batch["boundaries"]  # (B, N, 3)

    variables = {"params": params, "batch_stats": batch_stats}
    mutable = ["batch_stats"] if train else []
    out, new_vars = model.apply(
        variables, normalize_imagenet(imgs), train=train, mutable=mutable
    ) if train else (model.apply(variables, normalize_imagenet(imgs), train=False), {})
    new_batch_stats = new_vars.get("batch_stats", batch_stats) if train else batch_stats

    delta_v = out["delta_v"]       # (B, K, 3)
    cam_pred = out["cam_pred"]     # (B, 7)
    res_feats = out["res_feats"]

    mean_shape = model.apply({"params": params}, method=model.get_mean_shape)
    lbs = model.apply({"params": params}, method=model.get_lbs)  # (K, V)
    vert2kp = model.apply({"params": params}, method=model.get_vert2kp)

    pred_v = screened_poisson_solve(mean_shape, lbs, delta_v, Lap)  # (B, V, 3)
    B = pred_v.shape[0]
    mean_v = jnp.broadcast_to(mean_shape[None], pred_v.shape)

    proj_cam = cams_gt if cfg.train.use_gtpose else cam_pred

    kp_verts_pred = jnp.einsum("kv,bvc->bkc", vert2kp, pred_v)
    kp_pred_transformed = cam_utils.project_points(kp_verts_pred, proj_cam)

    proj_v = cam_utils.orthographic_proj_withz(
        pred_v, proj_cam, offset_z=cfg.train.offset_z
    )
    atlas = None
    if cfg.model.texture:
        atlas = model.apply(
            {"params": params, "batch_stats": batch_stats},
            res_feats,
            train=False,
            method=model.textures,
        )
        # one rasterization serves mask + visibility + texture sampling
        mask_pred, pix_to_face, vis_verts, tex_pred, _ = (
            ras.soft_silhouette_vis_tex(
                proj_v, faces, atlas, img_size, t.num_verts,
                face_chunk=face_chunk,
            )
        )
    else:
        mask_pred, pix_to_face, vis_verts = ras.soft_silhouette_vis(
            proj_v, faces, img_size, t.num_verts, face_chunk=face_chunk
        )

    metrics = {}
    total = 0.0

    kp_loss = L.kp_l2_loss(kp_pred_transformed, kps)
    mask_loss = L.iou_loss(mask_pred, masks)
    cam_loss = L.camera_loss(cam_pred, cams_gt, 0.0)
    total += w.kp * kp_loss + w.mask * mask_loss + w.cam * cam_loss
    metrics.update(kp_loss=kp_loss, mask_loss=mask_loss, cam_loss=cam_loss)

    tex_loss = 0.0
    if cfg.model.texture:
        imgs_f, cam_f, mask_pred_f, masks_f = mirror_batch(
            imgs, proj_cam, mask_pred, masks
        )
        proj_v_f = cam_utils.orthographic_proj_withz(
            jax.lax.stop_gradient(pred_v), cam_f, offset_z=cfg.train.offset_z
        )
        tex_pred_f, _, _ = ras.render_texture(
            proj_v_f, faces, atlas, img_size, face_chunk=face_chunk
        )
        # one LPIPS pass over [orig; flip] instead of two half-batch passes
        tex_loss = perceptual_texture_loss(
            lambda x, y: mods.lpips.apply({"params": lpips_params}, x, y),
            jnp.concatenate([tex_pred, tex_pred_f], 0),
            jnp.concatenate([imgs, imgs_f], 0),
            jnp.concatenate([masks, masks_f], 0),
        )
        tex_l1 = 0.5 * (
            ((tex_pred * masks[..., None] - imgs * masks[..., None]) ** 2).mean()
            + ((tex_pred_f * masks_f[..., None] - imgs_f * masks_f[..., None]) ** 2).mean()
        )
        tex_loss = tex_loss + tex_l1
        total += w.tex * tex_loss
        metrics.update(tex_loss=tex_loss)

    # silhouette consistency
    pred_proj2d = cam_utils.project_points(pred_v, proj_cam)
    edt_loss = L.edt_loss(mask_pred, edts)
    bdt_loss = L.boundaries_loss(pred_proj2d, boundaries, vis_verts)
    sil_cons = w.edt * edt_loss + w.bdt * bdt_loss
    total += w.boundaries * sil_cons
    metrics.update(edt_loss=edt_loss, bdt_loss=bdt_loss, sil_cons=sil_cons)

    # priors
    rigid_loss = L.locally_rigid_loss(pred_v, mean_v, edges)
    from ..geometry.mesh_ops import uniform_laplacian_smoothing

    triangle_loss = uniform_laplacian_smoothing(pred_v, Lap)
    vert2kp_loss = L.entropy_loss(vert2kp)
    deform_reg = L.deform_l2reg(delta_v)
    total += w.vert2kp * vert2kp_loss + w.rigid * rigid_loss + w.triangle * triangle_loss
    metrics.update(
        rigid_loss=rigid_loss,
        tri_loss=triangle_loss,
        vert2kp_loss=vert2kp_loss,
        deform_reg=deform_reg,
        total_loss=total,
    )

    aux = {
        "metrics": metrics,
        "batch_stats": new_batch_stats,
        "mask_pred": mask_pred,
        "kp_pred": kp_pred_transformed,
        "pred_v": pred_v,
        "cam_pred": cam_pred,
    }
    return total, aux


def make_train_step(mods: MonoModules, tx: optax.GradientTransformation, face_chunk=128):
    """Build the jitted fused train step."""

    def step(state: TrainState, batch: dict):
        def loss_fn(params):
            return forward(
                mods, params, state.batch_stats, state.lpips_params, batch,
                train=True, face_chunk=face_chunk,
            )

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            params=new_params,
            batch_stats=aux["batch_stats"],
            opt_state=new_opt,
            step=state.step + 1,
        )
        return new_state, aux["metrics"]

    return jax.jit(step, donate_argnums=(0,))


def make_eval_step(mods: MonoModules, face_chunk=128):
    def eval_step(state: TrainState, batch: dict):
        _, aux = forward(
            mods, state.params, state.batch_stats, state.lpips_params, batch,
            train=False, face_chunk=face_chunk,
        )
        return aux

    return jax.jit(eval_step)
