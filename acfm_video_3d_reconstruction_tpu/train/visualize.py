"""Training visualization panels (visdom replacement).

Parity target: reference get_current_visuals + Visualizer.
display_current_results (multiframe/main.py:775-923,
utils/visualizer.py:27-119): every display_freq steps, write a PNG panel of
[input+kps | GT mask | predicted mask | mesh render | novel view] rows to
<save_dir>/vis/. Wire through the driver's vis_fn hook.
"""
from __future__ import annotations

import os
import os.path as osp

import jax
import numpy as np

from ..geometry import camera as cam_utils
from ..ops import rasterizer as ras
from ..utils import vis as vis_utils


def _to_u8(img: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img, np.float32) * 255.0, 0, 255).astype(np.uint8)


def _mask_rgb(mask: np.ndarray) -> np.ndarray:
    m = np.asarray(mask, np.float32)
    return _to_u8(np.stack([m, m, m], axis=-1))


def render_row(imgs, masks, mask_pred, kp_pred=None, renderer_out=None):
    """One row per sample: input (+kps), GT mask, predicted soft mask."""
    rows = []
    n = min(4, imgs.shape[0])
    for i in range(n):
        img = _to_u8(imgs[i])
        if kp_pred is not None:
            img = vis_utils.kp2im(np.asarray(kp_pred[i]), img)
        cells = [img, _mask_rgb(masks[i]), _mask_rgb(mask_pred[i])]
        if renderer_out is not None:
            cells.append(_to_u8(renderer_out[i]))
        rows.append(np.concatenate(cells, axis=1))
    return np.concatenate(rows, axis=0)


def make_monocular_vis_fn(mods, face_chunk: int = 128):
    """vis_fn(save_dir, step, state, batch) for run_monocular_training."""
    from . import monocular as mono

    def vis_fn(save_dir, step, state, batch):
        _, aux = jax.jit(
            lambda p, bs, lp, b: mono.forward(
                mods, p, bs, lp, b, train=False, face_chunk=face_chunk
            )
        )(state.params, state.batch_stats, state.lpips_params, batch)
        img_size = mods.cfg.model.img_size
        panel = render_row(
            np.asarray(batch["img"]).reshape(-1, img_size, img_size, 3),
            np.asarray(batch["mask"]).reshape(-1, img_size, img_size),
            np.asarray(aux["mask_pred"]),
            kp_pred=np.asarray(aux["kp_pred"]),
        )
        out = osp.join(save_dir, "vis")
        os.makedirs(out, exist_ok=True)
        vis_utils.save_image(osp.join(out, f"step_{step:07d}.png"), panel)

    return vis_fn


def make_multiframe_vis_fn(mods, face_chunk: int = 128):
    """vis_fn for run_multiframe_training: renders the regressed-camera
    prediction (panel layout per reference multiframe/main.py:775-855)."""
    from ..deform.solve import screened_poisson_solve
    from ..geometry.mesh_ops import cot_laplacian
    from . import monocular as mono

    model = mods.model
    t = mods.template
    img_size = mods.cfg.model.img_size

    @jax.jit
    def fwd(params, batch_stats, imgs):
        out = model.apply(
            {"params": params, "batch_stats": batch_stats},
            mono.normalize_imagenet(imgs), train=False,
        )
        mean_shape = model.apply({"params": params}, method=model.get_mean_shape)
        lbs = model.apply({"params": params}, method=model.get_lbs)
        faces = jax.numpy.asarray(t.faces)
        Lcot = jax.lax.stop_gradient(cot_laplacian(mean_shape, faces))
        pred_v = screened_poisson_solve(mean_shape, lbs, out["delta_v"], Lcot)
        proj_v = cam_utils.orthographic_proj_withz(
            pred_v, out["cam_pred"], offset_z=0.0
        )
        mask_pred, _ = ras.soft_silhouette(
            proj_v, faces, img_size, face_chunk=face_chunk
        )
        return mask_pred

    def vis_fn(save_dir, step, state, batch):
        imgs = np.asarray(batch["img"]).reshape(-1, img_size, img_size, 3)
        masks = np.asarray(batch["mask"]).reshape(-1, img_size, img_size)
        mask_pred = np.asarray(
            fwd(state.params, state.batch_stats, jax.numpy.asarray(imgs))
        )
        panel = render_row(imgs, masks, mask_pred)
        out = osp.join(save_dir, "vis")
        os.makedirs(out, exist_ok=True)
        vis_utils.save_image(osp.join(out, f"step_{step:07d}.png"), panel)

    return vis_fn
