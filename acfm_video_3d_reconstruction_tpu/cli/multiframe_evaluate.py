"""Multiframe benchmark CLI (reference multiframe/benchmark/evaluate.py).

Sequential-frame clips over the test split, optional argmax-multiplex
camera and test-time optimization, IoU on frame 0 + pixel-unit PCK;
prints `mean iou, pck.1, pck.15` and saves results.npz.
"""
from __future__ import annotations

import os.path as osp

import numpy as np
from absl import app, flags

from ..data import tigdog as tig
from ..data.loader import DataLoader
from ..eval import metrics as eval_metrics
from ..eval.predictor import TTOConfig, make_tto_step_fn
from ..geometry import camera as cam_utils
from ..ops import rasterizer as ras
from ..train import checkpoints, multiframe as mf, monocular
from .multiframe_main import (
    FLAGS,
    build_cfg,
    build_mf_template,
    make_flow_fn_from_opts,
    opts_from_flags,
)

flags.DEFINE_integer("num_train_epoch", 0, "checkpoint epoch")
flags.DEFINE_boolean("optimize", False, "test-time optimization")
flags.DEFINE_boolean("optimize_camera", False, "TTO over camera too")
flags.DEFINE_integer("num_optim_iter", 100, "TTO iterations")
flags.DEFINE_boolean("use_argmax_camera", False, "argmax multiplex camera (train split)")
flags.DEFINE_string("split", "test", "dataset split to evaluate")
flags.DEFINE_string("results_dir", "cachedir/evaluation", "output dir")
flags.DEFINE_integer("save_visuals", 0, "save PNG panels for first N batches")
flags.DEFINE_boolean(
    "save_mat", False,
    "also save results.mat (scipy.io.savemat of the bench stats, drop-in "
    "for the reference's sio.savemat: benchmark/evaluate.py:225)",
)
flags.DEFINE_boolean(
    "use_gt_camera", False,
    "DIAGNOSTIC (no reference analog): project through the loader's GT "
    "sfm_pose camera instead of the predicted one — the PCK ceiling with "
    "a perfect camera regressor, for separating camera error from shape "
    "error on held-out splits",
)
flags.DEFINE_boolean(
    "gauge_align", False,
    "with --use_gt_camera: Kabsch-align the learned mean shape to the GT "
    "template and compose the similarity correction into the GT cameras. "
    "The multiplex fixes shape+cameras only up to a global similarity, so "
    "raw GT cameras are NOT a ceiling once the learned gauge drifts; this "
    "makes the diagnostic gauge-invariant",
)


def main(_):
    import jax
    import jax.numpy as jnp

    if FLAGS.gauge_align and not FLAGS.use_gt_camera:
        raise app.UsageError(
            "--gauge_align only applies to the GT-camera diagnostic; "
            "pass --use_gt_camera with it (alone it would do nothing)"
        )
    opts = opts_from_flags()
    cfg = build_cfg(opts)
    template = build_mf_template(cfg)

    video_ds = tig.VideoPklDataset(
        FLAGS.root_dir, FLAGS.category, split=FLAGS.split, num_kps=FLAGS.num_kps
    )
    # the train split reuses the training explosion so frames_idx matches the
    # multiplex embedding rows (reference benchmark/evaluate.py:77-103 +
    # argmax-camera lookup, predictor.py:239-252)
    tmp_dir = (
        FLAGS.tmp_dir if FLAGS.split == "train"
        else FLAGS.tmp_dir + "_" + FLAGS.split
    )
    n_frames, s2v, spv = tig.explode_to_frames(
        video_ds, tmp_dir, FLAGS.category, FLAGS.num_training_frames
    )
    dataset = tig.MultiFrameDataset(
        tmp_dir=tmp_dir, category=FLAGS.category,
        sample_to_vid=s2v, samples_per_vid=spv, num_frames=FLAGS.num_frames,
        img_size=FLAGS.img_size, mirror=False, transforms=False,
        sequential=True, tight_bboxes=FLAGS.tight_bboxes,
        remove_neck_kp=FLAGS.category in ("horse", "tiger"),
    )
    loader = DataLoader(dataset, FLAGS.batch_size, shuffle=False, drop_last=True)

    mods, (tx_full, tx_warm), state = mf.build(
        cfg, template, n_frames, jax.random.PRNGKey(0)
    )
    label = FLAGS.num_train_epoch if FLAGS.num_train_epoch > 0 else "latest"
    if checkpoints.exists(FLAGS.checkpoint_dir, FLAGS.name, label):
        state = checkpoints.restore(
            FLAGS.checkpoint_dir, FLAGS.name, label, state, strict=False
        )
    else:
        print(f"warning: checkpoint {label} not found; evaluating random init")

    model = mods.model
    img_size = cfg.model.img_size
    faces = jnp.asarray(template.faces)
    tto_fn = None
    flow_fn = None
    if FLAGS.optimize:
        tto_fn = make_tto_step_fn(
            mods,
            TTOConfig(
                num_iter=FLAGS.num_optim_iter,
                optimize_camera=FLAGS.optimize_camera,
                of_wt=FLAGS.of_loss_wt,
            ),
            num_frames=FLAGS.num_frames,
        )
        if FLAGS.num_frames > 1 and FLAGS.of_loss_wt > 0:
            # TTO's optical-flow term: frozen MaskFlownet on each batch
            # (reference multiframe/nnutils/predictor.py:195-225)
            flow_fn = make_flow_fn_from_opts(opts, img_size)

    @jax.jit
    def forward_batch(state, imgs):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            monocular.normalize_imagenet(imgs), train=False,
        )
        mean_shape = model.apply({"params": state.params}, method=model.get_mean_shape)
        lbs = model.apply({"params": state.params}, method=model.get_lbs)
        vert2kp = model.apply({"params": state.params}, method=model.get_vert2kp)
        from ..deform.solve import screened_poisson_solve
        from ..geometry.mesh_ops import cot_laplacian

        Lcot = jax.lax.stop_gradient(cot_laplacian(mean_shape, faces))
        pred_v = screened_poisson_solve(mean_shape, lbs, out["delta_v"], Lcot)
        return out, mean_shape, lbs, vert2kp, pred_v

    gauge_corr = None
    if FLAGS.use_gt_camera and FLAGS.gauge_align:
        # batch-invariant (template vs learned mean shape): compute the
        # Kabsch similarity once; per-batch work is only the cheap camera
        # composition in apply_gauge_correction
        from ..eval.predictor import gauge_correction

        mean_shape0 = model.apply(
            {"params": state.params}, method=model.get_mean_shape
        )
        gauge_corr = gauge_correction(
            jnp.asarray(template.verts, jnp.float32), mean_shape0
        )

    stats = eval_metrics.BenchStats()
    for i, batch in enumerate(loader):
        imgs = jnp.asarray(batch["img"].reshape(-1, img_size, img_size, 3))
        out, mean_shape, lbs, vert2kp, pred_v = forward_batch(state, imgs)
        cam_pred = out["cam_pred"]
        if FLAGS.use_gt_camera:
            cam_pred = jnp.asarray(
                np.asarray(batch["sfm_pose"], np.float32).reshape(-1, 7)
            )
            if gauge_corr is not None:
                from ..eval.predictor import apply_gauge_correction

                cam_pred = apply_gauge_correction(cam_pred, gauge_corr)
        elif FLAGS.use_argmax_camera:
            from ..eval.predictor import argmax_multiplex_camera

            cam_pred = argmax_multiplex_camera(
                state.multiplex, jnp.asarray(batch["frames_idx"]),
                scale_lr_decay=FLAGS.scale_lr_decay,
            )
        if tto_fn is not None:
            jb = {k: jnp.asarray(v) for k, v in batch.items()}
            if flow_fn is not None:
                jb = flow_fn(jb)
            pred_v, cam_pred, _ = tto_fn(mean_shape, lbs, out["delta_v"], cam_pred, jb)

        proj_v = cam_utils.orthographic_proj_withz(pred_v, cam_pred, offset_z=0.0)
        mask_pred, _ = ras.soft_silhouette(proj_v, faces, img_size)
        kp_verts = jnp.einsum("kv,bvc->bkc", vert2kp, pred_v)
        kp_pred = cam_utils.project_points(kp_verts, cam_pred)

        T = FLAGS.num_frames
        mask_pred = np.asarray(mask_pred).reshape(batch["mask"].shape)
        kp_pred = np.asarray(kp_pred).reshape(batch["kp"].shape[:-1] + (2,))
        # frame-0 metrics (benchmark/evaluate.py:132-161)
        iou = eval_metrics.mask_iou(
            batch["mask"][:, 0], (mask_pred[:, 0] > 0.5).astype(np.float32)
        )
        err, vis = eval_metrics.kp_errors_pixel(
            kp_pred[:, 0], batch["kp"][:, 0], img_size
        )
        stats.update(iou, err, vis)
        # frame-0 camera actually used for projection (post-TTO if enabled)
        # — a diagnostic for separating camera-regressor error from shape
        # error in held-out PCK; npz-only, not in the reference-parity .mat
        stats.add_extra(
            "cams", np.asarray(cam_pred).reshape(-1, T, 7)[:, 0]
        )
        stats.add_extra("kp_pred", kp_pred[:, 0])
        if FLAGS.save_visuals > 0 and i < FLAGS.save_visuals:
            import os

            from ..train.visualize import render_row
            from ..utils import vis as vis_utils

            panel = render_row(
                np.asarray(batch["img"]).reshape(-1, img_size, img_size, 3),
                np.asarray(batch["mask"]).reshape(-1, img_size, img_size),
                mask_pred.reshape(-1, img_size, img_size),
            )
            os.makedirs(FLAGS.results_dir, exist_ok=True)
            vis_utils.save_image(
                osp.join(FLAGS.results_dir, f"eval_batch_{i:04d}.png"), panel
            )
        if i % 20 == 0:
            print(f"batch {i}/{len(loader)}")

    stats.print_reference_format()
    stats.save(FLAGS.results_dir, save_mat=FLAGS.save_mat)


if __name__ == "__main__":
    app.run(main)
