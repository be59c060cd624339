"""Monocular evaluation CLI (reference monocular/evaluate.py compatible).

Prints `mean iou %.3g, pck.1 %.3g, pck.15 %.3g` over the chosen split.
"""
from __future__ import annotations

import numpy as np
from absl import app, flags

from ..data.cub import CUBDataset
from ..data.loader import DataLoader
from ..eval import metrics as eval_metrics
from ..train import checkpoints, driver, monocular
from .monocular_main import FLAGS, build_cfg, build_cub_template

flags.DEFINE_integer("num_train_epoch", 0, "checkpoint epoch to evaluate")
flags.DEFINE_integer("max_eval_iter", 0, "max eval batches (0 = all)")
flags.DEFINE_float("padding_frac", 0.05, "bbox padding fraction")
flags.DEFINE_integer("save_visuals", 0, "save PNG panels for first N batches")
flags.DEFINE_string("results_dir", "cachedir/evaluation", "output dir")
flags.DEFINE_string(
    "load_torch_checkpoint", "",
    "path to a reference pred_net_<epoch>.pth (torch MeshNet state dict, "
    "monocular/nnutils/train_utils.py:83-102); loaded instead of the orbax "
    "checkpoint. Template/config flags must match the checkpoint's.",
)


def main(_):
    import dataclasses

    import jax

    cfg = build_cfg()
    # The reference evaluator always projects through the PREDICTED camera
    # (monocular/nnutils/predictor.py:110-159 uses cam_pred; evaluate.py has
    # no gtpose path), regardless of the training-time --use_gtpose flag.
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, use_gtpose=False)
    )
    template = build_cub_template(cfg)
    mods, tx, state = monocular.build(cfg, template, jax.random.PRNGKey(0))
    label = FLAGS.num_train_epoch if FLAGS.num_train_epoch > 0 else "latest"
    if FLAGS.load_torch_checkpoint:
        from ..models.torch_import import load_reference_meshnet

        params, batch_stats = load_reference_meshnet(
            state.params, state.batch_stats, FLAGS.load_torch_checkpoint
        )
        state = dataclasses.replace(state, params=params, batch_stats=batch_stats)
        print(f"loaded torch checkpoint {FLAGS.load_torch_checkpoint}")
    elif checkpoints.exists(FLAGS.checkpoint_dir, FLAGS.name, label):
        state = checkpoints.restore(
            FLAGS.checkpoint_dir, FLAGS.name, label, state, strict=False
        )
    else:
        print(f"warning: checkpoint {label} not found; evaluating random init")

    dataset = CUBDataset(
        FLAGS.cub_dir, FLAGS.cub_cache_dir, split=FLAGS.split,
        img_size=FLAGS.img_size, jitter_frac=0.0,
    )
    loader = DataLoader(dataset, FLAGS.batch_size, shuffle=False, drop_last=True)
    ev = monocular.make_eval_step(mods)

    stats = eval_metrics.BenchStats()
    for i, batch in enumerate(loader):
        if FLAGS.max_eval_iter > 0 and i >= FLAGS.max_eval_iter:
            break
        if i % 100 == 0:
            print(f"{i}/{len(loader)} evaluation iterations.")
        aux = ev(state, batch)
        mask_pred = (np.asarray(aux["mask_pred"]) > 0.5).astype(np.float32)
        iou = eval_metrics.mask_iou(batch["mask"], mask_pred)
        err, vis = eval_metrics.kp_errors(
            np.asarray(aux["kp_pred"]), batch["kp"], FLAGS.padding_frac
        )
        stats.update(iou, err, vis)
        if FLAGS.save_visuals > 0 and i < FLAGS.save_visuals:
            # save_current_visuals parity (reference test_utils.py)
            import os

            from ..train.visualize import render_row
            from ..utils import vis as vis_utils

            panel = render_row(
                np.asarray(batch["img"]), np.asarray(batch["mask"]),
                np.asarray(aux["mask_pred"]),
                kp_pred=np.asarray(aux["kp_pred"]),
            )
            out = FLAGS.results_dir or "cachedir/evaluation"
            os.makedirs(out, exist_ok=True)
            vis_utils.save_image(
                os.path.join(out, f"eval_batch_{i:04d}.png"), panel
            )
    stats.print_reference_format()


if __name__ == "__main__":
    app.run(main)
