"""Standalone optical-flow inference / evaluation CLI.

Parity target: reference multiframe/data/optical_flow/predict_pair.py /
predict.py — load a (converted) MaskFlownet checkpoint, run a frame pair
(resize -> centralize -> pad to /64 -> net -> Upsample x4), report AEPE if
ground truth is given, save a color visualization. With --dataset, loops a
Chairs/Sintel/KITTI split and prints the mean AEPE like predict.py:62-97.

Usage:
  python -m acfm_video_3d_reconstruction_tpu.cli.flow_predict \
      --im0 a.png --im1 b.png --checkpoint weights.pth [--gt flow.flo] \
      --out flow_vis.png
  python -m acfm_video_3d_reconstruction_tpu.cli.flow_predict \
      --dataset sintel --root <MPI-Sintel> --split valid \
      --checkpoint weights.pth
"""
from __future__ import annotations

import numpy as np
from absl import app, flags

from ..flow import flowlib, infer, maskflownet as mfn

FLAGS = flags.FLAGS
flags.DEFINE_string("im0", "", "first frame")
flags.DEFINE_string("im1", "", "second frame")
flags.DEFINE_string("checkpoint", "", "torch MaskFlownet checkpoint (.pth)")
flags.DEFINE_string("gt", "", "optional GT .flo for AEPE")
flags.DEFINE_string("out", "flow_vis.png", "output visualization png")
flags.DEFINE_string("dataset", "", "chairs | sintel | kitti (AEPE eval)")
flags.DEFINE_string("root", "", "dataset root directory")
flags.DEFINE_string("split", "valid", "dataset split")
flags.DEFINE_string("subset", "final", "sintel pass (clean/final)")
flags.DEFINE_integer("max_samples", 0, "cap evaluated samples (0 = all)")


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32)[..., :3] / 255.0


def load_params():
    if FLAGS.checkpoint:
        from ..models.torch_import import load_torch_state_dict

        return mfn.convert_torch_state_dict(
            load_torch_state_dict(FLAGS.checkpoint)
        )
    import jax

    print("warning: no checkpoint; running random-init net")
    return mfn.init_params(jax.random.PRNGKey(0))


def eval_dataset(params):
    """Dataset AEPE loop (reference predict.py:62-97)."""
    import jax.numpy as jnp

    from ..flow import datasets as fds

    if FLAGS.dataset == "chairs":
        ds = fds.ChairsDataset(FLAGS.root, split=FLAGS.split)
    elif FLAGS.dataset == "sintel":
        ds = fds.SintelDataset(FLAGS.root, split=FLAGS.split, subset=FLAGS.subset)
    elif FLAGS.dataset == "kitti":
        ds = fds.KITTIDataset(FLAGS.root, split=FLAGS.split)
    else:
        raise ValueError(FLAGS.dataset)
    n = len(ds) if FLAGS.max_samples == 0 else min(len(ds), FLAGS.max_samples)
    epes = []
    for i in range(n):
        s = ds[i]
        flow = np.asarray(
            infer.predict_flow_native(
                params, jnp.asarray(s["im0"])[None], jnp.asarray(s["im1"])[None]
            )[0]
        )
        gt = s["flow"]
        if gt is None:
            continue
        epe = np.sqrt(((flow - gt[..., :2]) ** 2).sum(-1))
        if s["mask"] is not None:
            m = s["mask"] > 0
            epe = epe[m]
        epes.append(epe.mean())
        if i % 20 == 0 and epes:
            print(f"{i}/{n} running AEPE {np.mean(epes):.4f}")
    if not epes:
        # e.g. --split test on KITTI/Sintel: GT flow is not distributed
        print(f"AEPE: {FLAGS.dataset} n/a (no ground-truth flow in this split)")
        return None
    print(f"AEPE: {FLAGS.dataset} {np.mean(epes):.4f} ({len(epes)} samples)")
    return float(np.mean(epes))


def main(_):
    import jax.numpy as jnp

    params = load_params()
    if FLAGS.dataset:
        eval_dataset(params)
        return

    im0 = load_image(FLAGS.im0)
    im1 = load_image(FLAGS.im1)
    flow = np.asarray(
        infer.predict_flow_native(
            params, jnp.asarray(im0)[None], jnp.asarray(im1)[None]
        )[0]
    )
    if FLAGS.gt:
        gt = flowlib.read_flo(FLAGS.gt)
        aepe = np.sqrt(((flow - gt[..., :2]) ** 2).sum(-1)).mean()
        print(f"AEPE: {aepe:.4f}")
    from PIL import Image

    Image.fromarray(flowlib.flow_to_image(flow)).save(FLAGS.out)
    print(f"saved {FLAGS.out}")


if __name__ == "__main__":
    app.run(main)
