"""Standalone optical-flow inference CLI.

Parity target: reference multiframe/data/optical_flow/predict_pair.py /
predict.py — load a (converted) MaskFlownet checkpoint, run a frame pair
(resize -> centralize -> pad to /64 -> net -> Upsample x4), report AEPE if
ground truth is given, save a color visualization.

Usage:
  python -m acfm_video_3d_reconstruction_tpu.cli.flow_predict \
      --im0 a.png --im1 b.png --checkpoint weights.pth [--gt flow.flo] \
      --out flow_vis.png
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


def load_image(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path)).astype(np.float32)[..., :3] / 255.0


def main(_):
    import jax.numpy as jnp

    im0 = load_image(FLAGS.im0)
    im1 = load_image(FLAGS.im1)
    if FLAGS.checkpoint:
        from ..models.torch_import import load_torch_state_dict

        params = mfn.convert_torch_state_dict(load_torch_state_dict(FLAGS.checkpoint))
    else:
        import jax

        print("warning: no checkpoint; running random-init net")
        params = mfn.init_params(jax.random.PRNGKey(0))

    H = max(im0.shape[0], im0.shape[1])
    flow = infer.predict_pair_flow(
        params, jnp.asarray(im0)[None], jnp.asarray(im1)[None], im0.shape[0]
    )[0]
    flow = np.asarray(flow)
    if FLAGS.gt:
        gt = flowlib.read_flo(FLAGS.gt)
        aepe = np.sqrt(((flow - gt[..., :2]) ** 2).sum(-1)).mean()
        print(f"AEPE: {aepe:.4f}")
    from PIL import Image

    Image.fromarray(flowlib.flow_to_image(flow)).save(FLAGS.out)
    print(f"saved {FLAGS.out}")


if __name__ == "__main__":
    app.run(main)
