"""Monocular training CLI (reference monocular/main.py compatible).

Usage:
  python -m acfm_video_3d_reconstruction_tpu.cli.monocular_main \
      --name bird_net --cub_dir <CUB_200_2011> --cub_cache_dir <cachedir/cub> \
      --num_lbs 16 --batch_size 12
"""
from __future__ import annotations

import dataclasses
import pickle

import numpy as np
from absl import app, flags

from .. import config as cfg_lib
from ..data.cub import CUBDataset, load_sfm_mean_shape
from ..data.loader import DataLoader
from ..models.template import build_template
from ..train import driver
from ..utils.obj_io import load_obj

FLAGS = flags.FLAGS
flags.DEFINE_string("name", "exp_name", "Experiment name")
flags.DEFINE_string("cub_dir", "misc/CUB_200_2011", "CUB data dir")
flags.DEFINE_string("cub_cache_dir", "misc/cachedir/cub", "CUB cache dir")
flags.DEFINE_string("mesh_dir", "", "template mesh OBJ (default: icosphere)")
flags.DEFINE_string("kp_dict", "", "keypoint->vertex dictionary pkl")
flags.DEFINE_string("checkpoint_dir", "cachedir/snapshots", "checkpoints")
flags.DEFINE_integer("num_lbs", 15, "number of LBS handles")
flags.DEFINE_integer("num_kps", 15, "number of keypoints")
flags.DEFINE_integer("batch_size", 12, "batch size")
flags.DEFINE_integer("img_size", 256, "image size")
flags.DEFINE_integer("num_epochs", 500, "epochs")
flags.DEFINE_integer("num_pretrain_epochs", 0, "resume epoch")
flags.DEFINE_float("learning_rate", 1e-4, "lr")
flags.DEFINE_boolean("texture", True, "predict texture")
flags.DEFINE_boolean("symmetric", True, "symmetric mesh")
flags.DEFINE_boolean("use_gtpose", True, "use GT sfm pose for projection")
flags.DEFINE_string("split", "train", "data split")
flags.DEFINE_integer("nz_feat", 200, "latent feature size")
flags.DEFINE_integer("tex_size", 6, "texture atlas resolution per face")
flags.DEFINE_integer("save_epoch_freq", 50, "save every N epochs")
flags.DEFINE_float("kp_loss_wt", 30.0, "keypoint loss weight")
flags.DEFINE_float("mask_loss_wt", 1.0, "mask loss weight")
flags.DEFINE_float("cam_loss_wt", 2.0, "camera loss weight")
flags.DEFINE_float("boundaries_reg_wt", 1.0, "silhouette-consistency weight")
flags.DEFINE_float("edt_reg_wt", 0.1, "edt weight inside sil-cons")
flags.DEFINE_float("bdt_reg_wt", 0.1, "boundary weight inside sil-cons")
flags.DEFINE_float("tex_loss_wt", 0.5, "texture loss weight")
flags.DEFINE_float("rigid_wt", 0.5, "locally-rigid prior weight")
flags.DEFINE_float("triangle_reg_wt", 30.0, "laplacian smoothing weight")
flags.DEFINE_float("deform_reg_wt", 10.0, "deformation L2 reg weight")
flags.DEFINE_float("vert2kp_loss_wt", 0.16, "vertex-assignment reg weight")
flags.DEFINE_float("tex_dt_loss_wt", 0.5, "texture dt loss weight")
flags.DEFINE_float("entropy_lbs_loss_wt", 0.0016, "vert2kp entropy reg weight")
flags.DEFINE_integer("log_every", 20, "steps between scalar logs")
flags.DEFINE_integer("save_latest_freq", 0, "mid-epoch latest saves (steps)")
flags.DEFINE_integer("display_freq", 0, "visualization panels every N steps")
# pretrained weights (reference: ImageNet resnet18 encoder
# monocular/nnutils/mesh_net.py:87-95, LPIPS AlexNet loss_utils.py:361-363)
flags.DEFINE_string("pretrained_resnet18", "", "torchvision resnet18 .pth")
flags.DEFINE_string("lpips_alexnet", "", "torchvision alexnet .pth")


def build_cfg() -> cfg_lib.Config:
    return cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(),
            img_size=FLAGS.img_size,
            nz_feat=FLAGS.nz_feat,
            tex_size=FLAGS.tex_size,
            num_lbs=FLAGS.num_lbs,
            num_kps=FLAGS.num_kps,
            texture=FLAGS.texture,
            symmetric=FLAGS.symmetric,
            symmetric_texture=FLAGS.symmetric,
            mesh_path=FLAGS.mesh_dir or None,
            kp_dict_path=FLAGS.kp_dict or None,
        ),
        mono_weights=dataclasses.replace(
            cfg_lib.MonocularLossWeights(),
            kp=FLAGS.kp_loss_wt, mask=FLAGS.mask_loss_wt,
            cam=FLAGS.cam_loss_wt, boundaries=FLAGS.boundaries_reg_wt,
            edt=FLAGS.edt_reg_wt, bdt=FLAGS.bdt_reg_wt,
            tex=FLAGS.tex_loss_wt, rigid=FLAGS.rigid_wt,
            triangle=FLAGS.triangle_reg_wt,
            deform_reg=FLAGS.deform_reg_wt, vert2kp=FLAGS.vert2kp_loss_wt,
            tex_dt=FLAGS.tex_dt_loss_wt, entropy_lbs=FLAGS.entropy_lbs_loss_wt,
        ),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(),
            batch_size=FLAGS.batch_size,
            learning_rate=FLAGS.learning_rate,
            num_epochs=FLAGS.num_epochs,
            num_pretrain_epochs=FLAGS.num_pretrain_epochs,
            use_gtpose=FLAGS.use_gtpose,
            save_epoch_freq=FLAGS.save_epoch_freq,
            save_latest_freq=FLAGS.save_latest_freq,
            display_freq=FLAGS.display_freq,
            checkpoint_dir=FLAGS.checkpoint_dir,
            name=FLAGS.name,
        ),
    )


def make_pretrained_loaders():
    """(load_pretrained, load_lpips) per the CLI flags, or Nones."""
    load_pretrained = load_lpips = None
    if FLAGS.pretrained_resnet18:
        from ..models import torch_import

        def load_pretrained(params, batch_stats):  # noqa: F811
            params, batch_stats, ok = torch_import.maybe_load_pretrained_encoder(
                params, batch_stats, FLAGS.pretrained_resnet18
            )
            if not ok:
                raise FileNotFoundError(FLAGS.pretrained_resnet18)
            return params, batch_stats

    if FLAGS.lpips_alexnet:
        from ..models import torch_import

        def load_lpips(lpips_params):  # noqa: F811
            sd = torch_import.load_torch_state_dict(FLAGS.lpips_alexnet)
            feats = torch_import.convert_alexnet_features(sd)
            return torch_import.jax_tree_merge(
                dict(lpips_params), {"alex": feats}
            )

    return load_pretrained, load_lpips


def build_cub_template(cfg: cfg_lib.Config):
    """Template from mesh OBJ + kp dict, or icosphere + SfM mean shape.

    (reference monocular/main.py:78-99)
    """
    m = cfg.model
    verts = faces = None
    kp_ids = None
    sfm_kp = None
    if m.mesh_path:
        verts, faces = load_obj(m.mesh_path)
    if m.kp_dict_path:
        with open(m.kp_dict_path, "rb") as f:
            kp_dict = pickle.load(f)
        kp_ids = [np.atleast_1d(v) for v in kp_dict.values()]
    else:
        try:
            S, _ = load_sfm_mean_shape(FLAGS.cub_cache_dir, FLAGS.split)
            sfm_kp = S
        except Exception:
            sfm_kp = None
    return build_template(
        verts, faces,
        subdivide=m.subdivide, num_lbs=m.num_lbs, tex_size=m.tex_size,
        symmetric=m.symmetric and verts is None,
        symmetric_texture=m.symmetric_texture and verts is None,
        num_kps=m.num_kps, kp_vertex_ids=kp_ids, sfm_kp_points=sfm_kp,
    )


def main(_):
    cfg = build_cfg()
    template = build_cub_template(cfg)
    dataset = CUBDataset(
        FLAGS.cub_dir, FLAGS.cub_cache_dir, split=FLAGS.split,
        img_size=FLAGS.img_size,
    )
    loader = DataLoader(dataset, FLAGS.batch_size, shuffle=True)
    load_pretrained, load_lpips = make_pretrained_loaders()
    driver.run_monocular_training(
        cfg, template, loader, log_every=FLAGS.log_every,
        load_pretrained=load_pretrained, load_lpips=load_lpips,
    )


if __name__ == "__main__":
    app.run(main)
