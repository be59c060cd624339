"""Multiframe training CLI (reference multiframe/main.py compatible).

Usage:
  python -m acfm_video_3d_reconstruction_tpu.cli.multiframe_main \
      --name horse_net --category horse --root_dir <TigDog_pkls> \
      --mesh_dir meshes/horse_new.obj --num_lbs 16 --warmup --drop_hypothesis
"""
from __future__ import annotations

import dataclasses
import pickle

import numpy as np
from absl import app, flags

from .. import config as cfg_lib
from ..data import tigdog as tig
from ..data.loader import DataLoader
from ..models.template import build_template
from ..train import driver
from ..utils.obj_io import load_obj

FLAGS = flags.FLAGS
flags.DEFINE_string("name", "exp_name", "Experiment name")
flags.DEFINE_string("category", "horse", "category")
flags.DEFINE_string("root_dir", "", "TigDog/YTVIS pkl root dir")
flags.DEFINE_string("tmp_dir", "tmp/", "frame-cache dir")
flags.DEFINE_string("mesh_dir", "", "template mesh OBJ")
flags.DEFINE_string("kp_dict", "", "keypoint dictionary pkl")
flags.DEFINE_string("checkpoint_dir", "cachedir/snapshots", "checkpoints")
flags.DEFINE_integer("num_lbs", 15, "number of handles")
flags.DEFINE_integer("num_kps", 15, "number of keypoints")
flags.DEFINE_integer("num_training_frames", 50, "frames per video")
flags.DEFINE_integer("img_size", 256, "image size")
flags.DEFINE_integer("num_frames", 2, "clip length")
flags.DEFINE_integer("num_guesses", 8, "camera hypotheses")
flags.DEFINE_integer("batch_size", 8, "batch size")
flags.DEFINE_integer("num_epochs", 200, "epochs")
flags.DEFINE_integer("num_pretrain_epochs", 0, "resume epoch")
flags.DEFINE_float("learning_rate", 1e-4, "lr")
flags.DEFINE_boolean("texture", True, "predict texture")
flags.DEFINE_boolean("warmup", False, "pose warmup")
flags.DEFINE_boolean("texture_warmup", False, "texture warmup")
flags.DEFINE_boolean("init_camera_emb", False, "write GT cams into table 0")
flags.DEFINE_boolean("drop_hypothesis", False, "hypothesis dropping")
flags.DEFINE_boolean("finetune_camera", False, "switch off gtpose at epoch 30")
flags.DEFINE_boolean("use_gtpose", False, "use GT poses")
flags.DEFINE_boolean("az_el_cam", False, "azimuth-elevation multiplex")
flags.DEFINE_boolean("optimize_deform", False, "per-frame deform embeddings")
flags.DEFINE_boolean("scale_mesh", False, "normalize template scale")
flags.DEFINE_float("scale_lr_decay", 0.05, "embedding scale decode lr")
flags.DEFINE_float("scale_bias", 1.0, "az-el scale bias")
flags.DEFINE_float("kp_loss_wt", 0.0, "keypoint loss weight")
flags.DEFINE_float("of_loss_wt", 1.0, "optical flow loss weight")
flags.DEFINE_integer("log_every", 20, "logging interval")
flags.DEFINE_boolean("tight_bboxes", False, "use mask-derived bboxes")


def build_cfg() -> cfg_lib.Config:
    return cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(),
            img_size=FLAGS.img_size,
            num_lbs=FLAGS.num_lbs,
            num_kps=FLAGS.num_kps,
            texture=FLAGS.texture,
            symmetric=False,
            symmetric_texture=False,
            mesh_path=FLAGS.mesh_dir or None,
            kp_dict_path=FLAGS.kp_dict or None,
            scale_mesh=FLAGS.scale_mesh,
        ),
        mf_weights=dataclasses.replace(
            cfg_lib.MultiframeLossWeights(),
            kp=FLAGS.kp_loss_wt, of=FLAGS.of_loss_wt,
        ),
        multiplex=dataclasses.replace(
            cfg_lib.MultiplexConfig(),
            num_guesses=FLAGS.num_guesses,
            az_el_cam=FLAGS.az_el_cam,
            optimize_deform=FLAGS.optimize_deform,
            drop_hypothesis=FLAGS.drop_hypothesis,
            scale_lr_decay=FLAGS.scale_lr_decay,
            scale_bias=FLAGS.scale_bias,
        ),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(),
            batch_size=FLAGS.batch_size,
            num_frames=FLAGS.num_frames,
            learning_rate=FLAGS.learning_rate,
            num_epochs=FLAGS.num_epochs,
            num_pretrain_epochs=FLAGS.num_pretrain_epochs,
            warmup=FLAGS.warmup,
            texture_warmup=FLAGS.texture_warmup,
            use_gtpose=FLAGS.use_gtpose,
            checkpoint_dir=FLAGS.checkpoint_dir,
            name=FLAGS.name,
            offset_z=0.0,
        ),
    )


def build_mf_template(cfg: cfg_lib.Config):
    m = cfg.model
    verts = faces = None
    kp_ids = None
    if m.mesh_path:
        verts, faces = load_obj(m.mesh_path)
    if m.kp_dict_path:
        with open(m.kp_dict_path, "rb") as f:
            kp_dict = pickle.load(f)
        kp_ids = [np.atleast_1d(v) for v in kp_dict.values()]
    return build_template(
        verts, faces,
        subdivide=m.subdivide, num_lbs=m.num_lbs, tex_size=m.tex_size,
        symmetric=False, symmetric_texture=False,
        num_kps=m.num_kps, kp_vertex_ids=kp_ids, scale_mesh=m.scale_mesh,
    )


def main(_):
    cfg = build_cfg()
    template = build_mf_template(cfg)

    video_ds = tig.VideoPklDataset(
        FLAGS.root_dir, FLAGS.category, split="train", num_kps=FLAGS.num_kps
    )
    n_frames, s2v, spv = tig.explode_to_frames(
        video_ds, FLAGS.tmp_dir, FLAGS.category, FLAGS.num_training_frames
    )
    print(f"Training samples (frames): {n_frames}")

    mk = dict(
        tmp_dir=FLAGS.tmp_dir, category=FLAGS.category, sample_to_vid=s2v,
        samples_per_vid=spv, num_frames=FLAGS.num_frames,
        img_size=FLAGS.img_size, tight_bboxes=FLAGS.tight_bboxes,
        remove_neck_kp=FLAGS.category in ("horse", "tiger"),
    )
    dataset = tig.MultiFrameDataset(mirror=True, transforms=True, **mk)
    dataset_noag = tig.MultiFrameDataset(
        mirror=False, transforms=False, padding_frac=0.0, **mk
    )
    loader = DataLoader(dataset, FLAGS.batch_size, shuffle=True)
    loader_noag = DataLoader(dataset_noag, FLAGS.batch_size, shuffle=False, drop_last=False)

    driver.run_multiframe_training(
        cfg, template, loader, loader_noag, n_frames,
        init_camera_emb=FLAGS.init_camera_emb,
        finetune_camera=FLAGS.finetune_camera,
        log_every=FLAGS.log_every,
    )


if __name__ == "__main__":
    app.run(main)
