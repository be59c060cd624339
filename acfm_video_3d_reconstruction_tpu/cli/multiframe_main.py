"""Multiframe training CLI (reference multiframe/main.py compatible).

Usage:
  python -m acfm_video_3d_reconstruction_tpu.cli.multiframe_main \
      --name horse_net --category horse --root_dir <TigDog_pkls> \
      --mesh_dir meshes/horse_new.obj --num_lbs 16 --warmup \
      --drop_hypothesis --flow_checkpoint weights/maskflownet.pth

The flag surface mirrors multiframe/main.py:46-89 + train_utils.py:21-63.
main() is a thin flag adapter over `train(opts)` so tests can drive the
full pipeline with a plain dict.
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
flags.DEFINE_integer("subdivide", 3, "icosphere subdivisions (no mesh_dir)")
flags.DEFINE_integer("num_kps", 15, "number of keypoints")
flags.DEFINE_integer("nz_feat", 200, "latent feature size")
flags.DEFINE_integer("num_training_frames", 50, "frames per video")
flags.DEFINE_integer("img_size", 256, "image size")
flags.DEFINE_integer("num_frames", 2, "clip length")
flags.DEFINE_integer("num_guesses", 8, "camera hypotheses")
flags.DEFINE_integer("batch_size", 8, "batch size")
flags.DEFINE_integer("num_epochs", 200, "epochs")
flags.DEFINE_integer("num_pretrain_epochs", 0, "resume epoch")
flags.DEFINE_integer("num_reps", 20, "pose-warmup epochs")
flags.DEFINE_integer("tex_num_reps", 20, "texture-warmup reps per batch")
flags.DEFINE_float("learning_rate", 1e-4, "lr")
flags.DEFINE_float("warmup_lr", 1e-2, "pose-warmup Adam lr")
flags.DEFINE_boolean("texture", True, "predict texture")
flags.DEFINE_boolean("warmup", False, "pose warmup")
flags.DEFINE_boolean("load_warmup", False, "resume from warmup ckpt, skip warmups")
flags.DEFINE_boolean("texture_warmup", False, "texture warmup")
flags.DEFINE_boolean("init_camera_emb", False, "write GT cams into table 0")
flags.DEFINE_boolean("drop_hypothesis", False, "hypothesis dropping")
flags.DEFINE_boolean("finetune_camera", False, "switch off gtpose at epoch 30")
flags.DEFINE_boolean("use_gtpose", False, "use GT poses")
flags.DEFINE_boolean("az_el_cam", False, "azimuth-elevation multiplex")
flags.DEFINE_boolean(
    "az_el_quat_bias", False,
    "pi/4 hypothesis rotation biases (the reference builds but never applies "
    "this chain — off for strict parity)")
flags.DEFINE_boolean("optimize_deform", False, "per-frame deform embeddings")
flags.DEFINE_boolean("scale_mesh", False, "normalize template scale")
flags.DEFINE_boolean("multistep_lr", False, "MultiStepLR([5,150], 0.1)")
flags.DEFINE_boolean("separate_camera_opt", False, "separate camera Adam")
flags.DEFINE_float("camera_learning_rate", 1e-4, "camera Adam lr")
flags.DEFINE_float("scale_lr_decay", 0.05, "embedding scale decode lr")
flags.DEFINE_float("scale_bias", 1.0, "az-el scale bias")
flags.DEFINE_float("az_euler_range", 30.0, "azimuth range (deg)")
flags.DEFINE_float("el_euler_range", 60.0, "elevation range (deg)")
flags.DEFINE_float("cyc_euler_range", 60.0, "cyclo-rotation range (deg)")
flags.DEFINE_float("optimize_deform_lr", 100.0, "deform embedding lr mult")
flags.DEFINE_float("kp_loss_wt", 0.0, "keypoint loss weight")
flags.DEFINE_float("of_loss_wt", 1.0, "optical flow loss weight")
flags.DEFINE_float("mask_loss_wt", 1.0, "mask loss weight")
flags.DEFINE_float("boundaries_reg_wt", 1.0, "silhouette-consistency weight")
flags.DEFINE_float("edt_reg_wt", 0.1, "edt weight inside sil-cons")
flags.DEFINE_float("bdt_reg_wt", 2.0, "boundary weight inside sil-cons")
flags.DEFINE_float("rigid_wt", 0.5, "locally-rigid prior weight")
flags.DEFINE_float("triangle_reg_wt", 0.1, "laplacian smoothing weight")
flags.DEFINE_float("tex_loss_wt", 0.5, "texture loss weight")
flags.DEFINE_float("cam_loss_wt", 2.0, "camera distillation weight")
flags.DEFINE_float("deform_reg_wt", 1.0, "texture cycle weight")
flags.DEFINE_float("deform_loss_wt", 2.0, "deform distillation weight")
flags.DEFINE_float("handle_deform_reg_wt", 0.0, "handle offset reg weight")
flags.DEFINE_integer("log_every", 20, "logging interval")
# dataset expansion (reference multiframe/main.py:216-242)
flags.DEFINE_boolean("expand_ytvis", False, "mix YTVIS clips into training")
flags.DEFINE_boolean("expand_pascal", False, "mix PASCAL stills (cow)")
flags.DEFINE_string("root_dir_yt", "", "YTVIS pkl root dir")
flags.DEFINE_string("root_dir_coco", "", "COCO pkl root dir")
flags.DEFINE_string("pascal_img_dir", "", "PASCAL/VOC image dir")
flags.DEFINE_string("pascal_anno_path", "", "PASCAL CMR-style .mat annos")
flags.DEFINE_boolean(
    "expand_imgnet", False,
    "mix ImageNet synset stills (objects.py synset map; kp-less)")
flags.DEFINE_string("imgnet_dir", "", "ImageNet images root (synset subdirs)")
flags.DEFINE_string("imgnet_anno_path", "", "dir of {synset}_{split}.mat annos")
flags.DEFINE_float("padding_frac", 0.05, "tight-bbox padding fraction")
flags.DEFINE_boolean("v2_crop", False, "v2 crop (recompute kp visibility)")
flags.DEFINE_integer("save_epoch_freq", 50, "save every N epochs")
flags.DEFINE_integer("save_latest_freq", 0, "mid-epoch latest saves (steps)")
flags.DEFINE_integer("display_freq", 0, "visualization panels every N steps")
flags.DEFINE_boolean("tight_bboxes", False, "use mask-derived bboxes")
flags.DEFINE_boolean(
    "mirror", True,
    "random horizontal mirror augmentation (disable for annotation schemas "
    "without a left/right kp permutation, e.g. synthetic parity data)",
)
# pretrained weights (reference loads all three: mesh_net.py:87-95,
# loss_utils.py:361-363, multiframe/main.py:203-214)
flags.DEFINE_string("pretrained_resnet18", "", "torchvision resnet18 .pth")
flags.DEFINE_string("lpips_alexnet", "", "torchvision alexnet .pth")
flags.DEFINE_string("flow_checkpoint", "", "MaskFlownet torch checkpoint")
flags.DEFINE_boolean(
    "flow_random_init", False,
    "run the frozen flow net with random weights (plumbing tests only)",
)


_FLAG_NAMES = [
    "name", "category", "root_dir", "tmp_dir", "mesh_dir", "kp_dict",
    "checkpoint_dir", "num_lbs", "subdivide", "num_kps", "nz_feat",
    "num_training_frames",
    "img_size", "num_frames", "num_guesses", "batch_size", "num_epochs",
    "num_pretrain_epochs", "num_reps", "tex_num_reps", "learning_rate",
    "warmup_lr", "texture", "warmup", "texture_warmup", "init_camera_emb",
    "drop_hypothesis", "finetune_camera", "use_gtpose", "az_el_cam",
    "az_el_quat_bias", "optimize_deform", "scale_mesh", "multistep_lr",
    "load_warmup",
    "separate_camera_opt", "camera_learning_rate", "scale_lr_decay",
    "scale_bias", "az_euler_range", "el_euler_range", "cyc_euler_range",
    "optimize_deform_lr", "kp_loss_wt", "of_loss_wt", "mask_loss_wt",
    "boundaries_reg_wt", "edt_reg_wt", "bdt_reg_wt", "rigid_wt",
    "triangle_reg_wt", "tex_loss_wt", "cam_loss_wt", "deform_reg_wt",
    "deform_loss_wt", "handle_deform_reg_wt", "log_every", "save_epoch_freq",
    "save_latest_freq", "display_freq", "tight_bboxes", "mirror",
    "pretrained_resnet18",
    "lpips_alexnet", "flow_checkpoint", "flow_random_init",
    "expand_ytvis", "expand_pascal", "root_dir_yt", "root_dir_coco",
    "pascal_img_dir", "pascal_anno_path", "padding_frac", "v2_crop",
    "expand_imgnet", "imgnet_dir", "imgnet_anno_path",
]


def default_opts() -> dict:
    """Flag defaults as a plain dict (for tests / programmatic use)."""
    return {name: FLAGS[name].default for name in _FLAG_NAMES}


def opts_from_flags() -> dict:
    return {name: FLAGS[name].value for name in _FLAG_NAMES}


def build_cfg(o: dict) -> cfg_lib.Config:
    return cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(),
            img_size=o["img_size"],
            nz_feat=o["nz_feat"],
            num_lbs=o["num_lbs"],
            subdivide=o["subdivide"],
            num_kps=o["num_kps"],
            texture=o["texture"],
            symmetric=False,
            symmetric_texture=False,
            mesh_path=o["mesh_dir"] or None,
            kp_dict_path=o["kp_dict"] or None,
            scale_mesh=o["scale_mesh"],
        ),
        mf_weights=dataclasses.replace(
            cfg_lib.MultiframeLossWeights(),
            kp=o["kp_loss_wt"], of=o["of_loss_wt"], mask=o["mask_loss_wt"],
            boundaries=o["boundaries_reg_wt"], edt=o["edt_reg_wt"],
            bdt=o["bdt_reg_wt"], rigid=o["rigid_wt"],
            triangle=o["triangle_reg_wt"], tex=o["tex_loss_wt"],
            cam=o["cam_loss_wt"], deform_reg=o["deform_reg_wt"],
            deform=o["deform_loss_wt"],
            handle_deform_reg=o["handle_deform_reg_wt"],
        ),
        multiplex=dataclasses.replace(
            cfg_lib.MultiplexConfig(),
            num_guesses=o["num_guesses"],
            az_el_cam=o["az_el_cam"],
            az_el_quat_bias=o["az_el_quat_bias"],
            optimize_deform=o["optimize_deform"],
            optimize_deform_lr=o["optimize_deform_lr"],
            drop_hypothesis=o["drop_hypothesis"],
            scale_lr_decay=o["scale_lr_decay"],
            scale_bias=o["scale_bias"],
            az_euler_range=o["az_euler_range"],
            el_euler_range=o["el_euler_range"],
            cyc_euler_range=o["cyc_euler_range"],
        ),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(),
            batch_size=o["batch_size"],
            num_frames=o["num_frames"],
            learning_rate=o["learning_rate"],
            warmup_lr=o["warmup_lr"],
            num_epochs=o["num_epochs"],
            num_pretrain_epochs=o["num_pretrain_epochs"],
            num_reps=o["num_reps"],
            tex_num_reps=o["tex_num_reps"],
            warmup=o["warmup"],
            texture_warmup=o["texture_warmup"],
            use_gtpose=o["use_gtpose"],
            multistep_lr=o["multistep_lr"],
            separate_camera_opt=o["separate_camera_opt"],
            camera_learning_rate=o["camera_learning_rate"],
            save_epoch_freq=o["save_epoch_freq"],
            save_latest_freq=o["save_latest_freq"],
            display_freq=o["display_freq"],
            checkpoint_dir=o["checkpoint_dir"],
            name=o["name"],
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


def make_flow_fn_from_opts(o: dict, img_size: int):
    """Build the frozen-flow batch preprocessor (or None when of wt = 0)."""
    if o["of_loss_wt"] <= 0:
        return None
    from ..flow import infer as flow_infer

    if o["flow_checkpoint"]:
        params = flow_infer.load_flow_checkpoint(o["flow_checkpoint"])
    elif o["flow_random_init"]:
        import jax

        from ..flow import maskflownet as mfn

        params = mfn.init_params(jax.random.PRNGKey(0))
    else:
        raise ValueError(
            "of_loss_wt > 0 needs --flow_checkpoint (or --flow_random_init "
            "for plumbing tests, or --of_loss_wt=0)"
        )
    net_hw = o.get("flow_net_hw", (flow_infer.NET_H, flow_infer.NET_W))
    return flow_infer.make_flow_fn(params, img_size, net_hw)


def make_pretrained_loader(o: dict):
    """Pretrained-weight merger for driver (resnet18 + LPIPS AlexNet)."""
    if not (o["pretrained_resnet18"] or o["lpips_alexnet"]):
        return None
    from ..models import torch_import

    def load(params, batch_stats):
        if o["pretrained_resnet18"]:
            params, batch_stats, ok = torch_import.maybe_load_pretrained_encoder(
                params, batch_stats, o["pretrained_resnet18"]
            )
            if not ok:
                raise FileNotFoundError(o["pretrained_resnet18"])
        return params, batch_stats

    return load


def make_lpips_loader(o: dict):
    if not o["lpips_alexnet"]:
        return None
    from ..models import torch_import

    def load(lpips_params):
        sd = torch_import.load_torch_state_dict(o["lpips_alexnet"])
        feats = torch_import.convert_alexnet_features(sd)
        return torch_import.jax_tree_merge(dict(lpips_params), {"alex": feats})

    return load


def build_video_dataset(o: dict):
    """Video-level dataset mixing (reference multiframe/main.py:216-242).

    horse/tiger: TigDog (+ YTVIS + COCO with --expand_ytvis);
    other quadrupeds: YTVIS (+ PASCAL stills + COCO with --expand_pascal).
    """
    cat = o["category"]
    kps = o["num_kps"]
    parts = []
    if cat in ("horse", "tiger"):
        parts.append(
            tig.VideoPklDataset(o["root_dir"], cat, split="train", num_kps=kps)
        )
        if o["expand_ytvis"]:
            parts.append(tig.YTVISPklDataset(o["root_dir_yt"], cat, num_kps=kps))
            if o["root_dir_coco"]:
                parts.append(
                    tig.COCOPklDataset(o["root_dir_coco"], cat, num_kps=kps)
                )
    else:
        parts.append(
            tig.YTVISPklDataset(o["root_dir_yt"] or o["root_dir"], cat, num_kps=kps)
        )
        if o["expand_pascal"]:
            from ..data.pascal import PascalVideoDataset

            parts.append(
                PascalVideoDataset(
                    o["pascal_img_dir"], o["pascal_anno_path"], num_kps=kps
                )
            )
            if o["root_dir_coco"]:
                parts.append(
                    tig.COCOPklDataset(o["root_dir_coco"], cat, num_kps=kps)
                )
    if o.get("expand_imgnet"):
        # reference ImgnetPascalQuadDataset mixes kp-less ImageNet synset
        # stills into the train split (objects.py:238-243)
        from ..data.objects import ImageNetQuadVideoDataset

        parts.append(
            ImageNetQuadVideoDataset(
                o["imgnet_dir"], o["imgnet_anno_path"], cat,
                split="train", num_kps=kps,
            )
        )
    return parts[0] if len(parts) == 1 else tig.ConcatDataset(parts)


def train(o: dict):
    """Full multiframe training from an options dict (testable entry)."""
    cfg = build_cfg(o)
    template = build_mf_template(cfg)

    video_ds = build_video_dataset(o)
    n_frames, s2v, spv = tig.explode_to_frames(
        video_ds, o["tmp_dir"], o["category"], o["num_training_frames"]
    )
    print(f"Training samples (frames): {n_frames}")

    is_tigdog = o["category"] in ("horse", "tiger")
    mk = dict(
        tmp_dir=o["tmp_dir"], category=o["category"], sample_to_vid=s2v,
        samples_per_vid=spv, num_frames=o["num_frames"],
        img_size=o["img_size"],
        # no-kp categories use tight mask bboxes + v2 crop
        # (reference multiframe/main.py:292-306)
        tight_bboxes=o["tight_bboxes"] or not is_tigdog,
        v2_crop=o["v2_crop"] or not is_tigdog,
        padding_frac=o["padding_frac"],
        remove_neck_kp=is_tigdog,
    )
    dataset = tig.MultiFrameDataset(mirror=o["mirror"], transforms=True, **mk)
    # no-aug loader for the camera-embedding init pass; TigDog uses
    # padding_frac=0 here (reference multiframe/main.py:283-290)
    mk_noag = dict(mk, padding_frac=0.0 if is_tigdog else o["padding_frac"])
    dataset_noag = tig.MultiFrameDataset(
        mirror=False, transforms=False, **mk_noag
    )
    loader = DataLoader(dataset, o["batch_size"], shuffle=True)
    loader_noag = DataLoader(
        dataset_noag, o["batch_size"], shuffle=False, drop_last=False
    )

    flow_fn = make_flow_fn_from_opts(o, o["img_size"])
    lpips_loader = make_lpips_loader(o)

    return driver.run_multiframe_training(
        cfg, template, loader, loader_noag, n_frames,
        init_camera_emb=o["init_camera_emb"],
        finetune_camera=o["finetune_camera"],
        load_warmup=o["load_warmup"],
        log_every=o["log_every"],
        face_chunk=o.get("face_chunk", 128),
        flow_fn=flow_fn,
        load_pretrained=make_pretrained_loader(o),
        load_lpips=lpips_loader,
    )


def main(_):
    train(opts_from_flags())


if __name__ == "__main__":
    app.run(main)
