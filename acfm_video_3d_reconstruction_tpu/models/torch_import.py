"""Torch checkpoint -> flax parameter conversion (offline utility).

Converts locally-available torchvision/lpips/reference checkpoints into our
flax trees for pretrained-parity runs (resnet18 trunk, AlexNet/LPIPS
features, full reference MeshNet state dicts). No network access: all
loaders take a local file path and are gated by callers on existence.

Convention notes:
  torch Conv2d weight (O, I, kH, kW) -> flax (kH, kW, I, O)
  torch Linear weight (O, I) -> flax kernel (I, O)
  The encoder's first Dense after flatten needs an input permutation:
  torch flattens NCHW (C,H,W-major) while we flatten NHWC.
"""
from __future__ import annotations

from typing import Any, Mapping

import numpy as np


def _conv(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear(w) -> np.ndarray:
    return np.transpose(np.asarray(w), (1, 0))


def _bn(prefix: str, sd: Mapping[str, Any]):
    return (
        {"scale": np.asarray(sd[f"{prefix}.weight"]),
         "bias": np.asarray(sd[f"{prefix}.bias"])},
        {"mean": np.asarray(sd[f"{prefix}.running_mean"]),
         "var": np.asarray(sd[f"{prefix}.running_var"])},
    )


def convert_resnet18(state_dict: Mapping[str, Any]):
    """torchvision resnet18 state_dict -> (params, batch_stats) for
    models.encoder.ResNet18 (prefix-free trees to merge under 'resnet')."""
    sd = state_dict
    params: dict = {}
    stats: dict = {}
    params["conv1"] = {"kernel": _conv(sd["conv1.weight"])}
    p, s = _bn("bn1", sd)
    params["bn1"], stats["bn1"] = p, s
    for layer in range(1, 5):
        for block in range(2):
            name = f"layer{layer}_{block}"
            tpfx = f"layer{layer}.{block}"
            bp: dict = {
                "conv1": {"kernel": _conv(sd[f"{tpfx}.conv1.weight"])},
                "conv2": {"kernel": _conv(sd[f"{tpfx}.conv2.weight"])},
            }
            bs: dict = {}
            bp["bn1"], bs["bn1"] = _bn(f"{tpfx}.bn1", sd)
            bp["bn2"], bs["bn2"] = _bn(f"{tpfx}.bn2", sd)
            if f"{tpfx}.downsample.0.weight" in sd:
                bp["downsample_conv"] = {
                    "kernel": _conv(sd[f"{tpfx}.downsample.0.weight"])
                }
                bp["downsample_bn"], bs["downsample_bn"] = _bn(
                    f"{tpfx}.downsample.1", sd
                )
            params[name] = bp
            stats[name] = bs
    return params, stats


def convert_alexnet_features(state_dict: Mapping[str, Any]):
    """torchvision alexnet .features state_dict -> models.lpips.AlexNetFeatures
    params. torch indices of the 5 convs in .features: 0, 3, 6, 8, 10."""
    idx = [0, 3, 6, 8, 10]
    params = {}
    for i, t in enumerate(idx):
        params[f"conv{i}"] = {
            "kernel": _conv(state_dict[f"features.{t}.weight"]),
            "bias": np.asarray(state_dict[f"features.{t}.bias"]),
        }
    return params


def _nchw_flatten_perm(h: int, w: int, c: int) -> np.ndarray:
    """Row permutation taking a torch Linear over an NCHW flatten to ours.

    torch flattens (C, H, W) C-major: col = ch*h*w + y*w + x. We flatten
    NHWC: row = y*w*c + x*c + ch. Returns perm with perm[our_row] = torch_col
    so `_linear(W)[perm]` is the flax kernel.
    """
    perm = np.empty(h * w * c, np.int64)
    for y in range(h):
        for x in range(w):
            for ch in range(c):
                perm[y * w * c + x * c + ch] = ch * h * w + y * w + x
    return perm


def convert_meshnet(state_dict: Mapping[str, Any]):
    """Full reference `pred_net_<epoch>.pth` MeshNet state dict -> our trees.

    Covers every parameter the reference saves (monocular/nnutils/
    train_utils.py:83-89 saves `network.state_dict()` of mesh_net.py:294-470;
    the multiframe variant mesh_net.py:394-599 differs only by LayerNorm in
    the camera FC blocks, auto-detected from the keys):

      mean_v / lbs / vert2kp          -> mean_v / lbs_logits / vert2kp_logits
      encoder.resnet_conv.resnet.*    -> encoder/resnet/* (torchvision r18)
      encoder.enc_conv1.{0 conv,1 bn} -> encoder/enc_conv1/{Conv_0,BatchNorm_0}
      encoder.enc_fc.{i}.{0 fc,1 bn}  -> encoder/enc_fc/FCBNLeaky_{i}/*
                                         (first fc rows NCHW->NHWC permuted)
      code_predictor.transform_predictor.final_layer_trans
                                      -> code_predictor/Dense_0
        (final_layer_angles and the quat/scale/trans sub-predictors inside
         CodePredictor are dead in the reference forward, mesh_net.py:255-265
         — dropped)
      camera_predictor.{conv_c.0,fc1.0,fc2.0,(fc*.1 LayerNorm),
                        quat|scale|trans_predictor.pred_layer}
                                      -> camera_predictor/{conv_c,fc1,fc2,
                                         ln1,ln2,quat|scale|trans/Dense_0}
      texture_predictor.res_color_net.{0,2,3,5,7,9,11 ResLayer_2d, 12 conv3x3}
                                      -> texture_predictor/{ResLayer2d_0..6,
                                         Conv_0}

    Returns (params, batch_stats) trees shaped for models.mesh_net.MeshNet;
    merge with jax_tree_merge (which shape-checks every leaf).
    """
    sd = state_dict
    params: dict = {}
    stats: dict = {}

    # --- template state ---
    params["mean_v"] = np.asarray(sd["mean_v"], np.float32)
    params["lbs_logits"] = np.asarray(sd["lbs"], np.float32)
    if "vert2kp" in sd:
        params["vert2kp_logits"] = np.asarray(sd["vert2kp"], np.float32)

    # --- encoder ---
    rpfx = "encoder.resnet_conv.resnet."
    rsd = {k[len(rpfx):]: v for k, v in sd.items() if k.startswith(rpfx)}
    rp, rs = convert_resnet18(rsd)
    enc_p: dict = {"resnet": rp}
    enc_s: dict = {"resnet": rs}
    bnp, bns = _bn("encoder.enc_conv1.1", sd)
    enc_p["enc_conv1"] = {
        "Conv_0": {"kernel": _conv(sd["encoder.enc_conv1.0.weight"]),
                   "bias": np.asarray(sd["encoder.enc_conv1.0.bias"])},
        "BatchNorm_0": bnp,
    }
    enc_s["enc_conv1"] = {"BatchNorm_0": bns}
    enc_p["enc_fc"], enc_s["enc_fc"] = {}, {}
    for i in range(2):
        w = _linear(sd[f"encoder.enc_fc.{i}.0.weight"])
        if i == 0:
            # in_features = 256 * (H/64) * (W/64); reference images are square
            hw = w.shape[0] // 256
            side = int(round(hw ** 0.5))
            if side * side != hw:
                raise ValueError(f"non-square enc_fc input: 256x{hw}")
            w = w[_nchw_flatten_perm(side, side, 256)]
        bnp, bns = _bn(f"encoder.enc_fc.{i}.1", sd)
        enc_p["enc_fc"][f"FCBNLeaky_{i}"] = {
            "Dense_0": {"kernel": w,
                        "bias": np.asarray(sd[f"encoder.enc_fc.{i}.0.bias"])},
            "BatchNorm_0": bnp,
        }
        enc_s["enc_fc"][f"FCBNLeaky_{i}"] = {"BatchNorm_0": bns}
    params["encoder"], stats["encoder"] = enc_p, enc_s

    # --- handle-offset head ---
    tpfx = "code_predictor.transform_predictor.final_layer_trans"
    params["code_predictor"] = {
        "Dense_0": {"kernel": _linear(sd[f"{tpfx}.weight"]),
                    "bias": np.asarray(sd[f"{tpfx}.bias"])}
    }

    # --- camera head ---
    cam: dict = {
        "conv_c": {"kernel": _conv(sd["camera_predictor.conv_c.0.weight"]),
                   "bias": np.asarray(sd["camera_predictor.conv_c.0.bias"])},
    }
    for i in (1, 2):
        cam[f"fc{i}"] = {
            "kernel": _linear(sd[f"camera_predictor.fc{i}.0.weight"]),
            "bias": np.asarray(sd[f"camera_predictor.fc{i}.0.bias"]),
        }
        if f"camera_predictor.fc{i}.1.weight" in sd:  # multiframe LayerNorm
            cam[f"ln{i}"] = {
                "scale": np.asarray(sd[f"camera_predictor.fc{i}.1.weight"]),
                "bias": np.asarray(sd[f"camera_predictor.fc{i}.1.bias"]),
            }
    for ours, theirs in (("quat", "quat_predictor"), ("scale", "scale_predictor"),
                         ("trans", "trans_predictor")):
        cam[ours] = {"Dense_0": {
            "kernel": _linear(sd[f"camera_predictor.{theirs}.pred_layer.weight"]),
            "bias": np.asarray(sd[f"camera_predictor.{theirs}.pred_layer.bias"]),
        }}
    params["camera_predictor"] = cam

    # --- texture decoder (optional in the checkpoint) ---
    if any(k.startswith("texture_predictor.") for k in sd):
        tex_p: dict = {}
        tex_s: dict = {}
        res_idx = [0, 2, 3, 5, 7, 9, 11]  # ResLayer_2d slots in res_color_net
        for j, t in enumerate(res_idx):
            p = f"texture_predictor.res_color_net.{t}"
            blk_p: dict = {}
            blk_s: dict = {}
            for ci, cname in ((1, "Conv_0"), (2, "Conv_1")):
                blk_p[cname] = {"kernel": _conv(sd[f"{p}.conv{ci}.weight"]),
                                "bias": np.asarray(sd[f"{p}.conv{ci}.bias"])}
            for bi, bname in ((1, "BatchNorm_0"), (2, "BatchNorm_1")):
                bp, bs = _bn(f"{p}.bn{bi}", sd)
                blk_p[bname], blk_s[bname] = bp, bs
            tex_p[f"ResLayer2d_{j}"] = blk_p
            tex_s[f"ResLayer2d_{j}"] = blk_s
        tex_p["Conv_0"] = {
            "kernel": _conv(sd["texture_predictor.res_color_net.12.weight"]),
            "bias": np.asarray(sd["texture_predictor.res_color_net.12.bias"]),
        }
        params["texture_predictor"] = tex_p
        stats["texture_predictor"] = tex_s

    return params, stats


def load_reference_meshnet(params: dict, batch_stats: dict, path: str):
    """Load a reference `pred_net_*.pth` into MeshNet trees (shape-checked).

    Returns updated (params, batch_stats). Raises on shape mismatch — the
    caller's template/config must match the checkpoint's (same subdivide,
    num_lbs, num_kps, img_size, symmetry flags).
    """
    import flax

    sd = load_torch_state_dict(path)
    mp, ms = convert_meshnet(sd)
    params = jax_tree_merge(flax.core.unfreeze(params), mp)
    batch_stats = jax_tree_merge(flax.core.unfreeze(batch_stats), ms)
    return params, batch_stats


def load_torch_state_dict(path: str) -> Mapping[str, Any]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if "state_dict" in sd and isinstance(sd["state_dict"], dict):
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}


def maybe_load_pretrained_encoder(params: dict, batch_stats: dict, path: str | None):
    """Merge pretrained resnet18 weights into an encoder tree if available.

    params/batch_stats are the MeshNet trees; returns updated copies.
    """
    import os

    if not path or not os.path.exists(path):
        return params, batch_stats, False
    sd = load_torch_state_dict(path)
    rp, rs = convert_resnet18(sd)
    import flax

    params = flax.core.unfreeze(params)
    batch_stats = flax.core.unfreeze(batch_stats)
    params["encoder"]["resnet"] = jax_tree_merge(params["encoder"]["resnet"], rp)
    batch_stats["encoder"]["resnet"] = jax_tree_merge(
        batch_stats["encoder"]["resnet"], rs
    )
    return params, batch_stats, True


def jax_tree_merge(dst: dict, src: dict) -> dict:
    """Recursively overwrite dst leaves with src values (shape-checked)."""
    import jax.numpy as jnp

    out = dict(dst)
    for k, v in src.items():
        if isinstance(v, dict):
            out[k] = jax_tree_merge(dst.get(k, {}), v)
        else:
            if k in dst and dst[k].shape != np.asarray(v).shape:
                raise ValueError(f"shape mismatch at {k}: {dst[k].shape} vs {np.asarray(v).shape}")
            out[k] = jnp.asarray(v)
    return out
