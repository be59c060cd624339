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
