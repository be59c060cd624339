"""MaskFlownet optical flow network (PWC-style, two stacked stages), JAX.

Parity target: reference multiframe/data/optical_flow/model/MaskFlownet.py
(MaskFlownet_S :81-381, MaskFlownet :384-657). The network runs FROZEN at
ACFM train time (multiframe/main.py:203-214, set_input :385-411), so it is
implemented functionally over a parameter pytree (converted 1:1 from the
torch checkpoint names by `convert_torch_state_dict`), jitted once, NHWC.

Structure per stage: 6-level siamese conv pyramid; per level a cost volume
(flow/ops.correlation, the CUDA extension's TPU equivalent), deformable-
conv warping of the level-2 features by the upsampled flow, a DenseNet-
style decoder predicting a flow (+ occlusion mask in stage 1) residual,
and a dilated context network refining the finest level. Stage 2 re-runs
on [im1, 0] / [warped im2, occlusion-mask-offset] 4-channel inputs with
md=2 cost volumes against both pyramids.
"""
from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from . import ops

LEAK = 0.1
# feature pyramid channels per level (1-6)
PYR_CH = [16, 32, 64, 96, 128, 196]
DD = np.cumsum([128, 128, 96, 64, 32])  # densenet growth
STRIDES = [64, 32, 16, 8, 4]
UPFEAT_CH = 16


def _conv(p, x, stride=1, dilation=1, act=True):
    out = jax.lax.conv_general_dilated(
        x, p["w"],
        window_strides=(stride, stride),
        padding=[(dilation * (p["w"].shape[0] // 2),) * 2] * 2,
        rhs_dilation=(dilation, dilation),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    return jax.nn.leaky_relu(out, LEAK) if act else out


def _deconv(p, x):
    """ConvTranspose2d(k=4, s=2, p=1) equivalent via input dilation.

    Kernel stored as (kh, kw, Cout, Cin) (forward-conv view of the torch
    (Cin, Cout, kh, kw) weight); spatially flipped + axes swapped here.
    out_size = 2 * in_size.
    """
    w = jnp.flip(p["w"], (0, 1)).swapaxes(2, 3)  # (kh, kw, Cin, Cout)
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=[(2, 2), (2, 2)],
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    return out


def _pyramid(params, prefix_letters, x):
    """Three convs per level (stride 2 on the first), 6 levels."""
    feats = []
    for lvl in range(1, 7):
        a, b, c = prefix_letters
        x = _conv(params[f"conv{lvl}{a}"], x, stride=2)
        x = _conv(params[f"conv{lvl}{b}"], x)
        x = _conv(params[f"conv{lvl}{c}"], x)
        feats.append(x)
    return feats


def _densenet(params, prefix, x):
    for i in range(5):
        x = jnp.concatenate([_conv(params[f"{prefix}_{i}"], x), x], axis=-1)
    return x


def _deform_warp(params, name, feat2, flow, scale_over_stride):
    """Deformable-conv warping: offsets = flow (dy-dx channel order of the
    reference) repeated for all 9 taps (MaskFlownet.py:283-288)."""
    off = flow * scale_over_stride
    offsets = jnp.tile(off, (1, 1, 1, 9))
    p = params[name]
    return ops.deform_conv3x3(feat2, offsets, p["w"], p.get("b"))


def maskflownet_s(params: Mapping[str, Any], im1: jax.Array, im2: jax.Array,
                  flow_multiplier: float = 1.0):
    """Stage 1. im1/im2: (B, H, W, 3), H, W divisible by 64.

    Returns (predictions [flow6..flow2] * scale, occlusion_masks, srcs)
    mirroring the reference return contract.
    """
    scale = 20.0 * flow_multiplier
    c1 = _pyramid(params, "abc", im1)
    c2 = _pyramid(params, "abc", im2)
    md = 4

    corr6 = jax.nn.leaky_relu(ops.correlation(c1[5], c2[5], md), LEAK)
    x = _densenet(params, "conv6", corr6)
    flow6 = _conv(params["pred_flow6"], x, act=False)
    mask6 = _conv(params["pred_mask6"], x, act=False)

    flows = [flow6]
    masks = [mask6]
    cur_x = x
    mask = mask6
    for lvl in (5, 4, 3, 2):
        i = 6 - lvl  # 1..4
        feat = jax.nn.leaky_relu(_deconv(params[f"upfeat{lvl}"], cur_x), LEAK)
        flow = ops.upsample2d_flow(flows[-1], 2)
        mask = ops.upsample2d_flow(masks[-1], 2)
        warp = _deform_warp(
            params, f"deform{lvl}", c2[lvl - 1], flow, scale / STRIDES[i]
        )
        warp = warp * jax.nn.sigmoid(mask) + _conv(
            params[f"conv{lvl}f"], feat, act=False
        )
        warp = jax.nn.leaky_relu(warp, LEAK)
        corr = jax.nn.leaky_relu(ops.correlation(c1[lvl - 1], warp, md), LEAK)
        cur_x = jnp.concatenate([corr, c1[lvl - 1], feat, flow], axis=-1)
        cur_x = _densenet(params, f"conv{lvl}", cur_x)
        flow = flow + _conv(params[f"pred_flow{lvl}"], cur_x, act=False)
        flows.append(flow)
        if lvl > 2:
            masks.append(_conv(params[f"pred_mask{lvl}"], cur_x, act=False))

    # dilated context refinement on the finest level
    y = _conv(params["dc_conv1"], cur_x, dilation=1)
    y = _conv(params["dc_conv2"], y, dilation=2)
    y = _conv(params["dc_conv3"], y, dilation=4)
    y = _conv(params["dc_conv4"], y, dilation=8)
    y = _conv(params["dc_conv5"], y, dilation=16)
    y = _conv(params["dc_conv6"], y, dilation=1)
    flows[-1] = flows[-1] + _conv(params["dc_conv7"], y, act=False)

    predictions = [f * scale for f in flows]
    # mask2 = the stride-4 upsampled mask from the level-2 iteration (the
    # reference has no pred_mask2; MaskFlownet.py level-2 block).
    mask2 = mask
    occlusion_masks = [jax.nn.sigmoid(mask2)]

    mask0 = jax.nn.sigmoid(ops.upsample2d_flow(mask2, 4)) - 0.5
    c30 = jnp.concatenate([im1, jnp.zeros_like(mask0)], axis=-1)
    warped_im2 = ops.backward_warp(
        im2, ops.upsample2d_flow(flows[-1], 4)[..., ::-1] * scale
    )
    c40 = jnp.concatenate([warped_im2, mask0], axis=-1)
    srcs = (c1, c2, flows, c30, c40)
    return predictions, occlusion_masks, srcs


def maskflownet(params: Mapping[str, Any], im1: jax.Array, im2: jax.Array,
                flow_multiplier: float = 1.0):
    """Full two-stage MaskFlownet (reference :384-657).

    params holds stage-1 weights under params['s'] and stage-2 under
    params['m']. Returns (preds [flow6..flow2]*scale, visuals, []).
    """
    scale = 20.0 * flow_multiplier
    _, _, srcs = maskflownet_s(params["s"], im1, im2, flow_multiplier)
    c1, c2, flows1, c30, c40 = srcs
    p = params["m"]
    md = 2

    c3 = _pyramid(p, "xyz", c30)
    c4 = _pyramid(p, "xyz", c40)

    flow6 = flows1[0]
    warp6u = jax.nn.leaky_relu(
        _deform_warp(p, "deform6", c2[5], flow6, scale / STRIDES[0]), LEAK
    )
    corr6u = jax.nn.leaky_relu(ops.correlation(c1[5], warp6u, md), LEAK)
    corr6v = jax.nn.leaky_relu(ops.correlation(c3[5], c4[5], md), LEAK)
    x = jnp.concatenate([corr6u, corr6v, flow6], axis=-1)
    x = _densenet(p, "conv6", x)
    flow = flow6 + _conv(p["pred_flow6"], x, act=False)

    flows = [flow]
    for lvl in (5, 4, 3, 2):
        i = 6 - lvl
        feat = jax.nn.leaky_relu(_deconv(p[f"upfeat{lvl}"], x), LEAK)
        flow = ops.upsample2d_flow(flows[-1], 2)
        warpu = jax.nn.leaky_relu(
            _deform_warp(p, f"deform{lvl}", c2[lvl - 1], flow, scale / STRIDES[i]),
            LEAK,
        )
        corru = jax.nn.leaky_relu(ops.correlation(c1[lvl - 1], warpu, md), LEAK)
        corrv = jax.nn.leaky_relu(ops.correlation(c3[lvl - 1], c4[lvl - 1], md), LEAK)
        x = jnp.concatenate(
            [c1[lvl - 1], feat, corru, corrv, flow, flows1[i]], axis=-1
        )
        x = _densenet(p, f"conv{lvl}", x)
        flow = flow + _conv(p[f"pred_flow{lvl}"], x, act=False)
        flows.append(flow)

    y = _conv(p["dc_conv1"], x, dilation=1)
    y = _conv(p["dc_conv2"], y, dilation=2)
    y = _conv(p["dc_conv3"], y, dilation=4)
    y = _conv(p["dc_conv4"], y, dilation=8)
    y = _conv(p["dc_conv5"], y, dilation=16)
    y = _conv(p["dc_conv6"], y, dilation=1)
    flows[-1] = flows[-1] + _conv(p["dc_conv7"], y, act=False)

    preds = [f * scale for f in flows]
    visuals = [flows[-1][..., :1]]
    return preds, visuals, []


# --------------------------------------------------------------------------
# parameter construction
# --------------------------------------------------------------------------

def _stage_shapes(stage: str) -> dict:
    """Conv shapes keyed by reference module name, (kh, kw, cin, cout)."""
    nd = 81 if stage == "s" else 25
    shapes: dict = {}
    in_ch = 3 if stage == "s" else 4
    letters = "abc" if stage == "s" else "xyz"
    prev = in_ch
    for lvl, ch in enumerate(PYR_CH, start=1):
        a, b, c = letters
        shapes[f"conv{lvl}{a}"] = (3, 3, prev, ch)
        shapes[f"conv{lvl}{b}"] = (3, 3, ch, ch)
        shapes[f"conv{lvl}{c}"] = (3, 3, ch, ch)
        prev = ch
    grow = [128, 128, 96, 64, 32]
    for lvl in (6, 5, 4, 3, 2):
        if stage == "s":
            od = nd if lvl == 6 else nd + PYR_CH[lvl - 1] + UPFEAT_CH + 2
        else:
            od = nd + nd + 2 if lvl == 6 else nd + nd + PYR_CH[lvl - 1] + UPFEAT_CH + 4
        ch_in = od
        for i in range(5):
            shapes[f"conv{lvl}_{i}"] = (3, 3, ch_in, grow[i])
            ch_in += grow[i]
        shapes[f"pred_flow{lvl}"] = (3, 3, ch_in, 2)
        if stage == "s" and lvl > 2:
            shapes[f"pred_mask{lvl}"] = (3, 3, ch_in, 1)
        if lvl > 2:
            # deconv kernels live in forward-conv HWIO layout
            # (4, 4, out_ch=UPFEAT, in_ch) for conv_transpose(transpose_kernel=True)
            shapes[f"upfeat{lvl - 1}"] = (4, 4, UPFEAT_CH, ch_in)
        else:
            shapes["dc_conv1"] = (3, 3, ch_in, 128)
    shapes.update(
        dc_conv2=(3, 3, 128, 128), dc_conv3=(3, 3, 128, 128),
        dc_conv4=(3, 3, 128, 96), dc_conv5=(3, 3, 96, 64),
        dc_conv6=(3, 3, 64, 32), dc_conv7=(3, 3, 32, 2),
    )
    deform_lvls = (5, 4, 3, 2) if stage == "s" else (6, 5, 4, 3, 2)
    for lvl in deform_lvls:
        ch = PYR_CH[lvl - 1]
        shapes[f"deform{lvl}"] = (3, 3, ch, ch)
    if stage == "s":
        for lvl in (5, 4, 3, 2):
            shapes[f"conv{lvl}f"] = (3, 3, UPFEAT_CH, PYR_CH[lvl - 1])
    return shapes


def init_params(rng: jax.Array, dtype=jnp.float32) -> dict:
    """Random (kaiming fan-in) parameters for both stages."""

    def make(shapes, key):
        out = {}
        for i, (name, shp) in enumerate(sorted(shapes.items())):
            k = jax.random.fold_in(key, i)
            is_deconv = name.startswith("upfeat")
            fan_in = shp[0] * shp[1] * (shp[3] if is_deconv else shp[2])
            w = jax.random.normal(k, shp, dtype) * jnp.sqrt(2.0 / fan_in)
            nbias = shp[2] if is_deconv else shp[3]
            out[name] = {"w": w, "b": jnp.zeros((nbias,), dtype)}
        return out

    return {
        "s": make(_stage_shapes("s"), jax.random.fold_in(rng, 0)),
        "m": make(_stage_shapes("m"), jax.random.fold_in(rng, 1)),
    }


def convert_torch_state_dict(sd: Mapping[str, Any]) -> dict:
    """Reference MaskFlownet checkpoint -> params pytree.

    torch names: '<mod>.0.weight' for conv+activation Sequentials,
    '<mod>.weight' for bare convs/deconvs/deform convs, with stage-1
    modules under 'MaskFlownet_S.'.
    """

    def grab(prefix: str, names) -> dict:
        out = {}
        for name in names:
            for suffix in (f"{name}.0.weight", f"{name}.weight"):
                key = prefix + suffix
                if key in sd:
                    w = np.asarray(sd[key])
                    bkey = key.replace("weight", "bias")
                    b = np.asarray(sd[bkey]) if bkey in sd else None
                    if name.startswith("upfeat"):
                        # ConvTranspose2d (I, O, kh, kw) -> HWIO w/
                        # transpose_kernel=True expects (kh, kw, O, I)->flip?
                        w = np.transpose(w, (2, 3, 1, 0))
                    else:
                        w = np.transpose(w, (2, 3, 1, 0))
                    out[name] = {"w": jnp.asarray(w)}
                    if b is not None:
                        out[name]["b"] = jnp.asarray(b)
                    else:
                        out[name]["b"] = jnp.zeros((w.shape[-1],), jnp.float32)
                    break
        return out

    s_names = list(_stage_shapes("s"))
    m_names = list(_stage_shapes("m"))
    params = {
        "s": grab("MaskFlownet_S.", s_names),
        "m": grab("", m_names),
    }
    if not params["s"]:  # checkpoint of MaskFlownet_S alone
        params["s"] = grab("", s_names)
    return params
