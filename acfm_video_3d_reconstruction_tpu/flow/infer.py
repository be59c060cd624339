"""Frozen optical-flow inference for the multiframe trainer.

Parity target: reference multiframe/main.py:385-411 (set_input's no-grad
MaskFlownet pass): resize frame pair to 384x768, centralize (subtract the
pair's mean RGB), pad to /64, run the net, Upsample(pred[-1], 4), resize
back to the training resolution. Returns (B, T, H, W, 2) with the flow in
frame 0's slot and odd frames zeroed (main.py:409-411).

Can also be used offline to precompute flows into the frame cache
(the reference's commented-out intent at youtube_mf_of.py:161-200).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import maskflownet as mfn
from . import ops

NET_H, NET_W = 384, 768


def centralize(im0: jax.Array, im1: jax.Array):
    rgb_mean = jnp.concatenate([im0, im1], axis=1).mean(axis=(1, 2), keepdims=True)
    return im0 - rgb_mean, im1 - rgb_mean


@functools.partial(jax.jit, static_argnums=(3,))
def predict_pair_flow(params, im0: jax.Array, im1: jax.Array, out_size: int):
    """im0/im1: (B, H, W, 3) in [0,1] -> flow (B, out, out, 2) in pixels of
    the output resolution."""
    B = im0.shape[0]
    im0r = jax.image.resize(im0, (B, NET_H, NET_W, 3), "bilinear")
    im1r = jax.image.resize(im1, (B, NET_H, NET_W, 3), "bilinear")
    im0c, im1c = centralize(im0r, im1r)
    preds, _, _ = mfn.maskflownet(params, im0c, im1c)
    up = ops.upsample2d_flow(preds[-1], 4)  # (B, 384, 768, 2), pixel units
    flow = jax.image.resize(up, (B, out_size, out_size, 2), "bilinear")
    # rescale flow vectors to output pixel units
    scale = jnp.asarray(
        [out_size / NET_W, out_size / NET_H], dtype=flow.dtype
    )
    # reference flow channel order follows the network conv output (c0, c1);
    # main.py scales dims (2,3)=(H,W) of NCHW i.e. (c0 ~ H, c1 ~ W)? The
    # final per-channel resize factors there are (H_out/H_net, W_out/W_net)
    # applied to channels (0, 1) respectively.
    scale = jnp.asarray([out_size / NET_H, out_size / NET_W], dtype=flow.dtype)
    return flow * scale


def clip_flows(params, imgs: jax.Array, image_size: int) -> jax.Array:
    """Batch of clips (B, T, H, W, 3) -> (B, T, H, W, 2): flow(frame0 ->
    frame1) stored at t=0, zeros at odd t (reference layout)."""
    B, T = imgs.shape[:2]
    flow01 = predict_pair_flow(params, imgs[:, 0], imgs[:, 1], image_size)
    flows = jnp.zeros((B, T) + flow01.shape[1:], flow01.dtype)
    flows = flows.at[:, 0].set(flow01)
    return flows
