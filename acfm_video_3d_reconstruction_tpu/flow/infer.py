"""Frozen optical-flow inference for the multiframe trainer/evaluator.

Parity target: reference multiframe/main.py:385-411 (set_input's no-grad
MaskFlownet pass) and multiframe/nnutils/predictor.py:195-225 (the
benchmark predictor's identical pass): resize the frame pair to 384x768,
centralize (subtract the pair's mean RGB), run the net, Upsample(pred[-1],
4), resize back to the training resolution.

Flow conventions (settled, tested in tests/test_flow_infer.py):
  * The MaskFlownet torch port outputs flow channels (dy, dx): its warp()
    flips the flow before adding it to an (x, y) grid
    (reference MaskFlownet.py:226), and predict.py:71 flips the (u, v)
    channel order of .flo ground truth to match the net.
  * pred[-1] * 20 is in full-resolution (384x768) pixel units; the
    triangle-kernel Upsample is purely spatial (no value rescale).
  * DELIBERATE DEVIATIONS from the reference: (1) the reference's final
    resize to the training resolution (main.py:408) does NOT rescale the
    flow vectors, leaving dy in 384-height and dx in 768-width pixel
    units against a loss that measures vertex motion in image pixels
    (loss_utils.py:456); (2) the reference loss then pairs flow channel
    0 (=dy) with displacement channel 0 (=dx) (loss_utils.py:469-471).
    We rescale per-axis to output pixels and emit (dx, dy) so the
    optical-flow loss compares like with like. This changes only the
    fixed per-axis weighting of the loss, not its minimizer structure.

Output layout: clip_flows returns (B, T, H, W, 2) with slot t holding
flow(t -> t+1) and the last slot zero — a generalization of the
reference's T=2 layout (flow01 at slot 0, zeros at slot 1,
main.py:409-411) to arbitrary clip lengths. shift_flows_for_loss converts
to the layout optical_flow_loss consumes (slot t+1 = flow(t -> t+1)),
which for T=2 equals the reference's flip along T (main.py:648).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import maskflownet as mfn
from . import ops

NET_H, NET_W = 384, 768


def centralize(im0: jax.Array, im1: jax.Array):
    """Subtract the pair's mean RGB (reference main.py:413-417)."""
    rgb_mean = jnp.concatenate([im0, im1], axis=1).mean(axis=(1, 2), keepdims=True)
    return im0 - rgb_mean, im1 - rgb_mean


@functools.partial(jax.jit, static_argnums=(3, 4))
def predict_pair_flow(
    params,
    im0: jax.Array,
    im1: jax.Array,
    out_size: int,
    net_hw: tuple[int, int] = (NET_H, NET_W),
):
    """im0/im1: (B, H, W, 3) in [0,1] -> flow (B, out, out, 2).

    Output channels are (dx, dy) in out_size-pixel units (see module
    docstring for the settled conventions). net_hw must be /64-divisible;
    the reference runs at (384, 768) — smaller values are for tests.
    """
    B = im0.shape[0]
    nh, nw = net_hw
    im0r = jax.image.resize(im0, (B, nh, nw, 3), "bilinear")
    im1r = jax.image.resize(im1, (B, nh, nw, 3), "bilinear")
    im0c, im1c = centralize(im0r, im1r)
    preds, _, _ = mfn.maskflownet(params, im0c, im1c)
    up = ops.upsample2d_flow(preds[-1], 4)  # (B, nh, nw, 2) = (dy, dx)
    dx = up[..., 1] * (out_size / nw)
    dy = up[..., 0] * (out_size / nh)
    flow = jnp.stack([dx, dy], axis=-1)
    return jax.image.resize(flow, (B, out_size, out_size, 2), "bilinear")


def clip_flows(
    params,
    imgs: jax.Array,
    image_size: int,
    net_hw: tuple[int, int] = (NET_H, NET_W),
) -> jax.Array:
    """Batch of clips (B, T, H, W, 3) -> (B, T, H, W, 2).

    Slot t holds flow(frame t -> frame t+1) for every consecutive pair;
    the last slot is zero. All T-1 pairs run as one batched net call.
    """
    B, T = imgs.shape[:2]
    S = image_size
    if T < 2:
        return jnp.zeros((B, T, S, S, 2), imgs.dtype)
    H, W = imgs.shape[2:4]
    im0 = imgs[:, :-1].reshape(B * (T - 1), H, W, 3)
    im1 = imgs[:, 1:].reshape(B * (T - 1), H, W, 3)
    flow = predict_pair_flow(params, im0, im1, S, net_hw).reshape(
        B, T - 1, S, S, 2
    )
    return jnp.concatenate([flow, jnp.zeros((B, 1, S, S, 2), flow.dtype)], axis=1)


def predict_flow_native(params, im0: jax.Array, im1: jax.Array) -> jax.Array:
    """Native-resolution flow for benchmark evaluation (AEPE).

    Mirrors reference predict.py:74-93: centralize, stretch to the next
    /64-divisible size (the reference 'pads' by bilinear interpolation),
    run the net, Upsample x4, stretch back with per-axis vector rescale.
    im0/im1 (B, H, W, 3) -> (B, H, W, 2) channels (dx, dy) in pixels.
    """
    B, H, W = im0.shape[:3]
    nh = -(-H // 64) * 64
    nw = -(-W // 64) * 64
    im0c, im1c = centralize(im0, im1)
    im0r = jax.image.resize(im0c, (B, nh, nw, 3), "bilinear")
    im1r = jax.image.resize(im1c, (B, nh, nw, 3), "bilinear")
    preds, _, _ = mfn.maskflownet(params, im0r, im1r)
    up = ops.upsample2d_flow(preds[-1], 4)  # (B, nh, nw, 2) = (dy, dx)
    dy = up[..., 0] * (H / nh)
    dx = up[..., 1] * (W / nw)
    flow = jnp.stack([dx, dy], axis=-1)
    return jax.image.resize(flow, (B, H, W, 2), "bilinear")


def shift_flows_for_loss(flows: jax.Array) -> jax.Array:
    """clip_flows layout -> loss layout: slot t+1 = flow(t -> t+1), slot 0
    zero. Equals the reference's flip along T for T=2 (main.py:648)."""
    return jnp.concatenate([jnp.zeros_like(flows[:, :1]), flows[:, :-1]], axis=1)


def load_flow_checkpoint(path: str) -> dict:
    """Load a reference-format torch MaskFlownet checkpoint into a params
    pytree (multiframe/main.py:203-214 loads the same file with
    load_state_dict)."""
    from ..models.torch_import import load_torch_state_dict

    sd = load_torch_state_dict(path)
    return mfn.convert_torch_state_dict(sd)


def make_flow_fn(params, image_size: int, net_hw: tuple[int, int] = (NET_H, NET_W)):
    """Batch preprocessor: attach batch['optical_flows'] from a frozen,
    jitted MaskFlownet pass over every consecutive frame pair
    (reference set_input, multiframe/main.py:385-411)."""

    def flow_fn(batch: dict) -> dict:
        batch = dict(batch)
        batch["optical_flows"] = clip_flows(
            params, batch["img"], image_size, net_hw
        )
        return batch

    return flow_fn
