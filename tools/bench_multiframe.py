"""Multiframe flagship step benchmark: G hypotheses x B clips x T frames,
full multiplex loss matrix + soft-min + Adam, one chip.

Reference hot loop being measured: multiframe/main.py:523-765 (all G
camera hypotheses rendered + losses + soft-min writeback per step).
"""
import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from acfm_video_3d_reconstruction_tpu import config as cfg_lib
from acfm_video_3d_reconstruction_tpu.models import build_template
from acfm_video_3d_reconstruction_tpu.train import multiframe as mf

_ap = argparse.ArgumentParser()
_ap.add_argument("--batch", type=int, default=4, help="B clips")
_ap.add_argument("--frames", type=int, default=2, help="T frames/clip")
_ap.add_argument("--guesses", type=int, default=8, help="G camera hypotheses")
_ap.add_argument("--img", type=int, default=256)
_args = _ap.parse_args()
B, T, G, IMG = _args.batch, _args.frames, _args.guesses, _args.img


def main():
    template = build_template(subdivide=3, num_lbs=16, tex_size=6, num_kps=0)
    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=IMG, num_lbs=16, num_kps=0,
            texture=True, symmetric=False, symmetric_texture=False,
            dtype="bfloat16",
        ),
        multiplex=dataclasses.replace(cfg_lib.MultiplexConfig(), num_guesses=G),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(), batch_size=B, num_frames=T, offset_z=0.0,
            use_gtpose=False,
        ),
        mf_weights=dataclasses.replace(cfg_lib.MultiframeLossWeights(), kp=0.0),
    )
    n_frames = B * T * 4
    mods, (tx_full, tx_warm), state = mf.build(
        cfg, template, n_frames, jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((B, T, IMG, IMG, 3), np.float32)),
        "mask": jnp.asarray((rng.random((B, T, IMG, IMG)) > 0.5).astype(np.float32)),
        "kp": jnp.asarray(rng.random((B, T, 1, 3), np.float32)),
        "sfm_pose": jnp.asarray(
            np.tile(np.asarray([0.8, 0, 0, 1, 0, 0, 0], np.float32), (B, T, 1))
        ),
        "frames_idx": jnp.asarray(
            np.arange(B * T, dtype=np.int32).reshape(B, T)
        ),
        "mirror_flag": jnp.zeros((B, T), jnp.int32),
        "transforms": jnp.asarray(
            np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (B, T, 1))
        ),
        "optical_flows": jnp.zeros((B, T, IMG, IMG, 2)),
        "edt": jnp.asarray(rng.random((B * T, IMG, IMG), np.float32)),
        "bdt": jnp.asarray(rng.random((B * T, IMG, IMG), np.float32)),
        "boundaries": jnp.asarray(rng.random((B * T, 1000, 3), np.float32)),
    }
    step = mf.make_train_step(mods, tx_full, k=G, drop_deform=True)
    state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    n = 5
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = step(state, batch)
    jax.block_until_ready(metrics["total_loss"])
    dt = (time.perf_counter() - t0) / n
    frames = B * T
    rendered = G * B * T * 3  # mask + tex + tex-flip per hypothesis-frame
    print(
        json.dumps(
            {
                "metric": f"multiframe step (G={G}, B={B}, T={T}, 256^2, OF loss, soft-min)",
                "step_ms": round(dt * 1000, 1),
                "frames_per_s": round(frames / dt, 2),
                "rendered_views_per_s": round(rendered / dt, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
