"""Capture an XLA trace of the full monocular train step and print the
top ops by self-time (parsed from the xplane proto via
tensorboard_plugin_profile's raw xplane, no tensorboard UI needed)."""
import dataclasses
import glob
import os
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

BATCH, IMG = 12, 256
TRACE_DIR = "/tmp/acfm_trace"


def build_step():
    from acfm_video_3d_reconstruction_tpu import config as cfg_lib
    from acfm_video_3d_reconstruction_tpu.models import build_template
    from acfm_video_3d_reconstruction_tpu.train import monocular

    template = build_template(subdivide=3, num_lbs=16, tex_size=6, num_kps=15)
    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=IMG, num_lbs=16, num_kps=15,
            texture=True, symmetric=False, symmetric_texture=False,
            dtype="bfloat16",
        ),
        train=dataclasses.replace(cfg_lib.TrainConfig(), batch_size=BATCH),
    )
    mods, tx, state = monocular.build(cfg, template, jax.random.PRNGKey(0))
    step = monocular.make_train_step(mods, tx, face_chunk=128)
    rng = np.random.default_rng(0)
    batch = {
        "img": jnp.asarray(rng.random((BATCH, IMG, IMG, 3), np.float32)),
        "mask": jnp.asarray((rng.random((BATCH, IMG, IMG)) > 0.5).astype(np.float32)),
        "kp": jnp.asarray(rng.random((BATCH, 15, 3), np.float32)),
        "sfm_pose": jnp.asarray(
            np.tile(np.asarray([0.8, 0, 0, 1, 0, 0, 0], np.float32), (BATCH, 1))
        ),
        "edt": jnp.asarray(rng.random((BATCH, IMG, IMG), np.float32)),
        "boundaries": jnp.asarray(rng.random((BATCH, 1000, 3), np.float32)),
    }
    return step, state, batch


def main():
    step, state, batch = build_step()
    state, m = step(state, batch)
    jax.block_until_ready(m["total_loss"])

    os.makedirs(TRACE_DIR, exist_ok=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(5):
            state, m = step(state, batch)
        jax.block_until_ready(m["total_loss"])

    # parse the xplane
    paths = sorted(glob.glob(f"{TRACE_DIR}/**/*.xplane.pb", recursive=True))
    print("xplane:", paths[-1])
    try:
        from tensorboard_plugin_profile.protobuf import xplane_pb2
    except ImportError:
        # the plugin's protobufs aren't importable in this env; fall back
        # to the dependency-free parser (same output format)
        import subprocess

        sys.exit(subprocess.call(
            [sys.executable, "tools/xplane_parse.py", paths[-1]]
        ))

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(paths[-1], "rb").read())
    for plane in xs.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name:
            continue
        print("== plane:", plane.name)
        ev_meta = plane.event_metadata
        totals = {}
        counts = {}
        for line in plane.lines:
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                totals[name] = totals.get(name, 0) + ev.duration_ps
                counts[name] = counts.get(name, 0) + 1
        items = sorted(totals.items(), key=lambda kv: -kv[1])
        tot = sum(totals.values())
        print(f"total accounted: {tot / 1e12 * 1000:.1f} ms over 5 steps")
        for name, ps in items[:45]:
            print(f"{ps / 1e12 * 1000 / 5:9.3f} ms/step x{counts[name] // 5:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
