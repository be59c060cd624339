"""Ablation bench: time the full monocular train step with components
disabled to locate the real cost structure (component microbenches
mis-attribute costs that XLA overlaps)."""
import dataclasses
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from acfm_video_3d_reconstruction_tpu import config as cfg_lib
from acfm_video_3d_reconstruction_tpu.models import build_template
from acfm_video_3d_reconstruction_tpu.train import monocular

BATCH, IMG = 12, 256


def bench(name, cfg, template, n=10):
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
    state, m = step(state, batch)
    jax.block_until_ready(m["total_loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, m = step(state, batch)
    jax.block_until_ready(m["total_loss"])
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt * 1000:8.1f} ms  ({BATCH / dt:6.1f} fps)", flush=True)
    return dt


def main():
    template = build_template(subdivide=3, num_lbs=16, tex_size=6, num_kps=15)

    def cfg(**model_over):
        mw = model_over.pop("mono_weights", {})
        model_over.setdefault("texture", True)
        return cfg_lib.Config(
            model=dataclasses.replace(
                cfg_lib.ModelConfig(), img_size=IMG, num_lbs=16, num_kps=15,
                symmetric=False, symmetric_texture=False,
                dtype="bfloat16", **model_over,
            ),
            mono_weights=dataclasses.replace(
                cfg_lib.MonocularLossWeights(), **mw
            ),
            train=dataclasses.replace(cfg_lib.TrainConfig(), batch_size=BATCH),
        )

    bench("full step", cfg(), template)
    bench("no texture (no LPIPS/atlas/flip)", cfg(texture=False), template)
    bench("texture, lpips wt only (tex=0)", cfg(mono_weights={"tex": 0.0}), template)
    bench("no boundaries loss", cfg(mono_weights={"boundaries": 0.0}), template)


if __name__ == "__main__":
    main()
