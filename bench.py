"""Benchmark: fused render+loss fwd/bwd throughput at 256^2 (BASELINE.json).

Runs the flagship monocular training step (encoder -> LBS/Poisson solve ->
soft-silhouette + texture renders (orig + mirrored) -> full loss stack ->
Adam) on the real chip and reports frames/sec/chip.

Baseline note: the reference publishes no throughput numbers
(BASELINE.md). vs_baseline is computed against REFERENCE_FPS_EST = 30
frames/s — a generous estimate for the reference's PyTorch3D
forward+backward at 256^2 with faces_per_pixel=20 silhouette + texture +
LPIPS on a contemporary GPU (batch 12 at ~2.5 it/s).
"""
from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

REFERENCE_FPS_EST = 30.0

# peak dense-matmul TFLOP/s per chip by device_kind (bf16); public specs
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5e": 197.0,
    "TPU v5 lite": 197.0,
    "TPU v5p": 459.0,
    "TPU v6e": 918.0,
    "TPU v6 lite": 918.0,
}


def _peak_tflops(device) -> float | None:
    kind = getattr(device, "device_kind", "")
    for k, v in _PEAK_TFLOPS.items():
        if kind.lower().startswith(k.lower()):
            return v
    return None


def main():
    import jax

    from acfm_video_3d_reconstruction_tpu import config as cfg_lib
    from acfm_video_3d_reconstruction_tpu.models import build_template
    from acfm_video_3d_reconstruction_tpu.train import monocular

    # batch 16 is the chip's throughput sweet spot (measured 12: 279,
    # 16: 312, 24: 298 frames/s — 24 crosses into the >16-view
    # tile-sequential atlas path and loses pipelining)
    batch = 16
    img_size = 256
    template = build_template(subdivide=3, num_lbs=16, tex_size=6, num_kps=15)
    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=img_size, num_lbs=16, num_kps=15,
            texture=True, symmetric=False, symmetric_texture=False,
            dtype="bfloat16",
        ),
        train=dataclasses.replace(cfg_lib.TrainConfig(), batch_size=batch),
    )
    mods, tx, state = monocular.build(cfg, template, jax.random.PRNGKey(0))
    step = monocular.make_train_step(mods, tx, face_chunk=128)

    rng = np.random.default_rng(0)
    import jax.numpy as jnp

    bench_batch = {
        "img": jnp.asarray(rng.random((batch, img_size, img_size, 3), np.float32)),
        "mask": jnp.asarray((rng.random((batch, img_size, img_size)) > 0.5).astype(np.float32)),
        "kp": jnp.asarray(rng.random((batch, 15, 3), np.float32)),
        "sfm_pose": jnp.asarray(
            np.tile(np.asarray([0.8, 0, 0, 1, 0, 0, 0], np.float32), (batch, 1))
        ),
        "edt": jnp.asarray(rng.random((batch, img_size, img_size), np.float32)),
        "boundaries": jnp.asarray(rng.random((batch, 1000, 3), np.float32)),
    }

    # compile + warmup; keep the compiled step for its XLA cost analysis
    compiled = step.lower(state, bench_batch).compile()
    state, metrics = step(state, bench_batch)
    jax.block_until_ready(metrics["total_loss"])

    n_steps = 10
    t0 = time.perf_counter()
    for _ in range(n_steps):
        state, metrics = step(state, bench_batch)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0

    fps = batch * n_steps / dt
    result = {
        "metric": "frames/sec/chip render+loss fwd/bwd 256^2",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / REFERENCE_FPS_EST, 3),
    }
    # MFU: XLA-counted FLOPs per step / wall step time / chip peak.
    # Note Pallas kernels are opaque to XLA's flop counter, so this counts
    # the matmul/conv/elementwise graph only — a (slight) underestimate.
    try:
        cost = compiled.cost_analysis()
        cost = cost[0] if isinstance(cost, (list, tuple)) else cost
        flops = float(cost.get("flops", 0.0))
        peak = _peak_tflops(jax.devices()[0])
        if flops > 0 and peak:
            mfu = flops / (dt / n_steps) / (peak * 1e12)
            result["mfu"] = round(mfu, 4)
            result["flops_per_step"] = flops
            result["device_kind"] = jax.devices()[0].device_kind
    except Exception:
        pass
    print(json.dumps(result))


if __name__ == "__main__":
    main()
