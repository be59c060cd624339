"""ACFM-TPU: TPU-native articulated 3D reconstruction from video/images.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
``fkokkinos/acfm_video_3d_reconstruction`` (CVPR 2021, arXiv:2103.16352):
monocular and multi-frame articulated mesh reconstruction trained from 2D
supervision (masks, keypoints, optical flow, RGB) with a camera-multiplex.

Layout:
  geometry/   quaternions, cameras, icosphere, symmetry, Laplacians, geodesics
  ops/        rasterization (pure-JAX reference + Pallas TPU kernels),
              grid sampling, distance transforms, correlation (cost volume)
  models/     flax modules: ResNet-18 encoder, camera/shape/texture heads
  losses/     the full ACFM loss stack as pure functions (reduce-axis aware)
  deform/     LBS + screened-Poisson deformation solve
  multiplex/  camera-multiplex hypothesis state (cams/probs/deforms)
  flow/       MaskFlownet optical flow (frozen, jitted) + cost-volume kernel
  data/       host input pipelines (CUB / TigDog / YTVIS / COCO / synthetic)
  parallel/   device mesh + sharding helpers (pjit data parallelism over ICI)
  train/      trainers (monocular + multiframe), schedules, checkpoints
  eval/       IoU/PCK evaluators, predictor, test-time optimization
  cli/        reference-compatible entry points
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ACFM_FORCE_CPU"):
    # The hosted TPU plugin rewrites jax_platforms to "axon,cpu" at import
    # time (overriding JAX_PLATFORMS) and backend init HANGS when the TPU
    # tunnel is down — so CPU-only runs (tests, smoke runs of the parity
    # tools, subprocess CLIs) need an override that wins after plugin
    # import. jax.config.update before first backend use is the only hook.
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")
