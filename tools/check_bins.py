"""Measure per-tile face overlap counts for the bench scene (K sizing)."""
import os, sys

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax.numpy as jnp

from acfm_video_3d_reconstruction_tpu.geometry import camera, icosphere
from acfm_video_3d_reconstruction_tpu.ops import rasterizer_tpu as tpu

IMG = 256
v, f = icosphere.icosphere(3)
proj = camera.orthographic_proj_withz(
    jnp.asarray(v, jnp.float32)[None] * 0.8,
    jnp.asarray([[0.9, 0.0, 0.0, 1.0, 0, 0, 0]]), offset_z=5.0)
lay = tpu._pick_layout(IMG)
print("bins:", lay)
tab, idx = tpu._face_tables(jnp.asarray(proj), jnp.asarray(f, jnp.int32),
                            IMG, lay.bh, lay.bw, 1280, 0.0303)
counts = np.asarray((idx >= 0).sum(-1))
print("per-tile face counts: max", counts.max(), "p95",
      np.percentile(counts, 95), "mean", counts.mean())
