import os, sys
os.environ['JAX_PLATFORMS'] = 'cpu'
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
from acfm_video_3d_reconstruction_tpu.geometry import camera, icosphere
from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ref
from acfm_video_3d_reconstruction_tpu.ops import rasterizer_tpu as tpu

IMG = 8
v, f = icosphere.icosahedron()
proj = camera.orthographic_proj_withz(
    jnp.asarray(v, jnp.float32)[None] * 0.7,
    jnp.asarray([[0.9, 0.05, -0.05, 1.0, 0, 0, 0]]), offset_z=5.0)
faces = jnp.asarray(f, jnp.int32)


def loss_ref(p, w):
    m, _ = ref.soft_silhouette(p, faces, IMG, face_chunk=20, impl="ref")
    return (m * w).sum()


def loss_tpu(p, w):
    m, _ = tpu.soft_silhouette_tpu(p, faces, IMG, 20, interpret=True)
    return (m * w).sum()


m1, _ = ref.soft_silhouette(proj, faces, IMG, face_chunk=20, impl="ref")
m2, _ = tpu.soft_silhouette_tpu(proj, faces, IMG, 20, interpret=True)
print("fwd diff", float(jnp.abs(m1 - m2).max()), flush=True)
w1 = jnp.ones((1, IMG, IMG))
g_ref = jax.grad(loss_ref)(proj, w1)
g_tpu = jax.grad(loss_tpu)(proj, w1)
d = np.abs(np.asarray(g_ref) - np.asarray(g_tpu))
print("uniform w maxdiff", d.max(), "refmax", np.abs(np.asarray(g_ref)).max(), flush=True)
i = np.unravel_index(d.argmax(), d.shape)
print("at", i, "ref", np.asarray(g_ref)[i], "tpu", np.asarray(g_tpu)[i], flush=True)
eps = 1e-4
dv = np.zeros(proj.shape, np.float32)
dv[i] = eps
fd = (float(loss_ref(proj + dv, w1)) - float(loss_ref(proj - dv, w1))) / (2 * eps)
print("fd", fd, flush=True)
