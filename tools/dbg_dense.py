import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from acfm_video_3d_reconstruction_tpu.geometry import camera, icosphere
from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ref
from acfm_video_3d_reconstruction_tpu.ops import rasterizer_tpu as tpu
from acfm_video_3d_reconstruction_tpu.ops.rasterizer import pixel_grid, SIGMA, BLUR_RADIUS

IMG = 32
v, f = icosphere.icosphere(2)
cams = jnp.asarray([[0.9, 0.05, -0.05, 1., 0, 0, 0],
                    [0.7, -0.1, 0.1, 0.9238795, 0., 0.3826834, 0.]])
proj = camera.orthographic_proj_withz(
    jnp.asarray(v, jnp.float32)[None].repeat(2, 0) * 0.7, cams, offset_z=5.0)
faces = jnp.asarray(f, jnp.int32)
w = jnp.ones((2, IMG, IMG))


def dense_mask_one(p):
    fv = p[faces]  # (F,3,3)
    pix = pixel_grid(IMG)  # (P,2)
    px, py = pix[:, None, 0], pix[:, None, 1]  # (P,1)
    ax, ay = fv[None, :, 0, 0], fv[None, :, 0, 1]
    bx, by = fv[None, :, 1, 0], fv[None, :, 1, 1]
    cx, cy = fv[None, :, 2, 0], fv[None, :, 2, 1]
    w0 = (bx - px) * (cy - py) - (by - py) * (cx - px)
    w1 = (cx - px) * (ay - py) - (cy - py) * (ax - px)
    w2 = (ax - px) * (by - py) - (ay - py) * (bx - px)
    area = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    denom = jnp.where(jnp.abs(area) < 1e-12, 1e-12, area)
    inside = (w0 / denom >= 0) & (w1 / denom >= 0) & (w2 / denom >= 0)

    def seg(ux, uy, vx, vy):
        ex, ey = vx - ux, vy - uy
        wx, wy = px - ux, py - uy
        ee = jnp.maximum(ex * ex + ey * ey, 1e-12)
        t = jnp.clip((wx * ex + wy * ey) / ee, 0.0, 1.0)
        dx, dy = wx - t * ex, wy - t * ey
        return dx * dx + dy * dy

    d2 = jnp.minimum(jnp.minimum(seg(ax, ay, bx, by), seg(bx, by, cx, cy)),
                     seg(cx, cy, ax, ay))
    signed = jnp.where(inside, -d2, d2)
    in_r = inside | (signed < BLUR_RADIUS)
    log1mp = jnp.where(in_r, jax.nn.log_sigmoid(signed / SIGMA), 0.0)
    return (1 - jnp.exp(log1mp.sum(-1))).reshape(IMG, IMG)


def loss_dense(p):
    return (jax.vmap(dense_mask_one)(p) * w).sum()


def loss_ref(p):
    m, _ = ref.soft_silhouette(p, faces, IMG, face_chunk=80, impl="ref")
    return (m * w).sum()


def loss_tpu(p):
    m, _ = tpu.soft_silhouette_tpu(p, faces, IMG, 320, interpret=True)
    return (m * w).sum()


gd = np.asarray(jax.grad(loss_dense)(proj))
g1 = np.asarray(jax.grad(loss_ref)(proj))
g2 = np.asarray(jax.grad(loss_tpu)(proj))
print("dense vs ref grad maxdiff", np.abs(gd - g1).max(), flush=True)
print("dense vs tpu grad maxdiff", np.abs(gd - g2).max(), flush=True)
m_dense = jax.vmap(dense_mask_one)(proj)
m_ref, _ = ref.soft_silhouette(proj, faces, IMG, face_chunk=80, impl="ref")
m_tpu, _ = tpu.soft_silhouette_tpu(proj, faces, IMG, 320, interpret=True)
print("fwd dense-ref", float(jnp.abs(m_dense - m_ref).max()),
      "fwd dense-tpu", float(jnp.abs(m_dense - m_tpu).max()), flush=True)
