"""Component-level timing of the monocular train step on the real chip."""
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from acfm_video_3d_reconstruction_tpu.geometry import camera as cam_utils
from acfm_video_3d_reconstruction_tpu.models import build_template
from acfm_video_3d_reconstruction_tpu.models.lpips import LPIPS
from acfm_video_3d_reconstruction_tpu.models.encoder import Encoder
from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ras

B, IMG = 12, 256


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:40s} {dt * 1000:8.1f} ms")
    return dt


def main():
    template = build_template(subdivide=3, num_lbs=16, tex_size=6, num_kps=15)
    faces = jnp.asarray(template.faces)
    rng = np.random.default_rng(0)
    verts = jnp.asarray(template.verts, jnp.float32)[None].repeat(B, 0) * 0.6
    cam = jnp.tile(jnp.asarray([[0.8, 0, 0, 1, 0, 0, 0]]), (B, 1))
    proj = cam_utils.orthographic_proj_withz(verts, cam, offset_z=5.0)
    target = jnp.asarray((rng.random((B, IMG, IMG)) > 0.5).astype(np.float32))

    # 1. soft silhouette forward
    @jax.jit
    def sil_fwd(p):
        m, p2f = ras.soft_silhouette(p, faces, IMG, face_chunk=128)
        return m.sum()

    timeit("soft_silhouette fwd", sil_fwd, proj)

    # 2. soft silhouette fwd+bwd
    @jax.jit
    def sil_grad(p):
        def loss(p):
            m, _ = ras.soft_silhouette(p, faces, IMG, face_chunk=128)
            return ((m - target) ** 2).mean()
        return jax.grad(loss)(p)

    timeit("soft_silhouette fwd+bwd", sil_grad, proj)

    # 3. hard texture render fwd+bwd (grad to atlas)
    atlas = jnp.asarray(rng.random((B, template.num_faces, 6, 6, 3), np.float32))

    @jax.jit
    def tex_grad(a):
        def loss(a):
            rgb, sil, _ = ras.render_texture(proj, faces, a, IMG, face_chunk=128)
            return (rgb**2).mean()
        return jax.grad(loss)(a)

    timeit("render_texture fwd+bwd", tex_grad, atlas)

    # 4. LPIPS fwd+bwd
    lp = LPIPS()
    img = jnp.asarray(rng.random((B, IMG, IMG, 3), np.float32))
    lp_params = lp.init(jax.random.PRNGKey(0), img, img)["params"]

    @jax.jit
    def lpips_grad(x):
        def loss(x):
            return lp.apply({"params": lp_params}, x, img).mean()
        return jax.grad(loss)(x)

    timeit("LPIPS fwd+bwd", lpips_grad, img)

    # 5. encoder fwd+bwd
    enc = Encoder(nz_feat=200)
    vs = enc.init(jax.random.PRNGKey(0), img)

    @jax.jit
    def enc_grad(p):
        def loss(p):
            code, res = enc.apply({"params": p, "batch_stats": vs["batch_stats"]}, img)
            return (code**2).mean() + (res**2).mean()
        return jax.grad(loss)(p)

    timeit("encoder fwd+bwd", enc_grad, vs["params"])

    # 6. screened poisson
    from acfm_video_3d_reconstruction_tpu.deform.solve import (
        lbs_from_logits,
        screened_poisson_solve,
    )

    lbs = lbs_from_logits(jnp.asarray(template.lbs_logits))
    L = jnp.asarray(template.uniform_L)
    delta = jnp.zeros((B, 16, 3))

    @jax.jit
    def solve_grad(d):
        def loss(d):
            return screened_poisson_solve(jnp.asarray(template.verts), lbs, d, L).sum()
        return jax.grad(loss)(d)

    timeit("screened_poisson fwd+bwd", solve_grad, delta)

    # 7. boundaries loss fwd+bwd
    from acfm_video_3d_reconstruction_tpu.losses import losses as L2

    bds = jnp.asarray(rng.random((B, 1000, 3), np.float32))
    vis = jnp.ones((B, template.num_verts))

    @jax.jit
    def bds_grad(pv):
        def loss(pv):
            return L2.boundaries_loss(pv[..., :2], bds, vis)
        return jax.grad(loss)(pv)

    timeit("boundaries_loss fwd+bwd", bds_grad, proj)

    # 8. visible_vertices
    frags = ras.hard_rasterize(proj, faces, IMG, face_chunk=128)

    @jax.jit
    def vis_fn(p2f):
        return ras.visible_vertices(p2f, faces, template.num_verts)

    timeit("visible_vertices", vis_fn, frags.pix_to_face)


if __name__ == "__main__":
    main()
