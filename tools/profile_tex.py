"""Sub-profile of the texture render path on TPU."""
import sys, time

sys.path.insert(0, ".")
import jax
import jax.numpy as jnp
import numpy as np

from acfm_video_3d_reconstruction_tpu.geometry import camera as cam_utils
from acfm_video_3d_reconstruction_tpu.models import build_template
from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ras
from acfm_video_3d_reconstruction_tpu.ops import rasterizer_tpu as rtpu

B, IMG = 12, 256
template = build_template(subdivide=3, num_lbs=16, tex_size=6, num_kps=15)
faces = jnp.asarray(template.faces)
rng = np.random.default_rng(0)
verts = jnp.asarray(template.verts, jnp.float32)[None].repeat(B, 0) * 0.6
cam = jnp.tile(jnp.asarray([[0.8, 0, 0, 1, 0, 0, 0]]), (B, 1))
proj = cam_utils.orthographic_proj_withz(verts, cam, offset_z=5.0)
atlas = jnp.asarray(rng.random((B, template.num_faces, 6, 6, 3), np.float32))


def timeit(name, fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:40s} {(time.perf_counter() - t0) / n * 1000:8.1f} ms", flush=True)


@jax.jit
def hard_fwd(p):
    out = rtpu.hard_rasterize_tpu(p, faces, IMG)
    return out.pix_to_face, out.bary


timeit("hard_rasterize_tpu fwd", hard_fwd, proj)

p2f, bary = hard_fwd(proj)


@jax.jit
def atlas_fwd(a):
    rgb, cov = ras.sample_atlas(a, p2f.reshape(B, -1), bary.reshape(B, -1, 3))
    return rgb


timeit("sample_atlas fwd", atlas_fwd, atlas)


@jax.jit
def atlas_bwd(a):
    def loss(a):
        rgb, cov = ras.sample_atlas(a, p2f.reshape(B, -1), bary.reshape(B, -1, 3))
        return (rgb**2).sum()
    return jax.grad(loss)(a)


timeit("sample_atlas fwd+bwd (scatter)", atlas_bwd, atlas)


@jax.jit
def binning(p):
    tab, idx = rtpu._face_tables(p, faces, IMG, 16, 128, 192, 0.0303)
    return idx


timeit("binning (_face_tables+top_k)", binning, proj)


@jax.jit
def tex_full(a):
    def loss(a):
        rgb, sil, _ = ras.render_texture(proj, faces, a, IMG)
        return (rgb**2).sum()
    return jax.grad(loss)(a)


timeit("render_texture fwd+bwd", tex_full, atlas)
