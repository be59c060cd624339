"""Rasterizer correctness: coverage vs analytic shapes, gradient checks."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.geometry import camera, icosphere
from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ras
from acfm_video_3d_reconstruction_tpu.ops.grid_sample import grid_sample

IMG = 32


def square_mesh(half=0.5, z=2.0):
    """Two triangles covering [-half, half]^2 at depth z."""
    verts = jnp.asarray(
        [
            [-half, -half, z],
            [half, -half, z],
            [half, half, z],
            [-half, half, z],
        ]
    )
    faces = jnp.asarray([[0, 1, 2], [0, 2, 3]], dtype=jnp.int32)
    return verts[None], faces


class TestSilhouette:
    def test_square_coverage(self):
        verts, faces = square_mesh(0.5)
        mask, p2f = ras.soft_silhouette(verts, faces, IMG, face_chunk=2)
        mask = np.asarray(mask[0])
        # interior pixels ~1, far exterior ~0. (The exact image center sits
        # on the shared diagonal edge -> prob 0.75; probe off-diagonal.)
        assert mask[IMG // 2, IMG // 4] > 0.99
        assert mask[1, 1] < 0.01
        # analytic area fraction of the square = 0.25 of the image
        frac = mask.sum() / (IMG * IMG)
        assert abs(frac - 0.25) < 0.03
        p2f = np.asarray(p2f[0])
        assert p2f[IMG // 2, IMG // 2] >= 0
        assert p2f[1, 1] == -1

    def test_depth_ordering(self):
        # two overlapping squares; nearer one must win pix_to_face
        v1, f1 = square_mesh(0.5, z=2.0)
        v2, _ = square_mesh(0.3, z=1.0)  # closer
        verts = jnp.concatenate([v1, v2], axis=1)
        faces = jnp.concatenate([f1, f1 + 4], axis=0)
        _, p2f = ras.soft_silhouette(verts, faces, IMG, face_chunk=4)
        center = int(np.asarray(p2f[0])[IMG // 2, IMG // 2])
        assert center >= 2  # face of the closer square

    def test_mask_gradient_nonzero_and_finite(self):
        verts, faces = square_mesh(0.5)

        def loss(v):
            mask, _ = ras.soft_silhouette(v, faces, IMG, face_chunk=2)
            target = jnp.zeros_like(mask)
            return ((mask - target) ** 2).mean()

        g = jax.grad(loss)(verts)
        assert np.all(np.isfinite(np.asarray(g)))
        assert np.abs(np.asarray(g)).max() > 0

    def test_gradient_matches_finite_difference(self):
        verts, faces = square_mesh(0.42)

        def loss(v):
            mask, _ = ras.soft_silhouette(v, faces, IMG, face_chunk=2)
            # weight by a fixed random image so the gradient probes geometry
            w = jax.random.uniform(jax.random.PRNGKey(0), mask.shape)
            return (mask * w).sum()

        g = jax.grad(loss)(verts)
        eps = 1e-3
        rng = np.random.default_rng(0)
        for _ in range(4):
            i = rng.integers(0, 4)
            j = rng.integers(0, 2)  # x or y only (z has ~no effect here)
            dv = np.zeros(verts.shape)
            dv[0, i, j] = eps
            f1 = float(loss(verts + dv))
            f0 = float(loss(verts - dv))
            fd = (f1 - f0) / (2 * eps)
            an = float(np.asarray(g)[0, i, j])
            assert abs(fd - an) < 0.05 * max(1.0, abs(fd)), (fd, an)

    def test_icosphere_render(self):
        v, f = icosphere.icosphere(2)
        cam = jnp.asarray([[1.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]])
        proj = camera.orthographic_proj_withz(jnp.asarray(v)[None] * 0.6, cam, offset_z=5.0)
        mask, p2f = ras.soft_silhouette(proj, jnp.asarray(f, jnp.int32), IMG, face_chunk=80)
        mask = np.asarray(mask[0])
        # disc of radius 0.6 in [-1,1]^2: area fraction = pi*0.36/4 ≈ 0.283
        frac = mask.sum() / (IMG * IMG)
        assert abs(frac - np.pi * 0.36 / 4) < 0.03


class TestHardTexture:
    def test_atlas_colors(self):
        verts, faces = square_mesh(0.5)
        atlas = jnp.zeros((1, 2, 4, 4, 3))
        atlas = atlas.at[0, 0].set(jnp.asarray([1.0, 0, 0]))
        atlas = atlas.at[0, 1].set(jnp.asarray([0, 1.0, 0]))
        rgb, sil, p2f = ras.render_texture(verts, faces, atlas, IMG, face_chunk=2)
        rgb, sil = np.asarray(rgb[0]), np.asarray(sil[0])
        assert sil[IMG // 2, IMG // 2] == 1.0
        assert sil[0, 0] == 0.0
        inside = sil > 0
        # all covered pixels are pure red or pure green
        cols = rgb[inside]
        assert np.all((cols == [1, 0, 0]).all(1) | (cols == [0, 1, 0]).all(1))
        # both triangles visible
        assert (cols == [1, 0, 0]).all(1).any() and (cols == [0, 1, 0]).all(1).any()

    def test_atlas_gradient_flows(self):
        verts, faces = square_mesh(0.5)

        def loss(atlas):
            rgb, _, _ = ras.render_texture(verts, faces, atlas, IMG, face_chunk=2)
            return (rgb**2).sum()

        atlas = jnp.ones((1, 2, 4, 4, 3)) * 0.5
        g = jax.grad(loss)(atlas)
        assert np.abs(np.asarray(g)).sum() > 0

    def test_visible_vertices(self):
        v1, f1 = square_mesh(0.5, z=2.0)
        v2, _ = square_mesh(0.5, z=1.0)  # fully occludes the first
        verts = jnp.concatenate([v1, v2], axis=1)
        faces = jnp.concatenate([f1, f1 + 4], axis=0)
        frags = ras.hard_rasterize(verts, faces, IMG, face_chunk=4)
        vis = np.asarray(ras.visible_vertices(frags.pix_to_face, faces, 8))
        assert vis.shape == (1, 8)
        assert np.all(vis[0, 4:] == 1)  # near square visible
        assert np.all(vis[0, :4] == 0)  # far square occluded


class TestGridSample:
    def test_bilinear_align_corners_identity(self):
        rng = np.random.default_rng(0)
        img = jnp.asarray(rng.normal(size=(1, 5, 7, 3)))
        # grid hitting exact pixel centers (align_corners=True)
        ys, xs = jnp.meshgrid(
            jnp.linspace(-1, 1, 5), jnp.linspace(-1, 1, 7), indexing="ij"
        )
        grid = jnp.stack([xs, ys], axis=-1)[None]
        out = grid_sample(img, grid, align_corners=True)
        np.testing.assert_allclose(out, img, atol=1e-6)

    def test_zeros_padding(self):
        img = jnp.ones((1, 4, 4, 1))
        grid = jnp.asarray([[[-3.0, -3.0]]])  # far outside
        out = grid_sample(img, grid, align_corners=True, padding_mode="zeros")
        np.testing.assert_allclose(out, 0.0)

    def test_border_padding(self):
        img = jnp.ones((1, 4, 4, 1)) * 7.0
        grid = jnp.asarray([[[-3.0, -3.0]]])
        out = grid_sample(img, grid, align_corners=True, padding_mode="border")
        np.testing.assert_allclose(out, 7.0)

    def test_matches_torch(self):
        torch = pytest.importorskip("torch")
        rng = np.random.default_rng(1)
        img = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)  # NCHW for torch
        grid = (rng.uniform(-1.2, 1.2, size=(2, 5, 5, 2))).astype(np.float32)
        for ac in (True, False):
            for pad in ("zeros", "border"):
                t = torch.nn.functional.grid_sample(
                    torch.from_numpy(img), torch.from_numpy(grid),
                    mode="bilinear", padding_mode=pad, align_corners=ac,
                ).numpy()  # (2, 4, 5, 5)
                j = grid_sample(
                    jnp.asarray(np.moveaxis(img, 1, -1)), jnp.asarray(grid),
                    mode="bilinear", padding_mode=pad, align_corners=ac,
                )  # (2, 5, 5, 4)
                np.testing.assert_allclose(
                    np.moveaxis(np.asarray(j), -1, 1), t, atol=2e-5,
                )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
