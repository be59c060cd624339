"""Golden tests: Pallas binned rasterizer vs the pure-JAX reference."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.geometry import camera, icosphere
from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ref
from acfm_video_3d_reconstruction_tpu.ops import rasterizer_tpu as tpu

IMG = 32
INTERP = True  # interpret mode on CPU


@pytest.fixture(scope="module")
def scene():
    v, f = icosphere.icosphere(2)
    cams = jnp.asarray(
        [
            [0.9, 0.05, -0.05, 1.0, 0.0, 0.0, 0.0],
            [0.7, -0.1, 0.1, 0.9238795, 0.0, 0.3826834, 0.0],
        ]
    )
    proj = camera.orthographic_proj_withz(
        jnp.asarray(v, jnp.float32)[None].repeat(2, 0) * 0.7, cams, offset_z=5.0
    )
    return proj, jnp.asarray(f, jnp.int32)


class TestForwardParity:
    def test_soft_mask_matches_reference(self, scene):
        proj, faces = scene
        mask_ref, p2f_ref = ref.soft_silhouette(proj, faces, IMG, face_chunk=80)
        mask_tpu, p2f_tpu = tpu.soft_silhouette_tpu(
            proj, faces, IMG, 320, interpret=INTERP
        )
        np.testing.assert_allclose(
            np.asarray(mask_tpu), np.asarray(mask_ref), atol=2e-4
        )
        # pix_to_face agrees everywhere (same z ordering)
        agree = (np.asarray(p2f_tpu) == np.asarray(p2f_ref)).mean()
        assert agree > 0.999, agree

    def test_hard_matches_reference(self, scene):
        proj, faces = scene
        frags = ref.hard_rasterize(proj, faces, IMG, face_chunk=80)
        B = proj.shape[0]
        p2f_ref = np.asarray(frags.pix_to_face).reshape(B, IMG, IMG)
        out = tpu.hard_rasterize_tpu(proj, faces, IMG, 320, interpret=INTERP)
        agree = (np.asarray(out.pix_to_face) == p2f_ref).mean()
        assert agree > 0.999, agree
        bary_ref = np.asarray(frags.bary).reshape(B, IMG, IMG, 3)
        cov = p2f_ref >= 0
        np.testing.assert_allclose(
            np.asarray(out.bary)[cov], bary_ref[cov], atol=1e-4
        )


class TestBackwardParity:
    def test_grad_matches_reference(self, scene):
        proj, faces = scene
        w = jax.random.uniform(jax.random.PRNGKey(0), (2, IMG, IMG))

        def loss_ref(p):
            m, _ = ref.soft_silhouette(p, faces, IMG, face_chunk=80)
            return (m * w).sum()

        def loss_tpu(p):
            m, _ = tpu.soft_silhouette_tpu(p, faces, IMG, 320, interpret=INTERP)
            return (m * w).sum()

        g_ref = jax.grad(loss_ref)(proj)
        g_tpu = jax.grad(loss_tpu)(proj)
        np.testing.assert_allclose(
            np.asarray(g_tpu), np.asarray(g_ref), atol=2e-3, rtol=1e-2
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
