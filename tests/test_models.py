"""Model shape/behavior tests on tiny inputs."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.models import MeshNet, build_template
from acfm_video_3d_reconstruction_tpu.models.encoder import Encoder
from acfm_video_3d_reconstruction_tpu.models.heads import CameraPredictor
from acfm_video_3d_reconstruction_tpu.models.texture import (
    TexturePredictorUV,
    atlas_image_size,
)

IMG = 64  # small image for tests: res_feats become (B, 1, 1, 256)


@pytest.fixture(scope="module")
def template():
    return build_template(subdivide=2, num_lbs=8, tex_size=2, num_kps=4)


@pytest.fixture(scope="module")
def sym_template():
    return build_template(
        subdivide=2, num_lbs=8, tex_size=2, symmetric=True, symmetric_texture=True
    )


class TestEncoder:
    def test_shapes_256(self):
        enc = Encoder(nz_feat=200)
        x = jnp.zeros((2, 256, 256, 3))
        params = enc.init(jax.random.PRNGKey(0), x)
        code, res = enc.apply(params, x)
        assert code.shape == (2, 200)
        assert res.shape == (2, 4, 4, 256)

    def test_camera_head(self):
        cp = CameraPredictor()
        res = jnp.zeros((3, 4, 4, 256))
        params = cp.init(jax.random.PRNGKey(0), res)
        cam = cp.apply(params, res)
        assert cam.shape == (3, 7)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(cam[:, 3:]), axis=1), 1.0, atol=1e-5)
        assert np.all(np.asarray(cam[:, 0]) > 0)


class TestTexture:
    def test_atlas_size_formula(self):
        assert atlas_image_size(1280, 6) == (128, 256)

    @pytest.mark.heavy
    def test_decoder_shapes(self, template):
        uv = jnp.asarray(template.uv_sampler)
        net = TexturePredictorUV(uv_sampler=uv, num_sym_faces=-1)
        res = jnp.zeros((2, 4, 8, 256))  # trainer upsamples 4x4 -> 4x8 inside
        # module takes (B, 4, 4, 256) and doubles width itself
        res = jnp.zeros((2, 4, 4, 256))
        params = net.init(jax.random.PRNGKey(0), res)
        tex = net.apply(params, res)
        F, T = uv.shape[0], uv.shape[1]
        assert tex.shape == (2, F, T, T, 3)
        assert float(tex.min()) >= 0.0 and float(tex.max()) <= 1.0

    def test_symmetric_texture_mirrors(self, sym_template):
        t = sym_template
        uv = jnp.asarray(t.uv_sampler)
        net = TexturePredictorUV(uv_sampler=uv, num_sym_faces=t.num_sym_faces)
        res = jnp.zeros((1, 4, 4, 256))
        params = net.init(jax.random.PRNGKey(0), res)
        tex = net.apply(params, res)
        assert tex.shape[1] == t.num_faces
        np.testing.assert_allclose(
            tex[:, t.num_tex_faces:], tex[:, t.num_tex_faces - t.num_sym_faces : t.num_tex_faces]
        )


class TestFoldedConv:
    """apply_conv3x3(fold=2) is an exact weight-level identity for a 3x3
    stride-1 SAME conv (space-to-depth layout, zero borders included)."""

    def test_fold2_matches_direct(self):
        import flax.linen as nn

        from acfm_video_3d_reconstruction_tpu.models.nn_blocks import (
            apply_conv3x3, conv3x3,
        )

        class Pair(nn.Module):
            @nn.compact
            def __call__(self, x):
                conv = conv3x3(5)
                return conv(x), apply_conv3x3(conv, x, fold=2)

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 12, 7))
        y_direct, y_fold = Pair().init_with_output(jax.random.PRNGKey(1), x)[0]
        np.testing.assert_allclose(
            np.asarray(y_fold), np.asarray(y_direct), atol=1e-5, rtol=1e-5
        )

    def test_fold2_param_tree_unchanged(self):
        from acfm_video_3d_reconstruction_tpu.models.nn_blocks import ResLayer2d

        x = jnp.ones((1, 8, 8, 6))
        v_plain = ResLayer2d(6).init(jax.random.PRNGKey(0), x)
        v_fold = ResLayer2d(6, fold=2).init(jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(v_plain) == (
            jax.tree_util.tree_structure(v_fold)
        )
        y_p = ResLayer2d(6).apply(v_plain, x)
        y_f = ResLayer2d(6, fold=2).apply(v_plain, x)
        np.testing.assert_allclose(
            np.asarray(y_f), np.asarray(y_p), atol=1e-5, rtol=1e-5
        )

    def test_odd_spatial_falls_back(self):
        import flax.linen as nn

        from acfm_video_3d_reconstruction_tpu.models.nn_blocks import (
            apply_conv3x3, conv3x3,
        )

        class Pair(nn.Module):
            @nn.compact
            def __call__(self, x):
                conv = conv3x3(4)
                return conv(x), apply_conv3x3(conv, x, fold=2)

        x = jax.random.normal(jax.random.PRNGKey(2), (1, 7, 9, 3))
        y_direct, y_fold = Pair().init_with_output(jax.random.PRNGKey(3), x)[0]
        np.testing.assert_array_equal(np.asarray(y_fold), np.asarray(y_direct))


class TestMeshNet:
    def test_forward_and_state(self, template):
        net = MeshNet(template=template, nz_feat=64, predict_texture=False)
        x = jnp.zeros((2, IMG, IMG, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(variables, x)
        assert out["delta_v"].shape == (2, template.num_lbs, 3)
        assert out["cam_pred"].shape == (2, 7)
        # initial handle offsets ~ 0 (tiny init)
        assert float(jnp.abs(out["delta_v"]).max()) < 1e-2

        mean_shape = net.apply(variables, method=net.get_mean_shape)
        assert mean_shape.shape == (template.num_verts, 3)
        lbs = net.apply(variables, method=net.get_lbs)
        assert lbs.shape == (template.num_lbs, template.num_verts)
        np.testing.assert_allclose(np.asarray(lbs.sum(1)), 1.0, atol=1e-5)
        v2k = net.apply(variables, method=net.get_vert2kp)
        np.testing.assert_allclose(np.asarray(v2k.sum(1)), 1.0, atol=1e-5)

    def test_symmetric_mean_shape(self, sym_template):
        net = MeshNet(template=sym_template, nz_feat=64, predict_texture=False)
        x = jnp.zeros((1, IMG, IMG, 3))
        variables = net.init(jax.random.PRNGKey(0), x)
        ms = np.asarray(net.apply(variables, method=net.get_mean_shape))
        assert ms.shape == (sym_template.num_verts, 3)
        ns = sym_template.num_sym
        np.testing.assert_allclose(ms[-ns:], ms[-2 * ns : -ns] * np.array([-1.0, 1, 1]))


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
