"""Gauge-aligned GT-camera diagnostic (eval/predictor.py).

The camera multiplex determines shape+cameras only up to a global
similarity; these tests pin that composing the Kabsch-estimated drift
into the GT cameras restores the GT projections exactly.
"""
import jax.numpy as jnp
import numpy as np

from acfm_video_3d_reconstruction_tpu.eval.predictor import (
    gauge_align_cameras, similarity_kabsch,
)
from acfm_video_3d_reconstruction_tpu.geometry import camera as cam_utils
from acfm_video_3d_reconstruction_tpu.geometry import quaternion as quat


def _rand_unit_quat(rng, n=None):
    q = rng.normal(size=(4,) if n is None else (n, 4)).astype(np.float32)
    return np.asarray(quat.quat_normalize(jnp.asarray(q)))


class TestSimilarityKabsch:
    def test_recovers_known_similarity(self):
        rng = np.random.default_rng(0)
        src = rng.normal(size=(50, 3)).astype(np.float32)
        q_d = _rand_unit_quat(rng)
        R_true = np.asarray(quat.quat_to_matrix(jnp.asarray(q_d)))
        s_true, c_true = 1.7, np.asarray([0.3, -0.2, 0.5], np.float32)
        dst = s_true * src @ R_true.T + c_true
        s, R, c = similarity_kabsch(src, dst)
        np.testing.assert_allclose(float(s), s_true, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(R), R_true, atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), c_true, atol=1e-5)
        assert float(jnp.linalg.det(R)) > 0.99

    def test_identity_when_no_drift(self):
        rng = np.random.default_rng(1)
        src = rng.normal(size=(30, 3)).astype(np.float32)
        s, R, c = similarity_kabsch(src, src)
        np.testing.assert_allclose(float(s), 1.0, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(R), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(c), 0.0, atol=1e-5)


class TestGaugeAlignCameras:
    def test_corrected_cams_restore_gt_projection(self):
        """Drifted verts + corrected GT cams == GT verts + raw GT cams."""
        rng = np.random.default_rng(2)
        template = rng.normal(size=(64, 3)).astype(np.float32)
        # learned gauge = similarity-drifted GT gauge
        q_d = _rand_unit_quat(rng)
        s_d, c_d = 0.8, np.asarray([0.1, 0.2, -0.3], np.float32)
        drifted = s_d * np.asarray(
            quat.quat_rotate(jnp.asarray(template), jnp.asarray(q_d))
        ) + c_d
        B = 6
        cams_gt = np.concatenate(
            [
                rng.uniform(0.5, 1.5, (B, 1)),
                rng.uniform(-0.3, 0.3, (B, 2)),
                _rand_unit_quat(rng, B),
            ],
            axis=-1,
        ).astype(np.float32)

        cams_corr = gauge_align_cameras(
            jnp.asarray(cams_gt), jnp.asarray(template), jnp.asarray(drifted)
        )
        want = cam_utils.project_points(
            jnp.asarray(np.tile(template[None], (B, 1, 1))), jnp.asarray(cams_gt)
        )
        got = cam_utils.project_points(
            jnp.asarray(np.tile(drifted[None], (B, 1, 1))), cams_corr
        )
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)

    def test_noop_without_drift(self):
        rng = np.random.default_rng(3)
        template = rng.normal(size=(32, 3)).astype(np.float32)
        cams_gt = np.concatenate(
            [np.ones((2, 1)), np.zeros((2, 2)), _rand_unit_quat(rng, 2)], -1
        ).astype(np.float32)
        cams_corr = gauge_align_cameras(
            jnp.asarray(cams_gt), jnp.asarray(template), jnp.asarray(template)
        )
        # quaternion sign is standardized; compare up to sign
        got = np.asarray(cams_corr)
        want = cams_gt.copy()
        flip = np.sign(np.sum(got[:, 3:] * want[:, 3:], -1, keepdims=True))
        want[:, 3:] *= flip
        np.testing.assert_allclose(got, want, atol=1e-5)
