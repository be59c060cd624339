"""SfM factorization and flow-IO tests."""
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.flow import flowlib
from acfm_video_3d_reconstruction_tpu.flow.losses import epe_loss, epe_loss_with_mask
from acfm_video_3d_reconstruction_tpu.tools import sfm_init


class TestSfM:
    def make_scene(self, N=20, K=12, seed=0, missing=0.2):
        rng = np.random.default_rng(seed)
        S = rng.normal(size=(3, K))
        S -= S.mean(1, keepdims=True)
        kps = np.zeros((N, K, 2))
        vis = (rng.random((N, K)) > missing).astype(np.float64)
        scales = rng.uniform(0.5, 1.5, N)
        trans = rng.normal(size=(N, 2)) * 10
        for i in range(N):
            ang = rng.uniform(0, 2 * np.pi)
            axis = rng.normal(size=3)
            axis /= np.linalg.norm(axis)
            Kx = np.array([[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]],
                           [-axis[1], axis[0], 0]])
            R = np.eye(3) + np.sin(ang) * Kx + (1 - np.cos(ang)) * Kx @ Kx
            kps[i] = scales[i] * (R @ S)[:2].T + trans[i]
        return kps, vis, S

    def test_factorization_recovers_projection(self):
        kps, vis, S_true = self.make_scene()
        s, t, R, S = sfm_init.rigid_factorization(kps, vis, n_iter=60)
        err = sfm_init.reproj_error(kps, vis, s, t, R, S)
        # scene scale ~ O(1); reprojection should be recovered well
        assert err < 0.05, err

    def test_rotations_valid(self):
        kps, vis, _ = self.make_scene(seed=1)
        _, _, R, _ = sfm_init.rigid_factorization(kps, vis, n_iter=40)
        for Ri in R:
            np.testing.assert_allclose(Ri @ Ri.T, np.eye(3), atol=1e-5)
            assert np.linalg.det(Ri) > 0.9

    def test_align_model(self):
        _, _, S = self.make_scene(seed=2)
        Sa, R = sfm_init.align_sfm_model(S)
        np.testing.assert_allclose(Sa.mean(1), 0.0, atol=1e-9)
        assert abs(np.abs(Sa).max() - 1.0) < 1e-9

    def test_mask_chamfer_zero_inside(self):
        """bwdist semantics: distance 0 inside the mask, >0 outside;
        clamp displacement is added for out-of-image points."""
        from scipy.ndimage import distance_transform_edt

        mask = np.zeros((32, 32))
        mask[8:24, 8:24] = 1.0
        md = distance_transform_edt(~(mask > 0))
        inside = np.array([[10.0, 15.0], [10.0, 20.0]])  # (2, M) xy
        assert sfm_init.mask_chamfer(md, inside) == 0.0
        outside = np.array([[2.0], [2.0]])
        assert sfm_init.mask_chamfer(md, outside) > 0.0
        # out-of-image point: clamp displacement (squared) is included
        off = np.array([[40.0], [16.0]])  # clamps x to 31
        assert sfm_init.mask_chamfer(md, off) >= (40.0 - 31.0) ** 2

    def test_refine_camera_mask_recovers_perturbed_camera(self):
        """Synthetic scene: GT camera renders all kps inside a splatted
        mask; half the kps are hidden (NaN). A perturbed init must refine
        back so visible-kp error drops and hidden projections land inside
        the mask (reprojMaskMinimize.m objective)."""
        rng = np.random.default_rng(3)
        K = 10
        S = rng.normal(size=(3, K))
        S -= S.mean(1, keepdims=True)
        S /= np.abs(S).max()
        ang = 0.4
        R_gt = np.array([
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1.0],
        ])
        c_gt, t_gt = 12.0, np.array([32.0, 32.0])
        proj = c_gt * (R_gt @ S)[:2] + t_gt[:, None]  # (2, K)

        # splat a generous disk around every projected kp -> mask
        mask = np.zeros((64, 64))
        yy, xx = np.mgrid[:64, :64]
        for k in range(K):
            mask[(xx - proj[0, k]) ** 2 + (yy - proj[1, k]) ** 2 < 36] = 1.0

        P = proj.copy()
        P[:, K // 2:] = np.nan  # hide half the keypoints

        dang = 0.25
        dR = np.array([
            [np.cos(dang), -np.sin(dang), 0],
            [np.sin(dang), np.cos(dang), 0],
            [0, 0, 1.0],
        ])
        c0, R0, t0 = c_gt * 1.3, dR @ R_gt, t_gt + np.array([5.0, -4.0])

        def vis_err(c, R, t):
            pr = c * (R[:2] @ S[:, : K // 2]) + t[:, None]
            return np.abs(pr - proj[:, : K // 2]).max()

        c, R, t, err = sfm_init.refine_camera_mask(P, S, mask, c0, R0, t0)
        assert vis_err(c, R, t) < 0.05 < vis_err(c0, R0, t0)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
        # hidden kps project inside the mask (chamfer ~ 0)
        from scipy.ndimage import distance_transform_edt

        md = distance_transform_edt(~(mask > 0))
        hidden = c * (R[:2] @ S[:, K // 2:]) + t[:, None]
        assert sfm_init.mask_chamfer(md, hidden) < 1.0
        assert err < 1.0


class TestFlowIO:
    def test_flo_roundtrip(self, tmp_path):
        flow = np.random.default_rng(0).normal(size=(6, 9, 2)).astype(np.float32)
        p = str(tmp_path / "a.flo")
        flowlib.write_flo(p, flow)
        back = flowlib.read_flo(p)
        np.testing.assert_array_equal(back, flow)

    def test_flow_to_image(self):
        flow = np.zeros((8, 8, 2), np.float32)
        flow[..., 0] = 3.0
        img = flowlib.flow_to_image(flow)
        assert img.shape == (8, 8, 3) and img.dtype == np.uint8

    def test_epe(self):
        import jax.numpy as jnp

        a = jnp.zeros((2, 4, 4, 2))
        b = jnp.ones((2, 4, 4, 2))
        np.testing.assert_allclose(epe_loss(a, b), np.sqrt(2.0), rtol=1e-6)
        m = jnp.zeros((2, 4, 4)).at[:, 0].set(1.0)
        np.testing.assert_allclose(
            epe_loss_with_mask(a, b, m), np.sqrt(2.0), rtol=1e-3
        )


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
