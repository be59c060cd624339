"""Eval metrics, checkpoint roundtrip, TTO improvement test."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu import config as cfg_lib
from acfm_video_3d_reconstruction_tpu.eval import metrics as em
from acfm_video_3d_reconstruction_tpu.eval.predictor import TTOConfig, make_tto_step_fn
from acfm_video_3d_reconstruction_tpu.models import build_template
from acfm_video_3d_reconstruction_tpu.train import checkpoints


class TestMetrics:
    def test_mask_iou(self):
        a = np.zeros((2, 4, 4), np.float32)
        a[:, :2] = 1
        np.testing.assert_allclose(em.mask_iou(a, a), 1.0)
        b = np.ones((2, 4, 4), np.float32)
        np.testing.assert_allclose(em.mask_iou(a, b), 0.5)

    def test_kp_errors_scaling(self):
        kp_gt = np.zeros((1, 2, 3))
        kp_gt[..., 2] = 1
        kp_pred = np.zeros((1, 2, 2))
        kp_pred[0, 0, 0] = 0.2
        err, vis = em.kp_errors(kp_pred, kp_gt, padding_frac=0.05)
        np.testing.assert_allclose(err[0, 0], 0.2 * 1.1 / 2.0, atol=1e-6)
        np.testing.assert_allclose(vis, 1.0)

    def test_bench_stats_aggregation(self):
        stats = em.BenchStats()
        stats.update(np.asarray([0.5, 0.7]), np.asarray([[0.05], [0.2]]),
                     np.asarray([[1.0], [1.0]]))
        r = stats.results()
        assert r["mean_iou"] == pytest.approx(0.6)
        assert r["pck_0.1"] == pytest.approx(0.5)
        assert r["pck_0.15"] == pytest.approx(0.5)

    def test_never_visible_kp_columns_deleted(self):
        """Reference parity (multiframe/benchmark/evaluate.py:236-243):
        kp columns with zero total visibility are DELETED before the
        per-column PCK average, not kept as zeros."""
        stats = em.BenchStats()
        # 3 samples, 3 kps; kp 2 never visible; kp 0 always correct at 0.1;
        # kp 1 correct on 1 of 2 visible samples.
        errs = np.asarray([[0.05, 0.05, 0.0],
                           [0.05, 0.50, 0.0],
                           [0.05, 0.05, 0.0]])
        vis = np.asarray([[1.0, 1.0, 0.0],
                          [1.0, 1.0, 0.0],
                          [1.0, 0.0, 0.0]])
        stats.update(np.asarray([1.0, 1.0, 1.0]), errs, vis)
        r = stats.results()
        # reference aggregation on the same fixture
        n_vis = vis.sum(0)
        nc1 = ((errs < 0.1) * vis).sum(0)
        nc15 = ((errs < 0.15) * vis).sum(0)
        remove = [i for i, v in enumerate(n_vis) if v == 0]
        n_vis = np.delete(n_vis, remove)
        ref1 = (np.delete(nc1, remove) / n_vis).mean()
        ref15 = (np.delete(nc15, remove) / n_vis).mean()
        assert r["pck_0.1"] == pytest.approx(ref1)  # (3/3 + 1/2)/2 = 0.75
        assert r["pck_0.15"] == pytest.approx(ref15)
        assert r["pck_0.1"] == pytest.approx(0.75)

    def test_monocular_evaluator_aggregation_same_fixture(self):
        """The monocular evaluator path (kp_errors -> BenchStats) is pinned
        by the same fixture as the multiframe one: it matches the reference
        monocular aggregation (monocular/evaluate.py:95-104) wherever that
        formula is defined (every kp visible somewhere, incl. a
        partially-visible column), and unlike it stays finite when a column
        is never visible (where the reference would print NaN)."""
        # 3 samples, 3 kps in [-1,1] coords; kp 1 partially visible.
        kp_gt = np.zeros((3, 3, 3))
        kp_gt[..., 2] = np.asarray([[1.0, 1.0, 1.0],
                                    [1.0, 0.0, 1.0],
                                    [1.0, 1.0, 1.0]])
        kp_pred = np.zeros((3, 3, 2))
        kp_pred[:, 0, 0] = 0.1   # err 0.055 -> correct at 0.1
        kp_pred[:, 1, 0] = 0.25  # err 0.1375 -> correct only at 0.15
        kp_pred[:, 2, 0] = 0.5   # err 0.275 -> never correct
        errs, vis = em.kp_errors(kp_pred, kp_gt, padding_frac=0.05)
        stats = em.BenchStats()
        stats.update(np.ones(3), errs, vis)
        r = stats.results()
        # literal reference monocular formula (evaluate.py:96-104)
        n_vis_p = np.sum(vis, axis=0)
        pck1_ref = (np.sum((errs < 0.1) * vis, axis=0) / n_vis_p).mean()
        pck15_ref = (np.sum((errs < 0.15) * vis, axis=0) / n_vis_p).mean()
        assert r["pck_0.1"] == pytest.approx(pck1_ref)
        assert r["pck_0.15"] == pytest.approx(pck15_ref)
        assert r["pck_0.1"] == pytest.approx(1.0 / 3.0)
        assert r["pck_0.15"] == pytest.approx(2.0 / 3.0)
        # never-visible column: reference monocular formula divides by zero;
        # ours deletes the column (multiframe semantics) and stays finite
        vis2 = vis.copy()
        vis2[:, 2] = 0.0
        stats2 = em.BenchStats()
        stats2.update(np.ones(3), errs, vis2)
        r2 = stats2.results()
        assert np.isfinite(r2["pck_0.1"]) and np.isfinite(r2["pck_0.15"])
        assert r2["pck_0.1"] == pytest.approx(0.5)

    def test_save_results_mat(self, tmp_path):
        """--save_mat writes a scipy-readable results.mat with the
        reference's bench_stats keys (benchmark/evaluate.py:225)."""
        import scipy.io as sio

        stats = em.BenchStats()
        stats.update(np.asarray([0.5]), np.asarray([[0.05, 0.2]]),
                     np.asarray([[1.0, 1.0]]))
        stats.save(str(tmp_path), save_mat=True)
        mat = sio.loadmat(str(tmp_path / "results.mat"))
        np.testing.assert_allclose(mat["ious"].ravel(), [0.5])
        np.testing.assert_allclose(mat["kp_errs"], [[0.05, 0.2]])
        np.testing.assert_allclose(mat["kp_vis"], [[1.0, 1.0]])
        npz = np.load(str(tmp_path / "results.npz"))
        np.testing.assert_allclose(npz["ious"], [0.5])


class TestCheckpoint:
    def test_roundtrip(self, tmp_path):
        state = {
            "params": {"w": jnp.arange(6.0).reshape(2, 3)},
            "step": jnp.asarray(7, jnp.int32),
        }
        checkpoints.save(str(tmp_path), "exp", "latest", state)
        assert checkpoints.exists(str(tmp_path), "exp", "latest")
        zero = jax.tree_util.tree_map(jnp.zeros_like, state)
        restored = checkpoints.restore(str(tmp_path), "exp", "latest", zero)
        np.testing.assert_allclose(restored["params"]["w"], state["params"]["w"])
        assert int(restored["step"]) == 7


class TestTTO:
    @pytest.mark.heavy
    def test_tto_reduces_loss(self):
        """TTO on delta_v_res should reduce the silhouette loss vs a shifted
        GT mask rendered from a known deformed template."""
        template = build_template(subdivide=1, num_lbs=6, tex_size=2, num_kps=0)
        cfg = cfg_lib.Config(
            model=dataclasses.replace(
                cfg_lib.ModelConfig(), img_size=32, num_lbs=6, num_kps=0,
                texture=False, symmetric=False, symmetric_texture=False,
            ),
            train=dataclasses.replace(cfg_lib.TrainConfig(), offset_z=0.0),
        )

        import types

        mods = types.SimpleNamespace(template=template, cfg=cfg)

        from acfm_video_3d_reconstruction_tpu.deform.solve import lbs_from_logits
        from acfm_video_3d_reconstruction_tpu.geometry import camera as cam_utils
        from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ras

        mean_shape = jnp.asarray(template.verts) * 0.5
        lbs = lbs_from_logits(jnp.asarray(template.lbs_logits))
        cam = jnp.tile(jnp.asarray([[1.0, 0, 0, 1, 0, 0, 0]]), (2, 1))

        # GT: template deformed by a known handle offset
        rng = np.random.default_rng(0)
        gt_delta = jnp.asarray(rng.normal(size=(2, 6, 3)) * 0.1, jnp.float32)
        from acfm_video_3d_reconstruction_tpu.geometry.mesh_ops import cot_laplacian
        from acfm_video_3d_reconstruction_tpu.deform.solve import screened_poisson_solve

        faces = jnp.asarray(template.faces)
        Lc = cot_laplacian(mean_shape, faces)
        gt_v = screened_poisson_solve(mean_shape, lbs, gt_delta, Lc)
        proj = cam_utils.orthographic_proj_withz(gt_v, cam, offset_z=0.0)
        gt_mask, _ = ras.soft_silhouette(proj, faces, 32, face_chunk=80)
        gt_mask = (gt_mask > 0.5).astype(jnp.float32)

        batch = {
            "mask": gt_mask,
            "edt": jnp.zeros((2, 32, 32)),
            "boundaries": jnp.zeros((2, 8, 3)),
        }
        tto = TTOConfig(num_iter=30, lr=2e-2, of_wt=0.0, edt_wt=0.0, bdt_wt=0.0)
        fn = make_tto_step_fn(mods, tto, num_frames=1, face_chunk=80)
        delta0 = jnp.zeros((2, 6, 3))
        pred_v, cam_out, final_loss = fn(mean_shape, lbs, delta0, cam, batch)

        # initial loss with zero deformation
        proj0 = cam_utils.orthographic_proj_withz(
            screened_poisson_solve(mean_shape, lbs, delta0, Lc), cam, offset_z=0.0
        )
        m0, _ = ras.soft_silhouette(proj0, faces, 32, face_chunk=80)
        init_loss = float(jnp.abs(m0 - gt_mask).mean())
        assert float(final_loss) < init_loss, (float(final_loss), init_loss)

        # camera-in-the-loop TTO must return a DECODED camera: quat_rotate
        # scales by |q|^2, so an unnormalized Adam iterate silently
        # mis-scales every downstream projection (the round-4 PCK-collapse
        # bug; reference normalizes in-loop, predictor.py:307-309)
        tto_cam = TTOConfig(num_iter=30, lr=2e-2, of_wt=0.0, edt_wt=0.0,
                            bdt_wt=0.0, optimize_camera=True)
        fn_cam = make_tto_step_fn(mods, tto_cam, num_frames=1, face_chunk=80)
        _, cam_out2, loss2 = fn_cam(mean_shape, lbs, delta0, cam, batch)
        qn = np.linalg.norm(np.asarray(cam_out2[:, 3:7]), axis=-1)
        np.testing.assert_allclose(qn, 1.0, atol=1e-5)
        assert float(loss2) < init_loss

        # trace mode: scan-based loop returns per-iteration diagnostics and
        # the same-shape outputs
        v2kp = jnp.ones((2, mean_shape.shape[0]), jnp.float32) / mean_shape.shape[0]
        fn_tr = make_tto_step_fn(mods, tto_cam, num_frames=1, face_chunk=80,
                                 trace_vert2kp=v2kp)
        pv, cam_tr, loss_tr, trace = fn_tr(mean_shape, lbs, delta0, cam, batch)
        assert trace["loss"].shape == (30,)
        assert trace["iou"].shape == (30, 2)
        assert trace["kp_pred"].shape == (30, 2, 2, 2)
        assert trace["cam"].shape == (30, 2, 7)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(trace["cam"][..., 3:7]), axis=-1), 1.0,
            atol=1e-5)
        np.testing.assert_allclose(np.asarray(cam_tr), np.asarray(cam_out2),
                                   atol=1e-5)


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
