"""Visualization helpers, kp splits, pascal utils, schedules."""
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.data.kp_splits import get_kp_splits
from acfm_video_3d_reconstruction_tpu.data.pascal import as_clip, sample_contour_points
from acfm_video_3d_reconstruction_tpu.geometry import icosphere
from acfm_video_3d_reconstruction_tpu.train import schedules
from acfm_video_3d_reconstruction_tpu.utils import vis


class TestVis:
    def test_kp2im_marks_pixels(self):
        img = np.zeros((32, 32, 3), np.float32)
        kps = np.asarray([[0.0, 0.0, 1.0], [-0.9, -0.9, 0.0]])
        out = vis.kp2im(kps, img)
        assert out[16, 16].sum() > 0          # visible kp drawn
        assert out[1, 1].sum() == 0           # invisible kp skipped

    def test_vis_renderer_default_texture(self):
        v, f = icosphere.icosphere(1)
        r = vis.VisRenderer(32, f)
        img = r(v * 0.5, np.asarray([0.9, 0, 0, 1, 0, 0, 0]))
        assert img.shape == (32, 32, 3)
        # background white, object blue-ish
        assert img[0, 0].tolist() == [255, 255, 255]
        center = img[16, 16]
        assert center[2] >= center[0]

    def test_panel(self):
        a = np.zeros((8, 4, 3), np.uint8)
        b = np.ones((8, 6, 3), np.uint8)
        p = vis.make_panel([a, b])
        assert p.shape == (8, 10, 3)


class TestKpSplits:
    def test_quadruped(self):
        names = [
            "L_Eye", "R_Eye", "L_EarBase", "R_EarBase", "Nose", "Throat",
            "TailBase", "Withers", "L_F_Elbow", "R_F_Elbow", "L_B_Elbow",
            "R_B_Elbow", "L_F_Paw", "R_F_Paw", "L_B_Paw", "R_B_Paw",
        ]
        splits = get_kp_splits(names, "horse")
        assert len(splits["leg"]) == 8
        assert len(splits["head"]) == 5
        assert len(splits["torso"]) == 3

    def test_unknown_category(self):
        assert get_kp_splits(["a"], "spaceship") == {}


class TestPascal:
    def test_as_clip_contract(self):
        s = {
            "img": np.zeros((16, 16, 3), np.float32),
            "mask": np.zeros((16, 16), np.float32),
            "kp": np.zeros((5, 3), np.float32),
            "sfm_pose": np.asarray([1, 0, 0, 1, 0, 0, 0], np.float32),
            "inds": 3,
        }
        clip = as_clip(s, 2)
        assert clip["img"].shape == (2, 16, 16, 3)
        assert clip["optical_flows"].shape == (2, 16, 16, 2)
        assert clip["frames_idx"].tolist() == [3, 3]

    def test_contour_points(self):
        m = np.zeros((32, 32))
        m[8:24, 8:24] = 1
        pts = sample_contour_points(m, 64)
        assert pts.shape == (64, 2)
        # points lie on the square boundary
        on_edge = (
            (np.isclose(pts[:, 0], 8) | np.isclose(pts[:, 0], 23)
             | np.isclose(pts[:, 1], 8) | np.isclose(pts[:, 1], 23))
        )
        assert on_edge.mean() > 0.9


class TestSchedules:
    def test_num_guesses_drop(self):
        f = lambda e: schedules.num_guesses_at(e, 8, True, False)  # noqa
        assert f(10) == 8 and f(50) == 4 and f(150) == 2

    def test_no_drop_with_gtpose(self):
        assert schedules.num_guesses_at(200, 8, True, True) == 8

    def test_finetune_camera(self):
        assert schedules.use_gtpose_at(29, True, True) is True
        assert schedules.use_gtpose_at(30, True, True) is False


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


class TestTrainingVisPanels:
    @pytest.mark.heavy
    def test_multiframe_vis_fn_writes_png(self, tmp_path):
        """display_freq panels: the driver's vis hook writes PNG files
        (visdom replacement, reference multiframe/main.py:775-855)."""
        import dataclasses

        import jax
        import jax.numpy as jnp

        from acfm_video_3d_reconstruction_tpu import config as cfg_lib
        from acfm_video_3d_reconstruction_tpu.data.synthetic import (
            SyntheticConfig, SyntheticDataset, preprocess_batch,
        )
        from acfm_video_3d_reconstruction_tpu.models import build_template
        from acfm_video_3d_reconstruction_tpu.train import multiframe as mf
        from acfm_video_3d_reconstruction_tpu.train import visualize

        template = build_template(subdivide=1, num_lbs=6, tex_size=2, num_kps=0)
        cfg = cfg_lib.Config(
            model=dataclasses.replace(
                cfg_lib.ModelConfig(), img_size=64, nz_feat=32, num_lbs=6,
                num_kps=0, tex_size=2, texture=False, symmetric=False,
                symmetric_texture=False,
            ),
            train=dataclasses.replace(
                cfg_lib.TrainConfig(), batch_size=1, num_frames=2, offset_z=0.0
            ),
        )
        mods, _, state = mf.build(cfg, template, 4, jax.random.PRNGKey(0))
        ds = SyntheticDataset(
            template,
            SyntheticConfig(num_frames_total=4, clip_len=2, image_size=64, num_kps=3),
        )
        batch = preprocess_batch(ds.get_batch(np.asarray([0])), 64)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        vis_fn = visualize.make_multiframe_vis_fn(mods, face_chunk=80)
        vis_fn(str(tmp_path), 7, state, batch)
        import os

        files = os.listdir(tmp_path / "vis")
        assert files == ["step_0000007.png"]


class TestPlotMetrics:
    def test_renders_curves_png(self, tmp_path):
        """tools/plot_metrics.py turns a run's metrics.jsonl into a PNG
        grid (headless analog of the reference's visdom scalar plots,
        utils/visualizer.py:27-119). Tolerates a torn tail line from a
        live run and non-numeric fields."""
        import json
        import subprocess
        import sys

        rows = [
            {"step": s, "epoch": 0, "total_loss": 1.0 / (s + 1),
             "mask_loss": 0.5, "phase": "main"}
            for s in range(12)
        ]
        p = tmp_path / "metrics.jsonl"
        with open(p, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
            f.write('{"step": 12, "total_l')  # torn tail write
        out = tmp_path / "curves.png"
        r = subprocess.run(
            [sys.executable, "tools/plot_metrics.py", str(p),
             "--out", str(out), "--smooth", "3"],
            capture_output=True, text=True,
        )
        assert r.returncode == 0, r.stderr
        assert out.exists() and out.stat().st_size > 1000


class TestNaNWatchdog:
    def test_logger_raises_on_nonfinite(self, tmp_path):
        """A non-finite loss must fail fast (poisoned params would
        otherwise keep overwriting good checkpoints — seen at epoch 29
        of a 40-epoch run before safe_norm)."""
        import pytest

        from acfm_video_3d_reconstruction_tpu.train.metrics_logger import (
            MetricsLogger,
        )

        lg = MetricsLogger(str(tmp_path))
        lg.log(0, 1, {"total_loss": 1.0}, echo=False)
        with pytest.raises(FloatingPointError, match="total_loss"):
            lg.log(0, 2, {"total_loss": float("nan")}, echo=False)
        with pytest.raises(FloatingPointError, match="kp_loss"):
            lg.log(0, 3, {"kp_loss": float("inf")}, echo=False)
