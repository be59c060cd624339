"""End-to-end monocular training smoke + fixed-seed regression on synthetic data."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu import config as cfg_lib
from acfm_video_3d_reconstruction_tpu.data.synthetic import (
    SyntheticConfig,
    SyntheticDataset,
    preprocess_batch,
)
from acfm_video_3d_reconstruction_tpu.models import build_template
from acfm_video_3d_reconstruction_tpu.train import monocular

IMG = 64


@pytest.fixture(scope="module")
def setup():
    template = build_template(subdivide=2, num_lbs=6, tex_size=2, num_kps=4)
    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=IMG, nz_feat=32, num_lbs=6, num_kps=4,
            tex_size=2, texture=True, symmetric=False, symmetric_texture=False,
        ),
        train=dataclasses.replace(cfg_lib.TrainConfig(), batch_size=2, use_gtpose=True),
    )
    mods, tx, state = monocular.build(cfg, template, jax.random.PRNGKey(0))
    ds = SyntheticDataset(template, SyntheticConfig(num_frames_total=8, clip_len=1, image_size=IMG, num_kps=4))
    return mods, tx, state, ds


def mono_batch(ds, ids):
    b = ds.get_batch(np.asarray(ids))
    b = preprocess_batch(b, ds.cfg.image_size)
    # squeeze the clip axis (monocular: single frames)
    out = {}
    for k in ("img", "mask", "kp", "sfm_pose"):
        out[k] = jnp.asarray(b[k][:, 0])
    out["edt"] = jnp.asarray(b["edt"])
    out["boundaries"] = jnp.asarray(b["boundaries"])
    return out


def fresh(state):
    """Deep-copy a train state (steps donate their input buffers)."""
    return jax.tree_util.tree_map(jnp.array, state)


class TestMonocularTraining:
    @pytest.mark.heavy
    def test_step_runs_and_decreases_loss(self, setup):
        mods, tx, state, ds = setup
        state = fresh(state)
        step = monocular.make_train_step(mods, tx, face_chunk=80)
        batch = mono_batch(ds, [0, 1])
        losses = []
        for i in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["total_loss"]))
        assert np.all(np.isfinite(losses))
        assert losses[-1] < losses[0], losses

    @pytest.mark.heavy
    def test_metrics_keys(self, setup):
        mods, tx, state, ds = setup
        step = monocular.make_train_step(mods, tx, face_chunk=80)
        _, metrics = step(fresh(state), mono_batch(ds, [0, 1]))
        for k in (
            "kp_loss", "mask_loss", "cam_loss", "edt_loss", "bdt_loss",
            "rigid_loss", "tri_loss", "vert2kp_loss", "total_loss", "tex_loss",
        ):
            assert k in metrics, k

    def test_eval_outputs(self, setup):
        mods, tx, state, ds = setup
        ev = monocular.make_eval_step(mods, face_chunk=80)
        aux = ev(fresh(state), mono_batch(ds, [0, 1]))
        assert aux["mask_pred"].shape == (2, IMG, IMG)
        assert aux["kp_pred"].shape == (2, 4, 2)
        assert np.all(np.isfinite(np.asarray(aux["pred_v"])))


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
