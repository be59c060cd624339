"""Multiframe trainer: multiplex warmup + main-loop step on synthetic clips."""
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
from acfm_video_3d_reconstruction_tpu.multiplex import state as mpx_lib
from acfm_video_3d_reconstruction_tpu.train import multiframe as mf

IMG = 64
T = 2
B = 2
G = 4


@pytest.fixture(scope="module")
def setup():
    template = build_template(subdivide=1, num_lbs=6, tex_size=2, num_kps=0)
    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=IMG, nz_feat=32, num_lbs=6, num_kps=0,
            tex_size=2, texture=True, symmetric=False, symmetric_texture=False,
        ),
        multiplex=dataclasses.replace(
            cfg_lib.MultiplexConfig(), num_guesses=G, optimize_deform=False
        ),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(), batch_size=B, num_frames=T, offset_z=0.0,
            use_gtpose=False,
        ),
        mf_weights=dataclasses.replace(cfg_lib.MultiframeLossWeights(), kp=0.0),
    )
    ds = SyntheticDataset(
        template,
        SyntheticConfig(num_frames_total=8, clip_len=T, image_size=IMG, num_kps=3),
    )
    mods, (tx_full, tx_warm), state = mf.build(cfg, template, 8, jax.random.PRNGKey(0))
    return mods, tx_full, tx_warm, state, ds


def mf_batch(ds, ids):
    b = preprocess_batch(ds.get_batch(np.asarray(ids)), ds.cfg.image_size)
    return {k: jnp.asarray(v) for k, v in b.items()}


def fresh(state):
    """Deep-copy a train state (steps donate their input buffers)."""
    return jax.tree_util.tree_map(jnp.array, state)


class TestMultiplexState:
    def test_init_and_gather(self):
        mpx = mpx_lib.init_quat_multiplex(10, G, 6)
        assert mpx.cams.shape == (G, 10, 7)
        frames = jnp.asarray([[0, 1], [2, 3]])
        cams = mpx_lib.gather_cameras(mpx, frames)
        assert cams.shape == (G, 4, 7)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(cams[..., 3:]), axis=-1), 1.0, atol=1e-5
        )
        assert np.all(np.asarray(cams[..., 0]) > 0)

    def test_topk_and_scatter(self):
        mpx = mpx_lib.init_quat_multiplex(6, G, 6)
        probs = jnp.asarray(np.random.default_rng(0).random((6, G)).astype(np.float32))
        mpx = dataclasses.replace(mpx, probs=probs)
        frames = jnp.asarray([[0, 1]])
        sel = mpx_lib.topk_hypotheses(mpx, frames, 2)
        assert sel.shape == (2, 2)
        np.testing.assert_array_equal(
            np.asarray(sel[0]), np.asarray(jnp.argmax(probs[jnp.asarray([0, 1])], -1))
        )
        new_probs = jnp.ones((2, 2)) * 0.5
        mpx2 = mpx_lib.scatter_probs(mpx, frames, sel, new_probs)
        row0 = np.asarray(mpx2.probs[0])
        assert row0.sum() == pytest.approx(1.0)  # two entries of 0.5, rest 0
        # untouched rows keep their values
        np.testing.assert_allclose(np.asarray(mpx2.probs[5]), np.asarray(probs[5]))


class TestMultiframeTraining:
    def test_warmup_step(self, setup):
        mods, tx_full, tx_warm, state, ds = setup
        state = fresh(state)
        step = mf.make_warmup_step(mods, tx_warm, face_chunk=80)
        batch = mf_batch(ds, [0, 1])
        losses = []
        for _ in range(4):
            state, metrics = step(state, batch)
            losses.append(float(metrics["warmup_loss"]))
        assert np.all(np.isfinite(losses))
        assert losses[-1] <= losses[0]
        # probabilities were written for these frames
        p = np.asarray(state.multiplex.probs[:4])
        np.testing.assert_allclose(p.sum(-1), 1.0, atol=1e-4)
        # soft-min wrote genuine (non-uniform) weights, not the init fill
        assert p.std() > 1e-4, p

    @pytest.mark.heavy
    def test_main_step_all_guesses(self, setup):
        mods, tx_full, tx_warm, state, ds = setup
        step = mf.make_train_step(mods, tx_full, k=G, drop_deform=False, face_chunk=80)
        batch = mf_batch(ds, [0, 1])
        state, metrics = step(fresh(state), batch)
        for key in ("total_loss", "mask_loss", "of_loss", "tex_loss", "camera_loss",
                    "rigid_loss", "tri_loss", "cycle_loss"):
            assert key in metrics and np.isfinite(float(metrics[key])), key

    @pytest.mark.heavy
    def test_main_step_topk(self, setup):
        mods, tx_full, tx_warm, state, ds = setup
        step = mf.make_train_step(mods, tx_full, k=2, drop_deform=True, face_chunk=80)
        batch = mf_batch(ds, [2, 3])
        state, metrics = step(fresh(state), batch)
        assert np.isfinite(float(metrics["total_loss"]))

    def test_init_camera_emb(self, setup):
        mods, tx_full, tx_warm, state, ds = setup
        batch = mf_batch(ds, [0, 1])
        state2 = mf.init_camera_emb(fresh(state), batch)
        flat = np.asarray(batch["frames_idx"]).reshape(-1)
        written = np.asarray(state2.multiplex.cams[0, flat])
        gt = np.asarray(batch["sfm_pose"]).reshape(-1, 7)
        np.testing.assert_allclose(written[:, 3:], gt[:, 3:], atol=1e-5)
        np.testing.assert_allclose(
            written[:, 0], (np.abs(gt[:, 0]) - 1.0) / 0.05, atol=1e-5
        )


if __name__ == "__main__":
    pytest.main([__file__, "-x", "-q"])
