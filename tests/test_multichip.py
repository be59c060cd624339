"""Multi-device execution tests (SURVEY §4: multi-chip tests on CPU).

Runs the multiframe pose-warmup step, the main train step, and a TTO
refine over the virtual 8-device mesh (tiny shapes, dryrun_multichip
scale) and asserts numerical agreement with the 1-device run. The
multiplex tables are frame-row sharded (parallel.mesh.multiplex_sharding)
— this also pins that the scatter_probs/gather path is correct under row
sharding and that jit preserves the table shardings across steps.

Reference analog being validated: torch DataParallel training
(multiframe/main.py:172) + the per-frame embedding tables
(multiframe/nnutils/mesh_net.py:404-451), recast as SPMD over a 1-D data
mesh with XLA collectives.
"""
import dataclasses

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from acfm_video_3d_reconstruction_tpu import config as cfg_lib  # noqa: E402
from acfm_video_3d_reconstruction_tpu.models import build_template  # noqa: E402
from acfm_video_3d_reconstruction_tpu.parallel import mesh as pmesh  # noqa: E402
from acfm_video_3d_reconstruction_tpu.train import multiframe as mf  # noqa: E402

IMG, T, G, LBS = 64, 2, 2, 6
NDEV = 8
B = NDEV  # one clip per device
N_FRAMES = B * T  # multiplex rows divisible by the mesh size


def tiny_setup():
    template = build_template(subdivide=1, num_lbs=LBS, tex_size=2, num_kps=0)
    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=IMG, nz_feat=16, num_lbs=LBS,
            num_kps=0, tex_size=2, texture=False, symmetric=False,
            symmetric_texture=False,
        ),
        multiplex=dataclasses.replace(
            cfg_lib.MultiplexConfig(), num_guesses=G, optimize_deform=True
        ),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(), batch_size=B, num_frames=T, offset_z=0.0
        ),
        mf_weights=dataclasses.replace(
            cfg_lib.MultiframeLossWeights(), kp=0.0, of=0.0, tex=0.0
        ),
    )
    mods, (tx_full, tx_warm), state = mf.build(
        cfg, template, N_FRAMES, jax.random.PRNGKey(0)
    )
    rng = np.random.default_rng(0)
    H = IMG
    batch = {
        "img": rng.random((B, T, H, H, 3), np.float32),
        "mask": (rng.random((B, T, H, H)) > 0.5).astype(np.float32),
        "kp": rng.random((B, T, 1, 3), np.float32),
        "sfm_pose": np.tile(
            np.asarray([0.8, 0, 0, 1, 0, 0, 0], np.float32), (B, T, 1)
        ),
        "frames_idx": np.arange(B * T, dtype=np.int32).reshape(B, T),
        "mirror_flag": np.zeros((B, T), np.int32),
        "transforms": np.tile(np.asarray([1.0, 0, 0, 0], np.float32), (B, T, 1)),
        "optical_flows": np.zeros((B, T, H, H, 2), np.float32),
        "edt": rng.random((B * T, H, H)).astype(np.float32),
        "bdt": rng.random((B * T, H, H)).astype(np.float32),
        "boundaries": rng.random((B * T, 16, 3)).astype(np.float32),
    }
    return mods, tx_full, tx_warm, state, batch, template


def run_steps(n_devices, mods, tx_full, tx_warm, state, batch, template):
    """Warmup step + main step on an n-device mesh; returns final arrays."""
    mesh = pmesh.make_mesh(jax.devices()[:n_devices])
    state = pmesh.shard_multiframe_state(mesh, state)
    sbatch = pmesh.shard_batch(mesh, batch)
    with mesh:
        warm = mf.make_warmup_step(mods, tx_warm, face_chunk=template.num_faces)
        state, wmetrics = warm(state, sbatch)
        step = mf.make_train_step(
            mods, tx_full, k=G, drop_deform=False,
            face_chunk=template.num_faces,
        )
        state, metrics = step(state, sbatch)
    return state, wmetrics, metrics


@pytest.mark.heavy
def test_smoke_warmup_step_on_8dev_mesh():
    """Fast tier: one warmup step over the virtual 8-device mesh — loss
    finite and the frame-row sharding of the multiplex preserved by jit.
    The full single- vs multi-device numerical-agreement matrix (train
    step + TTO) is the slow-marked tests below (SPMD compiles of the full
    train step take minutes on this 1-core host)."""
    from jax.sharding import PartitionSpec as P

    assert len(jax.devices()) >= NDEV, "conftest must provide 8 CPU devices"
    mods, tx_full, tx_warm, state, batch, template = tiny_setup()
    mesh = pmesh.make_mesh(jax.devices()[:NDEV])
    state = pmesh.shard_multiframe_state(mesh, state)
    sbatch = pmesh.shard_batch(mesh, batch)
    with mesh:
        warm = mf.make_warmup_step(mods, tx_warm, face_chunk=template.num_faces)
        state, wmetrics = warm(state, sbatch)
    assert np.isfinite(float(wmetrics["warmup_loss"]))
    assert state.multiplex.cams.sharding.spec == P(None, "data")


@pytest.fixture(scope="module")
def runs():
    assert len(jax.devices()) >= NDEV, "conftest must provide 8 CPU devices"
    args = tiny_setup()
    multi = run_steps(NDEV, *args)
    single = run_steps(1, *tiny_setup())
    return single, multi


@pytest.mark.slow
def test_multichip_matches_single_device(runs):
    (s1, w1, m1), (s8, w8, m8) = runs
    assert np.isfinite(float(m8["total_loss"]))
    np.testing.assert_allclose(
        float(w8["warmup_loss"]), float(w1["warmup_loss"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(m8["total_loss"]), float(m1["total_loss"]), rtol=1e-4
    )
    # full state agreement: multiplex tables and a model parameter
    np.testing.assert_allclose(
        np.asarray(s8.multiplex.cams), np.asarray(s1.multiplex.cams),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s8.multiplex.probs), np.asarray(s1.multiplex.probs),
        rtol=1e-3, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(s8.multiplex.deform), np.asarray(s1.multiplex.deform),
        rtol=1e-4, atol=1e-6,
    )


@pytest.mark.slow
def test_multiplex_stays_frame_row_sharded(runs):
    """jit must preserve the frame-row sharding of the multiplex tables
    across steps (no silent re-replication of the N-row state)."""
    _, (s8, _, _) = runs

    def names(sharding):
        return getattr(sharding, "spec", None)

    from jax.sharding import PartitionSpec as P

    assert names(s8.multiplex.cams.sharding) == P(None, "data"), (
        s8.multiplex.cams.sharding
    )
    assert names(s8.multiplex.probs.sharding) == P("data")
    assert names(s8.multiplex.deform.sharding) == P("data")


@pytest.mark.slow
def test_tto_refine_on_mesh(runs):
    """TTO refine (eval path) executes over the 8-device mesh and agrees
    with the single-device refine."""
    from acfm_video_3d_reconstruction_tpu.eval import predictor as pred

    (s1, _, _), (s8, _, _) = runs
    args = tiny_setup()
    mods, _, _, state, batch, template = args
    tto = pred.TTOConfig(num_iter=3, lr=5e-3, of_wt=0.0, offset_z=0.0)
    refine = pred.make_tto_step_fn(mods, tto, T, face_chunk=template.num_faces)

    model = mods.model
    mean_shape = model.apply({"params": state.params}, method=model.get_mean_shape)
    lbs = model.apply({"params": state.params}, method=model.get_lbs)
    BT = B * T
    delta = jnp.zeros((BT, LBS, 3), jnp.float32)
    cams = jnp.tile(jnp.asarray([[0.8, 0, 0, 1, 0, 0, 0]], jnp.float32), (BT, 1))
    flat_batch = {
        "mask": batch["mask"].reshape(BT, IMG, IMG),
        "edt": batch["edt"],
        "boundaries": batch["boundaries"],
    }

    def run(n):
        mesh = pmesh.make_mesh(jax.devices()[:n])
        fb = pmesh.shard_batch(mesh, flat_batch)
        d = pmesh.shard_batch(mesh, delta)
        c = pmesh.shard_batch(mesh, cams)
        with mesh:
            pred_v, cam_out, loss = refine(mean_shape, lbs, d, c, fb)
        return np.asarray(pred_v), float(loss)

    v8, l8 = run(NDEV)
    v1, l1 = run(1)
    assert np.isfinite(l8)
    np.testing.assert_allclose(l8, l1, rtol=1e-4)
    np.testing.assert_allclose(v8, v1, rtol=1e-3, atol=1e-5)


def test_shard_batch_warns_on_replication_fallback(caplog):
    """Non-divisible leading axes must fall back to replication LOUDLY
    (round-3 verdict: a batch-size change on a real mesh would silently
    lose the data-parallel split)."""
    import logging

    mesh = pmesh.make_mesh(jax.devices()[:NDEV])
    bad = {"x": np.zeros((NDEV + 1, 4), np.float32),
           "good": np.zeros((NDEV, 4), np.float32)}
    with caplog.at_level(logging.WARNING,
                         logger="acfm_video_3d_reconstruction_tpu.parallel.mesh"):
        out = pmesh.shard_batch(mesh, bad)
    warns = [r for r in caplog.records if "shard fallback" in r.message]
    assert len(warns) == 1 and "'x'" in warns[0].message
    from jax.sharding import PartitionSpec as P
    assert out["x"].sharding.spec == P()
    assert out["good"].sharding.spec == P("data")

    caplog.clear()
    # multiplex row fallback warns too
    from acfm_video_3d_reconstruction_tpu.multiplex import state as mpx_state
    mpx = mpx_state.init_quat_multiplex(
        num_frames=NDEV + 1, num_guesses=2, num_lbs=4
    )
    with caplog.at_level(logging.WARNING,
                         logger="acfm_video_3d_reconstruction_tpu.parallel.mesh"):
        pmesh.shard_multiplex(mesh, mpx)
    assert any("multiplex." in r.message for r in caplog.records)
