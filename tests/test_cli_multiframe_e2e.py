"""End-to-end multiframe CLI test: synthetic video pkl tree -> cache
explode -> loaders -> flow net -> warmup + main loop -> checkpoints.

This is the test that guards the flagship pipeline actually running with
optical flow in the loop (reference multiframe/main.py entry; the
optical_flows batch key is produced by a frozen MaskFlownet pass exactly
as in set_input, main.py:385-411).
"""
import json
import os
import os.path as osp
import pickle

import numpy as np
import pytest

jax = pytest.importorskip("jax")

from acfm_video_3d_reconstruction_tpu.cli import multiframe_main as cli  # noqa: E402

IMG_RAW = 96


def make_video(rng, n_frames=5, size=IMG_RAW, kps=3):
    """Moving bright square on a dark background with consistent annos."""
    video = np.zeros((n_frames, size, size, 3), np.float32) + 0.1
    seg = np.zeros((n_frames, size, size), np.float32)
    bboxes = np.zeros((n_frames, 4), np.float64)
    landmarks = np.zeros((n_frames, kps, 3), np.float64)
    poses = np.zeros((n_frames, 7), np.float64)
    x0, y0, w = 18, 26, 36
    for t in range(n_frames):
        x = x0 + 3 * t
        y = y0 + 2 * t
        video[t, y : y + w, x : x + w] = rng.uniform(0.6, 1.0, 3)
        seg[t, y : y + w, x : x + w] = 1.0
        bboxes[t] = [x - 4, y - 4, x + w + 4, y + w + 4]
        landmarks[t] = [[x + 5, y + 5, 1], [x + w - 5, y + 5, 1],
                        [x + w // 2, y + w - 5, 1]]
        poses[t] = [0.8, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]
    return {
        "video": video,
        "segmentations": seg,
        "bboxes": bboxes,
        "landmarks": landmarks,
        "sfm_poses": poses,
    }


@pytest.fixture(autouse=True)
def single_device_mesh(monkeypatch):
    """Pin the driver to a 1-device mesh: SPMD compiles over the virtual
    8-device CPU mesh take minutes per step on this host, and the
    multi-device path is already covered by dryrun_multichip."""
    from acfm_video_3d_reconstruction_tpu.parallel import mesh as pmesh

    real = pmesh.make_mesh

    def one_dev(devices=None, axis_name="data"):
        return real(jax.devices()[:1], axis_name)

    monkeypatch.setattr(pmesh, "make_mesh", one_dev)


@pytest.fixture()
def pkl_tree(tmp_path):
    rng = np.random.default_rng(0)
    root = tmp_path / "pkls" / "horse"
    root.mkdir(parents=True)
    for i in range(2):
        with open(root / f"vid{i}.pkl", "wb") as f:
            pickle.dump(make_video(rng), f)
    return str(tmp_path / "pkls")


def small_opts(tmp_path, pkl_root, **over):
    o = cli.default_opts()
    o.update(
        name="e2e_test",
        category="horse",
        root_dir=pkl_root,
        tmp_dir=str(tmp_path / "cache"),
        checkpoint_dir=str(tmp_path / "snapshots"),
        img_size=64,
        num_lbs=6,
        subdivide=1,
        num_kps=3,
        num_frames=2,
        num_guesses=2,
        batch_size=2,
        num_epochs=1,
        num_training_frames=5,
        num_reps=1,
        texture=False,
        of_loss_wt=1.0,
        flow_random_init=True,
        flow_net_hw=(64, 128),
        face_chunk=80,
        log_every=1,
        save_epoch_freq=1,
        warmup=False,
    )
    o.update(over)
    return o


def read_metrics(o):
    path = osp.join(o["checkpoint_dir"], o["name"], "metrics.jsonl")
    with open(path) as f:
        return [json.loads(line) for line in f if line.strip()]


@pytest.fixture()
def cheap_flow(monkeypatch):
    """Replace the frozen MaskFlownet pass with a cheap synthetic flow so
    the CLI plumbing (driver prep -> batch['optical_flows'] -> of loss)
    runs in seconds on CPU. The real-net path is covered by the slow test."""
    import jax.numpy as jnp

    def fake_make_flow_fn(o, img_size):
        if o["of_loss_wt"] <= 0:
            return None
        if not (o["flow_checkpoint"] or o["flow_random_init"]):
            raise ValueError("of_loss_wt > 0 needs --flow_checkpoint")

        def flow_fn(batch):
            batch = dict(batch)
            B, T = batch["img"].shape[:2]
            S = batch["img"].shape[2]
            flows = jnp.zeros((B, T, S, S, 2))
            flows = flows.at[:, :-1, :, :, 0].set(1.5)
            flows = flows.at[:, :-1, :, :, 1].set(-0.5)
            batch["optical_flows"] = flows
            return batch

        return flow_fn

    monkeypatch.setattr(cli, "make_flow_fn_from_opts", fake_make_flow_fn)
    return fake_make_flow_fn


@pytest.mark.heavy
def test_multiframe_cli_end_to_end_with_flow(tmp_path, pkl_tree, cheap_flow):
    """The full CLI pipeline runs 2+ steps with of in the loss; of_loss is
    nonzero and the per-batch total decreases when re-visiting data."""
    o = small_opts(tmp_path, pkl_tree, num_epochs=3)
    mods, state = cli.train(o)

    rows = read_metrics(o)
    assert len(rows) >= 4
    of = [r["of_loss"] for r in rows if "of_loss" in r]
    assert of and all(np.isfinite(of)), of
    assert max(np.abs(of)) > 0, "of_loss is identically zero - flow not wired"
    total = [r["total_loss"] for r in rows if "total_loss" in r]
    # training on the same tiny set for 3 epochs must reduce the loss
    assert np.mean(total[-2:]) < np.mean(total[:2]), total

    # labeled checkpoints exist
    ckpt_root = osp.join(o["checkpoint_dir"], o["name"])
    names = os.listdir(ckpt_root)
    assert any("latest" in n for n in names), names


@pytest.mark.slow
def test_multiframe_cli_real_flow_net(tmp_path, pkl_tree):
    """The real frozen MaskFlownet (random weights) in the loop, 1 epoch."""
    o = small_opts(tmp_path, pkl_tree, num_epochs=1, name="e2e_realflow")
    mods, state = cli.train(o)
    rows = read_metrics(o)
    of = [r["of_loss"] for r in rows if "of_loss" in r]
    assert of and all(np.isfinite(of))


@pytest.mark.heavy
def test_multiframe_cli_warmup_and_gtpose(tmp_path, pkl_tree, cheap_flow):
    """Pose warmup phase runs and the use_gtpose projection path compiles
    and trains (k forced to 1)."""
    o = small_opts(
        tmp_path, pkl_tree, warmup=True, num_reps=1, use_gtpose=True,
        init_camera_emb=True, num_epochs=1, name="e2e_gtpose",
    )
    mods, state = cli.train(o)
    rows = read_metrics(o)
    warm = [r for r in rows if "warmup_loss" in r]
    assert warm and np.isfinite(warm[-1]["warmup_loss"])
    main = [r for r in rows if "total_loss" in r]
    assert main and np.isfinite(main[-1]["total_loss"])
    ckpt_root = osp.join(o["checkpoint_dir"], o["name"])
    assert any("warmup" in n for n in os.listdir(ckpt_root))


def test_missing_flow_checkpoint_is_a_clear_error(tmp_path, pkl_tree, cheap_flow):
    o = small_opts(tmp_path, pkl_tree, flow_random_init=False)
    with pytest.raises(ValueError, match="flow_checkpoint"):
        cli.train(o)


@pytest.mark.heavy
def test_load_warmup_resumes_and_skips_phases(tmp_path, pkl_tree, cheap_flow):
    """--load_warmup restores the warmup checkpoint and skips the warmup
    phases (reference --load_warmup, train_utils.py:205-232 guards)."""
    o = small_opts(
        tmp_path, pkl_tree, warmup=True, num_reps=1, num_epochs=1,
        name="e2e_resume",
    )
    cli.train(o)
    rows1 = read_metrics(o)
    assert any("warmup_loss" in r for r in rows1)

    # second run: resume from the warmup ckpt; no warmup rows may appear
    o2 = dict(o, load_warmup=True)
    metrics_path = osp.join(o["checkpoint_dir"], o["name"], "metrics.jsonl")
    os.remove(metrics_path)
    cli.train(o2)
    rows2 = read_metrics(o2)
    assert rows2 and not any("warmup_loss" in r for r in rows2)
