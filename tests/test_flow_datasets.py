"""Flow benchmark dataset loaders on tiny synthetic fixture trees
(reference data_loaders/{Chairs,sintel,kitti}.py layouts)."""
import os

import numpy as np
import pytest

from acfm_video_3d_reconstruction_tpu.flow import datasets as fds
from acfm_video_3d_reconstruction_tpu.flow import flowlib


def write_ppm(path, arr):
    h, w = arr.shape[:2]
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(arr.astype(np.uint8).tobytes())


def test_chairs_layout(tmp_path):
    rng = np.random.default_rng(0)
    (tmp_path / "data").mkdir()
    flags = []
    for i in range(1, 5):
        im = (rng.random((8, 10, 3)) * 255).astype(np.uint8)
        write_ppm(tmp_path / "data" / f"{i:05d}_img1.ppm", im)
        write_ppm(tmp_path / "data" / f"{i:05d}_img2.ppm", im)
        flow = rng.standard_normal((8, 10, 2)).astype(np.float32)
        flowlib.write_flo(str(tmp_path / "data" / f"{i:05d}_flow.flo"), flow)
        flags.append("1" if i % 2 else "2")
    with open(tmp_path / "FlyingChairs_train_val.txt", "w") as f:
        f.write("\n".join(flags) + "\n")

    train = fds.ChairsDataset(str(tmp_path), "train")
    valid = fds.ChairsDataset(str(tmp_path), "valid")
    assert len(train) == 2 and len(valid) == 2
    s = train[0]
    assert s["im0"].shape == (8, 10, 3) and s["im0"].max() <= 1.0
    assert s["flow"].shape == (8, 10, 2)


def test_sintel_layout(tmp_path):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    seq = "alley_1"
    for sub in ("clean", "final", "flow", "invalid"):
        (tmp_path / "training" / sub / seq).mkdir(parents=True)
    for i in (1, 2, 3):
        im = (rng.random((12, 16, 3)) * 255).astype(np.uint8)
        for sub in ("clean", "final"):
            cv2.imwrite(
                str(tmp_path / "training" / sub / seq / f"frame_{i:04d}.png"), im
            )
        inval = np.zeros((12, 16), np.uint8)
        cv2.imwrite(
            str(tmp_path / "training" / "invalid" / seq / f"frame_{i:04d}.png"),
            inval,
        )
        flow = rng.standard_normal((12, 16, 2)).astype(np.float32)
        flowlib.write_flo(
            str(tmp_path / "training" / "flow" / seq / f"frame_{i:04d}.flo"), flow
        )
    np.savetxt(str(tmp_path / "sintel_train_val_split.txt"), [1, 0])

    train = fds.SintelDataset(str(tmp_path), "train")
    valid = fds.SintelDataset(str(tmp_path), "valid")
    both = fds.SintelDataset(str(tmp_path), "train+valid")
    assert len(train) + len(valid) == 2 and len(both) == 2
    s = train[0]
    assert s["im0"].shape == (12, 16, 3)
    assert s["flow"].shape == (12, 16, 2)
    assert s["mask"].min() == 1.0  # nothing invalid


def test_predict_flow_native_units(monkeypatch):
    """Constant net flow (dy, dx) comes back as (dx, dy) in native-pixel
    units after the stretch-back rescale."""
    jax = pytest.importorskip("jax")
    import jax.numpy as jnp

    from acfm_video_3d_reconstruction_tpu.flow import infer

    def fake_net(params, im0, im1):
        B, H, W = im0.shape[:3]
        pred = jnp.zeros((B, H // 4, W // 4, 2))
        pred = pred.at[..., 0].set(4.0).at[..., 1].set(8.0)  # (dy, dx)
        return [pred], None, None

    monkeypatch.setattr(infer.mfn, "maskflownet", fake_net)
    H, W = 48, 100  # stretches to (64, 128)
    im = jnp.zeros((1, H, W, 3))
    flow = np.asarray(infer.predict_flow_native({}, im, im))
    assert flow.shape == (1, H, W, 2)
    np.testing.assert_allclose(flow[..., 0], 8.0 * W / 128, atol=1e-4)
    np.testing.assert_allclose(flow[..., 1], 4.0 * H / 64, atol=1e-4)


def test_config_reader(tmp_path):
    yaml = pytest.importorskip("yaml")
    del yaml
    from acfm_video_3d_reconstruction_tpu.flow import config as fcfg

    p = tmp_path / "m.yaml"
    p.write_text("network:\n  class: MaskFlownet_S\n")
    cfg = fcfg.load_yaml(str(p))
    assert fcfg.network_class(cfg) == "MaskFlownet_S"
    # missing keys resolve through .get defaults (reference Reader)
    assert fcfg.flow_multiplier(cfg) == 1.0
    assert cfg.no.such.key.get("dflt") == "dflt"
