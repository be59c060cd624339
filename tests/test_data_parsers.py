"""Dataset-format parsers: YTVIS/COCO pkl schema, PASCAL stills adapter,
video-level concat, variable-length collates, v2-crop visibility.

Reference anchors: ytvis_final.py:120-150 (xywh boxes, uint8 video,
placeholder annos), coco_final.py (same schema), base2.py:475-593 (pascal
stills as 2-frame videos), tigdog_final.py:279-378 (collates),
tigdog_mf_of.py:245-268 (v2 crop).
"""
import pickle

import numpy as np
import pytest
import scipy.io as sio

from acfm_video_3d_reconstruction_tpu.data import loader as loader_lib
from acfm_video_3d_reconstruction_tpu.data import tigdog as tig
from acfm_video_3d_reconstruction_tpu.data.pascal import PascalVideoDataset


def _write_ytvis_pkl(path, n_frames=3, size=48, seed=0):
    rng = np.random.default_rng(seed)
    video = (rng.random((n_frames, size, size, 3)) * 255).astype(np.uint8)
    seg = np.zeros((n_frames, size, size), np.float32)
    seg[:, 10:30, 12:36] = 1.0
    bboxes = np.tile(
        np.asarray([12.0, 10.0, 24.0, 20.0], np.float64), (n_frames, 1)
    )  # xywh
    with open(path, "wb") as f:
        pickle.dump({"video": video, "segmentations": seg, "bboxes": bboxes}, f)


def test_ytvis_pkl_schema(tmp_path):
    root = tmp_path / "yt" / "cow"
    root.mkdir(parents=True)
    for i in range(3):
        _write_ytvis_pkl(root / f"{i}.pkl", seed=i)
    ds = tig.YTVISPklDataset(str(tmp_path / "yt"), "cow", num_kps=16)
    assert len(ds) == 3
    s = ds[0]
    # uint8 -> [0,1] floats
    assert s["video"].dtype == np.float32 and s["video"].max() <= 1.0
    # xywh -> squared xyxy
    bb = s["bboxes"][0]
    assert bb[2] > bb[0] and bb[3] > bb[1]
    w, h = bb[2] - bb[0], bb[3] - bb[1]
    assert abs(w - h) <= 1.5  # square_bbox
    # placeholder annotations synthesized
    assert s["landmarks"].shape == (3, 16, 3)
    np.testing.assert_allclose(s["landmarks"], 0.0)
    assert s["sfm_poses"].shape == (3, 7)
    np.testing.assert_allclose(s["sfm_poses"][:, 3], 1.0)


def test_concat_dataset_and_explode(tmp_path):
    for cat_dir, n in (("a/horse", 2), ("b/horse", 1)):
        root = tmp_path / cat_dir
        root.mkdir(parents=True)
        for i in range(n):
            _write_ytvis_pkl(root / f"{i}.pkl", seed=i)
    d1 = tig.YTVISPklDataset(str(tmp_path / "a"), "horse")
    d2 = tig.YTVISPklDataset(str(tmp_path / "b"), "horse")
    cat = tig.ConcatDataset([d1, d2])
    assert len(cat) == 3
    assert cat[2]["video"].shape == cat[0]["video"].shape

    n_frames, s2v, spv = tig.explode_to_frames(
        cat, str(tmp_path / "cache"), "horse", num_training_frames=10
    )
    assert n_frames == 9
    assert s2v[8] == 2  # last frame belongs to the concat-appended video
    assert sorted(spv) == [0, 1, 2]


def test_pascal_video_dataset(tmp_path):
    cv2 = pytest.importorskip("cv2")
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    img = (rng.random((40, 52, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(img_dir / "cow1.png"), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))

    # CMR-style annotation struct
    mask = np.zeros((40, 52), np.uint8)
    mask[8:30, 10:40] = 1
    parts = np.asarray(
        [[11.0, 21.0, 31.0], [9.0, 15.0, 20.0], [1.0, 1.0, 0.0]]
    )  # (3, K): x, y, vis -- one-indexed
    dt = np.dtype([("rel_path", "O"), ("mask", "O"), ("parts", "O")])
    images = np.zeros((1,), dt)
    images[0] = ("cow1.png", mask, parts)
    anno_path = tmp_path / "cow_train.mat"
    sio.savemat(str(anno_path), {"images": images})

    ds = PascalVideoDataset(str(img_dir), str(anno_path), num_kps=3)
    assert len(ds) == 1
    s = ds[0]
    assert s["video"].shape == (2, 40, 52, 3)
    np.testing.assert_allclose(s["video"][0], s["video"][1])
    assert s["segmentations"].shape == (2, 40, 52)
    # kps 0-indexed, nan-safe
    np.testing.assert_allclose(s["landmarks"][0, 0], [10.0, 8.0, 1.0])
    assert s["landmarks"][0, 2, 2] == 0.0
    np.testing.assert_allclose(s["sfm_poses"][:, 3], 1.0)

    # full mixing path: explode + MultiFrame windowing consumes it
    n_frames, s2v, spv = tig.explode_to_frames(
        ds, str(tmp_path / "cache"), "cow", num_training_frames=10
    )
    assert n_frames == 2
    mf = tig.MultiFrameDataset(
        tmp_dir=str(tmp_path / "cache"), category="cow", sample_to_vid=s2v,
        samples_per_vid=spv, num_frames=2, img_size=32, mirror=False,
        transforms=False, tight_bboxes=True, v2_crop=True,
        remove_neck_kp=False,
    )
    item = mf[0]
    assert item["img"].shape == (2, 32, 32, 3)
    assert np.isfinite(item["kp"]).all()


def test_collate_min_crop_and_pad():
    def clip(T, val):
        return {
            "video": np.full((T, 4, 4, 3), val, np.float32),
            "landmarks": np.full((T, 2, 3), val, np.float32),
            "idx": np.asarray(val),
        }

    samples = [clip(5, 1.0), clip(3, 2.0)]
    out = loader_lib.collate_min_crop(samples, rng=np.random.default_rng(0))
    assert out["video"].shape == (2, 3, 4, 4, 3)
    assert out["landmarks"].shape == (2, 3, 2, 3)
    assert out["idx"].shape == (2,)

    out2 = loader_lib.collate_pad_circular(samples)
    assert out2["video"].shape == (2, 5, 4, 4, 3)
    # circular pad repeats from the start
    np.testing.assert_allclose(out2["video"][1, 3], out2["video"][1, 0])


def test_v2_crop_recomputes_visibility(tmp_path):
    root = tmp_path / "yt" / "cow"
    root.mkdir(parents=True)
    rng = np.random.default_rng(0)
    size = 48
    video = rng.random((2, size, size, 3)).astype(np.float32)
    seg = np.zeros((2, size, size), np.float32)
    seg[:, 20:36, 20:36] = 1.0
    # one kp inside the tight bbox, one far outside
    lm = np.asarray([[[24.0, 24.0, 1.0], [2.0, 2.0, 1.0]]] * 2)
    bb = np.tile(np.asarray([20.0, 20.0, 16.0, 16.0]), (2, 1))
    with open(root / "0.pkl", "wb") as f:
        pickle.dump(
            {"video": video, "segmentations": seg, "bboxes": bb,
             "landmarks": lm, "sfm_poses": None}, f
        )
    ds = tig.YTVISPklDataset(str(tmp_path / "yt"), "cow", num_kps=2)
    n, s2v, spv = tig.explode_to_frames(ds, str(tmp_path / "c"), "cow", 10)
    mf = tig.MultiFrameDataset(
        tmp_dir=str(tmp_path / "c"), category="cow", sample_to_vid=s2v,
        samples_per_vid=spv, num_frames=2, img_size=32, mirror=False,
        transforms=False, tight_bboxes=True, v2_crop=True,
        remove_neck_kp=False, padding_frac=0.0,
    )
    item = mf[0]
    vis = item["kp"][0, :, 2]
    assert vis[0] == 1.0  # inside the crop
    assert vis[1] == 0.0  # outside the tight bbox -> invisible


def test_imagenet_quad_video_dataset(tmp_path):
    """ImageNet synset loader family (reference objects.py:66-112,157-185):
    multi-synset concat, bare rel_path prefixing, placeholder kps."""
    cv2 = pytest.importorskip("cv2")
    from acfm_video_3d_reconstruction_tpu.data.objects import (
        IMNET_CLASS2SYNSET,
        ImageNetQuadVideoDataset,
        standardize_rel_path,
    )

    assert IMNET_CLASS2SYNSET["cow"] == ["n01887787"]
    assert len(IMNET_CLASS2SYNSET["fox"]) == 4
    assert standardize_rel_path("n02119022_1.JPEG", "n02119022") == (
        "n02119022/n02119022_1.JPEG"
    )
    assert standardize_rel_path("a/b.JPEG", "n02119022") == "a/b.JPEG"

    img_dir = tmp_path / "imgs"
    anno_dir = tmp_path / "annos"
    anno_dir.mkdir()
    rng = np.random.default_rng(0)
    dt = np.dtype([("rel_path", "O"), ("mask", "O")])
    # two of fox's four synsets present (missing ones are skipped), one
    # image each; first uses a bare rel_path, second a nested one
    for j, (synset, rel) in enumerate(
        [("n02119022", "fox_a.png"), ("n02119789", "n02119789/fox_b.png")]
    ):
        d = img_dir / synset
        d.mkdir(parents=True, exist_ok=True)
        img = (rng.random((32, 48, 3)) * 255).astype(np.uint8)
        name = rel.split("/")[-1]
        cv2.imwrite(str(d / name), cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        mask = np.zeros((32, 48), np.uint8)
        mask[4 + j : 20, 6 : 30 + j] = 1
        images = np.zeros((1,), dt)
        images[0] = (rel, mask)
        sio.savemat(str(anno_dir / f"{synset}_train.mat"), {"images": images})

    ds = ImageNetQuadVideoDataset(
        str(img_dir), str(anno_dir), "fox", split="train", num_kps=5
    )
    assert len(ds) == 2
    for i in range(2):
        s = ds[i]
        assert s["video"].shape == (2, 32, 48, 3)
        assert s["segmentations"].shape == (2, 32, 48)
        # kp-less stills: zero, invisible placeholder landmarks
        assert s["landmarks"].shape == (2, 5, 3)
        assert (s["landmarks"] == 0).all()

    # unknown category / empty anno dir fail loudly
    with pytest.raises(KeyError):
        ImageNetQuadVideoDataset(str(img_dir), str(anno_dir), "dragon")
    with pytest.raises(FileNotFoundError):
        ImageNetQuadVideoDataset(str(img_dir), str(anno_dir), "zebra")
