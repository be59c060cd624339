"""Mini-CUB quality-parity run.

Real CUB_200_2011 images cannot ship in this environment, so this tool
re-generates a faithful mini-CUB from the reference's exact annotation
schema (monocular/data/cub.py: images/ PNGs + data/<split>_cub_cleaned.mat
with rel_path/mask/bbox.x1..y2/parts + sfm/anno_<split>.mat with
scale/trans/rot + S/conv_tri), renders self-consistent synthetic birds
with known GT, then runs the REAL monocular pipeline end to end:
CUBDataset -> DataLoader -> run_monocular_training -> evaluator, reporting
PCK@0.1/0.15 and mask IoU on a held-out split exactly like
monocular/evaluate.py:95-104.

Usage: python tools/mini_cub_parity.py [--steps 600] [--out DEMO_RESULTS.md]
"""
import argparse
import dataclasses
import os
import os.path as osp
import sys
import time

sys.path.insert(0, ".")

import numpy as np
import scipy.io as sio

RAW = 192          # raw image size written to disk
IMG = 128          # training crop size
N_TRAIN = 512      # default matches the recorded DEMO_RESULTS.md run
N_TEST = 24
GEN_CHUNK = 64     # render the synthetic set in batches of this many frames
NUM_KPS = 8
NUM_LBS = 12
# kp anchor vertices shared by generation and the template's vert2kp init
# (the reference inits vert2kp from its kp dictionary, mesh_net.py:354-397)
ANCHORS = np.random.default_rng(11).choice(642, NUM_KPS, replace=False)


def quaternion_matrix(q):
    w, x, y, z = q
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def generate(root, template, n_train=N_TRAIN, n_test=N_TEST):
    """Render synthetic birds into the reference CUB annotation layout.

    n_train/n_test are explicit parameters (not module globals) so callers
    that override the split size cannot leave a stale global behind.
    """
    import cv2
    import jax
    import jax.numpy as jnp

    from acfm_video_3d_reconstruction_tpu.deform.solve import (
        lbs_from_logits, screened_poisson_solve,
    )
    from acfm_video_3d_reconstruction_tpu.geometry import camera as cam_utils
    from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ras

    rng = np.random.default_rng(7)
    kp_verts = ANCHORS
    N = n_train + n_test
    # GT normalized cameras in the RAW frame (object ~40% of frame)
    cams = np.zeros((N, 7), np.float32)
    ang = rng.uniform(-0.7, 0.7, N)
    cams[:, 0] = rng.uniform(0.35, 0.45, N)
    cams[:, 1:3] = rng.uniform(-0.15, 0.15, (N, 2))
    cams[:, 3] = np.cos(ang / 2)
    cams[:, 5] = np.sin(ang / 2)
    deform = (rng.normal(size=(N, NUM_LBS, 3)) * 0.1).astype(np.float32)

    A = lbs_from_logits(jnp.asarray(template.lbs_logits))
    pred_v = screened_poisson_solve(
        jnp.asarray(template.verts), A, jnp.asarray(deform),
        jnp.asarray(template.uniform_L),
    )
    jcams = jnp.asarray(cams)
    proj = cam_utils.orthographic_proj_withz(pred_v, jcams, offset_z=5.0)
    fc = 40 if template.num_faces % 40 == 0 else template.num_faces
    faces_j = jnp.asarray(template.faces)
    light = jnp.asarray([0.45, -0.35, 0.82])

    # Rasterize in GEN_CHUNK-frame batches (a single call at N in the
    # hundreds would hold N x RAW^2 x face_chunk intermediates at once).
    # A ragged final chunk is padded to GEN_CHUNK (results sliced) so the
    # rasterizer JIT-compiles exactly once per run.
    # Lambertian shading from per-face camera-space normals so azimuth is
    # identifiable from appearance (the predicted-camera eval needs the
    # encoder to be able to learn pose; a pose-invariant gradient texture
    # leaves only the silhouette, which is rotation-ambiguous).
    masks_l, shades_l = [], []
    for c0 in range(0, N, GEN_CHUNK):
        take = min(GEN_CHUNK, N - c0)
        pj = proj[c0:c0 + take]
        if take < GEN_CHUNK:
            pj = jnp.concatenate(
                [pj, jnp.tile(pj[-1:], (GEN_CHUNK - take, 1, 1))], axis=0
            )
        mask, _ = ras.soft_silhouette(pj, faces_j, RAW, face_chunk=fc)
        masks_l.append(np.asarray(mask > 0.5, np.float32)[:take])
        frag = ras.hard_rasterize(pj, faces_j, RAW, face_chunk=fc)
        tri = pj[:, faces_j]
        nrm = jnp.cross(tri[..., 1, :] - tri[..., 0, :],
                        tri[..., 2, :] - tri[..., 0, :])
        nrm = nrm * jnp.where(nrm[..., 2:] < 0, -1.0, 1.0)
        nrm = nrm / (jnp.linalg.norm(nrm, axis=-1, keepdims=True) + 1e-8)
        shade_f = 0.35 + 0.65 * jnp.clip(nrm @ light, 0.0, 1.0)
        cov = frag.pix_to_face >= 0
        shade_px = jnp.take_along_axis(
            shade_f, jnp.where(cov, frag.pix_to_face, 0), axis=1
        )
        shades_l.append(np.asarray(
            jnp.where(cov, shade_px, 0.0)
        ).reshape(-1, RAW, RAW).astype(np.float32)[:take])
    masks = np.concatenate(masks_l, axis=0)
    shades = np.concatenate(shades_l, axis=0)
    kp2d = np.asarray(
        cam_utils.project_points(pred_v[:, kp_verts], jcams)
    )  # [-1,1] of the raw frame
    kp_px = (kp2d + 1.0) / 2.0 * RAW

    gx = np.linspace(0, 1, RAW, dtype=np.float32)
    os.makedirs(osp.join(root, "images"), exist_ok=True)
    os.makedirs(osp.join(root, "cache", "data"), exist_ok=True)
    os.makedirs(osp.join(root, "cache", "sfm"), exist_ok=True)

    splits = {"train": range(n_train), "test": range(n_train, N)}
    for split, ids in splits.items():
        dt = np.dtype([("rel_path", "O"), ("mask", "O"), ("bbox", "O"),
                       ("parts", "O")])
        images = np.zeros((len(list(ids)),), dt)
        sdt = np.dtype([("scale", "O"), ("trans", "O"), ("rot", "O")])
        sfm = np.zeros((images.shape[0],), sdt)
        for j, i in enumerate(splits[split]):
            m = masks[i]
            sh = shades[i]
            img = np.stack(
                [sh * 0.9, sh * 0.55 + 0.25 * m * gx[None, :], m * 0.5],
                axis=-1,
            )
            rel = f"{split}_{j:03d}.png"
            cv2.imwrite(
                osp.join(root, "images", rel),
                cv2.cvtColor((img * 255).astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
            ys, xs = np.nonzero(m > 0.5)
            pad = 6
            # one-indexed bbox (reference schema subtracts 1 on load)
            bbox = {
                "x1": float(max(xs.min() - pad, 0) + 1),
                "y1": float(max(ys.min() - pad, 0) + 1),
                "x2": float(min(xs.max() + pad, RAW - 1) + 1),
                "y2": float(min(ys.max() + pad, RAW - 1) + 1),
            }
            parts = np.concatenate(
                [kp_px[i].T + 1.0, np.ones((1, NUM_KPS))], axis=0
            )  # (3, K) one-indexed, all visible
            images[j] = (rel, m.astype(np.uint8), bbox, parts)
            # pixel-frame weak-persp camera for the raw image
            s_px = RAW / 2.0 * cams[i, 0]
            t_px = RAW * (cams[i, 1:3] + 1.0) / 2.0
            sfm[j] = (
                np.asarray([s_px]), t_px.astype(np.float64),
                quaternion_matrix(cams[i, 3:7]),
            )
        sio.savemat(
            osp.join(root, "cache", "data", f"{split}_cub_cleaned.mat"),
            {"images": images},
        )
        S = np.asarray(pred_v[0, kp_verts]).T  # (3, K) mean-ish shape kps
        sio.savemat(
            osp.join(root, "cache", "sfm", f"anno_{split}.mat"),
            {"sfm_anno": sfm, "S": S.T, "conv_tri": np.ones((1, 3))},
        )
    return deform, kp_verts


def main():
    ap = argparse.ArgumentParser()
    # defaults match the recorded DEMO_RESULTS.md run (--n_train 512
    # --steps 3000) so running the tool as-is reproduces the table
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--n_train", type=int, default=512,
                    help="training images; test PCK through the predicted "
                         "camera is generalization- (data-) bound, >=512 "
                         "for the recorded parity run")
    ap.add_argument("--root", type=str, default="/tmp/mini_cub")
    ap.add_argument("--out", type=str, default="DEMO_RESULTS.md")
    ap.add_argument("--append", action="store_true", default=True)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the hosted TPU plugin "
                         "rewrites jax_platforms to 'axon,cpu' and hangs "
                         "when the tunnel is down; JAX_PLATFORMS alone "
                         "cannot override it)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["ACFM_FORCE_CPU"] = "1"
    n_train = args.n_train
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from acfm_video_3d_reconstruction_tpu import config as cfg_lib
    from acfm_video_3d_reconstruction_tpu.data.cub import CUBDataset
    from acfm_video_3d_reconstruction_tpu.data.loader import DataLoader
    from acfm_video_3d_reconstruction_tpu.eval import metrics as em
    from acfm_video_3d_reconstruction_tpu.models import build_template
    from acfm_video_3d_reconstruction_tpu.train import monocular

    template = build_template(
        subdivide=3, num_lbs=NUM_LBS, tex_size=4, num_kps=NUM_KPS,
        kp_vertex_ids=[np.asarray([a]) for a in ANCHORS],
    )
    print("generating mini-CUB ...", flush=True)
    generate(args.root, template, n_train=n_train)

    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=IMG, nz_feat=128, num_lbs=NUM_LBS,
            num_kps=NUM_KPS, tex_size=4, texture=True, symmetric=False,
            symmetric_texture=False, dtype="bfloat16",
        ),
        # mask 5 balances kp 30 on synthetic data (DEMO_RESULTS.md ablation)
        mono_weights=dataclasses.replace(
            cfg_lib.MonocularLossWeights(), triangle=0.3, mask=5.0,
        ),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(), batch_size=8, use_gtpose=True,
            learning_rate=3e-4,
        ),
    )
    mods, tx, state = monocular.build(cfg, template, jax.random.PRNGKey(0))
    # Evaluation projects through the PREDICTED camera, faithful to the
    # reference evaluator (monocular/nnutils/predictor.py:110-159 always
    # uses cam_pred) — training may use GT pose, evaluation never does.
    eval_cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, use_gtpose=False)
    )
    eval_mods = dataclasses.replace(mods, cfg=eval_cfg)

    # mirror=False: the synthetic kp anchors are arbitrary vertices with no
    # left/right-symmetric layout, so the reference's mirror kp-perm cannot
    # apply — mirrored samples would carry unlearnable kp labels
    train_ds = CUBDataset(args.root, osp.join(args.root, "cache"),
                          split="train", img_size=IMG, jitter_frac=0.0,
                          mirror=False)
    # deterministic copy of the train split for fit evaluation
    train_eval_ds = CUBDataset(args.root, osp.join(args.root, "cache"),
                               split="train", img_size=IMG, jitter_frac=0.0)
    train_eval_ds.split = "eval"  # disable the random mirror
    test_ds = CUBDataset(args.root, osp.join(args.root, "cache"),
                         split="test", img_size=IMG, jitter_frac=0.0,
                         padding_frac=0.05)
    loader = DataLoader(train_ds, 8, shuffle=True, seed=0)
    test_loader = DataLoader(test_ds, 8, shuffle=False, drop_last=False)
    train_eval_loader = DataLoader(
        train_eval_ds, 8, shuffle=False, drop_last=False
    )

    step = monocular.make_train_step(mods, tx)
    ev = monocular.make_eval_step(eval_mods)

    def evaluate(state, which=test_loader):
        stats = em.BenchStats()
        for b in which:
            jb = {k: jnp.asarray(v) for k, v in b.items() if k != "inds"}
            aux = ev(state, jb)
            mp = (np.asarray(aux["mask_pred"]) > 0.5).astype(np.float32)
            iou = em.mask_iou(np.asarray(b["mask"]), mp)
            err, vis = em.kp_errors(np.asarray(aux["kp_pred"]), np.asarray(b["kp"]))
            stats.update(iou, err, vis)
        return stats.results()

    before = evaluate(state)
    print("before:", before, flush=True)
    t0 = time.perf_counter()
    n = 0
    losses = []
    while n < args.steps:
        for b in loader:
            jb = {k: jnp.asarray(v) for k, v in b.items() if k != "inds"}
            state, metrics = step(state, jb)
            n += 1
            if n % 50 == 0:
                losses.append(round(float(metrics["total_loss"]), 4))
                print(f"step {n}: {losses[-1]}", flush=True)
            if n >= args.steps:
                break
    dt = time.perf_counter() - t0
    after = evaluate(state)
    after_train = evaluate(state, train_eval_loader)
    print("after (test):", after, flush=True)
    print("after (train-fit):", after_train, flush=True)

    table = (
        "\n## Mini-CUB parity run (tools/mini_cub_parity.py)\n\n"
        "Monocular pipeline end-to-end on a re-generated mini-CUB in the "
        "reference's exact .mat/images schema (real CUB images are not "
        "available in this environment): CUBDataset "
        f"(`python tools/mini_cub_parity.py --n_train {n_train} --steps "
        f"{args.steps}`; {n_train} train / {N_TEST} held-out images) -> train "
        f"{args.steps} steps (batch 8, {IMG}^2, bf16) -> held-out-split "
        "evaluation per monocular/evaluate.py:95-104 through the PREDICTED "
        "camera (the reference evaluator never uses GT pose, "
        "monocular/nnutils/predictor.py:110-159).\n\n"
        "| metric | random init | trained | reference (real CUB, 64 handles) |\n"
        "|---|---|---|---|\n"
        f"| mean mask IoU | {before['mean_iou']:.3f} | {after['mean_iou']:.3f} | (printed, unpublished) |\n"
        f"| PCK@0.1 | {before['pck_0.1']:.3f} | {after['pck_0.1']:.3f} | 0.915 |\n"
        f"| PCK@0.15 | {before['pck_0.15']:.3f} | {after['pck_0.15']:.3f} | — |\n\n"
        f"train-split fit after training: IoU {after_train['mean_iou']:.3f}, "
        f"PCK@0.1 {after_train['pck_0.1']:.3f}\n\n"
        f"loss trajectory (every 50): {losses}\n\n"
        f"wall-clock {dt:.1f}s. The published 0.915 PCK@0.1 is on real CUB "
        "birds after 330 epochs; this run demonstrates the identical "
        "pipeline (schema, loaders, losses, eval) converging on "
        "schema-faithful synthetic data with known GT. Gap to the "
        "published number is unmeasurable without the real dataset.\n"
    )
    with open(args.out, "a") as f:
        f.write(table)
    print(f"appended mini-CUB results to {args.out}")


if __name__ == "__main__":
    main()
