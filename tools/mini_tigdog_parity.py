"""Mini-TigDog multiframe quality-parity run.

The multiframe analog of tools/mini_cub_parity.py: real TigDog video data
cannot ship in this environment, so this generates a schema-faithful
mini-TigDog pkl tree (per-video pkls {video, segmentations, bboxes,
landmarks, sfm_poses}, exactly the reference's
multiframe/data/tigdog_final.py layout, including the deterministic
14-video test split), renders self-consistent synthetic quadruped clips
with known GT cameras/deformations, then runs the REAL multiframe
pipeline end to end: cli.multiframe_main.train (cache exploding ->
MultiFrameDataset -> warmup + main loop on the camera multiplex) ->
cli.multiframe_evaluate (sequential clips, frame-0 IoU + pixel PCK, with
and without --optimize test-time optimization), reporting
`mean iou, pck.1, pck.15` per multiframe/benchmark/evaluate.py:227-245.

Usage: python tools/mini_tigdog_parity.py [--epochs 30] [--out DEMO_RESULTS.md]
"""
import argparse
import os
import os.path as osp
import pickle
import re
import subprocess
import sys
import time

sys.path.insert(0, ".")

import numpy as np

RAW = 144          # raw frame size written into the pkls
IMG = 128          # training/eval crop size
N_VIDEOS = 60      # > 14 so the deterministic split keeps 14 test videos
T_RAW = 6          # frames per video
NUM_KPS = 8
NUM_LBS = 12
ANCHORS = np.random.default_rng(11).choice(642, NUM_KPS, replace=False)


def generate(root, template):
    """Render synthetic clips into the TigDog pkl schema.

    Matches the reference's data contract (tigdog_mf_of.py:245-299):
    `sfm_poses` are final [-1,1]-unit weak-perspective cameras expressed in
    the standard square-bbox crop frame (the loader passes them through
    crop/scale untouched), while `landmarks`/`bboxes` are raw-frame pixels.
    Frames are Lambertian-shaded (per-face normals) so camera azimuth is
    identifiable from appearance — a flat-colored blob would leave the
    camera regressor with nothing to learn pose from.
    """
    import shutil

    import jax.numpy as jnp

    from acfm_video_3d_reconstruction_tpu.data import image_utils
    from acfm_video_3d_reconstruction_tpu.deform.solve import (
        lbs_from_logits, screened_poisson_solve,
    )
    from acfm_video_3d_reconstruction_tpu.geometry import camera as cam_utils
    from acfm_video_3d_reconstruction_tpu.ops import rasterizer as ras

    rng = np.random.default_rng(7)
    if osp.isdir(root):
        shutil.rmtree(root)
    cat_dir = osp.join(root, "horse")
    os.makedirs(cat_dir, exist_ok=True)

    A = lbs_from_logits(jnp.asarray(template.lbs_logits))
    L = jnp.asarray(template.uniform_L)
    base_verts = jnp.asarray(template.verts)
    faces = jnp.asarray(template.faces)
    fc = 40 if template.num_faces % 40 == 0 else template.num_faces

    for vid in range(N_VIDEOS):
        # smooth camera path + slowly-varying articulation across the clip
        ang0 = rng.uniform(-0.7, 0.7)
        dang = rng.uniform(-0.06, 0.06)
        scale = rng.uniform(0.35, 0.45)
        trans = rng.uniform(-0.12, 0.12, 2)
        base_deform = rng.normal(size=(NUM_LBS, 3)) * 0.05
        ddeform = rng.normal(size=(NUM_LBS, 3)) * 0.01

        cams = np.zeros((T_RAW, 7), np.float32)
        deforms = np.zeros((T_RAW, NUM_LBS, 3), np.float32)
        for t in range(T_RAW):
            a = ang0 + dang * t
            cams[t] = [scale, trans[0], trans[1],
                       np.cos(a / 2), 0.0, np.sin(a / 2), 0.0]
            deforms[t] = base_deform + ddeform * t

        pred_v = screened_poisson_solve(
            base_verts, A, jnp.asarray(deforms), L
        )
        jcams = jnp.asarray(cams)
        proj = cam_utils.orthographic_proj_withz(pred_v, jcams, offset_z=0.0)
        mask, _ = ras.soft_silhouette(proj, faces, RAW, face_chunk=fc)
        mask = (np.asarray(mask) > 0.5).astype(np.float32)

        # Lambertian-shaded frames: per-face camera-space normals dotted
        # with a fixed light, sampled per pixel through the hard z-buffer,
        # over a noise background. Shading varies with azimuth, so the
        # camera regressor can learn pose from appearance.
        frag = ras.hard_rasterize(proj, faces, RAW, face_chunk=fc)
        tri = proj[:, faces]                      # (T, F, 3, 3) cam space
        n = jnp.cross(tri[..., 1, :] - tri[..., 0, :],
                      tri[..., 2, :] - tri[..., 0, :])
        n = n * jnp.where(n[..., 2:] < 0, -1.0, 1.0)   # face the camera
        n = n / (jnp.linalg.norm(n, axis=-1, keepdims=True) + 1e-8)
        light = jnp.asarray([0.45, -0.35, 0.82])
        shade_f = 0.35 + 0.65 * jnp.clip(n @ light, 0.0, 1.0)  # (T, F)
        covered = frag.pix_to_face >= 0
        shade_px = jnp.take_along_axis(
            shade_f, jnp.where(covered, frag.pix_to_face, 0), axis=1
        )
        shade_px = jnp.where(covered, shade_px, 0.0)
        shade = np.asarray(shade_px).reshape(T_RAW, RAW, RAW)

        video = rng.uniform(0.0, 0.15, (T_RAW, RAW, RAW, 3)).astype(np.float32)
        color = rng.uniform(0.4, 0.9, 3).astype(np.float32)
        lit = mask * np.maximum(shade, 0.35 * mask)
        video = video * (1 - mask[..., None]) + lit[..., None] * color
        video = np.clip(video, 0, 1)

        # landmarks: anchor vertices projected to RAW pixel coords
        kp_ndc = np.asarray(
            cam_utils.project_points(pred_v[:, ANCHORS], jcams)
        )  # (T, K, 2) in [-1, 1]
        kp_px = (kp_ndc + 1.0) * 0.5 * (RAW - 1)
        vis = (
            (kp_px[..., 0] >= 0) & (kp_px[..., 0] < RAW)
            & (kp_px[..., 1] >= 0) & (kp_px[..., 1] < RAW)
        ).astype(np.float64)
        landmarks = np.concatenate([kp_px, vis[..., None]], -1)

        ys, xs = np.nonzero(mask.max(0))
        bbox = np.asarray(
            [xs.min() - 4, ys.min() - 4, xs.max() + 4, ys.max() + 4], np.float64
        )
        # Express the cameras in the square-crop frame the loader will
        # produce (sfm_poses pass through the loader untouched, matching
        # tigdog_mf_of.py:245-299): raw-NDC -> crop-NDC for the
        # square_bbox at (x0, y0) with side S.
        sq = image_utils.square_bbox(bbox)
        x0, y0, S = sq[0], sq[1], sq[2] - sq[0] + 1
        crop_cams = cams.copy()
        r = (RAW - 1) / S
        crop_cams[:, 0] = cams[:, 0] * r
        crop_cams[:, 1] = (cams[:, 1] + 1.0) * r - 2.0 * x0 / S - 1.0
        crop_cams[:, 2] = (cams[:, 2] + 1.0) * r - 2.0 * y0 / S - 1.0
        with open(osp.join(cat_dir, f"video_{vid:03d}.pkl"), "wb") as f:
            pickle.dump(
                {
                    "video": video,
                    "segmentations": mask,
                    "bboxes": np.tile(bbox, (T_RAW, 1)),
                    "landmarks": landmarks,
                    "sfm_poses": crop_cams.astype(np.float64),
                },
                f,
            )
    print(f"wrote {N_VIDEOS} videos to {cat_dir}", flush=True)


def run_eval(o, extra):
    """Run the evaluate CLI in a subprocess; parse `mean iou ...`."""
    cmd = [
        sys.executable, "-m",
        "acfm_video_3d_reconstruction_tpu.cli.multiframe_evaluate",
        "--name", o["name"], "--category", "horse",
        "--root_dir", o["root_dir"], "--tmp_dir", o["tmp_dir"],
        "--checkpoint_dir", o["checkpoint_dir"],
        "--img_size", str(IMG), "--num_lbs", str(NUM_LBS),
        "--num_kps", str(NUM_KPS), "--num_frames", "2",
        "--num_guesses", str(o["num_guesses"]), "--batch_size", "4",
        "--num_training_frames", "1000",
        "--texture=False", "--of_loss_wt", "0",
        "--results_dir", osp.join(o["tmp_dir"], "eval"),
    ] + extra
    env = dict(os.environ)
    env.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")
    out = subprocess.run(
        cmd, capture_output=True, text=True, env=env, cwd=os.getcwd()
    )
    text = out.stdout + out.stderr
    m = re.search(
        r"mean iou ([0-9.eE+-]+), pck\.1 ([0-9.eE+-]+), pck\.15 ([0-9.eE+-]+)",
        text,
    )
    if not m:
        print(text[-4000:])
        raise RuntimeError("evaluate CLI did not print metrics")
    return {
        "mean_iou": float(m.group(1)),
        "pck_0.1": float(m.group(2)),
        "pck_0.15": float(m.group(3)),
    }


def _format_table(args, before, res, dt, partial=False):
    """Render the 8-column results table (nan -> 'n/a' for pending cols)."""

    def cell(d, k):
        v = d[k]
        return "n/a" if v != v else f"{v:.3f}"

    rows = []
    for label, k in (("mean mask IoU", "mean_iou"), ("PCK@0.1", "pck_0.1"),
                     ("PCK@0.15", "pck_0.15")):
        rows.append(
            f"| {label} | {cell(before, k)} | {cell(res['after'], k)} "
            f"| {cell(res['tto'], k)} | {cell(res['tto_cam'], k)} "
            f"| {cell(res['train_argmax'], k)} "
            f"| {cell(res['train_reg'], k)} "
            f"| {cell(res['gtcam'], k)} "
            f"| {cell(res['gtcam_al'], k)} |"
        )
    head = (
        "\n## Mini-TigDog multiframe parity run (tools/mini_tigdog_parity.py)"
        + (" — PARTIAL (evals still running at snapshot time)" if partial
           else "") + "\n\n"
        "Multiframe pipeline end-to-end on a re-generated mini-TigDog pkl tree "
        "in the reference's exact per-video schema (real TigDog videos are not "
        "available in this environment): VideoPklDataset (deterministic "
        "14-video test split) -> cache exploding -> MultiFrameDataset -> "
        f"camera-multiplex warmup + {args.epochs} epochs (batch 4 clips x 2 "
        f"frames, {IMG}^2) -> benchmark evaluation per "
        "multiframe/benchmark/evaluate.py:227-245 (frame-0 IoU, pixel PCK), "
        "with and without test-time optimization.\n\n"
        "| metric | random init | trained | trained + TTO | + TTO(shape+camera) | train split (argmax mpx) | train split (regressed cam) | held-out, GT camera (diagnostic) | held-out, gauge-aligned GT camera |\n"
        "|---|---|---|---|---|---|---|---|---|\n"
    )
    tail = (
        f"\ntrain wall-clock {dt:.1f}s. The reference publishes no multiframe "
        "IoU/PCK numbers in-repo (its benchmark prints them per run, "
        "monocular CUB PCK@0.1=0.915 is the only published metric); this run "
        "demonstrates the identical multiframe pipeline (schema, split, "
        "multiplex warmup, TTO, eval) converging on schema-faithful "
        "synthetic clips with known GT.\n"
    )
    return head + "\n".join(rows) + "\n" + tail


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--root", type=str, default="/tmp/mini_tigdog")
    ap.add_argument("--out", type=str, default="DEMO_RESULTS.md")
    ap.add_argument("--num_optim_iter", type=int, default=60)
    ap.add_argument("--videos", type=int, default=0,
                    help="override N_VIDEOS (>14 keeps the deterministic "
                         "14-video test split; use ~24 for CPU-scale runs)")
    ap.add_argument("--img", type=int, default=0,
                    help="override the train/eval crop size (and scales the "
                         "raw pkl frames with it; use 64 for CPU-scale runs)")
    ap.add_argument("--guesses", type=int, default=4,
                    help="camera hypotheses in the multiplex")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse an existing generated tree + trained "
                         "checkpoint under --root (iterate on eval columns "
                         "without the 40-epoch retrain)")
    ap.add_argument("--skip_gen", action="store_true",
                    help="reuse an existing generated pkl tree under --root "
                         "but retrain from scratch (generation dominates "
                         "wall-clock at --videos >> 60 on the tunneled chip)")
    ap.add_argument("--skip_before", action="store_true",
                    help="skip the random-init eval column (~15 min of "
                         "wall-clock; its value is documented in the "
                         "recorded run-A/B tables)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (sets ACFM_FORCE_CPU for "
                         "this process and the evaluate-CLI subprocesses; "
                         "the hosted TPU plugin ignores JAX_PLATFORMS and "
                         "hangs when the tunnel is down)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["ACFM_FORCE_CPU"] = "1"
    global N_VIDEOS, IMG, RAW
    if args.videos:
        N_VIDEOS = args.videos
    if args.img:
        RAW = round(args.img * RAW / IMG)
        IMG = args.img

    from acfm_video_3d_reconstruction_tpu.cli import multiframe_main as cli
    from acfm_video_3d_reconstruction_tpu.models import build_template

    template = build_template(
        subdivide=3, num_lbs=NUM_LBS, tex_size=2, num_kps=NUM_KPS,
        kp_vertex_ids=[np.asarray([a]) for a in ANCHORS],
    )
    if not args.skip_train and not args.skip_gen:
        print("generating mini-TigDog ...", flush=True)
        generate(args.root, template)

    o = cli.default_opts()
    o.update(
        name="mini_tigdog",
        category="horse",
        root_dir=args.root,
        tmp_dir=osp.join(args.root, "cache"),
        checkpoint_dir=osp.join(args.root, "snapshots"),
        img_size=IMG,
        num_lbs=NUM_LBS,
        subdivide=3,
        num_kps=NUM_KPS,
        num_frames=2,
        num_guesses=args.guesses,
        batch_size=4,
        num_epochs=args.epochs,
        num_training_frames=1000,
        num_reps=2,
        texture=False,
        of_loss_wt=0.0,
        kp_loss_wt=30.0,
        mask_loss_wt=5.0,
        warmup=True,
        init_camera_emb=True,
        # synthetic kp anchors have no left/right-symmetric layout; the
        # mirror kp-perm cannot apply (see --mirror flag docstring)
        mirror=False,
        log_every=20,
        save_epoch_freq=max(args.epochs, 1),
        save_latest_freq=200,
    )

    nan = {"mean_iou": float("nan"), "pck_0.1": float("nan"),
           "pck_0.15": float("nan")}
    if args.skip_train:
        before = dict(nan)
        dt = 0.0
    else:
        if args.skip_before:
            before = dict(nan)
        else:
            before = run_eval(o, [])
            print("before (random init):", before, flush=True)

        t0 = time.perf_counter()
        cli.train(o)
        dt = time.perf_counter() - t0
        print(f"trained {args.epochs} epochs in {dt:.1f}s", flush=True)

    # Eval plan, highest-diagnostic-value first, with an incremental
    # partial table rewritten after every column: a wall-clock cutoff
    # mid-evals then still leaves the key columns on disk.
    # - gtcam_al: gauge-invariant GT-camera ceiling — the multiplex fixes
    #   shape+cameras only up to a global similarity, so raw GT cameras
    #   understate the ceiling once the learned canonical frame drifts;
    #   Kabsch-align the learned mean shape to the GT template and
    #   correct the GT cameras.
    # - tto_cam: TTO over shape AND camera — the reference's own tiger
    #   recipe (docs/setup_video.md: --optimize --optimize_camera).
    # - train argmax: train-split fit through the argmax multiplex camera
    #   (reference benchmark's train-split mode, predictor.py:239-252) —
    #   isolates multiplex/shape convergence from camera generalization.
    # - train reg: train split through the REGRESSED camera — vs argmax
    #   separates distillation gap from held-out generalization gap.
    # - gtcam: raw GT-camera diagnostic (no gauge correction).
    plan = [
        ("after", "trained", []),
        ("gtcam_al", "held-out, gauge-aligned GT camera",
         ["--use_gt_camera", "--gauge_align"]),
        ("tto_cam", "trained + TTO(shape+camera)",
         ["--optimize", "--optimize_camera",
          "--num_optim_iter", str(args.num_optim_iter)]),
        ("tto", "trained + TTO",
         ["--optimize", "--num_optim_iter", str(args.num_optim_iter)]),
        ("train_argmax", "train split (argmax multiplex)",
         ["--split", "train", "--use_argmax_camera"]),
        ("gtcam", "held-out, GT camera (diagnostic)", ["--use_gt_camera"]),
        ("train_reg", "train split (regressed cam)", ["--split", "train"]),
    ]
    res = {key: dict(nan) for key, _, _ in plan}
    partial_path = args.out + ".partial.md"
    for key, label, extra in plan:
        res[key] = run_eval(o, extra)
        print(f"{label}: {res[key]}", flush=True)
        with open(partial_path, "w") as f:
            f.write(_format_table(args, before, res, dt, partial=True))
    with open(args.out, "a") as f:
        f.write(_format_table(args, before, res, dt))
    print(f"appended mini-TigDog results to {args.out}")


if __name__ == "__main__":
    main()
