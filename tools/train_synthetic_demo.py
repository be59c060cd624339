"""End-to-end learning demo on the TPU: train the monocular model on the
self-consistent synthetic dataset and report mask-IoU / PCK before vs
after. Writes DEMO_RESULTS.md. This is the fixed-seed convergence evidence
the reference repo never had (SURVEY.md §4)."""
import argparse
import dataclasses
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from acfm_video_3d_reconstruction_tpu import config as cfg_lib
from acfm_video_3d_reconstruction_tpu.data.synthetic import (
    SyntheticConfig,
    SyntheticDataset,
    preprocess_batch,
)
from acfm_video_3d_reconstruction_tpu.eval import metrics as em
from acfm_video_3d_reconstruction_tpu.models import build_template
from acfm_video_3d_reconstruction_tpu.train import monocular

IMG = 128
BATCH = 8

ap = argparse.ArgumentParser()
ap.add_argument("--steps", type=int, default=800)
# defaults found by the round-2 ablation (see DEMO_RESULTS.md): mask 5
# balances the reference's kp 30 on this synthetic set
ap.add_argument("--mask_wt", type=float, default=5.0)
ap.add_argument("--kp_wt", type=float, default=30.0)
ap.add_argument("--triangle_wt", type=float, default=3.0)
ap.add_argument("--rigid_wt", type=float, default=0.5)
ap.add_argument("--boundaries_wt", type=float, default=1.0)
ap.add_argument("--lr", type=float, default=3e-4)
ap.add_argument("--cosine", action="store_true", default=True,
                help="cosine-decay lr to 1%")
ap.add_argument("--out", type=str, default="DEMO_RESULTS.md")
ARGS = ap.parse_args()
STEPS = ARGS.steps


def main():
    # fixed kp anchors shared by the dataset and the template's vert2kp
    # init — the reference never learns the assignment from scratch either
    # (kp-dictionary / SfM-distance init, mesh_net.py:354-397)
    anchors = np.random.default_rng(11).choice(642, 8, replace=False)
    template = build_template(
        subdivide=3, num_lbs=12, tex_size=4, num_kps=8,
        kp_vertex_ids=[np.asarray([a]) for a in anchors],
    )
    cfg = cfg_lib.Config(
        model=dataclasses.replace(
            cfg_lib.ModelConfig(), img_size=IMG, nz_feat=128, num_lbs=12,
            num_kps=8, tex_size=4, texture=True, symmetric=False,
            symmetric_texture=False, dtype="bfloat16",
        ),
        # reference CUB weights, with the smoothness prior scaled to the
        # demo's step budget (the wt-30 Laplacian transiently shrinks the
        # template over the first ~1k steps before mask/kp anchoring wins —
        # fine over the reference's 100k-step runs, noise in a short demo)
        mono_weights=dataclasses.replace(
            cfg_lib.MonocularLossWeights(),
            mask=ARGS.mask_wt, kp=ARGS.kp_wt, triangle=ARGS.triangle_wt,
            rigid=ARGS.rigid_wt, boundaries=ARGS.boundaries_wt,
        ),
        train=dataclasses.replace(
            cfg_lib.TrainConfig(), batch_size=BATCH, use_gtpose=True,
            learning_rate=ARGS.lr,
        ),
    )
    mods, tx, state = monocular.build(cfg, template, jax.random.PRNGKey(0))
    if ARGS.cosine:
        import optax

        sched = optax.cosine_decay_schedule(ARGS.lr, STEPS, alpha=0.01)
        tx = optax.adam(sched, b1=0.9, b2=0.999)
        state = state.replace(opt_state=tx.init(state.params))
    ds = SyntheticDataset(
        template,
        SyntheticConfig(num_frames_total=BATCH * 4, clip_len=1, image_size=IMG,
                        num_kps=8, seed=3, kp_vertex_ids=tuple(anchors)),
    )
    step = monocular.make_train_step(mods, tx)
    ev = monocular.make_eval_step(mods)

    def batch_for(ids):
        b = preprocess_batch(ds.get_batch(np.asarray(ids)), IMG)
        out = {k: jnp.asarray(b[k][:, 0]) for k in ("img", "mask", "kp", "sfm_pose")}
        out["edt"] = jnp.asarray(b["edt"])
        out["boundaries"] = jnp.asarray(b["boundaries"])
        return out

    batches = [batch_for(range(i * BATCH, (i + 1) * BATCH)) for i in range(4)]

    def evaluate(state):
        stats = em.BenchStats()
        for b in batches:
            aux = ev(state, b)
            mp = (np.asarray(aux["mask_pred"]) > 0.5).astype(np.float32)
            iou = em.mask_iou(np.asarray(b["mask"]), mp)
            err, vis = em.kp_errors(np.asarray(aux["kp_pred"]), np.asarray(b["kp"]))
            stats.update(iou, err, vis)
        return stats.results()

    before = evaluate(state)
    print("before:", before, flush=True)
    t0 = time.perf_counter()
    losses = []
    for i in range(STEPS):
        state, metrics = step(state, batches[i % len(batches)])
        if i % 50 == 0:
            losses.append(float(metrics["total_loss"]))
            parts = {
                k: round(float(v), 4)
                for k, v in metrics.items()
                if k in ("kp_loss", "mask_loss", "tri_loss", "rigid_loss",
                         "edt_loss", "bdt_loss", "tex_loss")
            }
            print(f"step {i}: total_loss={losses[-1]:.4f} {parts}", flush=True)
    jax.block_until_ready(metrics["total_loss"])
    dt = time.perf_counter() - t0
    after = evaluate(state)
    print("after:", after, flush=True)

    with open(ARGS.out, "w") as f:
        f.write(
            "# Synthetic convergence demo (tools/train_synthetic_demo.py)\n\n"
            f"Monocular trainer, {STEPS} steps, batch {BATCH}, {IMG}^2, one TPU "
            f"chip, self-consistent synthetic dataset (known GT cameras/"
            f"deformations), fixed seeds.\n\n"
            f"| metric | before | after |\n|---|---|---|\n"
            f"| mean mask IoU | {before['mean_iou']:.3f} | {after['mean_iou']:.3f} |\n"
            f"| PCK@0.1 | {before['pck_0.1']:.3f} | {after['pck_0.1']:.3f} |\n"
            f"| PCK@0.15 | {before['pck_0.15']:.3f} | {after['pck_0.15']:.3f} |\n\n"
            f"loss trajectory (every 50 steps): {json.dumps([round(x, 4) for x in losses])}\n\n"
            f"wall-clock: {dt:.1f}s for {STEPS} steps "
            f"({STEPS * BATCH / dt:.1f} frames/s at {IMG}^2).\n"
        )
    print(f"wrote {ARGS.out} ({dt:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
