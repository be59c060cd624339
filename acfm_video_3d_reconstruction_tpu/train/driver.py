"""Host-side training drivers: epoch loops, phases, checkpoints, logging.

Parity targets: reference monocular/nnutils/train_utils.py train() and
multiframe/nnutils/train_utils.py train() — camera-embedding init pass,
pose warmup epochs, texture warmup, main loop with hypothesis-drop and
finetune-camera schedules, labeled checkpoints ('warmup',
'texture_warmup', 'latest', epoch).

Device placement: steps are jitted over the active mesh; batches are
host-sharded onto the data axis (single chip = trivial mesh).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np

from .. import config as cfg_lib
from ..parallel import mesh as pmesh
from . import checkpoints, metrics_logger, prefetch, schedules
from . import monocular as mono
from . import multiframe as mf


def _save_dir(cfg: cfg_lib.Config) -> str:
    import os.path as osp

    return osp.join(cfg.train.checkpoint_dir, cfg.train.name)


def _nan_dump_dir() -> Optional[str]:
    """ACFM_NAN_DUMP_DIR: per-step non-finite-loss detection (debug aid).

    When set, every train step's total_loss is checked on host (one sync
    per step — debugging cost, so env-gated); on the FIRST non-finite
    value the PRE-step state and the offending batch are pickled to the
    directory and training aborts. The saved pair reproduces the bad
    gradient step offline (dissect per-loss grads to locate the NaN)."""
    import os

    return os.environ.get("ACFM_NAN_DUMP_DIR") or None


def _check_finite_or_dump(dump_dir, epoch, step, prev_pair, metrics):
    import math
    import os
    import pickle

    tl = float(jax.device_get(metrics["total_loss"]))
    if math.isfinite(tl):
        return
    os.makedirs(dump_dir, exist_ok=True)
    path = f"{dump_dir}/nan_step_{step}.pkl"
    state, batch = prev_pair if prev_pair is not None else (None, None)
    with open(path, "wb") as f:
        pickle.dump(
            {
                "epoch": epoch,
                "step": step,
                "state": jax.device_get(state),
                "batch": jax.device_get(batch),
                "metrics": jax.device_get(metrics),
            },
            f,
        )
    raise FloatingPointError(
        f"non-finite total_loss at epoch {epoch} step {step}; the "
        f"poisoning step's pre-step state + batch dumped to {path}"
    )


def to_device(mesh, batch: dict) -> dict:
    return pmesh.shard_batch(mesh, batch)


def run_monocular_training(
    cfg: cfg_lib.Config,
    template,
    loader,
    num_epochs: Optional[int] = None,
    log_every: int = 20,
    face_chunk: int = 128,
    load_pretrained=None,
    load_lpips=None,
    vis_fn=None,
):
    """Monocular train loop (reference monocular train_utils.py:192-264).

    load_pretrained / load_lpips: optional weight mergers applied before
    replication (ImageNet resnet18 encoder, monocular/nnutils/
    mesh_net.py:87-95; pretrained LPIPS AlexNet, loss_utils.py:361-363).
    """
    mesh = pmesh.make_mesh()
    mods, tx, state = mono.build(cfg, template, jax.random.PRNGKey(cfg.train.seed))
    if vis_fn is None and cfg.train.display_freq > 0:
        from . import visualize

        vis_fn = visualize.make_monocular_vis_fn(mods, face_chunk)
    if load_pretrained is not None:
        params, batch_stats = load_pretrained(state.params, state.batch_stats)
        state = state.replace(params=params, batch_stats=batch_stats)
    if load_lpips is not None:
        state = state.replace(lpips_params=load_lpips(state.lpips_params))
    state = pmesh.replicate(mesh, state)
    step = mono.make_train_step(mods, tx, face_chunk=face_chunk)
    save_dir = _save_dir(cfg)
    logger = metrics_logger.MetricsLogger(save_dir)
    metrics_logger.dump_config(save_dir, cfg)

    if cfg.train.num_pretrain_epochs > 0 and checkpoints.exists(
        cfg.train.checkpoint_dir, cfg.train.name, cfg.train.num_pretrain_epochs
    ):
        state = checkpoints.restore(
            cfg.train.checkpoint_dir, cfg.train.name, cfg.train.num_pretrain_epochs, state
        )

    total_steps = 0
    n_epochs = num_epochs if num_epochs is not None else cfg.train.num_epochs
    for epoch in range(cfg.train.num_pretrain_epochs, n_epochs):
        for db in prefetch.prefetch(loader, lambda b: to_device(mesh, b)):
            state, metrics = step(state, db)
            total_steps += 1
            if total_steps % log_every == 0:
                logger.log(epoch, total_steps, jax.device_get(metrics))
            if (
                cfg.train.save_latest_freq > 0
                and total_steps % cfg.train.save_latest_freq == 0
            ):
                checkpoints.save(
                    cfg.train.checkpoint_dir, cfg.train.name, "latest", state
                )
            if (
                vis_fn is not None
                and cfg.train.display_freq > 0
                and total_steps % cfg.train.display_freq == 0
            ):
                vis_fn(save_dir, total_steps, state, db)
        if (epoch + 1) % cfg.train.save_epoch_freq == 0:
            checkpoints.save(cfg.train.checkpoint_dir, cfg.train.name, "latest", state)
            checkpoints.save(cfg.train.checkpoint_dir, cfg.train.name, epoch + 1, state)
    checkpoints.save(cfg.train.checkpoint_dir, cfg.train.name, "latest", state)
    return mods, state


def run_multiframe_training(
    cfg: cfg_lib.Config,
    template,
    loader,
    loader_noaug,
    num_frames_total: int,
    num_epochs: Optional[int] = None,
    init_camera_emb: bool = False,
    finetune_camera: bool = False,
    log_every: int = 20,
    face_chunk: int = 128,
    flow_fn=None,
    load_pretrained=None,
    load_lpips=None,
    vis_fn=None,
    load_warmup: bool = False,
):
    """Multiframe phases: [init-camera-emb] -> pose warmup -> texture warmup
    -> main loop with hypothesis-drop schedule.
    (reference multiframe train_utils.py:192-284)

    load_warmup: restore the 'texture_warmup' (or 'warmup') checkpoint and
    skip the warmup phases (reference --load_warmup,
    train_utils.py:205-232 guards + load_warmup_network :100-110).
    num_pretrain_epochs > 0 restores that epoch's checkpoint and resumes
    the main loop there (reference multiframe/main.py:174-178).

    flow_fn: batch preprocessor attaching batch['optical_flows'] (frozen
    MaskFlownet pass, flow.infer.make_flow_fn). Required whenever the
    optical-flow loss weight is nonzero — the reference equivalently
    requires a flow checkpoint (multiframe/main.py:203-214).
    load_pretrained: optional fn(params, batch_stats) -> (params,
    batch_stats) merging pretrained weights before replication.
    vis_fn: optional fn(save_dir, step, state, batch) writing image panels
    every cfg.train.display_freq steps (visdom replacement).
    """
    tr = cfg.train
    mp = cfg.multiplex
    if cfg.mf_weights.of > 0 and flow_fn is None:
        raise ValueError(
            "of_loss_wt > 0 requires optical flow: pass flow_fn "
            "(e.g. flow.infer.make_flow_fn with --flow_checkpoint), or set "
            "of_loss_wt=0"
        )
    mesh = pmesh.make_mesh()
    mods, (tx_full, tx_warm), state = mf.build(
        cfg, template, num_frames_total, jax.random.PRNGKey(tr.seed),
        steps_per_epoch=len(loader),
    )
    if vis_fn is None and tr.display_freq > 0:
        from . import visualize

        vis_fn = visualize.make_multiframe_vis_fn(mods, face_chunk)
    if load_pretrained is not None:
        params, batch_stats = load_pretrained(state.params, state.batch_stats)
        state = state.replace(params=params, batch_stats=batch_stats)
    if load_lpips is not None:
        state = state.replace(lpips_params=load_lpips(state.lpips_params))
    state = pmesh.replicate(mesh, state)
    save_dir = _save_dir(cfg)
    logger = metrics_logger.MetricsLogger(save_dir)
    metrics_logger.dump_config(save_dir, cfg)

    def prep(batch):
        db = to_device(mesh, batch)
        return flow_fn(db) if flow_fn is not None else db

    if init_camera_emb and loader_noaug is not None:
        for batch in loader_noaug:
            state = jax.jit(mf.init_camera_emb, donate_argnums=0)(
                state, to_device(mesh, batch)
            )

    step_cache: dict = {}

    nan_dump = _nan_dump_dir()

    def get_step(k: int, drop_deform: bool, detach_camera: bool = False,
                 use_gtpose: bool = False):
        key = (k, drop_deform, detach_camera, use_gtpose)
        if key not in step_cache:
            step_cache[key] = mf.make_train_step(
                mods, tx_full, k=k, drop_deform=drop_deform,
                detach_camera=detach_camera, use_gtpose=use_gtpose,
                face_chunk=face_chunk,
                # debug mode keeps pre-step buffers alive for the dump
                donate=not nan_dump,
            )
        return step_cache[key]

    skip_warmups = False
    if load_warmup:
        for label in ("texture_warmup", "warmup"):
            if checkpoints.exists(tr.checkpoint_dir, tr.name, label):
                state = checkpoints.restore(
                    tr.checkpoint_dir, tr.name, label, state, strict=False
                )
                skip_warmups = True
                print(f"resumed from '{label}' checkpoint; skipping warmups")
                break
        else:
            print("warning: --load_warmup set but no warmup checkpoint found")
    if tr.num_pretrain_epochs > 0 and checkpoints.exists(
        tr.checkpoint_dir, tr.name, tr.num_pretrain_epochs
    ):
        state = checkpoints.restore(
            tr.checkpoint_dir, tr.name, tr.num_pretrain_epochs, state,
            strict=False,
        )
        skip_warmups = True
        print(f"resumed from epoch {tr.num_pretrain_epochs}")

    def maybe_save_latest(total_steps: int):
        if tr.save_latest_freq > 0 and total_steps % tr.save_latest_freq == 0:
            checkpoints.save(tr.checkpoint_dir, tr.name, "latest", state)

    def maybe_visualize(total_steps: int, batch):
        if (
            vis_fn is not None
            and tr.display_freq > 0
            and total_steps % tr.display_freq == 0
        ):
            vis_fn(save_dir, total_steps, state, batch)

    total_steps = 0
    if tr.warmup and not skip_warmups:
        warm_step = mf.make_warmup_step(mods, tx_warm, face_chunk=face_chunk)
        for _ in range(tr.num_reps):
            for db in prefetch.prefetch(loader, prep):
                state, wm = warm_step(state, db)
                total_steps += 1
                if total_steps % log_every == 0:
                    logger.log(-1, total_steps, jax.device_get(wm))
        checkpoints.save(tr.checkpoint_dir, tr.name, "warmup", state)

    if tr.texture_warmup and not skip_warmups:
        tex_k = 1 if tr.use_gtpose else mp.num_guesses
        tex_step = get_step(tex_k, drop_deform=True, use_gtpose=tr.use_gtpose)
        for db in prefetch.prefetch(loader, prep):
            for _ in range(tr.tex_num_reps):
                state, m = tex_step(state, db)
                total_steps += 1
        checkpoints.save(tr.checkpoint_dir, tr.name, "texture_warmup", state)

    n_epochs = num_epochs if num_epochs is not None else tr.num_epochs
    prev_pair = None  # debug mode: last step's (pre-step state, batch)
    for epoch in range(tr.num_pretrain_epochs, n_epochs):
        use_gt = schedules.use_gtpose_at(epoch, tr.use_gtpose, finetune_camera)
        # the GT-pose projection path is single-hypothesis (the reference
        # only exercises use_gtpose with num_guesses=1)
        k = 1 if use_gt else schedules.num_guesses_at(
            epoch, mp.num_guesses, mp.drop_hypothesis, use_gt
        )
        step = get_step(k, drop_deform=True, use_gtpose=use_gt)
        for db in prefetch.prefetch(loader, prep):
            new_state, metrics = step(state, db)
            if nan_dump:
                # metrics NaN at step N => params were poisoned by the
                # UPDATE of step N-1 => culprit pair is prev_pair
                _check_finite_or_dump(
                    nan_dump, epoch, total_steps + 1, prev_pair, metrics
                )
                prev_pair = (state, db)
            state = new_state
            total_steps += 1
            if total_steps % log_every == 0:
                logger.log(epoch, total_steps, jax.device_get(metrics))
            maybe_save_latest(total_steps)
            maybe_visualize(total_steps, db)
        if (epoch + 1) % tr.save_epoch_freq == 0:
            checkpoints.save(tr.checkpoint_dir, tr.name, "latest", state)
            checkpoints.save(tr.checkpoint_dir, tr.name, epoch + 1, state)
    checkpoints.save(tr.checkpoint_dir, tr.name, "latest", state)
    return mods, state
