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
from . import checkpoints, metrics_logger, schedules
from . import monocular as mono
from . import multiframe as mf


def _save_dir(cfg: cfg_lib.Config) -> str:
    import os.path as osp

    return osp.join(cfg.train.checkpoint_dir, cfg.train.name)


def to_device(mesh, batch: dict) -> dict:
    return pmesh.shard_batch(mesh, batch)


def run_monocular_training(
    cfg: cfg_lib.Config,
    template,
    loader,
    num_epochs: Optional[int] = None,
    log_every: int = 20,
    face_chunk: int = 128,
):
    """Monocular train loop (reference monocular train_utils.py:192-264)."""
    mesh = pmesh.make_mesh()
    mods, tx, state = mono.build(cfg, template, jax.random.PRNGKey(cfg.train.seed))
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
        for batch in loader:
            state, metrics = step(state, to_device(mesh, batch))
            total_steps += 1
            if total_steps % log_every == 0:
                logger.log(epoch, total_steps, jax.device_get(metrics))
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
):
    """Multiframe phases: [init-camera-emb] -> pose warmup -> texture warmup
    -> main loop with hypothesis-drop schedule.
    (reference multiframe train_utils.py:192-284)
    """
    mesh = pmesh.make_mesh()
    mods, (tx_full, tx_warm), state = mf.build(
        cfg, template, num_frames_total, jax.random.PRNGKey(cfg.train.seed)
    )
    state = pmesh.replicate(mesh, state)
    save_dir = _save_dir(cfg)
    logger = metrics_logger.MetricsLogger(save_dir)
    metrics_logger.dump_config(save_dir, cfg)
    tr = cfg.train
    mp = cfg.multiplex

    if init_camera_emb and loader_noaug is not None:
        for batch in loader_noaug:
            state = jax.jit(mf.init_camera_emb, donate_argnums=0)(
                state, to_device(mesh, batch)
            )

    step_cache: dict = {}

    def get_step(k: int, drop_deform: bool, detach_camera: bool = False):
        key = (k, drop_deform, detach_camera)
        if key not in step_cache:
            step_cache[key] = mf.make_train_step(
                mods, tx_full, k=k, drop_deform=drop_deform,
                detach_camera=detach_camera, face_chunk=face_chunk,
            )
        return step_cache[key]

    total_steps = 0
    if tr.warmup:
        warm_step = mf.make_warmup_step(mods, tx_warm, face_chunk=face_chunk)
        for _ in range(tr.num_reps):
            for batch in loader:
                state, wm = warm_step(state, to_device(mesh, batch))
                total_steps += 1
                if total_steps % log_every == 0:
                    logger.log(-1, total_steps, jax.device_get(wm))
        checkpoints.save(tr.checkpoint_dir, tr.name, "warmup", state)

    if tr.texture_warmup:
        tex_step = get_step(mp.num_guesses, drop_deform=True)
        for batch in loader:
            db = to_device(mesh, batch)
            for _ in range(tr.tex_num_reps):
                state, m = tex_step(state, db)
                total_steps += 1
        checkpoints.save(tr.checkpoint_dir, tr.name, "texture_warmup", state)

    n_epochs = num_epochs if num_epochs is not None else tr.num_epochs
    for epoch in range(tr.num_pretrain_epochs, n_epochs):
        use_gt = schedules.use_gtpose_at(epoch, tr.use_gtpose, finetune_camera)
        k = schedules.num_guesses_at(
            epoch, mp.num_guesses, mp.drop_hypothesis, use_gt
        )
        step = get_step(k, drop_deform=True)
        for batch in loader:
            state, metrics = step(state, to_device(mesh, batch))
            total_steps += 1
            if total_steps % log_every == 0:
                logger.log(epoch, total_steps, jax.device_get(metrics))
        if (epoch + 1) % tr.save_epoch_freq == 0:
            checkpoints.save(tr.checkpoint_dir, tr.name, "latest", state)
            checkpoints.save(tr.checkpoint_dir, tr.name, epoch + 1, state)
    checkpoints.save(tr.checkpoint_dir, tr.name, "latest", state)
    return mods, state
