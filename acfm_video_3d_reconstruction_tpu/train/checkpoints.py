"""Checkpoint save/resume via orbax.

Parity target: reference train_utils.py:83-110 — labeled checkpoints
('warmup', 'texture_warmup', 'latest', '<epoch+1>'), resume via
num_pretrain_epochs / load_warmup. The multiplex tables are saved with the
model state, so (like the reference's embedding tables) a checkpoint pins
the dataset frame ordering.
"""
from __future__ import annotations

import os
from typing import Any

import jax
import orbax.checkpoint as ocp


def _path(checkpoint_dir: str, name: str, label: str) -> str:
    return os.path.abspath(os.path.join(checkpoint_dir, name, f"pred_net_{label}"))


def save(checkpoint_dir: str, name: str, label: str | int, state: Any) -> str:
    """Save a train-state pytree under a reference-style label."""
    path = _path(checkpoint_dir, name, str(label))
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()
    return path


def restore(checkpoint_dir: str, name: str, label: str | int, target: Any) -> Any:
    """Restore into the structure of `target` (abstract or concrete state)."""
    path = _path(checkpoint_dir, name, str(label))
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(path, target=jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target))


def exists(checkpoint_dir: str, name: str, label: str | int) -> bool:
    return os.path.isdir(_path(checkpoint_dir, name, str(label)))
