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


def restore(
    checkpoint_dir: str, name: str, label: str | int, target: Any,
    strict: bool = True,
) -> Any:
    """Restore into the structure of `target` (abstract or concrete state).

    strict=False tolerates structure drift the way the reference's
    non-strict state-dict load does (train_utils.py:92-102): checkpoint
    entries missing from `target` are dropped, entries absent from the
    checkpoint keep the target's current value, and shape mismatches keep
    the target's value with a warning. Used by the eval CLIs so a
    train/eval flag mismatch (e.g. --texture) degrades instead of crashing.
    """
    path = _path(checkpoint_dir, name, str(label))
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
    if strict:
        return ckptr.restore(path, target=abstract)

    # non-strict: read the raw tree, then graft leaves matched by key path
    raw = ocp.PyTreeCheckpointer().restore(path)

    def norm_path(kp) -> str:
        # normalize GetAttrKey/DictKey/SequenceKey to plain '/'-joined names
        # (the state is a flax dataclass, the raw restore is nested dicts)
        toks = []
        for k in kp:
            for attr in ("name", "key", "idx"):
                if hasattr(k, attr):
                    toks.append(str(getattr(k, attr)))
                    break
            else:
                toks.append(str(k))
        return "/".join(toks)

    raw_by_path = {
        norm_path(kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(raw)[0]
    }
    tgt_leaves, treedef = jax.tree_util.tree_flatten_with_path(target)
    out = []
    for kp, tgt_v in tgt_leaves:
        key = norm_path(kp)
        src_v = raw_by_path.get(key)
        if src_v is None:
            print(f"[restore non-strict] missing in checkpoint: {key}")
            out.append(tgt_v)
            continue
        t_shape = getattr(tgt_v, "shape", None)
        s_shape = getattr(src_v, "shape", None)
        if t_shape is not None and t_shape != s_shape:
            print(
                f"[restore non-strict] shape mismatch at {key}: "
                f"{s_shape} vs {t_shape}; keeping target"
            )
            out.append(tgt_v)
            continue
        # match the target leaf's dtype and (for committed jax.Arrays, e.g. a
        # state already replicated over a mesh) its sharding — grafting raw
        # numpy leaves would silently change placement on a multi-chip mesh
        t_dtype = getattr(tgt_v, "dtype", None)
        if t_dtype is not None and getattr(src_v, "dtype", None) != t_dtype:
            src_v = jax.numpy.asarray(src_v).astype(t_dtype)
        if isinstance(tgt_v, jax.Array) and tgt_v.committed:
            src_v = jax.device_put(src_v, tgt_v.sharding)
        out.append(src_v)
    return jax.tree_util.tree_unflatten(treedef, out)


def exists(checkpoint_dir: str, name: str, label: str | int) -> bool:
    return os.path.isdir(_path(checkpoint_dir, name, str(label)))
