"""Device mesh + sharding helpers: data parallelism over ICI.

The reference's only parallelism is single-node torch DataParallel
(SURVEY.md §2.8). The TPU-native equivalent: a 1-D `Mesh(('data',))` over
all chips; batch-majority arrays shard on their leading axis, parameters
replicate, and XLA inserts the gradient all-reduce over ICI.

The camera-multiplex tables shard by *frame row* so each chip owns the
hypothesis state of the frames it trains — embedding gathers and prob
scatters then stay chip-local under the same batch sharding.
"""
from __future__ import annotations

import logging
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def _warn_replicated(what: str, shape, n: int) -> None:
    """Loud fallback: a batch/table axis not divisible by the mesh size
    silently degrades data parallelism to replication — log it so a batch-
    size change on a real mesh doesn't quietly lose the split."""
    logger.warning(
        "shard fallback: %s with shape %s replicates on a %d-device mesh "
        "(leading/row axis not divisible by %d) — data parallelism lost "
        "for this array", what, tuple(shape), n, n,
    )


def make_mesh(devices: Optional[list] = None, axis_name: str = "data") -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis across the data mesh."""
    return NamedSharding(mesh, P(mesh.axis_names[0]))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Device_put a batch pytree with the leading axis sharded.

    Arrays whose leading axis is not divisible by the mesh size (small
    debug batches, scalar entries) replicate instead — XLA still runs them
    correctly, just without the data-parallel split.
    """
    n = mesh.devices.size
    s = batch_sharding(mesh)
    r = replicated(mesh)

    def put(path, x):
        shape = jnp.shape(x)
        ok = len(shape) > 0 and shape[0] % n == 0
        if not ok and n > 1 and len(shape) > 0:
            _warn_replicated(f"batch leaf {jax.tree_util.keystr(path)}", shape, n)
        return jax.device_put(x, s if ok else r)

    return jax.tree_util.tree_map_with_path(put, tree)


def replicate(mesh: Mesh, tree: Any) -> Any:
    s = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def multiplex_sharding(mesh: Mesh) -> Any:
    """Shardings for a MultiplexState: frame-row sharded tables.

    cams (G, N, C) shards axis 1; probs/deform (N, ...) shard axis 0.
    """
    axis = mesh.axis_names[0]
    return {
        "cams": NamedSharding(mesh, P(None, axis)),
        "probs": NamedSharding(mesh, P(axis)),
        "deform": NamedSharding(mesh, P(axis)),
        "deform_mirror": NamedSharding(mesh, P(axis)),
    }


def shard_multiplex(mesh: Mesh, mpx: Any) -> Any:
    """Device_put a MultiplexState with frame rows sharded over the mesh.

    Frame rows that are not divisible by the mesh size replicate instead
    (same degradation rule as shard_batch).
    """
    import dataclasses

    n = mesh.devices.size
    sh = multiplex_sharding(mesh)
    r = replicated(mesh)

    def put(x, spec_key, row_axis):
        if x is None:
            return None
        ok = x.shape[row_axis] % n == 0
        if not ok and n > 1:
            _warn_replicated(f"multiplex.{spec_key}", x.shape, n)
        return jax.device_put(x, sh[spec_key] if ok else r)

    return dataclasses.replace(
        mpx,
        cams=put(mpx.cams, "cams", 1),
        probs=put(mpx.probs, "probs", 0),
        deform=put(mpx.deform, "deform", 0),
        deform_mirror=put(mpx.deform_mirror, "deform_mirror", 0),
    )


def shard_multiframe_state(mesh: Mesh, state: Any) -> Any:
    """Place a full MFTrainState on the mesh: params/batch_stats/lpips
    replicate; the multiplex tables shard by frame row; optimizer moments
    that mirror a multiplex table shard like it (matched by tree path, so
    the Adam mu/nu of `mpx/cams` etc. stay chip-local with their table)."""
    axis = mesh.axis_names[0]
    n = mesh.devices.size
    r = replicated(mesh)

    def opt_spec(path, x):
        shape = jnp.shape(x)
        keys = [str(getattr(k, "name", getattr(k, "key", k))) for k in path]
        if "cams" in keys and len(shape) == 3 and shape[1] % n == 0:
            return NamedSharding(mesh, P(None, axis))
        if any(k in ("deform", "deform_mirror") for k in keys) and (
            len(shape) >= 1 and shape and shape[0] % n == 0
        ):
            return NamedSharding(mesh, P(axis))
        return r

    def put_opt(tree):
        return jax.tree_util.tree_map_with_path(
            lambda p, x: jax.device_put(x, opt_spec(p, x)), tree
        )

    return state.replace(
        params=replicate(mesh, state.params),
        batch_stats=replicate(mesh, state.batch_stats),
        lpips_params=replicate(mesh, state.lpips_params),
        opt_state=put_opt(state.opt_state),
        warmup_opt_state=put_opt(state.warmup_opt_state),
        multiplex=shard_multiplex(mesh, state.multiplex),
        step=jax.device_put(state.step, r),
    )


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
