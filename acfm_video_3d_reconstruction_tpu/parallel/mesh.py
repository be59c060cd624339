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

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


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

    def put(x):
        shape = jnp.shape(x)
        ok = len(shape) > 0 and shape[0] % n == 0
        return jax.device_put(x, s if ok else r)

    return jax.tree_util.tree_map(put, tree)


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


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
