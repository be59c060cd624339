from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    multiplex_sharding,
    replicate,
    replicated,
    shard_batch,
)
