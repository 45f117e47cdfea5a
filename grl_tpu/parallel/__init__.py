"""SPMD scale-out over a jax.sharding.Mesh."""

from .mesh import (
    auto_mesh,
    data_mesh,
    replicate,
    shard_batch,
    sharded_cosine_distance,
    sharded_train_state,
)
from .multihost import (
    GlobalBatchLoader,
    coordination_barrier,
    establish_collectives,
    eval_catalog_meta,
    gather_striped_rows,
    global_batch_loader,
    maybe_initialize_distributed,
    min_shard_size,
    shard_catalog,
    stripe_catalog,
)

__all__ = [
    "auto_mesh",
    "coordination_barrier",
    "establish_collectives",
    "data_mesh",
    "GlobalBatchLoader",
    "global_batch_loader",
    "maybe_initialize_distributed",
    "min_shard_size",
    "shard_catalog",
    "stripe_catalog",
    "gather_striped_rows",
    "eval_catalog_meta",
    "replicate",
    "shard_batch",
    "sharded_train_state",
    "sharded_cosine_distance",
]
