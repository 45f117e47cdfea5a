"""SPMD scale-out over a jax.sharding.Mesh."""

from .mesh import (
    auto_mesh,
    data_mesh,
    replicate,
    shard_batch,
    sharded_cosine_distance,
    sharded_train_state,
)

__all__ = [
    "auto_mesh",
    "data_mesh",
    "replicate",
    "shard_batch",
    "sharded_train_state",
    "sharded_cosine_distance",
]
