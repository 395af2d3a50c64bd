"""Parallelism layer: mesh construction, sharding rules, distributed init."""

from .mesh import (
    AXES,
    batch_sharding,
    create_mesh,
    make_param_shardings,
    param_spec,
    process_local_batch_indices,
    replicated,
    shard_batch,
    shard_params,
)

__all__ = [
    "AXES",
    "batch_sharding",
    "create_mesh",
    "make_param_shardings",
    "param_spec",
    "process_local_batch_indices",
    "replicated",
    "shard_batch",
    "shard_params",
]
