"""Parallelism layer: mesh construction, sharding rules, distributed init,
ring (sequence-parallel) attention, and GPipe pipeline parallelism."""

from .pipeline import pipeline_apply, stack_stage_params, stage_param_sharding
from .ring import ring_attention
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
    "pipeline_apply",
    "process_local_batch_indices",
    "replicated",
    "ring_attention",
    "shard_batch",
    "shard_params",
    "stack_stage_params",
    "stage_param_sharding",
]
