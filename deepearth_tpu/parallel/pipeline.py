"""Pipeline parallelism: microbatched GPipe schedule over a mesh axis.

The reference has no pipeline parallelism (SURVEY.md §2.6 marks PP absent —
its HPC path is DDP-only, hpc/train_distrbuted.py); this module adds it the
TPU/SPMD way:

* The model is split into P shape-preserving *stages*. Each stage's
  parameters are stacked on a new leading axis and that axis is sharded
  over the mesh's pipeline axis — device p holds ONLY stage p's weights
  (1/P of the model), which is the point of PP: models whose weights don't
  fit one chip.
* The global batch is split into M microbatches. A single jitted
  ``lax.scan`` runs M + P - 1 ticks; at tick t, device p runs its stage on
  microbatch t - p (when 0 ≤ t - p < M) and hands its activation one hop
  down the ring via ``lax.ppermute``. The bubble fraction is the standard
  (P-1)/(M+P-1) — pick M ≳ 4·P.
* Everything is one SPMD program: XLA overlaps the ppermute with the next
  tick's stage compute, and ``jax.grad`` through the scan + ppermute gives
  exact pipeline-parallel backward (the transpose of a ppermute is the
  reverse ppermute), with per-stage parameter gradients landing on the
  device that owns the stage.

Inactive (bubble) ticks still execute the stage computation on a dummy
buffer — that is inherent to SPMD pipelining; their results are select-ed
away and never contaminate real microbatches (a stage-p tick is consumed by
stage p+1 exactly one tick later, and both are active on the same
microbatch window).

Constraints (v1, documented): stage functions must be shape-preserving
(activation in == activation out), the microbatch count must divide the
batch, and all stages must share one param tree structure (use
``stack_stage_params``). Transformer stacks satisfy all three.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def stack_stage_params(stage_params: Sequence[Any]) -> Any:
    """Stack per-stage parameter pytrees (identical treedefs) on a new
    leading 'stage' axis, ready to shard with ``P('pipe')``."""
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *stage_params
    )


def stage_param_sharding(stacked: Any, mesh: Mesh, axis_name: str = "pipe"):
    """NamedSharding pytree: leading stage axis over the pipeline axis."""
    from jax.sharding import NamedSharding

    def one(leaf):
        spec = [axis_name] + [None] * (leaf.ndim - 1)
        return NamedSharding(mesh, P(*spec))

    return jax.tree_util.tree_map(one, stacked)


def _pipeline_local(
    stacked_local: Any,
    x_mb: jnp.ndarray,
    *,
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    axis_name: str,
    n_stages: int,
    n_microbatches: int,
):
    """Per-device body. stacked_local: stage params with leading dim 1
    (this device's stage); x_mb: (M, mb, ...) full microbatched input
    (replicated)."""
    my = lax.axis_index(axis_name)
    params = jax.tree_util.tree_map(lambda l: l[0], stacked_local)
    m = n_microbatches
    fwd = [(j, (j + 1) % n_stages) for j in range(n_stages)]
    mb_shape = x_mb.shape[1:]

    def tick(carry, t):
        x_recv, out = carry
        in_idx = jnp.clip(t, 0, m - 1)
        x_in = jnp.where(
            my == 0, lax.dynamic_index_in_dim(x_mb, in_idx, keepdims=False),
            x_recv,
        )
        y = stage_fn(params, x_in)
        # last stage stashes its (active-window) result
        out_idx = jnp.clip(t - (n_stages - 1), 0, m - 1)
        write = (my == n_stages - 1) & (t >= n_stages - 1)
        cur = lax.dynamic_index_in_dim(out, out_idx, keepdims=False)
        out = lax.dynamic_update_index_in_dim(
            out, jnp.where(write, y, cur), out_idx, axis=0
        )
        x_next = lax.ppermute(y, axis_name, fwd)
        return (x_next, out), None

    x0 = jnp.zeros(mb_shape, x_mb.dtype)
    out0 = jnp.zeros_like(x_mb)
    (_, out), _ = lax.scan(
        tick, (x0, out0), jnp.arange(m + n_stages - 1)
    )
    # only the last device holds real outputs; broadcast around the ring
    # (psum of a one-hot-masked stash == broadcast from last stage)
    out = lax.psum(
        jnp.where(my == n_stages - 1, out, jnp.zeros_like(out)), axis_name
    )
    return out


def pipeline_apply(
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x: jnp.ndarray,
    *,
    mesh: Mesh,
    axis_name: str = "pipe",
    n_microbatches: int,
) -> jnp.ndarray:
    """Run ``stage_{P-1}(… stage_1(stage_0(x)))`` as a GPipe pipeline.

    Args:
        stage_fn: (params_for_one_stage, (mb, ...) activation) -> same shape.
        stacked_params: per-stage params stacked on a leading axis of size
            P = mesh.shape[axis_name] (see ``stack_stage_params``).
        x: (batch, ...) global input; batch must divide by n_microbatches.
        n_microbatches: M; bubble fraction (P-1)/(M+P-1).

    Returns (batch, ...) output, numerically equal to the sequential
    composition of the stages.
    """
    n_stages = int(mesh.shape[axis_name])
    lead = jax.tree_util.tree_leaves(stacked_params)[0].shape[0]
    if lead != n_stages:
        raise ValueError(
            f"stacked stage axis {lead} != '{axis_name}' size {n_stages}"
        )
    batch = x.shape[0]
    if batch % n_microbatches:
        raise ValueError(f"batch {batch} % microbatches {n_microbatches} != 0")
    x_mb = x.reshape(n_microbatches, batch // n_microbatches, *x.shape[1:])

    stage_spec = jax.tree_util.tree_map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))), stacked_params
    )
    body = functools.partial(
        _pipeline_local,
        stage_fn=stage_fn,
        axis_name=axis_name,
        n_stages=n_stages,
        n_microbatches=n_microbatches,
    )
    out_mb = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(stage_spec, P()),
        out_specs=P(),
        check_vma=False,
    )(stacked_params, x_mb)
    return out_mb.reshape(batch, *x.shape[1:])
