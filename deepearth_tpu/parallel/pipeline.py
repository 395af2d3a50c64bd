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

Memory (round-4 fix): the microbatched input and output live SHARDED over
the pipeline axis — device p owns the contiguous microbatch block
[p·M/P, (p+1)·M/P). Feeding stage 0 and collecting stage P-1's results use
two single-microbatch "conveyor" buffers rotated one hop per tick with
``lax.ppermute``:

* input conveyor (downward ring): the item at device d on tick t is exactly
  microbatch o = t + d; each owner pushes its local block at the right
  ticks and stage 0 consumes o = t on time, every tick, with ZERO buffering
  beyond one microbatch in flight per device;
* output conveyor (downward ring): stage P-1 tags each produced microbatch
  with its index; items cascade down one hop per tick and each owner writes
  arrivals into its local output block. The (P-d-1)(M/P-1) ≥ 0 slack
  guarantees every item lands within the standard M+P-1 ticks.

Per-device activation memory is therefore O(M/P + 3) microbatches instead
of O(M) — the regime where PP exists (global batch >> per-chip memory) now
actually scales.

Constraints (v1, documented): stage functions must be shape-preserving
(activation in == activation out), the microbatch count must divide the
batch AND be divisible by the pipeline axis size, and all stages must share
one param tree structure (use ``stack_stage_params``). Transformer stacks
satisfy all three.
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
    x_loc: jnp.ndarray,
    *,
    stage_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    axis_name: str,
    n_stages: int,
    n_microbatches: int,
):
    """Per-device body. stacked_local: stage params with leading dim 1
    (this device's stage); x_loc: (M/P, mb, ...) this device's contiguous
    microbatch block (input sharded over the pipe axis)."""
    my = lax.axis_index(axis_name)
    params = jax.tree_util.tree_map(lambda l: l[0], stacked_local)
    m = n_microbatches
    mp = m // n_stages  # microbatches owned per device
    fwd = [(j, (j + 1) % n_stages) for j in range(n_stages)]
    down = [(j, (j - 1) % n_stages) for j in range(n_stages)]
    mb_shape = x_loc.shape[1:]

    def tick(carry, t):
        x_recv, feed_c, conv_x, conv_i, conv_v, outbuf = carry

        # -- input conveyor: the item at device d on tick t is microbatch
        #    o = t + d (each hop down loses one tick, so it reaches stage 0
        #    exactly at tick o). Owners overwrite the slot with their local
        #    copy at push time; everyone else forwards what arrived.
        o = t + my
        is_owner = (o // mp == my) & (o < m)
        local = lax.dynamic_index_in_dim(
            x_loc, jnp.clip(o - my * mp, 0, mp - 1), keepdims=False
        )
        feed = jnp.where(is_owner, local, feed_c)
        x_in = jnp.where(my == 0, feed, x_recv)
        y = stage_fn(params, x_in)

        # -- output conveyor: stage P-1 tags each produced microbatch with
        #    its index; tagged items cascade down one hop per tick and the
        #    owner writes them into its local block on arrival.
        oi = t - (n_stages - 1)
        produce = (my == n_stages - 1) & (oi >= 0) & (oi < m)
        conv_x = jnp.where(produce, y, conv_x)
        conv_i = jnp.where(produce, oi, conv_i)
        conv_v = produce | conv_v
        mine = conv_v & (conv_i // mp == my) & (conv_i >= 0)
        slot = jnp.clip(conv_i - my * mp, 0, mp - 1)
        cur = lax.dynamic_index_in_dim(outbuf, slot, keepdims=False)
        outbuf = lax.dynamic_update_index_in_dim(
            outbuf, jnp.where(mine, conv_x, cur), slot, axis=0
        )

        x_next = lax.ppermute(y, axis_name, fwd)
        feed_next = lax.ppermute(feed, axis_name, down)
        conv = (conv_x, conv_i, conv_v)
        conv_x_n, conv_i_n, conv_v_n = (
            lax.ppermute(c, axis_name, down) for c in conv
        )
        return (x_next, feed_next, conv_x_n, conv_i_n, conv_v_n, outbuf), None

    zero_mb = jnp.zeros(mb_shape, x_loc.dtype)
    carry0 = (
        zero_mb,                       # activation arriving from stage-1 ring
        zero_mb,                       # input conveyor slot
        zero_mb,                       # output conveyor payload
        jnp.full((), -1, jnp.int32),   # output conveyor tag
        jnp.zeros((), bool),           # output conveyor valid
        jnp.zeros_like(x_loc),         # local output block
    )
    (*_, outbuf), _ = lax.scan(tick, carry0, jnp.arange(m + n_stages - 1))
    return outbuf


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
    # the sharded-IO schedule needs M divisible by P; pad with dummy
    # microbatches (they ride the bubble and are sliced away below)
    m_pad = -(-n_microbatches // n_stages) * n_stages
    if m_pad != n_microbatches:
        x_mb = jnp.concatenate(
            [x_mb, jnp.zeros((m_pad - n_microbatches, *x_mb.shape[1:]),
                             x_mb.dtype)], axis=0
        )

    stage_spec = jax.tree_util.tree_map(
        lambda l: P(axis_name, *([None] * (l.ndim - 1))), stacked_params
    )
    # microbatched IO is SHARDED over the pipe axis (device p owns block p);
    # per-device memory is O(M/P), not O(M) — see module docstring
    io_spec = P(axis_name)
    body = functools.partial(
        _pipeline_local,
        stage_fn=stage_fn,
        axis_name=axis_name,
        n_stages=n_stages,
        n_microbatches=m_pad,
    )
    out_mb = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(stage_spec, io_spec),
        out_specs=io_spec,
        check_vma=False,
    )(stacked_params, x_mb)
    return out_mb[:n_microbatches].reshape(batch, *x.shape[1:])
