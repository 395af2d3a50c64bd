"""Mixture-of-experts routing and static-shape dispatch for TPU.

Gating reproduces DeepSeek-V3's sigmoid, group-limited, bias-corrected top-k
("noaux_tc", reference: encoders/modeling_deepseek.py:393-473). Dispatch
replaces the reference's data-dependent sort + variable-split all_to_all
(reference: encoders/modeling_deepseek.py:534-608, inference-only) with the
capacity-factor dense einsum formulation: static shapes, MXU-friendly, and
trivially shardable over an ``expert`` mesh axis (XLA SPMD inserts the
all-to-alls). Unlike the reference, this path is differentiable end-to-end —
the reference never shipped a training-mode MoE.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class GateResult(NamedTuple):
    topk_idx: jnp.ndarray  # (N, K) int32
    topk_weight: jnp.ndarray  # (N, K) float32
    scores: jnp.ndarray  # (N, E) float32 sigmoid scores (pre-bias)


def moe_gate(
    logits: jnp.ndarray,
    bias: jnp.ndarray,
    *,
    top_k: int,
    n_group: int,
    topk_group: int,
    norm_topk_prob: bool,
    routed_scaling_factor: float,
) -> GateResult:
    """Sigmoid group-limited top-k gate.

    Args:
        logits: (N, E) float32 router logits (x @ W_g^T).
        bias: (E,) expert-score correction bias (load balancing without an
            aux loss; gradients through selection flow via the weights only,
            matching the reference where bias affects *choice* but the weight
            is the raw sigmoid score).
    """
    n, e = logits.shape
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    scores_for_choice = scores + bias[None, :].astype(jnp.float32)

    if n_group > 1:
        grouped = scores_for_choice.reshape(n, n_group, e // n_group)
        top2 = jax.lax.top_k(grouped, min(2, e // n_group))[0]
        group_scores = top2.sum(axis=-1)  # (N, G)
        _, group_idx = jax.lax.top_k(group_scores, topk_group)
        group_mask = (
            jnp.zeros((n, n_group), bool)
            .at[jnp.arange(n)[:, None], group_idx]
            .set(True)
        )
        score_mask = jnp.repeat(group_mask, e // n_group, axis=1)  # (N, E)
        masked = jnp.where(score_mask, scores_for_choice, -jnp.inf)
    else:
        masked = scores_for_choice

    _, topk_idx = jax.lax.top_k(masked, top_k)
    topk_weight = jnp.take_along_axis(scores, topk_idx, axis=1)

    if top_k > 1 and norm_topk_prob:
        topk_weight = topk_weight / (topk_weight.sum(axis=-1, keepdims=True) + 1e-20)
    topk_weight = topk_weight * routed_scaling_factor
    return GateResult(topk_idx.astype(jnp.int32), topk_weight, scores)


def make_dispatch_combine(
    topk_idx: jnp.ndarray,
    topk_weight: jnp.ndarray,
    *,
    n_experts: int,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Build static-shape dispatch/combine tensors (GShard formulation).

    Tokens beyond an expert's capacity are dropped for that expert (their
    combine weight is zero). Rank-0 choices of all tokens get priority over
    rank-1 choices, etc.

    Args:
        topk_idx: (N, K) expert choice per token.
        topk_weight: (N, K) gate weight per choice.

    Returns:
        dispatch: (N, E, C) float32 in {0, 1}
        combine:  (N, E, C) float32 (dispatch * gate weight)
        load:     (E,) float32 tokens assigned per expert (pre-capacity)
    """
    n, k = topk_idx.shape
    # (K, N, E): k-major so lower-rank choices win capacity first.
    expert_onehot = jax.nn.one_hot(
        topk_idx.T, n_experts, dtype=jnp.float32
    )  # (K, N, E)
    flat = expert_onehot.reshape(k * n, n_experts)
    # Position of each assignment within its expert queue.
    pos = jnp.cumsum(flat, axis=0) - flat  # (K*N, E)
    within_cap = (pos < capacity) & (flat > 0)
    pos_capped = jnp.where(within_cap, pos, 0).astype(jnp.int32)
    cap_onehot = jax.nn.one_hot(pos_capped.sum(axis=-1), capacity, dtype=jnp.float32)
    # dispatch_{(k n), e, c} = within_cap * onehot(position)
    disp_flat = (
        within_cap.astype(jnp.float32)[:, :, None] * cap_onehot[:, None, :]
    )  # (K*N, E, C)
    disp = disp_flat.reshape(k, n, n_experts, capacity)
    dispatch = disp.sum(axis=0)  # (N, E, C) — each token occupies ≤K slots
    combine = jnp.einsum(
        "knec,nk->nec", disp, topk_weight.astype(jnp.float32)
    )
    load = flat.sum(axis=0)
    return dispatch, combine, load


def position_in_expert(
    topk_idx: jnp.ndarray, n_experts: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Queue position of every (token, k) assignment within its expert.

    k-major priority (all rank-0 choices beat rank-1 choices), identical to
    :func:`make_dispatch_combine`'s cumsum ordering, but computed via a
    single stable argsort — O(N·K log) instead of the O(N·K·E) one-hot
    cumsum, which is what makes 64-128-expert configs viable.

    Returns:
        flat_e: (K*N,) expert id per assignment (k-major layout)
        pos:    (K*N,) slot index within the expert's queue
        load:   (E,) assignments per expert (pre-capacity)
    """
    n, k = topk_idx.shape
    flat_e = topk_idx.T.reshape(-1).astype(jnp.int32)  # k-major: i = k*N + n
    order = jnp.argsort(flat_e, stable=True)
    inv = jnp.argsort(order)  # rank of assignment i in expert-sorted order
    counts = jnp.bincount(flat_e, length=n_experts)
    starts = jnp.cumsum(counts) - counts
    pos = inv - starts[flat_e]
    return flat_e, pos.astype(jnp.int32), counts.astype(jnp.float32)


def scatter_dispatch_ffn(
    xf: jnp.ndarray,
    topk_idx: jnp.ndarray,
    topk_weight: jnp.ndarray,
    w_gate: jnp.ndarray,
    w_up: jnp.ndarray,
    w_down: jnp.ndarray,
    capacity: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Capacity-bounded MoE via scatter/gather instead of one-hot einsums.

    Semantically identical to the dense dispatch path (same k-major
    capacity priority, same dropped-token behaviour) but memory/FLOPs are
    O(N·K·D) + O(E·C·D) rather than O(N·E·C·D): the einsum dispatch is
    quadratic in tokens at fixed capacity factor, this is linear — required
    for the 64-128-expert 'ultra' simulator preset
    (reference: core/inductive_simulator.py:126-154,
    encoders/modeling_deepseek.py:475-608). Differentiable end-to-end
    (scatter-add ↔ gather transposes).

    Returns:
        (N, D) combined output, (E,) pre-capacity load.
    """
    n, d = xf.shape
    k = topk_idx.shape[1]
    e = w_gate.shape[0]
    flat_e, pos, load = position_in_expert(topk_idx, e)
    within = pos < capacity
    # Assignment → slot map; dropped assignments point at a trash slot (E·C)
    # that reads/writes a zero row. Slots are unique (pos is a queue index),
    # so both directions are pure permutations — dispatch and combine are
    # GATHERS, not scatter-adds: a 73728-token/4-expert dispatch measured
    # 10 ms as a gather vs 27 ms as a row scatter-add on v5e (scatter lowers
    # to a serialized sorted-update loop; gather rides the copy engines).
    slot = jnp.where(within, flat_e * capacity + pos, e * capacity)
    token_of = jnp.tile(jnp.arange(n, dtype=jnp.int32), k)  # k-major rows

    # Inverse permutation slot → source token (int scatter: 4 bytes/row).
    # Unfilled capacity slots keep sentinel n → gather the zero pad row.
    inv = jnp.full((e * capacity + 1,), n, jnp.int32).at[slot].set(
        token_of, mode="drop"
    )
    xf_pad = jnp.concatenate([xf, jnp.zeros((1, d), xf.dtype)], axis=0)
    expert_in = xf_pad[inv[:-1]].reshape(e, capacity, d)
    expert_out = expert_ffn(expert_in, w_gate, w_up, w_down)  # (E, C, D)

    # Combine: gather each assignment's output row by slot (trash slot → 0),
    # then sum the K copies per token — a reshape-reduce, no scatter.
    out_pad = jnp.concatenate(
        [expert_out.reshape(e * capacity, d), jnp.zeros((1, d), expert_out.dtype)],
        axis=0,
    )
    gathered = out_pad[slot]  # (K*N, D)
    w = topk_weight.T.reshape(-1)[:, None].astype(gathered.dtype)  # k-major
    y = (gathered * w).reshape(k, n, d).sum(axis=0).astype(xf.dtype)
    return y, load


def dense_all_expert_ffn(
    xf: jnp.ndarray,
    topk_idx: jnp.ndarray,
    topk_weight: jnp.ndarray,
    w_gate: jnp.ndarray,
    w_up: jnp.ndarray,
    w_down: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Small-E MoE: run every token through EVERY expert, combine by gate.

    Exact drop-free routing (identical outputs to the reference's per-token
    dispatch, reference: encoders/modeling_deepseek.py:475-608) with zero
    dispatch machinery — no sorts, no capacity slots, no row gathers. FFN
    math is E/K× the routed minimum, which beats capacity dispatch whenever
    E ≤ capacity_factor·K, and beats it in wall-clock somewhat past that
    point because the big batched einsums run at the SwiGLU roofline while
    dispatch pays ~16 ms of gather/sort overhead at flagship shape
    (measured v5e, N=73728 D=F=2048 E=4 K=2: 43.3 ms dense-all vs 58.6 ms
    scatter cf=2.0 — same FLOPs — vs 38.4 ms scatter cf=1.25 with drops).

    Memory: the (E, N, F) activation must fit; callers gate on
    E·N·F (see MoELayer's auto rule).

    Returns:
        (N, D) combined output, (E,) tokens routed per expert.
    """
    n = xf.shape[0]
    e = w_gate.shape[0]
    # Outputs stay in the compute dtype: the MXU accumulates bf16 matmuls in
    # fp32 internally, and forcing f32 outputs materializes 2.4 GB (E,N,F)
    # intermediates at flagship shape — measured 13.5 ms on the gate einsum
    # alone (PROFILE_FLAGSHIP.json fusion.3635) before this change.
    from .sharding import shard_hint

    # pin the big (E, N, F) buffers' layout on multi-axis meshes: experts
    # over 'expert', tokens over 'data', FFN features over 'model' — GSPMD
    # left unconstrained reshards these with multi-GB all-to-alls (round-4
    # multichip memory fix); exact no-op single-chip
    gate = shard_hint(
        jnp.einsum("nd,edf->enf", xf, w_gate), "expert", "data", "model"
    )
    up = shard_hint(
        jnp.einsum("nd,edf->enf", xf, w_up), "expert", "data", "model"
    )
    h = jax.nn.silu(gate) * up
    out = shard_hint(
        jnp.einsum("enf,efd->end", h, w_down), "expert", "data", None
    )
    # (N, E) dense gate weights: zeros except each token's K chosen experts
    w_dense = (
        jnp.zeros((n, e), jnp.float32)
        .at[jnp.arange(n)[:, None], topk_idx]
        .add(topk_weight.astype(jnp.float32))
    )
    y = jnp.einsum(
        "end,ne->nd", out, w_dense.astype(out.dtype),
        preferred_element_type=jnp.float32,
    ).astype(xf.dtype)
    load = jnp.bincount(topk_idx.reshape(-1), length=e).astype(jnp.float32)
    return y, load


def expert_ffn(
    expert_in: jnp.ndarray,
    w_gate: jnp.ndarray,
    w_up: jnp.ndarray,
    w_down: jnp.ndarray,
) -> jnp.ndarray:
    """Batched SwiGLU expert MLPs (reference: encoders/modeling_deepseek.py:374-390).

    Args:
        expert_in: (E, C, D)
        w_gate, w_up: (E, D, F)
        w_down: (E, F, D)
    Returns:
        (E, C, D)
    """
    # compute-dtype outputs: fp32 accumulation happens inside the MXU; f32
    # output dtypes only add HBM traffic (see dense_all_expert_ffn)
    gate = jnp.einsum("ecd,edf->ecf", expert_in, w_gate)
    up = jnp.einsum("ecd,edf->ecf", expert_in, w_up)
    h = jax.nn.silu(gate) * up
    return jnp.einsum("ecf,efd->ecd", h, w_down)


def load_balance_aux_loss(
    scores: jnp.ndarray, topk_idx: jnp.ndarray, n_experts: int
) -> jnp.ndarray:
    """Switch-style load-balance loss: E * sum_e f_e * P_e."""
    n = scores.shape[0]
    mask = jax.nn.one_hot(topk_idx, n_experts, dtype=jnp.float32).sum(axis=1)
    f = mask.mean(axis=0)  # fraction routed per expert
    p = (scores / (scores.sum(-1, keepdims=True) + 1e-20)).mean(axis=0)
    return n_experts * jnp.sum(f * p)


def ragged_expert_ffn(
    xf: jnp.ndarray,
    topk_idx: jnp.ndarray,
    topk_weight: jnp.ndarray,
    w_gate: jnp.ndarray,
    w_up: jnp.ndarray,
    w_down: jnp.ndarray,
) -> jnp.ndarray:
    """Drop-free MoE via sort + grouped matmul (megablox gmm Pallas kernel).

    TPU-native equivalent of the reference's sort + all_to_all dispatch
    (reference: encoders/modeling_deepseek.py:534-608) with static shapes:
    token copies are sorted by expert id, each expert's contiguous segment
    runs through one grouped SwiGLU matmul on the MXU, and results are
    unsorted and combined with the gate weights. No capacity factor, no
    dropped tokens; differentiable end-to-end.

    Args:
        xf: (S, D) tokens.
        topk_idx: (S, K) expert assignment.
        topk_weight: (S, K) gate weights.
        w_gate, w_up: (E, D, F); w_down: (E, F, D).

    Returns:
        (S, D) combined expert outputs.
    """
    from jax.experimental.pallas.ops.tpu.megablox import gmm

    s, d = xf.shape
    k = topk_idx.shape[1]
    e = w_gate.shape[0]

    f = w_gate.shape[2]
    flat_expert = topk_idx.reshape(-1)  # (S*K,) — row s*K + j is token s
    order = jnp.argsort(flat_expert)
    token_of_row = order // k
    sorted_tokens = xf[token_of_row]  # (S*K, D)
    group_sizes = jnp.bincount(flat_expert, length=e).astype(jnp.int32)

    # gmm wants the row count 128-aligned; pad rows land in the last
    # expert's segment (they sort highest) and are sliced away after.
    m = s * k
    pad = (-m) % 128
    if pad:
        sorted_tokens = jnp.pad(sorted_tokens, ((0, pad), (0, 0)))
        group_sizes = group_sizes.at[e - 1].add(pad)

    interpret = jax.default_backend() != "tpu"  # CPU tests run interpreted
    # Tile choice is the whole ballgame: the earlier (128,128,128) tiling
    # ran the in-proj shape (M=147k, D=F=2048) at 12 TF/s — k-tiles of 128
    # re-stream the M×128 accumulator slab from HBM 16× per output tile.
    # On-chip bisect (fwd+bwd, v5e, docs/ROUND3.md): (512,1024,512) is the
    # fastest that also compiles through the VJP's tgmm (tk=2048 blows the
    # backward kernel's VMEM and fails remote compile). Clamps keep small
    # test shapes legal.
    mr = sorted_tokens.shape[0]
    tm = next(t for t in (512, 256, 128) if mr % t == 0 or mr < t)
    tm = min(tm, mr)
    t_up = (tm, min(1024, d), min(512, f))
    t_down = (tm, min(1024, f), min(512, d))
    gate = gmm(sorted_tokens, w_gate, group_sizes,
               preferred_element_type=jnp.float32, tiling=t_up,
               interpret=interpret)
    up = gmm(sorted_tokens, w_up, group_sizes,
             preferred_element_type=jnp.float32, tiling=t_up,
             interpret=interpret)
    h = (jax.nn.silu(gate) * up).astype(xf.dtype)
    out_sorted = gmm(h, w_down, group_sizes,
                     preferred_element_type=jnp.float32,
                     tiling=t_down,
                     interpret=interpret).astype(xf.dtype)
    if pad:
        out_sorted = out_sorted[:m]

    # unsort and weighted-combine the K copies of each token
    inv = jnp.argsort(order)
    out_rows = out_sorted[inv].reshape(s, k, d)
    return jnp.einsum(
        "skd,sk->sd", out_rows, topk_weight.astype(out_rows.dtype)
    )
