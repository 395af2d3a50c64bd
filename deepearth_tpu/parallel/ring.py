"""Ring attention: sequence/context parallelism over a mesh axis.

The reference has no sequence parallelism (SURVEY.md §2.6 marks SP/CP
absent); this module adds it the TPU way so attention over sequences that
do not fit one chip's HBM scales across the ICI ring:

* q, k, v are sharded along the sequence dimension over a mesh axis.
* Each device computes blockwise attention of its LOCAL query block against
  the k/v block it currently holds, accumulating with the online-softmax
  recurrence (running max / denominator / numerator in float32 — the same
  math as the flash kernel, ops/attention_vmem.py, applied across devices).
* After each step the k/v block rotates one hop along the ring via
  ``lax.ppermute`` — exactly one block of k/v is resident per device at any
  time, and the per-hop transfer rides a single ICI link (Ring Attention,
  Liu et al. 2023; the "How to Scale Your Model" collective recipe).

Communication per step: 2 · (B·H·nk_local·D) elements per device — the
block leaving and entering overlap with the block matmul, so for
nk_local·D large enough the ring is compute-bound.

Gradients flow through the rotation automatically (the transpose of a
ppermute is the inverse ppermute), so this is trainable with plain
``jax.grad`` — no custom VJP needed. The P-step python loop is unrolled at
trace time (P = mesh axis size, known statically).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -1e30  # matches ops/attention.py: keeps fully-masked rows NaN-free


def _ring_attention_local(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    key_mask: jnp.ndarray,
    *,
    scale: float,
    axis_name: str,
    n_shards: int,
    is_causal: bool,
) -> jnp.ndarray:
    """Per-device body. q: (B,H,nq,Dk) local block; k/v: (B,H,nk,·) local
    block; key_mask: (B,nk) local bool (True = visible)."""
    my = lax.axis_index(axis_name)
    b, h, nq, _ = q.shape
    nk = k.shape[2]
    dv = v.shape[3]

    m = jnp.full((b, h, nq), NEG_INF, jnp.float32)   # running row max
    l = jnp.zeros((b, h, nq), jnp.float32)           # running denominator
    o = jnp.zeros((b, h, nq, dv), jnp.float32)       # running numerator

    q_pos = my * nq + jnp.arange(nq)
    fwd = [(j, (j + 1) % n_shards) for j in range(n_shards)]

    for i in range(n_shards):
        # after i forward rotations, this device holds the block that
        # originated on rank (my - i) mod P
        src = (my - i) % n_shards
        scores = jnp.einsum(
            "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
        ) * jnp.float32(scale)
        scores = jnp.where(key_mask[:, None, None, :], scores, NEG_INF)
        if is_causal:
            k_pos = src * nk + jnp.arange(nk)
            causal = q_pos[:, None] >= k_pos[None, :]
            scores = jnp.where(causal[None, None], scores, NEG_INF)

        m_new = jnp.maximum(m, scores.max(axis=-1))
        p = jnp.exp(scores - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l = l * alpha + p.sum(axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
            preferred_element_type=jnp.float32,
        )
        m = m_new
        if i < n_shards - 1:
            k = lax.ppermute(k, axis_name, fwd)
            v = lax.ppermute(v, axis_name, fwd)
            key_mask = lax.ppermute(key_mask, axis_name, fwd)

    # Rows whose running max never left the sentinel saw NO visible key
    # anywhere on the ring: exp(0)=1 would make out the uniform mean of v.
    # The convention (pinned by tests/test_attention_vmem.py) is ZERO.
    out = jnp.where(
        m[..., None] > NEG_INF / 2,
        o / jnp.maximum(l[..., None], 1e-30),
        0.0,
    )
    return out.astype(q.dtype)


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    mesh: Mesh,
    axis_name: str = "sequence",
    key_mask: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Sequence-parallel attention over ``mesh``'s ``axis_name`` ring.

    Args mirror ``ops.attention.dot_product_attention``; q/k/v are GLOBAL
    (B, H, N, D) arrays whose sequence dim is (or will be) sharded over
    ``axis_name``. N must divide evenly by the axis size. ``mesh`` may be a
    concrete Mesh or the ambient AbstractMesh (jax.set_mesh under jit).
    ``batch_axis`` additionally co-shards the batch dim (data parallelism
    composing with SP) — without it the batch is REPLICATED inside the ring
    body, which is correct but wastes memory on dp×sp meshes.

    Returns the exact full-attention result (same float32-softmax math),
    with k/v memory per device reduced by the axis size.
    """
    n_shards = int(mesh.shape[axis_name])
    if q.shape[2] % n_shards or k.shape[2] % n_shards:
        raise ValueError(
            f"sequence dims {q.shape[2]}/{k.shape[2]} must divide the "
            f"'{axis_name}' axis size {n_shards}"
        )
    if batch_axis is not None and q.shape[0] % int(mesh.shape[batch_axis]):
        raise ValueError(
            f"batch {q.shape[0]} must divide the '{batch_axis}' axis size"
        )
    if key_mask is None:
        key_mask = jnp.ones((k.shape[0], k.shape[2]), bool)

    seq_spec = P(batch_axis, None, axis_name, None)
    body = functools.partial(
        _ring_attention_local,
        scale=scale,
        axis_name=axis_name,
        n_shards=n_shards,
        is_causal=is_causal,
    )
    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(seq_spec, seq_spec, seq_spec, P(batch_axis, axis_name)),
        out_specs=seq_spec,
        check_vma=False,
    )(q, k, v, key_mask)
