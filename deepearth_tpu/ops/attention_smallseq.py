"""Token-major attention for tiny static sequences (the fusion stack's 3-22
universal tokens).

Why this exists (measured, PROFILE_ASTACK_BUCKETS.json): at the A-stack
headline shape (B=1024, N=3, D=768, H=12) the standard (B, H, N, Dh)
attention is an op-count/padding storm — 16.3 ms of the 42 ms train step.
Every tensor with N or Dh in the minor-two dims pads sublanes 3→8 and lanes
3→128 / 64→128 (the same lane-padding pathology as the hash gather,
ops/hash_encoding.py), and the per-(head) 3×64×3 matmuls waste >99% of each
MXU pass. ~2000 tiny kernels/step × ~5 µs ≈ the whole attention bucket.

The TPU-native formulation keeps everything TOKEN-MAJOR (N, B, D):

* minor dims are always (B, D) = (1024, 768) — zero padding anywhere;
* per-token slices q[i] are contiguous (B, D) slabs (free);
* the head structure is handled by a constant one-hot segment matrix
  SEG (D, H): ``scores[i,j] = (q_i ⊙ k_j) @ SEG`` collapses each head's
  Dh lanes with one well-shaped MXU matmul, and ``probs @ SEGᵀ`` expands
  head weights back to lanes for the value combine;
* rotate_half RoPE becomes a constant ±1 permutation matmul
  ``x @ R`` (exact in any dtype), so no (N, H, Dh)-layout tensor is ever
  formed;
* softmax runs on (Nq, Nk, B, H) where the padded minor (B, H) tensor is
  ~0.5 MB — noise.

Total: ~15 fused XLA ops per attention site instead of ~45 padded ones, no
transposes. Equivalent to ops.attention.dot_product_attention to float
tolerance (tests/test_attention_smallseq.py pins it, and the fusion parity
suite covers it end-to-end vs the reference's torch module).

(reference: models/cross_modal_fusion.py:185-270 — the module whose
attention this accelerates)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30  # same finite -inf as ops/attention.py


# --------------------------------------------------------------------------- #
# constant matrices (host numpy, cached; become folded XLA constants)
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=32)
def _seg_np(n_heads: int, head_dim: int) -> np.ndarray:
    """(D, H) one-hot: column h marks head h's lanes."""
    d = n_heads * head_dim
    seg = np.zeros((d, n_heads), np.float32)
    for h in range(n_heads):
        seg[h * head_dim : (h + 1) * head_dim, h] = 1.0
    return seg


@functools.lru_cache(maxsize=32)
def _rotate_half_matrix_np(n_heads: int, head_dim: int) -> np.ndarray:
    """(D, D) ±1 permutation: x @ R == per-head rotate_half(x)."""
    d = n_heads * head_dim
    hd2 = head_dim // 2
    r = np.zeros((d, d), np.float32)
    for h in range(n_heads):
        o = h * head_dim
        for i in range(hd2):
            r[o + hd2 + i, o + i] = -1.0  # out[:hd2] = -x[hd2:]
            r[o + i, o + hd2 + i] = 1.0   # out[hd2:] =  x[:hd2]
    return r


@functools.lru_cache(maxsize=64)
def _rope_tables_np(
    n: int, n_heads: int, head_dim: int, theta: float
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables tiled to the flat layout: (N, 1, D), half convention
    (matches ops.rope.rope_cos_sin(layout='half') with no scaling)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    ang = np.arange(n)[:, None] * np.concatenate([inv, inv])[None, :]  # (N, Dh)
    cos = np.tile(np.cos(ang), (1, n_heads)).astype(np.float32)
    sin = np.tile(np.sin(ang), (1, n_heads)).astype(np.float32)
    return cos[:, None, :], sin[:, None, :]


def rope_token_major(
    x: jnp.ndarray, n_heads: int, theta: float = 10000.0
) -> jnp.ndarray:
    """Half-layout RoPE on a token-major (N, B, D) tensor, positions 0..N-1.

    Equivalent to ops.rope.apply_rope_half on the (B, H, N, Dh) layout, but
    rotate_half is the constant ±1 matmul — no head-split reshape/transpose.
    """
    n, _, d = x.shape
    head_dim = d // n_heads
    cos, sin = _rope_tables_np(n, n_heads, head_dim, theta)
    r = jnp.asarray(_rotate_half_matrix_np(n_heads, head_dim), x.dtype)
    rotated = x @ r
    return (
        x * jnp.asarray(cos, x.dtype) + rotated * jnp.asarray(sin, x.dtype)
    ).astype(x.dtype)


# --------------------------------------------------------------------------- #
# attention core
# --------------------------------------------------------------------------- #


def pairwise_token_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    n_heads: int,
    scale: float,
    key_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Multi-head attention, token-major, tiny static N.

    Args:
        q: (Nq, B, D); k, v: (Nk, B, D) — flat head layout, D = H·Dh.
        key_mask: optional (B, Nk) bool, True = visible (same semantics as
            dot_product_attention).

    Returns (Nq, B, D) in q's dtype; softmax in float32.
    """
    nq, b, d = q.shape
    nk = k.shape[0]
    head_dim = d // n_heads
    seg = jnp.asarray(_seg_np(n_heads, head_dim))

    # scores[i,j,b,h] = Σ_{d∈h} q[i,b,d]·k[j,b,d] — outer product over the
    # tiny token pair grid, head-collapse as ONE (Nq·Nk·B, D)@(D, H) matmul.
    a = q[:, None, :, :].astype(jnp.float32) * k[None, :, :, :].astype(
        jnp.float32
    )  # (Nq, Nk, B, D)
    scores = jax.lax.dot_general(
        a,
        seg,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)  # (Nq, Nk, B, H)

    if key_mask is not None:
        scores = jnp.where(
            key_mask.T[None, :, :, None], scores, NEG_INF
        )

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)  # (Nq, Nk, B, H)

    # combine: expand head weights to lanes (one (Nq·Nk·B, H)@(H, D) matmul),
    # multiply by v, reduce over the key tokens.
    pv = jax.lax.dot_general(
        probs,
        seg.T,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Nq, Nk, B, D)
    out = jnp.sum(pv * v[None, :, :, :].astype(jnp.float32), axis=1)
    return out.astype(q.dtype)
