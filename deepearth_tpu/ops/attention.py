"""Fused scaled-dot-product attention core.

XLA fuses qk^T → softmax → @v well on TPU when written as plain einsums with
float32 softmax (matching the reference numerics,
reference: encoders/modeling_deepseek.py:832-835, models/transformers.py:95-103).
All sequence lengths in DeepEarth are small (fusion operates on ~22 universal
tokens; the longest path is the 4608-patch V-JEPA2 cross-attention), so a
flash/splash kernel is not needed for capability parity — the MXU-friendly
einsum formulation is the fast path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

NEG_INF = -1e30  # finite -inf stand-in: keeps softmax NaN-free for fully
# masked rows (bfloat16-safe)


def dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    key_mask: Optional[jnp.ndarray] = None,
    attn_bias: Optional[jnp.ndarray] = None,
    is_causal: bool = False,
) -> jnp.ndarray:
    """Multi-head attention.

    Args:
        q: (B, H, Nq, Dk)
        k: (B, H, Nk, Dk)
        v: (B, H, Nk, Dv)
        scale: softmax scale (already includes any mscale correction).
        key_mask: optional (B, Nk) bool; False keys are masked out
            (reference A-stack semantics: models/transformers.py:98-100).
        attn_bias: optional additive bias broadcastable to (B, H, Nq, Nk).
        is_causal: apply a causal mask.

    Returns:
        (B, H, Nq, Dv) in q's dtype; softmax computed in float32.
    """
    # Mid-length sequences (the S=576 trainable-flagship vision path) route
    # to the VMEM-resident Pallas kernel: scores never touch HBM, fwd+bwd
    # (ops/attention_vmem.py). Short sequences (fusion's ~22 universal
    # tokens) and causal/biased paths stay on the XLA einsum formulation;
    # S>1024 uses the flash kernel via the MLAttention gate.
    import jax

    from .attention_vmem import supported, vmem_attention

    if (
        supported(q.shape[2], k.shape[2], q.shape[3], v.shape[3],
                  is_causal, attn_bias is not None)
        and jax.default_backend() == "tpu"
    ):
        return vmem_attention(q, k, v, scale=scale, key_mask=key_mask)

    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * jnp.float32(scale)

    if attn_bias is not None:
        scores = scores + attn_bias.astype(jnp.float32)
    if key_mask is not None:
        scores = jnp.where(key_mask[:, None, None, :], scores, NEG_INF)
    if is_causal:
        nq, nk = scores.shape[-2], scores.shape[-1]
        causal = jnp.tril(jnp.ones((nq, nk), dtype=bool), k=nk - nq)
        scores = jnp.where(causal, scores, NEG_INF)

    probs = jnp.exp(
        scores - jnp.max(scores, axis=-1, keepdims=True)
    )
    probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
    probs = probs.astype(q.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    if key_mask is not None:
        # A row with ALL keys masked contributes ZERO (not the uniform mean
        # of v that exp(NEG_INF-NEG_INF)=1 would produce) — pinned across
        # backends: the vmem and flash kernels' guarded softmax already
        # returns zeros for such rows.
        out = jnp.where(
            key_mask.any(axis=-1)[:, None, None, None], out, 0.0
        ).astype(out.dtype)
    return out
