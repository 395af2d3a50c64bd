"""MLA autoregressive decoding with a compressed KV cache.

This is the feature behind the reference's "57× more memory-efficient
Transformer" claim (reference: README.md:29): Multi-head Latent Attention
caches only the rank-compressed latent (``kv_lora_rank`` floats) plus the
shared rope head per token, instead of full per-head K/V. For DeepSeek-V3
dims (kv_lora_rank=512, rope=64 vs 128 heads × 256) that is
128·256 / (512+64) ≈ 57×.

The decode step uses **projection absorption**: k_nope never materializes —
q_nope is folded through the kv_b key projection once per step
(``q_eff = q_nope · W_kᵀ``), so attention scores are taken directly against
the cached latents, and the value projection is applied after the
probability-weighted latent sum. Works with the unmodified flax parameters
of :class:`deepearth_tpu.models.MLAttention`; decode outputs match the full
(training) forward to <1e-4.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..configs import MLAConfig
from ..ops.quant import linear_p
from ..ops.rope import apply_rope_deepseek, rope_cos_sin, yarn_get_mscale


class MLACache(NamedTuple):
    """Compressed KV cache: (B, max_len, kv_lora_rank) latents (post-RMSNorm)
    + (B, max_len, qk_rope_head_dim) shared rope keys."""

    ckv: jnp.ndarray
    k_pe: jnp.ndarray
    length: jnp.ndarray  # () int32 — tokens filled


def init_cache(cfg: MLAConfig, batch: int, max_len: int, dtype=jnp.float32) -> MLACache:
    return MLACache(
        ckv=jnp.zeros((batch, max_len, cfg.kv_lora_rank), dtype),
        k_pe=jnp.zeros((batch, max_len, cfg.qk_rope_head_dim), dtype),
        length=jnp.int32(0),
    )


def cache_bytes_per_token(cfg: MLAConfig, dtype_bytes: int = 4) -> int:
    return (cfg.kv_lora_rank + cfg.qk_rope_head_dim) * dtype_bytes


def full_cache_bytes_per_token(cfg: MLAConfig, dtype_bytes: int = 4) -> int:
    """What a standard attention cache would cost (per-head K + V)."""
    return cfg.n_heads * (cfg.q_head_dim + cfg.v_head_dim) * dtype_bytes


def _rms(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (weight * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype)).astype(
        x.dtype
    )


def _softmax_scale(cfg: MLAConfig) -> float:
    scale = cfg.q_head_dim ** -0.5
    if cfg.rope_scaling.type == "yarn" and cfg.rope_scaling.mscale_all_dim:
        ms = yarn_get_mscale(cfg.rope_scaling.factor, cfg.rope_scaling.mscale_all_dim)
        scale = scale * ms * ms
    return scale


def decode_step(
    params: dict,
    cfg: MLAConfig,
    cache: MLACache,
    x_t: jnp.ndarray,
    max_len: int,
) -> Tuple[jnp.ndarray, MLACache]:
    """One decode step.

    Args:
        params: the flax param dict of an MLAttention module.
        x_t: (B, 1, hidden) current-token activations.
        max_len: static cache capacity (rope tables sized to it).

    Returns:
        (B, 1, hidden) attention output and the updated cache.
    """
    B = x_t.shape[0]
    H = cfg.n_heads
    nope, rope_d, vh = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
    pos = cache.length

    # -- queries (linear_p: bf16, or int8 fused-dequant when quantized) ---- #
    if cfg.q_lora_rank is None:
        q = linear_p(params["q_proj"], x_t)
    else:
        qa = linear_p(params["q_a_proj"], x_t)
        qa = _rms(qa, params["q_a_layernorm"]["weight"])
        q = linear_p(params["q_b_proj"], qa)
    q = q.reshape(B, 1, H, cfg.q_head_dim).transpose(0, 2, 1, 3)  # (B,H,1,qh)
    q_nope, q_pe = q[..., :nope], q[..., nope:]

    # -- compressed kv for the current token ------------------------------- #
    ckv_full = linear_p(params["kv_a_proj_with_mqa"], x_t)
    ckv_t = ckv_full[..., : cfg.kv_lora_rank]  # (B, 1, r)
    kpe_t = ckv_full[..., cfg.kv_lora_rank :]  # (B, 1, rope_d)
    ckv_t = _rms(ckv_t, params["kv_a_layernorm"]["weight"])

    # rope at the current position (tables sized to max_len, indexed at pos)
    scaling = cfg.rope_scaling if cfg.rope_scaling.type != "none" else None
    cos, sin = rope_cos_sin(max_len, rope_d, cfg.rope_theta, scaling=scaling)
    cos_t = jax.lax.dynamic_slice_in_dim(cos, pos, 1, axis=0)
    sin_t = jax.lax.dynamic_slice_in_dim(sin, pos, 1, axis=0)
    q_pe = apply_rope_deepseek(q_pe, cos_t, sin_t).astype(q_nope.dtype)
    kpe_t = apply_rope_deepseek(
        kpe_t[:, None], cos_t, sin_t
    )[:, 0].astype(ckv_t.dtype)  # (B, 1, rope_d)

    # -- cache update (cast to the cache dtype: params may be bf16 while
    # the cache is kept fp32, or vice versa) -------------------------------- #
    cache = MLACache(
        ckv=jax.lax.dynamic_update_slice_in_dim(
            cache.ckv, ckv_t.astype(cache.ckv.dtype), pos, axis=1
        ),
        k_pe=jax.lax.dynamic_update_slice_in_dim(
            cache.k_pe, kpe_t.astype(cache.k_pe.dtype), pos, axis=1
        ),
        length=pos + 1,
    )

    # -- absorbed attention --------------------------------------------------- #
    # kv_b kernel: (r, H*(nope+vh)) → W_k (r, H, nope), W_v (r, H, vh)
    w_kv_b = params["kv_b_proj"]["kernel"].reshape(
        cfg.kv_lora_rank, H, nope + vh
    )
    w_k, w_v = w_kv_b[..., :nope], w_kv_b[..., nope:]

    q_eff = jnp.einsum("bhtn,rhn->bhtr", q_nope, w_k)  # (B, H, 1, r)
    scores = jnp.einsum(
        "bhtr,bsr->bhts", q_eff.astype(jnp.float32),
        cache.ckv.astype(jnp.float32),
    ) + jnp.einsum(
        "bhtp,bsp->bhts", q_pe.astype(jnp.float32),
        cache.k_pe.astype(jnp.float32),
    )
    scores = scores * jnp.float32(_softmax_scale(cfg))

    valid = (
        jnp.arange(max_len) < cache.length
    )  # (max_len,) — attend to filled slots only
    scores = jnp.where(valid[None, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(cache.ckv.dtype)

    ctx_latent = jnp.einsum("bhts,bsr->bhtr", probs, cache.ckv)  # (B,H,1,r)
    ctx = jnp.einsum("bhtr,rhv->bhtv", ctx_latent, w_v)  # (B,H,1,vh)
    out = ctx.transpose(0, 2, 1, 3).reshape(B, 1, H * vh)
    out = linear_p(params["o_proj"], out)
    return out, cache


def decode_sequence(
    params: dict, cfg: MLAConfig, xs: jnp.ndarray, max_len: int = None
) -> jnp.ndarray:
    """Decode a whole (B, S, D) sequence token-by-token (testing/reference
    path; production decoding drives decode_step from a sampler loop)."""
    B, S, _ = xs.shape
    max_len = max_len or S
    cache = init_cache(cfg, B, max_len, xs.dtype)
    outs = []
    for t in range(S):
        o, cache = decode_step(params, cfg, cache, xs[:, t : t + 1], max_len)
        outs.append(o)
    return jnp.concatenate(outs, axis=1)
