"""Modality encoders: simple A-stack encoder and universal-token generation.

* :class:`ModalityEncoder` — reference models/encoders.py:88-146: project,
  add learnable modality token, small transformer, project to model dim.
* :class:`UniversalTokenEncoder` — the universal-token pipeline of the B/D
  stacks (reference: encoders/modality_infrastructure.py:311-587): native
  embeddings → (optional MoE) projection to universal dim → positional
  embeddings → DeepSeek transformer → fixed number of universal tokens via
  learned query cross-attention (multi-token) or attention pooling
  (single-token), RMSNorm'd.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..configs import (
    DeepSeekBlockConfig,
    MLAConfig,
    ModalityConfig,
    MoEConfig,
    TransformerConfig,
)
from ..ops.attention import dot_product_attention
from ..ops.norms import RMSNorm
from .deepseek import DeepSeekTransformer, MoELayer
from .transformer import Transformer


class ModalityEncoder(nn.Module):
    """A-stack per-modality encoder (reference: models/encoders.py:88-146)."""

    input_dim: int
    output_dim: int
    encoder_cfg: TransformerConfig
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        """x: (B, input_dim); mask: (B,) bool. Returns (B, output_dim)."""
        B = x.shape[0]
        h = nn.Dense(
            self.encoder_cfg.hidden_dim, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name="input_projection",
        )(x.astype(self.compute_dtype))[:, None, :]  # (B, 1, H)
        modality_embedding = self.param(
            "modality_embedding", nn.initializers.normal(0.02),
            (1, 1, self.encoder_cfg.hidden_dim), self.param_dtype,
        )
        h = h + modality_embedding.astype(h.dtype)
        key_mask = mask[:, None] if mask is not None else None
        h = Transformer(
            self.encoder_cfg, self.compute_dtype, self.param_dtype, name="transformer"
        )(h, mask=key_mask, deterministic=deterministic)
        h = h[:, 0]
        h = nn.Dense(
            self.output_dim, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="output_projection",
        )(h)
        return nn.LayerNorm(
            epsilon=1e-5,  # torch nn.LayerNorm default (reference parity)
            dtype=self.compute_dtype, param_dtype=self.param_dtype, name="norm"
        )(h)


class _CrossAttention(nn.Module):
    """Single-block multi-query cross-attention used for token generation
    (reference: encoders/modality_infrastructure.py:509-556)."""

    dim: int
    n_heads: int
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, queries: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        B, Nq, D = queries.shape
        Nk = context.shape[1]
        H = self.n_heads
        Dh = D // H
        dense = lambda name: nn.Dense(  # noqa: E731
            D, use_bias=False, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name=name,
        )
        q = dense("q_proj")(queries).reshape(B, Nq, H, Dh).transpose(0, 2, 1, 3)
        k = dense("k_proj")(context).reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)
        v = dense("v_proj")(context).reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)
        out = dot_product_attention(q, k, v, scale=Dh ** -0.5)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, D)
        return dense("out_proj")(out)


class UniversalTokenEncoder(nn.Module):
    """native embeddings → n_tokens universal tokens."""

    modality: ModalityConfig
    universal_dim: int
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    max_positions: int = 4608  # longest native sequence (V-JEPA2 patches)

    def _transformer_cfg(self) -> DeepSeekBlockConfig:
        m = self.modality
        d = self.universal_dim
        heads = m.encoder_heads
        head_dim = max(16, d // heads // 2)
        # Cap q_head_dim (nope + rope) at 128: the Pallas flash kernel needs
        # head dims ≤128 or zero-padded to a multiple of 128, and padding
        # 192→256 wastes a third of the attention FLOPs at S=4608 (measured
        # at the 2048-d flagship). 3:1 nope:rope split preserved.
        nope = min(head_dim, 96)
        rope = max(8, min(head_dim // 2, 128 - nope))
        rope -= rope % 2  # rotation acts on pairs
        return DeepSeekBlockConfig(
            hidden_dim=d,
            n_layers=m.encoder_layers,
            intermediate_size=d * 2,
            mla=MLAConfig(
                hidden_dim=d,
                n_heads=heads,
                kv_lora_rank=max(16, d // 4),
                qk_rope_head_dim=rope,
                qk_nope_head_dim=nope,
                v_head_dim=min(head_dim, 128),
                # the 4608-patch V-JEPA2 path benefits from the flash kernel
                use_flash_attention=True,
                # sequence parallelism: ring attention when the ambient mesh
                # carries the configured axis (parallel/ring.py)
                sequence_axis=m.encoder_sequence_axis,
                ring_min_seq=m.encoder_ring_min_seq,
            ),
            moe=None,
        )

    @nn.compact
    def __call__(
        self, native: jnp.ndarray, deterministic: bool = True
    ) -> jnp.ndarray:
        """native: (B, S, input_dim) or (B, input_dim). Returns
        (B, n_tokens, universal_dim)."""
        m = self.modality
        D = self.universal_dim
        if native.ndim == 2:
            native = native[:, None, :]
        B, S, _ = native.shape
        x = native.astype(self.compute_dtype)

        # Input projection (optionally MoE-refined,
        # reference: modality_infrastructure.py:392-430).
        x = nn.Dense(
            D, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="input_projection",
        )(x)
        if m.use_moe_projection:
            x = x + MoELayer(
                MoEConfig(
                    n_routed_experts=4, num_experts_per_tok=2,
                    moe_intermediate_size=D, hidden_dim=D, n_shared_experts=None,
                ),
                self.compute_dtype, self.param_dtype, name="moe_projection",
            )(x)

        # Interpolated learned position embeddings
        # (reference: modality_infrastructure.py:465-476).
        n_pos = min(self.max_positions, max(S, m.n_tokens))
        pos_table = self.param(
            "position_embedding", nn.initializers.normal(0.02),
            (n_pos, D), self.param_dtype,
        )
        if S <= n_pos:
            pos = pos_table[:S]
        else:
            # linear interpolation of the table to length S
            idx = jnp.linspace(0.0, n_pos - 1.0, S)
            lo = jnp.floor(idx).astype(jnp.int32)
            hi = jnp.minimum(lo + 1, n_pos - 1)
            w = (idx - lo)[:, None]
            pos = pos_table[lo] * (1 - w) + pos_table[hi] * w
        x = x + pos.astype(x.dtype)[None]

        x = DeepSeekTransformer(
            self._transformer_cfg(), self.compute_dtype, self.param_dtype,
            remat=m.encoder_remat, remat_policy=m.encoder_remat_policy,
            name="transformer",
        )(x, deterministic=deterministic)

        if m.n_tokens > 1:
            # Learned query tokens cross-attend into the processed sequence
            # (reference: modality_infrastructure.py:509-556).
            queries = self.param(
                "query_tokens", nn.initializers.normal(0.02),
                (1, m.n_tokens, D), self.param_dtype,
            )
            tokens = _CrossAttention(
                D, m.encoder_heads, self.compute_dtype, self.param_dtype,
                name="token_cross_attention",
            )(jnp.broadcast_to(queries.astype(x.dtype), (B, m.n_tokens, D)), x)
        else:
            # Attention-weighted pooling
            # (reference: modality_infrastructure.py:558-587).
            pool_q = self.param(
                "pool_query", nn.initializers.normal(0.02), (D,), self.param_dtype
            )
            logits = jnp.einsum("bsd,d->bs", x, pool_q.astype(x.dtype))
            w = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
            tokens = jnp.einsum("bs,bsd->bd", w, x)[:, None, :]

        return RMSNorm(name="output_norm")(tokens)
