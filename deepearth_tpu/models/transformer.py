"""Dense pre-norm transformer with RoPE (A-stack parity).

Re-design of the reference transformer (reference: models/transformers.py:16-213)
as flax modules over the fused attention core. Differences from the reference
are TPU-idiomatic only: one fused qkv einsum path, float32 softmax, and
bfloat16-friendly compute dtype; the math (pre-norm blocks, interleaved RoPE,
GELU MLP, boolean key-mask → -inf) is identical.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..configs import TransformerConfig
from ..ops.attention import dot_product_attention
from ..ops.rope import (
    apply_rope_half,
    apply_rope_interleaved,
    rope_cos_sin,
)


class KernelParam(nn.Module):
    """Declares a bias-free Dense-compatible kernel at ``<name>/kernel`` and
    returns it, so the caller can CONCATENATE several projections into one
    matmul (q/k/v, gate/up) while keeping the parameter tree — paths, shapes,
    and init draws — byte-identical to separate ``nn.Dense`` modules.

    Why: at small token counts each separate projection dot is launch-bound
    (~25 µs); fusing 3 dots into one cuts the fusion stack's dot count ~2×
    (PROFILE_ASTACK_BUCKETS.json round-3 analysis)."""

    d_in: int
    d_out: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        return self.param(
            "kernel", nn.initializers.normal(0.02),
            (self.d_in, self.d_out), self.param_dtype,
        )


class MultiHeadAttention(nn.Module):
    """RoPE multi-head self-attention (reference: models/transformers.py:16-114)."""

    cfg: TransformerConfig
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        B, N, D = x.shape
        H, Dh = cfg.n_heads, cfg.head_dim

        cd = self.compute_dtype
        wq = KernelParam(D, D, self.param_dtype, name="q_proj")()
        wk = KernelParam(D, D, self.param_dtype, name="k_proj")()
        wv = KernelParam(D, D, self.param_dtype, name="v_proj")()
        # one fused qkv matmul (self-attention: shared input)
        qkv = x.astype(cd) @ jnp.concatenate([wq, wk, wv], axis=1).astype(cd)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)

        if cfg.use_rope:
            if cfg.rope_variant == "interleaved":
                cos, sin = rope_cos_sin(N, Dh, cfg.rope_theta, layout="interleaved")
                q = apply_rope_interleaved(q, cos, sin).astype(q.dtype)
                k = apply_rope_interleaved(k, cos, sin).astype(k.dtype)
            else:
                cos, sin = rope_cos_sin(N, Dh, cfg.rope_theta, layout="half")
                q = apply_rope_half(q, cos, sin).astype(q.dtype)
                k = apply_rope_half(k, cos, sin).astype(k.dtype)

        out = dot_product_attention(q, k, v, scale=Dh ** -0.5, key_mask=mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
        wo = KernelParam(D, D, self.param_dtype, name="out_proj")()
        out = out @ wo.astype(cd)
        out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
        return out


class MLP(nn.Module):
    """GELU MLP (reference: models/transformers.py:136-143)."""

    cfg: TransformerConfig
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        cfg = self.cfg
        hidden = int(cfg.hidden_dim * cfg.mlp_ratio)
        x = nn.Dense(
            hidden, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(0.02), name="fc1",
        )(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        x = nn.Dense(
            cfg.hidden_dim, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            kernel_init=nn.initializers.normal(0.02), name="fc2",
        )(x)
        x = nn.Dropout(cfg.dropout)(x, deterministic=deterministic)
        return x


class GatedMLP(nn.Module):
    """SiLU-gated MLP (reference: models/cross_modal_fusion.py:167-182)."""

    hidden_dim: int
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        inner = int(self.hidden_dim * self.mlp_ratio)
        d = self.hidden_dim
        cd = self.compute_dtype
        wg = KernelParam(d, inner, self.param_dtype, name="gate_proj")()
        wu = KernelParam(d, inner, self.param_dtype, name="up_proj")()
        wd = KernelParam(inner, d, self.param_dtype, name="down_proj")()
        # gate+up as ONE matmul (shared input), split after
        gu = x.astype(cd) @ jnp.concatenate([wg, wu], axis=1).astype(cd)
        gate, up = jnp.split(gu, 2, axis=-1)
        out = (nn.silu(gate) * up) @ wd.astype(cd)
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class TransformerBlock(nn.Module):
    """Pre-norm block (reference: models/transformers.py:117-161)."""

    cfg: TransformerConfig
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name=name,
        )
        x = x + MultiHeadAttention(
            cfg, self.compute_dtype, self.param_dtype, name="attention"
        )(ln("norm1")(x), mask=mask, deterministic=deterministic)
        if cfg.use_gated_mlp:
            mlp_out = GatedMLP(
                cfg.hidden_dim, cfg.mlp_ratio, cfg.dropout,
                self.compute_dtype, self.param_dtype, name="mlp",
            )(ln("norm2")(x), deterministic=deterministic)
        else:
            mlp_out = MLP(cfg, self.compute_dtype, self.param_dtype, name="mlp")(
                ln("norm2")(x), deterministic=deterministic
            )
        return x + mlp_out


class Transformer(nn.Module):
    """Stack of pre-norm blocks + final norm (reference: models/transformers.py:164-213)."""

    cfg: TransformerConfig
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        for i in range(self.cfg.n_layers):
            x = TransformerBlock(
                self.cfg, self.compute_dtype, self.param_dtype, name=f"block_{i}"
            )(x, mask=mask, deterministic=deterministic)
        return nn.LayerNorm(
            epsilon=self.cfg.layer_norm_eps, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name="final_norm",
        )(x)
