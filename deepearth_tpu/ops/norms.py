"""Normalization layers."""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax
from flax import linen as nn


class RMSNorm(nn.Module):
    """Variance-only norm computed in float32 (reference:
    encoders/modeling_deepseek.py:94-108)."""

    eps: float = 1e-6
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        input_dtype = x.dtype
        weight = self.param(
            "weight", nn.initializers.ones, (x.shape[-1],), self.param_dtype
        )
        xf = x.astype(jnp.float32)
        variance = jnp.mean(xf * xf, axis=-1, keepdims=True)
        xf = xf * lax.rsqrt(variance + self.eps)
        return (weight * xf.astype(input_dtype)).astype(input_dtype)
