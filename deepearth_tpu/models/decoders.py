"""Reconstruction decoders (reference: models/decoders.py:9-89)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn


class ModalityDecoder(nn.Module):
    """3-layer shrinking MLP: hidden → hidden → hidden/2 → out
    (reference: models/decoders.py:9-43)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        kwargs = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)
        h = nn.Dense(self.hidden_dim, name="fc1", **kwargs)(x)
        h = nn.LayerNorm(epsilon=1e-5, name="ln1", **kwargs)(h)  # torch LN default (parity)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.hidden_dim // 2, name="fc2", **kwargs)(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2", **kwargs)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="fc3", **kwargs)(h)


class SpatiotemporalDecoder(nn.Module):
    """Shrinking MLP + sigmoid for normalized coordinates in [0, 1]
    (reference: models/decoders.py:46-88)."""

    hidden_dim: int
    output_dim: int  # 3 for spatial, 1 for temporal
    coord_type: str = "spatial"
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def __post_init__(self):
        if self.coord_type not in ("spatial", "temporal"):
            raise ValueError(
                f"coord_type must be 'spatial' or 'temporal', got {self.coord_type}"
            )
        super().__post_init__()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kwargs = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)
        h = nn.Dense(self.hidden_dim // 2, name="fc1", **kwargs)(x)
        h = nn.LayerNorm(epsilon=1e-5, name="ln1", **kwargs)(h)  # torch LN default (parity)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.hidden_dim // 4, name="fc2", **kwargs)(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2", **kwargs)(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.output_dim, name="fc3", **kwargs)(h)
        return nn.sigmoid(h)
