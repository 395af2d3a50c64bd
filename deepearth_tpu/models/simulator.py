"""Inductive simulator: the deep DeepSeek-style transformer over fused tokens
(reference: core/inductive_simulator.py:23-167 and the richer backup
core/inductive_simulator_florida_backup.py:54-242).

Presets standard / high_precision / fast / ultra mirror the reference's
(24/32/12/48 layers, up to 128 experts). Token-level masking strategies
(random / block / temporal / spatial) reproduce the backup's MaskingStrategy.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..configs import DeepSeekBlockConfig, simulator_config
from .deepseek import DeepSeekTransformer


class InductiveSimulator(nn.Module):
    """Deep transformer simulator over a fused token sequence, with a
    learnable mask token for token-level masked prediction."""

    cfg: DeepSeekBlockConfig
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        token_mask: Optional[jnp.ndarray] = None,  # (B, N) bool, True = visible
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if token_mask is not None:
            mask_token = self.param(
                "mask_token", nn.initializers.normal(0.02),
                (1, 1, tokens.shape[-1]), self.param_dtype,
            )
            tokens = jnp.where(
                token_mask[..., None], tokens, mask_token.astype(tokens.dtype)
            )
        return DeepSeekTransformer(
            self.cfg, self.compute_dtype, self.param_dtype, remat=self.remat,
            remat_policy=self.remat_policy,
            name="transformer",
        )(tokens, deterministic=deterministic)


def create_inductive_simulator(
    preset: str = "standard", **overrides
) -> Tuple[InductiveSimulator, DeepSeekBlockConfig]:
    """Factory mirroring reference create_inductive_simulator
    (core/inductive_simulator.py:118-154)."""
    cfg = simulator_config(preset)
    for k, v in overrides.items():
        setattr(cfg, k, v)
    return InductiveSimulator(cfg), cfg


class MaskingStrategy:
    """Token-level masking over a (B, N) token grid
    (reference: core/inductive_simulator_florida_backup.py:54-111).

    Masks are True = visible. Tokens may carry (temporal, spatial) structure
    described by ``grid`` = (T, S) with N = T * S.
    """

    def __init__(self, mask_ratio: float = 0.15, grid: Optional[Tuple[int, int]] = None):
        self.mask_ratio = mask_ratio
        self.grid = grid

    def random(self, key: jax.Array, batch: int, n_tokens: int) -> jnp.ndarray:
        return jax.random.bernoulli(key, 1.0 - self.mask_ratio, (batch, n_tokens))

    def block(self, key: jax.Array, batch: int, n_tokens: int) -> jnp.ndarray:
        """Contiguous block of ~mask_ratio tokens hidden per sample."""
        block_len = max(1, int(round(n_tokens * self.mask_ratio)))
        start = jax.random.randint(
            key, (batch,), 0, max(1, n_tokens - block_len + 1)
        )
        pos = jnp.arange(n_tokens)[None, :]
        hidden = (pos >= start[:, None]) & (pos < start[:, None] + block_len)
        return ~hidden

    def temporal(self, key: jax.Array, batch: int, n_tokens: int) -> jnp.ndarray:
        """Hide whole temporal slices (requires grid)."""
        t, s = self._grid(n_tokens)
        keep_t = jax.random.bernoulli(key, 1.0 - self.mask_ratio, (batch, t))
        return jnp.repeat(keep_t, s, axis=1)

    def spatial(self, key: jax.Array, batch: int, n_tokens: int) -> jnp.ndarray:
        """Hide whole spatial positions across all times (requires grid)."""
        t, s = self._grid(n_tokens)
        keep_s = jax.random.bernoulli(key, 1.0 - self.mask_ratio, (batch, s))
        return jnp.tile(keep_s, (1, t))

    def _grid(self, n_tokens: int) -> Tuple[int, int]:
        if self.grid is None:
            raise ValueError("temporal/spatial masking needs grid=(T, S)")
        t, s = self.grid
        if t * s != n_tokens:
            raise ValueError(f"grid {self.grid} != {n_tokens} tokens")
        return t, s


class DatasetSpecificDecoder(nn.Module):
    """Per-dataset linear reconstruction heads
    (reference: core/inductive_simulator_florida_backup.py:242)."""

    output_dims: Dict[str, int]
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fused: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        return {
            name: nn.Dense(
                dim, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"head_{name}",
            )(fused)
            for name, dim in sorted(self.output_dims.items())
        }
