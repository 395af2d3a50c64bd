"""Multi-resolution hash encoding (InstantNGP-style) for TPU.

Re-design of the reference encoder (reference: models/hash_encoding.py:11-96)
with two upgrades:

* **d-linear interpolation** over the 2^D cell corners (the reference gathers
  only the nearest cell; ``interpolation='nearest'`` reproduces that exactly
  for parity testing — same XOR-prime hash, same primes, same modulo).
* **Vectorised level stack**: all levels live in one ``(L, T, F)`` table and
  are gathered with a single flattened `take`, which XLA lowers to one fused
  gather instead of L embedding lookups. Gradients scatter-add into the table
  automatically via the gather transpose.

Hash function parity note: the reference computes ``(grid * prime) ^ ...`` in
int64 then ``% table_size``. For power-of-two table sizes, low-19-bit
equivalence means uint32 arithmetic gives bit-identical indices (2^19 divides
2^32, and XOR/mod only see the low bits). We compute in uint32, which is what
the TPU vector unit natively supports.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..configs import HashEncodingConfig

# Large-prime spatial hash (reference: models/hash_encoding.py:64).
HASH_PRIMES = (1, 2654435761, 805459861, 3674653429)


def _corner_offsets(coords_dim: int) -> np.ndarray:
    """All 2^D corner offsets of a unit cell, shape (2^D, D), values in {0,1}."""
    n = 1 << coords_dim
    out = np.zeros((n, coords_dim), dtype=np.int32)
    for c in range(n):
        for d in range(coords_dim):
            out[c, d] = (c >> d) & 1
    return out


def hash_grid_indices(
    grid_coords: jnp.ndarray, table_size: int, coords_dim: int
) -> jnp.ndarray:
    """XOR-prime hash of integer grid coordinates.

    Args:
        grid_coords: (..., D) int32/uint32 grid cell coordinates.
        table_size: hash table length (power of two recommended).
        coords_dim: D.

    Returns:
        (...,) uint32 indices in [0, table_size).
    """
    g = grid_coords.astype(jnp.uint32)
    h = g[..., 0] * jnp.uint32(HASH_PRIMES[0])
    for d in range(1, coords_dim):
        h = h ^ (g[..., d] * jnp.uint32(HASH_PRIMES[d]))
    if table_size & (table_size - 1) == 0:
        return h & jnp.uint32(table_size - 1)
    return h % jnp.uint32(table_size)


@functools.partial(jax.jit, static_argnames=("interpolation", "table_size"))
def hash_encode(
    coords: jnp.ndarray,
    tables: jnp.ndarray,
    resolutions: jnp.ndarray,
    *,
    interpolation: str = "linear",
    table_size: Optional[int] = None,
) -> jnp.ndarray:
    """Encode continuous coordinates with a multi-level hash grid.

    Args:
        coords: (..., D) coordinates, typically normalized to [0, 1].
        tables: (L, T, F) feature tables for all levels.
        resolutions: (L,) per-level grid resolutions.
        interpolation: 'linear' (d-linear over 2^D corners) or 'nearest'
            (reference parity: floor cell only).
        table_size: T (defaults to tables.shape[1]).

    Returns:
        (..., L * F) concatenated per-level features.
    """
    L, T, F = tables.shape
    table_size = table_size or T
    D = coords.shape[-1]
    batch_shape = coords.shape[:-1]

    # (..., L, D): coordinates scaled per level.
    scaled = coords[..., None, :].astype(jnp.float32) * resolutions.astype(
        jnp.float32
    )[:, None]
    grid = jnp.floor(scaled).astype(jnp.int32)

    tables_flat = tables.reshape(L * T, F)
    level_offset = (jnp.arange(L, dtype=jnp.uint32) * jnp.uint32(T))

    if interpolation == "nearest":
        idx = hash_grid_indices(grid, table_size, D)  # (..., L)
        flat_idx = (idx + level_offset).astype(jnp.int32)
        feats = tables_flat[flat_idx]  # (..., L, F)
        return feats.reshape(*batch_shape, L * F)

    if interpolation != "linear":
        raise ValueError(f"unknown interpolation {interpolation!r}")

    offsets = jnp.asarray(_corner_offsets(D))  # (C, D), C = 2^D
    corners = grid[..., None, :] + offsets  # (..., L, C, D)
    idx = hash_grid_indices(corners, table_size, D)  # (..., L, C)
    flat_idx = (idx + level_offset[:, None]).astype(jnp.int32)
    feats = tables_flat[flat_idx]  # (..., L, C, F)

    frac = scaled - jnp.floor(scaled)  # (..., L, D)
    # weight per corner: prod_d (offset_d ? frac_d : 1-frac_d)
    w = jnp.where(
        offsets.astype(bool), frac[..., None, :], 1.0 - frac[..., None, :]
    ).prod(axis=-1)  # (..., L, C)
    out = jnp.sum(w[..., None] * feats, axis=-2)  # (..., L, F)
    return out.reshape(*batch_shape, L * F)


def init_hash_tables(
    key: jax.Array, cfg: HashEncodingConfig, dtype=jnp.float32
) -> jnp.ndarray:
    """Uniform(-1e-4, 1e-4) init (reference: models/hash_encoding.py:44-45)."""
    return jax.random.uniform(
        key,
        (cfg.n_levels, cfg.hash_table_size, cfg.n_features_per_level),
        dtype=dtype,
        minval=-1e-4,
        maxval=1e-4,
    )


class HashEncoding(nn.Module):
    """Flax module wrapping :func:`hash_encode` with learned tables."""

    cfg: HashEncodingConfig
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        tables = self.param(
            "tables",
            lambda key: init_hash_tables(key, cfg, self.param_dtype),
        )
        resolutions = jnp.asarray(cfg.resolutions, dtype=jnp.float32)
        return hash_encode(
            coords,
            tables,
            resolutions,
            interpolation=cfg.interpolation,
            table_size=cfg.hash_table_size,
        )
