"""Spatiotemporal / modality masking for self-supervised reconstruction
(reference: training/train_deepearth2.py:237-307, SPECIFICATIONS.MD:256-261).

Masks are boolean with True = visible; the model replaces masked modalities
with a learnable mask token and zeroes masked coordinate features. Losses are
computed on the masked-out entries only.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from ..configs import MaskingConfig


def sample_masks(
    key: jax.Array,
    batch_size: int,
    modality_names: Sequence[str],
    cfg: MaskingConfig,
    modality_probs: Dict[str, float] | None = None,
) -> Dict[str, object]:
    """Sample per-sample masks.

    Returns dict with 'spatial_mask', 'temporal_mask' (B,) bool and
    'modality_masks' {name: (B,) bool}; True = visible.
    """
    modality_probs = modality_probs or {}
    n = len(modality_names)
    keys = jax.random.split(key, 2 + n)
    out = {
        "spatial_mask": jax.random.bernoulli(
            keys[0], 1.0 - cfg.spatial_mask_prob, (batch_size,)
        ),
        "temporal_mask": jax.random.bernoulli(
            keys[1], 1.0 - cfg.temporal_mask_prob, (batch_size,)
        ),
        "modality_masks": {},
    }
    for i, name in enumerate(modality_names):
        p = modality_probs.get(name, cfg.modality_mask_prob)
        out["modality_masks"][name] = jax.random.bernoulli(
            keys[2 + i], 1.0 - p, (batch_size,)
        )
    return out


def mae_patch_mask(
    key: jax.Array, batch_size: int, n_patches: int, mask_prob: float
) -> jnp.ndarray:
    """MAE-style per-patch mask (B, P) bool, True = visible
    (reference: train_deepearth2.py vision 75% masking)."""
    return jax.random.bernoulli(key, 1.0 - mask_prob, (batch_size, n_patches))


def mlm_token_mask(
    key: jax.Array, batch_size: int, seq_len: int, mask_prob: float
) -> jnp.ndarray:
    """MLM-style per-token mask (B, S) bool, True = visible."""
    return jax.random.bernoulli(key, 1.0 - mask_prob, (batch_size, seq_len))
