"""MLP-UNet multimodal reconstructors with skip connections
(reference: training/unet_simple.py, training/complex_unet.py,
reconstruction/mlp_unet/model.py).

Encoder halves the width each stage, decoder doubles it back with skip
concatenation; input-level masking hides a random fraction of input features
(reference default: 30% language, 0% vision)."""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class MLPUNet(nn.Module):
    """1-D MLP U-Net over feature vectors."""

    input_dim: int
    output_dim: int
    base_width: int = 512
    depth: int = 3
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        kwargs = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)
        h = nn.Dense(self.base_width, name="stem", **kwargs)(
            x.astype(self.compute_dtype)
        )
        skips = []
        w = self.base_width
        for i in range(self.depth):
            h = nn.LayerNorm(name=f"enc_ln{i}", **kwargs)(h)
            h = nn.gelu(nn.Dense(w, name=f"enc{i}", **kwargs)(h))
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            skips.append(h)
            w = max(w // 2, 32)
            h = nn.Dense(w, name=f"down{i}", **kwargs)(h)
        for i in range(self.depth):
            w = skips[-(i + 1)].shape[-1]
            h = nn.Dense(w, name=f"up{i}", **kwargs)(h)
            h = jnp.concatenate([h, skips[-(i + 1)]], axis=-1)
            h = nn.LayerNorm(name=f"dec_ln{i}", **kwargs)(h)
            h = nn.gelu(nn.Dense(w, name=f"dec{i}", **kwargs)(h))
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.Dense(self.output_dim, name="head", **kwargs)(h)


def input_feature_mask(
    key: jax.Array, shape: Tuple[int, ...], mask_prob: float
) -> jnp.ndarray:
    """Per-feature keep mask (True = keep), reference input-level masking."""
    return jax.random.bernoulli(key, 1.0 - mask_prob, shape)


class MultimodalUNet(nn.Module):
    """Cross-modal U-Net: masked vision+language in, both reconstructed out
    (reference: training/unet_simple.py forward)."""

    vision_dim: int
    language_dim: int
    base_width: int = 512
    depth: int = 3
    vision_mask_prob: float = 0.0
    language_mask_prob: float = 0.3
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        vision: jnp.ndarray,
        language: jnp.ndarray,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        v = vision.astype(self.compute_dtype)
        if v.ndim == 3:
            v = v.mean(axis=1)
        l = language.astype(self.compute_dtype)
        if not deterministic:
            rng = rng if rng is not None else self.make_rng("mask")
            kv, kl = jax.random.split(rng)
            v = v * input_feature_mask(kv, v.shape, self.vision_mask_prob)
            l = l * input_feature_mask(kl, l.shape, self.language_mask_prob)
        x = jnp.concatenate([v, l], axis=-1)
        unet = MLPUNet(
            input_dim=x.shape[-1],
            output_dim=self.vision_dim + self.language_dim,
            base_width=self.base_width,
            depth=self.depth,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name="unet",
        )
        out = unet(x, deterministic=deterministic)
        return {
            "vision_recon": out[..., : self.vision_dim],
            "language_recon": out[..., self.vision_dim :],
        }
