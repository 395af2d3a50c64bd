"""Bidirectional cross-modal reconstruction (the C-stack — the one stack the
reference actually trained end-to-end).

* :class:`VisionSequenceDecoder` — language/fused embedding → full V-JEPA2
  patch grid (T, H, W, C), reference: training/bidirectional_reconstruction.py
  VisionDecoder (outputs 8·24·24·1408). TPU re-design: learned patch queries
  cross-attend into the conditioning embedding and a single einsum projects to
  channel space — one big MXU matmul instead of a 6.5M-wide MLP head.
* :class:`BidirectionalReconstructor` — vision→language and language→vision
  (reference: training/bidirectional_reconstruction.py:23-94).
* :class:`MultimodalAutoencoder` — pooled vision + language → fusion
  bottleneck → reconstruction heads + species classifier
  (reference: training/multimodal_autoencoder.py:131-360).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


class VisionSequenceDecoder(nn.Module):
    """Conditioning vector → (T, H, W, C) patch-feature grid."""

    grid: Tuple[int, int, int] = (8, 24, 24)  # V-JEPA2 temporal × spatial
    channels: int = 1408
    hidden_dim: int = 512
    n_heads: int = 8
    n_layers: int = 2
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """cond: (B, D_in) → (B, T, H, W, C)."""
        B = cond.shape[0]
        T, H, W = self.grid
        P = T * H * W
        D = self.hidden_dim

        cond_tokens = nn.Dense(
            D * 4, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="cond_proj",
        )(cond.astype(self.compute_dtype)).reshape(B, 4, D)

        queries = self.param(
            "patch_queries", nn.initializers.normal(0.02), (P, D), self.param_dtype
        )
        q = jnp.broadcast_to(queries.astype(self.compute_dtype)[None], (B, P, D))

        # cross-attend patch queries into the conditioning tokens
        Dh = D // self.n_heads
        for i in range(self.n_layers):
            dense = lambda name: nn.Dense(  # noqa: E731
                D, use_bias=False, dtype=self.compute_dtype,
                param_dtype=self.param_dtype, name=f"{name}_{i}",
            )
            qq = dense("q")(nn.LayerNorm(
                dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"norm_{i}",
            )(q))
            kk = dense("k")(cond_tokens)
            vv = dense("v")(cond_tokens)
            qh = qq.reshape(B, P, self.n_heads, Dh).transpose(0, 2, 1, 3)
            kh = kk.reshape(B, 4, self.n_heads, Dh).transpose(0, 2, 1, 3)
            vh = vv.reshape(B, 4, self.n_heads, Dh).transpose(0, 2, 1, 3)
            att = dot_product_attention(qh, kh, vh, scale=Dh ** -0.5)
            q = q + dense("o")(att.transpose(0, 2, 1, 3).reshape(B, P, D))
            mlp = nn.Dense(
                D * 2, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"mlp_up_{i}",
            )(nn.LayerNorm(
                dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"mlp_norm_{i}",
            )(q))
            q = q + nn.Dense(
                D, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"mlp_down_{i}",
            )(nn.gelu(mlp, approximate=False))

        out = nn.Dense(
            self.channels, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="channel_proj",
        )(q)
        return out.reshape(B, T, H, W, self.channels)


class BidirectionalReconstructor(nn.Module):
    """vision ↔ language cross-reconstruction
    (reference: training/bidirectional_reconstruction.py:23-94)."""

    vision_dim: int = 1408
    language_dim: int = 7168
    hidden_dim: int = 512
    vision_grid: Tuple[int, int, int] = (8, 24, 24)
    full_vision_output: bool = False  # True → decode the full patch grid
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        vision: Optional[jnp.ndarray] = None,  # (B, S, vision_dim) or (B, vision_dim)
        language: Optional[jnp.ndarray] = None,  # (B, language_dim)
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cd, pd = self.compute_dtype, self.param_dtype
        out: Dict[str, jnp.ndarray] = {}
        mlp = lambda dims, name: _MLPStack(dims, cd, pd, name=name)  # noqa: E731

        if vision is not None:
            v = vision.astype(cd)
            if v.ndim == 3:
                v = v.mean(axis=1)  # pooled patches (C-stack VisionMLP pooling)
            out["language_from_vision"] = mlp(
                (self.hidden_dim * 2, self.hidden_dim * 2, self.language_dim),
                "vision_to_language",
            )(v)
        if language is not None:
            l = language.astype(cd)
            if self.full_vision_output:
                out["vision_from_language"] = VisionSequenceDecoder(
                    grid=self.vision_grid, channels=self.vision_dim,
                    hidden_dim=self.hidden_dim,
                    compute_dtype=cd, param_dtype=pd,
                    name="language_to_vision_full",
                )(l, deterministic=deterministic)
            else:
                out["vision_from_language"] = mlp(
                    (self.hidden_dim * 2, self.hidden_dim * 2, self.vision_dim),
                    "language_to_vision",
                )(l)
        return out


class _MLPStack(nn.Module):
    dims: Tuple[int, ...]
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i, d in enumerate(self.dims[:-1]):
            x = nn.Dense(
                d, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"fc{i}",
            )(x)
            x = nn.LayerNorm(
                dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"ln{i}",
            )(x)
            x = nn.gelu(x, approximate=False)
        return nn.Dense(
            self.dims[-1], dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name=f"fc{len(self.dims) - 1}",
        )(x)


class MultimodalAutoencoder(nn.Module):
    """Fusion-bottleneck autoencoder + species classifier
    (reference: training/multimodal_autoencoder.py:131-360)."""

    vision_dim: int = 1408
    language_dim: int = 7168
    bottleneck_dim: int = 256
    n_species: int = 232
    hidden_dim: int = 512
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        vision: jnp.ndarray,  # (B, S, vision_dim) or (B, vision_dim)
        language: jnp.ndarray,  # (B, language_dim)
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cd, pd = self.compute_dtype, self.param_dtype
        v = vision.astype(cd)
        if v.ndim == 3:
            v = v.mean(axis=1)
        l = language.astype(cd)

        v_h = _MLPStack((self.hidden_dim, self.hidden_dim), cd, pd, name="vision_enc")(v)
        l_h = _MLPStack((self.hidden_dim, self.hidden_dim), cd, pd, name="language_enc")(l)
        fused = jnp.concatenate([v_h, l_h], axis=-1)
        z = _MLPStack((self.hidden_dim, self.bottleneck_dim), cd, pd, name="bottleneck")(
            fused
        )

        return {
            "embedding": z,
            "vision_recon": _MLPStack(
                (self.hidden_dim, self.vision_dim), cd, pd, name="vision_dec"
            )(z),
            "language_recon": _MLPStack(
                (self.hidden_dim, self.language_dim), cd, pd, name="language_dec"
            )(z),
            "species_logits": nn.Dense(
                self.n_species, dtype=cd, param_dtype=pd, name="classifier"
            )(z),
        }
