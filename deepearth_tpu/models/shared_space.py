"""Perceiver-style shared latent pool
(reference: models/shared_space/multimodal_shared_space.py:21-132).

Frozen backbone features from any modalities are projected into a common
width, then a learnable latent pool cross-attends into the concatenated
features; trained with CLIP alignment + MAE reconstruction losses (see
training/losses.clip_contrastive_loss)."""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
from flax import linen as nn

from ..ops.attention import dot_product_attention


class LatentPool(nn.Module):
    """Learnable latents cross-attend into input tokens, then self-attend."""

    n_latents: int = 32
    dim: int = 256
    n_heads: int = 8
    n_layers: int = 2
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tokens: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """tokens: (B, S, dim) → latents (B, n_latents, dim)."""
        B = tokens.shape[0]
        D, H = self.dim, self.n_heads
        Dh = D // H
        latents = self.param(
            "latents", nn.initializers.normal(0.02),
            (1, self.n_latents, D), self.param_dtype,
        )
        z = jnp.broadcast_to(
            latents.astype(self.compute_dtype), (B, self.n_latents, D)
        )

        def attend(q_in, kv_in, prefix):
            dense = lambda name: nn.Dense(  # noqa: E731
                D, use_bias=False, dtype=self.compute_dtype,
                param_dtype=self.param_dtype, name=f"{prefix}_{name}",
            )
            Nq, Nk = q_in.shape[1], kv_in.shape[1]
            q = dense("q")(q_in).reshape(B, Nq, H, Dh).transpose(0, 2, 1, 3)
            k = dense("k")(kv_in).reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)
            v = dense("v")(kv_in).reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)
            o = dot_product_attention(q, k, v, scale=Dh ** -0.5)
            return dense("o")(o.transpose(0, 2, 1, 3).reshape(B, Nq, D))

        for i in range(self.n_layers):
            ln = lambda name: nn.LayerNorm(  # noqa: E731
                dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"{name}_{i}",
            )
            z = z + attend(ln("cross_norm")(z), tokens.astype(self.compute_dtype),
                           f"cross{i}")
            z = z + attend(ln("self_norm")(z), z, f"self{i}")
            mlp_in = ln("mlp_norm")(z)
            h = nn.gelu(nn.Dense(
                D * 4, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"mlp_up_{i}",
            )(mlp_in), approximate=False)
            z = z + nn.Dense(
                D, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name=f"mlp_down_{i}",
            )(h)
        return z


class MultimodalSharedSpace(nn.Module):
    """Projection heads + shared latent pool + per-modality reconstruction."""

    modality_dims: Dict[str, int]  # name → native feature dim
    dim: int = 256
    n_latents: int = 32
    n_heads: int = 8
    n_layers: int = 2
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Dict[str, jnp.ndarray], deterministic: bool = True
    ) -> Dict[str, jnp.ndarray]:
        """features: {name: (B, S, Dn) | (B, Dn)} frozen-backbone features."""
        kwargs = dict(dtype=self.compute_dtype, param_dtype=self.param_dtype)
        tokens = []
        pooled_proj = {}
        for name in sorted(self.modality_dims):
            if name not in features:
                continue
            f = features[name].astype(self.compute_dtype)
            if f.ndim == 2:
                f = f[:, None, :]
            proj = nn.Dense(self.dim, name=f"proj_{name}", **kwargs)(f)
            tokens.append(proj)
            pooled_proj[name] = proj.mean(axis=1)
        x = jnp.concatenate(tokens, axis=1)

        latents = LatentPool(
            self.n_latents, self.dim, self.n_heads, self.n_layers,
            self.compute_dtype, self.param_dtype, name="pool",
        )(x, deterministic=deterministic)
        shared = latents.mean(axis=1)  # (B, dim)

        recon = {
            name: nn.Dense(dim, name=f"recon_{name}", **kwargs)(shared)
            for name, dim in sorted(self.modality_dims.items())
            if name in features
        }
        return {
            "shared_embedding": shared,
            "latents": latents,
            "modality_projections": pooled_proj,
            "reconstructions": recon,
        }
