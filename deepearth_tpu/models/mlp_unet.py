"""MLP-UNet multimodal reconstructors with skip connections
(reference: training/unet_simple.py, training/complex_unet.py,
reconstruction/mlp_unet/model.py).

Encoder halves the width each stage, decoder doubles it back with skip
concatenation; input-level masking hides a random fraction of input features
(reference default: 30% language, 0% vision). BimodalMLPUNet adds the
reconstruction pipeline's image↔species system: one shared U-Net
reconstructing masked embeddings of either modality in a common space, with
cosine top-k species retrieval against a (frozen text / learnable) species
embedding table (reference: reconstruction/mlp_unet/model.py:187-380)."""

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
            h = nn.gelu(nn.Dense(w, name=f"enc{i}", **kwargs)(h), approximate=False)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            skips.append(h)
            w = max(w // 2, 32)
            h = nn.Dense(w, name=f"down{i}", **kwargs)(h)
        for i in range(self.depth):
            w = skips[-(i + 1)].shape[-1]
            h = nn.Dense(w, name=f"up{i}", **kwargs)(h)
            h = jnp.concatenate([h, skips[-(i + 1)]], axis=-1)
            h = nn.LayerNorm(name=f"dec_ln{i}", **kwargs)(h)
            h = nn.gelu(nn.Dense(w, name=f"dec{i}", **kwargs)(h), approximate=False)
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


class BimodalMLPUNet(nn.Module):
    """Image↔species bimodal reconstructor
    (reference: reconstruction/mlp_unet/model.py:228-344).

    One shared :class:`MLPUNet` (512→256→128 bottleneck at the reference
    defaults) reconstructs masked embeddings from EITHER modality in the
    common ``embedding_dim`` space. Species live in a table that is either
    frozen text embeddings — produced here by the DeepSeek flax stack
    (serving/language_server.py DeepSeekFlaxEmbedder) instead of the
    reference's HF coder model — or a learnable parameter
    (LearnableSpeciesEmbeddings parity). Image embeddings arrive
    pre-extracted (frozen backbones throughout the reference's training).

    Methods mirror the reference API: reconstruct from a masked image
    embedding (image→species direction), from a species id
    (species→image), and cosine top-k retrieval via
    :func:`species_topk`.
    """

    n_species: int
    embedding_dim: int = 2048
    hidden_dim: int = 512
    bottleneck_dim: int = 128
    mask_ratio: float = 0.5
    species_table: Optional[jnp.ndarray] = None  # frozen (S, D); else learned
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    def _unet(self):
        # depth-2 halving from hidden_dim reproduces the reference's
        # 512 → 256 → 128 encoder/decoder shape
        return MLPUNet(
            input_dim=self.embedding_dim,
            output_dim=self.embedding_dim,
            base_width=self.hidden_dim,
            depth=2,
            dropout=0.1,
            compute_dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name="mlp_unet",
        )

    @nn.compact
    def __call__(
        self,
        embedding: Optional[jnp.ndarray] = None,
        species_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        rng: Optional[jax.Array] = None,
    ) -> Dict[str, jnp.ndarray]:
        """Reconstruct a masked embedding.

        Exactly one of ``embedding`` (image direction, (B, D)) or
        ``species_ids`` (species direction, (B,) int) must be given.
        Returns dict with ``recon``, ``target``, ``mask``.
        """
        if self.species_table is not None:
            table = jnp.asarray(self.species_table, self.compute_dtype)
        else:
            table = self.param(
                "species_embeddings", nn.initializers.normal(0.02),
                (self.n_species, self.embedding_dim), self.param_dtype,
            ).astype(self.compute_dtype)

        if (embedding is None) == (species_ids is None):
            raise ValueError("pass exactly one of embedding / species_ids")
        target = (
            embedding.astype(self.compute_dtype)
            if embedding is not None
            else table[species_ids]
        )
        if deterministic or self.mask_ratio <= 0:
            mask = jnp.ones_like(target, bool)
        else:
            rng = rng if rng is not None else self.make_rng("mask")
            mask = input_feature_mask(rng, target.shape, self.mask_ratio)
        recon = self._unet()(target * mask, deterministic=deterministic)
        return {"recon": recon, "target": target, "mask": mask,
                "species_table": table}


def species_topk(
    recon: jnp.ndarray, species_table: jnp.ndarray, k: int = 1
) -> jnp.ndarray:
    """Cosine top-k species retrieval
    (reference: reconstruction/mlp_unet/model.py:306-335 predict_species).

    Args:
        recon: (B, D) reconstructed embeddings.
        species_table: (S, D).
    Returns:
        (B, k) int32 species indices, best first.
    """
    r = recon / (jnp.linalg.norm(recon, axis=-1, keepdims=True) + 1e-8)
    t = species_table / (
        jnp.linalg.norm(species_table, axis=-1, keepdims=True) + 1e-8
    )
    sims = r @ t.T  # (B, S)
    return jax.lax.top_k(sims, k)[1].astype(jnp.int32)
