"""DeepEarthModel — the integrated multimodal masked-reconstruction model.

One coherent model replacing the reference's four stacks (see SURVEY.md §0):
Grid4D hash spacetime encoding (reference: models/encoders.py:12),
universal-token modality encoders (reference:
encoders/modality_infrastructure.py:311), whole-modality masking with a
learnable mask token (reference: models/deepearth_full_model.py:13-116),
cross-modal fusion (reference: models/cross_modal_fusion.py:353), an optional
DeepSeek MLA/MoE inductive simulator (reference: core/inductive_simulator.py:78),
and per-modality reconstruction decoders (reference: models/decoders.py).

Batch schema (all arrays static-shaped, jit-friendly):
    xyzt:            (B, 4) normalized coordinates
    modalities:      {name: (B,) int32 | (B, Din) | (B, S, Din)}
    modality_masks:  {name: (B,) bool} True = visible (False → mask token)
    spatial_mask:    (B,) bool True = visible
    temporal_mask:   (B,) bool True = visible

Mask semantics follow the reference: masked coordinates are zeroed
multiplicatively inside Grid4D, masked modalities are replaced wholesale by
the mask token; losses are computed on the masked-out entries.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
from flax import linen as nn

from ..configs import DeepEarthConfig, ModalityConfig
from .decoders import ModalityDecoder, SpatiotemporalDecoder
from .deepseek import DeepSeekTransformer
from .encoders import UniversalTokenEncoder
from .fusion import CrossModalFusion
from .grid4d import Grid4DEncoder


def _native_dim(m: ModalityConfig) -> int:
    if m.encoding_type in ("learned_embedding", "token_sequence"):
        return m.vocab_size
    return m.input_dim


class TokenSequenceDecoder(nn.Module):
    """Per-position MLM logits from fused modality tokens: learned position
    queries cross-attend into the modality's fused tokens, then project to
    the vocabulary (reference MLM objective: train_deepearth2.py language CE,
    [MASK] reconstruction)."""

    seq_len: int
    vocab_size: int
    dim: int
    n_heads: int = 8
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, fused_tokens: jnp.ndarray) -> jnp.ndarray:
        """fused_tokens: (B, n_tokens, dim) → (B, seq_len, vocab)."""
        from ..ops.attention import dot_product_attention

        B = fused_tokens.shape[0]
        D, H = self.dim, self.n_heads
        Dh = D // H
        queries = self.param(
            "position_queries", nn.initializers.normal(0.02),
            (self.seq_len, D), self.param_dtype,
        )
        q_in = jnp.broadcast_to(
            queries.astype(self.compute_dtype)[None], (B, self.seq_len, D)
        )
        dense = lambda name: nn.Dense(  # noqa: E731
            D, use_bias=False, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name=name,
        )
        kv = fused_tokens.astype(self.compute_dtype)
        q = dense("q")(q_in).reshape(B, self.seq_len, H, Dh).transpose(0, 2, 1, 3)
        k = dense("k")(kv).reshape(B, kv.shape[1], H, Dh).transpose(0, 2, 1, 3)
        v = dense("v")(kv).reshape(B, kv.shape[1], H, Dh).transpose(0, 2, 1, 3)
        out = dot_product_attention(q, k, v, scale=Dh ** -0.5)
        h = q_in + dense("o")(
            out.transpose(0, 2, 1, 3).reshape(B, self.seq_len, D)
        )
        h = nn.LayerNorm(
            dtype=self.compute_dtype, param_dtype=self.param_dtype, name="norm"
        )(h)
        return nn.Dense(
            self.vocab_size, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name="vocab_proj",
        )(h)


class DeepEarthModel(nn.Module):
    """Config-driven multimodal model with a single jit-able forward."""

    config: DeepEarthConfig

    @nn.compact
    def __call__(
        self,
        batch: Dict[str, Any],
        deterministic: bool = True,
    ) -> Dict[str, Any]:
        cfg = self.config
        cd, pd = cfg.compute_dtype, cfg.param_dtype
        D = cfg.fusion.universal_dim
        xyzt = batch["xyzt"]
        B = xyzt.shape[0]
        modalities = batch.get("modalities", {})
        masks = batch.get("modality_masks", {})
        spatial_mask = batch.get("spatial_mask")
        temporal_mask = batch.get("temporal_mask")

        # ---- spacetime token -------------------------------------------------- #
        st_emb = Grid4DEncoder(
            cfg.grid4d, cfg.hidden_dim, cd, pd, name="grid4d"
        )(xyzt, spatial_mask, temporal_mask)
        if cfg.hidden_dim != D:
            st_emb = nn.Dense(D, dtype=cd, param_dtype=pd, name="grid4d_projector")(
                st_emb
            )
        tokens: Dict[str, jnp.ndarray] = {"spacetime": st_emb[:, None, :]}

        # ---- per-modality universal tokens ----------------------------------- #
        mask_token = self.param(
            "mask_token", nn.initializers.normal(0.02), (1, 1, D), pd
        )
        patch_masks = batch.get("modality_patch_masks", {})
        for name in sorted(cfg.modalities):
            if name not in modalities:
                continue
            m = cfg.modalities[name]
            x = modalities[name]
            if name in patch_masks and x.ndim == 3:
                # MAE-style per-patch masking: hidden patches contribute zero
                # features (reference: train_deepearth2.py 75% vision masking)
                x = x * patch_masks[name][..., None].astype(x.dtype)
            if m.encoding_type == "learned_embedding":
                tok = nn.Embed(
                    m.vocab_size, D, dtype=cd, param_dtype=pd,
                    embedding_init=nn.initializers.normal(0.02),
                    name=f"embed_{name}",
                )(x.astype(jnp.int32))[:, None, :]
            elif m.encoding_type == "token_sequence":
                # (B, S) int token ids → embeddings; MLM-masked positions are
                # zeroed via modality_patch_masks before encoding
                emb = nn.Embed(
                    m.vocab_size, D, dtype=cd, param_dtype=pd,
                    embedding_init=nn.initializers.normal(0.02),
                    name=f"embed_{name}",
                )(x.astype(jnp.int32))  # (B, S, D)
                if name in patch_masks:
                    emb = emb * patch_masks[name][..., None].astype(emb.dtype)
                tok = UniversalTokenEncoder(
                    dataclasses.replace(m, input_dim=D), D, cd, pd,
                    name=f"encoder_{name}",
                )(emb, deterministic=deterministic)
            else:
                tok = UniversalTokenEncoder(
                    m, D, cd, pd, name=f"encoder_{name}"
                )(x, deterministic=deterministic)
            if name in masks:
                keep = masks[name][:, None, None]
                tok = jnp.where(keep, tok, mask_token.astype(tok.dtype))
            from ..ops.sharding import shard_hint

            tokens[name] = shard_hint(tok, "data")

        # ---- fusion ----------------------------------------------------------- #
        # Auto-generate token positions (reference: models/deepearth_integrated
        # .py:266-286 builds vision grid positions): square token counts get a
        # 2D grid of spatial positions; every modality token inherits the
        # observation's normalized time. User-provided batch positions win.
        spatial_positions = dict(batch.get("spatial_positions") or {})
        temporal_positions = dict(batch.get("temporal_positions") or {})
        if cfg.fusion.spatial_aware or cfg.fusion.temporal_aware:
            import math as _math

            for name, tok in tokens.items():
                n_tok = tok.shape[1]
                if (
                    cfg.fusion.spatial_aware
                    and name not in spatial_positions
                    and n_tok > 1
                ):
                    side = int(_math.isqrt(n_tok))
                    if side * side == n_tok:
                        g = (jnp.arange(side) + 0.5) / side
                        gy, gx = jnp.meshgrid(g, g, indexing="ij")
                        grid = jnp.stack(
                            [gx.ravel(), gy.ravel()], axis=-1
                        )  # (n_tok, 2)
                        spatial_positions[name] = jnp.broadcast_to(
                            grid[None], (B, n_tok, 2)
                        )
                if cfg.fusion.temporal_aware and name not in temporal_positions:
                    temporal_positions[name] = jnp.broadcast_to(
                        xyzt[:, 3:4][:, None, :], (B, n_tok, 1)
                    )

        modality_names = tuple(["spacetime"] + sorted(cfg.modalities))
        fusion_out = CrossModalFusion(
            cfg.fusion, modality_names, cd, pd, remat=cfg.fusion.remat,
            remat_policy=cfg.fusion.remat_policy,
            name="fusion",
        )(
            tokens,
            spatial_positions or None,
            temporal_positions or None,
            deterministic=deterministic,
        )
        h_tokens = fusion_out["all_tokens"]

        # ---- optional inductive simulator ------------------------------------ #
        if cfg.fusion.deepseek_block is not None:
            h_tokens = DeepSeekTransformer(
                cfg.fusion.deepseek_block, cd, pd, remat=cfg.fusion.remat,
                remat_policy=cfg.fusion.remat_policy,
                name="simulator",
            )(h_tokens, deterministic=deterministic)
            fusion_out = dict(fusion_out)
            fusion_out["all_tokens"] = h_tokens
            fusion_out["fused_representation"] = h_tokens[:, 0]
            # re-slice per-modality tokens from the simulated sequence
            idx = 1
            mt = {}
            for name in modality_names:
                if name not in tokens:
                    continue
                n = tokens[name].shape[1]
                mt[name] = h_tokens[:, idx : idx + n]
                idx += n
            fusion_out["modality_tokens"] = mt

        # ---- reconstruction decoders ----------------------------------------- #
        st_fused = fusion_out["modality_tokens"]["spacetime"].mean(axis=1)
        recon: Dict[str, jnp.ndarray] = {
            "spatial": SpatiotemporalDecoder(
                D, 3, "spatial", cd, pd, name="spatial_decoder"
            )(st_fused),
            "temporal": SpatiotemporalDecoder(
                D, 1, "temporal", cd, pd, name="temporal_decoder"
            )(st_fused),
        }
        for name in sorted(cfg.modalities):
            if name not in tokens:
                continue
            m = cfg.modalities[name]
            if m.encoding_type == "token_sequence":
                recon[name] = TokenSequenceDecoder(
                    seq_len=modalities[name].shape[1],
                    vocab_size=m.vocab_size,
                    dim=D,
                    n_heads=m.encoder_heads,
                    compute_dtype=cd, param_dtype=pd,
                    name=f"decoder_{name}",
                )(fusion_out["modality_tokens"][name])
                continue
            if m.decode_sequence and modalities[name].ndim == 3:
                # full-sequence reconstruction (MAE-proper): position queries
                # cross-attend into the fused modality tokens and project to
                # the native feature dim
                recon[name] = TokenSequenceDecoder(
                    seq_len=modalities[name].shape[1],
                    vocab_size=m.input_dim,  # projects to native dim
                    dim=D,
                    n_heads=m.encoder_heads,
                    compute_dtype=cd, param_dtype=pd,
                    name=f"decoder_{name}",
                )(fusion_out["modality_tokens"][name])
                continue
            pooled = fusion_out["modality_tokens"][name].mean(axis=1)
            recon[name] = ModalityDecoder(
                D, _native_dim(m), dropout=0.0,
                compute_dtype=cd, param_dtype=pd, name=f"decoder_{name}",
            )(pooled, deterministic=deterministic)

        return {
            "reconstructions": recon,
            "fused_representation": fusion_out["fused_representation"],
            "all_tokens": fusion_out["all_tokens"],
            "modality_tokens": fusion_out["modality_tokens"],
            "input_tokens": tokens,
        }

    def extract_features(self, batch: Dict[str, Any]) -> jnp.ndarray:
        """Frozen-feature extraction entry point
        (reference: models/deepearth_integrated.py:337)."""
        return self(batch, deterministic=True)["fused_representation"]
