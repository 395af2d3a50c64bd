"""Cross-modal fusion over universal tokens
(reference: models/cross_modal_fusion.py:99-578).

CLS token + per-modality learned embeddings + 2D binned spatial position
tables + continuous temporal MLP embedding; N pre-norm layers with
self-attention every layer and cross-attention every ``cross_attention_freq``
layers; SiLU-gated MLP; rotate_half RoPE. Token boundaries are static (flax
traces fixed modality dicts), so per-modality token extraction is free.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..configs import FusionConfig
from ..ops.attention import dot_product_attention
from ..ops.attention_smallseq import pairwise_token_attention, rope_token_major
from ..ops.rope import apply_rope_half, rope_cos_sin
from .transformer import GatedMLP, KernelParam, MLP
from ..configs import TransformerConfig


class SpatialTemporalEmbedding(nn.Module):
    """Learnable spatial/temporal/modal token embeddings
    (reference: models/cross_modal_fusion.py:99-164)."""

    universal_dim: int
    modality_names: Tuple[str, ...]
    max_spatial_resolution: int = 64
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tokens: jnp.ndarray,
        modality_name: str,
        spatial_positions: Optional[jnp.ndarray] = None,
        temporal_positions: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """tokens: (B, N, D); spatial_positions: (B, N, 2) in [0,1];
        temporal_positions: (B, N, 1) normalized time."""
        B, N, D = tokens.shape
        emb = jnp.zeros_like(tokens)

        if spatial_positions is not None:
            ex = self.param(
                "spatial_embed_x", nn.initializers.normal(0.02),
                (self.max_spatial_resolution, D // 4), self.param_dtype,
            )
            ey = self.param(
                "spatial_embed_y", nn.initializers.normal(0.02),
                (self.max_spatial_resolution, D // 4), self.param_dtype,
            )
            r = self.max_spatial_resolution
            xi = jnp.clip((spatial_positions[..., 0] * r).astype(jnp.int32), 0, r - 1)
            yi = jnp.clip((spatial_positions[..., 1] * r).astype(jnp.int32), 0, r - 1)
            sp = jnp.concatenate([ex[xi], ey[yi]], axis=-1).astype(emb.dtype)
            emb = emb.at[..., : D // 2].add(sp)

        if temporal_positions is not None:
            t = temporal_positions.astype(self.compute_dtype)
            h = nn.Dense(
                D // 2, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name="temporal_fc1",
            )(t)
            h = nn.gelu(h, approximate=False)
            h = nn.Dense(
                D // 2, dtype=self.compute_dtype, param_dtype=self.param_dtype,
                name="temporal_fc2",
            )(h)
            emb = emb.at[..., D // 2 :].add(h.astype(emb.dtype))

        if modality_name in self.modality_names:
            me = self.param(
                f"modality_embed_{modality_name}", nn.initializers.normal(0.02),
                (1, 1, D), self.param_dtype,
            )
            emb = emb + me.astype(emb.dtype)

        return tokens + emb


class FusionAttention(nn.Module):
    """Self/cross attention with rotate_half RoPE
    (reference: models/cross_modal_fusion.py:185-270).

    Two equivalent layouts (same params, same math):
    * batch-major (B, N, D) — the standard BHND einsum path; used for long
      token sequences.
    * token-major (N, B, D) — the pairwise small-sequence formulation
      (ops/attention_smallseq.py); measured 2.62× on the A-stack headline
      shape fwd+bwd (BENCH_SMALLSEQ_ATTN.json) by eliminating the
      N/Dh-minor padded-op storm.
    """

    cfg: FusionConfig
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    token_major: bool = False

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,
        key_value: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        D = query.shape[-1]
        kv = query if key_value is None else key_value
        H = cfg.num_heads
        Dh = D // H
        cd = self.compute_dtype

        # Kernels declared separately (paths/init identical to nn.Dense) but
        # applied as fused matmuls: qkv in ONE dot for self-attention, kv in
        # one for cross — separate small dots are launch-bound at tiny N.
        wq = KernelParam(D, D, self.param_dtype, name="q_proj")()
        wk = KernelParam(D, D, self.param_dtype, name="k_proj")()
        wv = KernelParam(D, D, self.param_dtype, name="v_proj")()
        wo = KernelParam(D, D, self.param_dtype, name="out_proj")()

        if key_value is None:
            qkv = query.astype(cd) @ jnp.concatenate(
                [wq, wk, wv], axis=1
            ).astype(cd)
            q, k, v = jnp.split(qkv, 3, axis=-1)
        else:
            q = query.astype(cd) @ wq.astype(cd)
            kv_p = kv.astype(cd) @ jnp.concatenate([wk, wv], axis=1).astype(cd)
            k, v = jnp.split(kv_p, 2, axis=-1)

        if self.token_major:
            # q/k/v: (N, B, D)
            if cfg.use_rotary_embeddings:
                q = rope_token_major(q, H)
                k = rope_token_major(k, H)
            out = pairwise_token_attention(
                q, k, v, n_heads=H, scale=Dh ** -0.5, key_mask=key_mask
            )
            out = out @ wo.astype(cd)
            return nn.Dropout(cfg.dropout)(out, deterministic=deterministic)

        B, Nq, _ = query.shape
        Nk = kv.shape[1]
        q = q.reshape(B, Nq, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Nk, H, Dh).transpose(0, 2, 1, 3)

        if cfg.use_rotary_embeddings:
            cos_q, sin_q = rope_cos_sin(Nq, Dh, layout="half")
            cos_k, sin_k = rope_cos_sin(Nk, Dh, layout="half")
            q = apply_rope_half(q, cos_q, sin_q).astype(v.dtype)
            k = apply_rope_half(k, cos_k, sin_k).astype(v.dtype)

        out = dot_product_attention(q, k, v, scale=Dh ** -0.5, key_mask=key_mask)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, D)
        out = out @ wo.astype(cd)
        return nn.Dropout(cfg.dropout)(out, deterministic=deterministic)


class FusionLayer(nn.Module):
    """Pre-norm fusion layer (reference: models/cross_modal_fusion.py:273-350)."""

    cfg: FusionConfig
    layer_idx: int
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    token_major: bool = False

    @property
    def use_cross_attention(self) -> bool:
        return self.layer_idx % self.cfg.cross_attention_freq == 0

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        key_mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=cfg.layer_norm_eps, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name=name,
        )
        x = x + FusionAttention(
            cfg, self.compute_dtype, self.param_dtype, self.token_major,
            name="self_attn",
        )(ln("self_attn_norm")(x), key_mask=key_mask, deterministic=deterministic)

        if self.use_cross_attention and encoder_hidden_states is not None:
            x = x + FusionAttention(
                cfg, self.compute_dtype, self.param_dtype, self.token_major,
                name="cross_attn",
            )(
                ln("cross_attn_norm")(x),
                key_value=encoder_hidden_states,
                deterministic=deterministic,
            )

        if cfg.use_gated_mlp:
            mlp_out = GatedMLP(
                cfg.universal_dim, cfg.mlp_ratio, cfg.dropout,
                self.compute_dtype, self.param_dtype, name="mlp",
            )(ln("mlp_norm")(x), deterministic=deterministic)
        else:
            tcfg = TransformerConfig(
                hidden_dim=cfg.universal_dim, mlp_ratio=cfg.mlp_ratio,
                dropout=cfg.dropout,
            )
            mlp_out = MLP(tcfg, self.compute_dtype, self.param_dtype, name="mlp")(
                ln("mlp_norm")(x), deterministic=deterministic
            )
        return x + mlp_out


class CrossModalFusion(nn.Module):
    """Main fusion module (reference: models/cross_modal_fusion.py:353-470)."""

    cfg: FusionConfig
    modality_names: Tuple[str, ...]
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32
    remat: bool = False
    remat_policy: str = "full"

    @nn.compact
    def __call__(
        self,
        modality_tokens: Dict[str, jnp.ndarray],
        spatial_positions: Optional[Dict[str, jnp.ndarray]] = None,
        temporal_positions: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        names = [n for n in self.modality_names if n in modality_tokens]
        B = next(iter(modality_tokens.values())).shape[0]
        D = cfg.universal_dim

        st = SpatialTemporalEmbedding(
            D, tuple(self.modality_names), cfg.max_spatial_resolution,
            self.compute_dtype, self.param_dtype, name="st_embedding",
        )

        cls = self.param(
            "cls_token", nn.initializers.normal(0.02), (1, 1, D), self.param_dtype
        )
        parts = [jnp.broadcast_to(cls.astype(self.compute_dtype), (B, 1, D))]
        boundaries = {"cls": (0, 1)}
        idx = 1
        for name in names:
            tokens = modality_tokens[name].astype(self.compute_dtype)
            tokens = st(
                tokens,
                name,
                spatial_positions.get(name) if spatial_positions else None,
                temporal_positions.get(name) if temporal_positions else None,
            )
            parts.append(tokens)
            n = tokens.shape[1]
            boundaries[name] = (idx, idx + n)
            idx += n

        h = jnp.concatenate(parts, axis=1)

        # For small token counts (the A-stack's 3, most multimodal configs'
        # <=8), run the whole stack TOKEN-MAJOR (N, B, D): minor dims stay
        # (B, D) — unpadded — and attention uses the pairwise formulation.
        # Measured 2.62x on the headline attention sites
        # (BENCH_SMALLSEQ_ATTN.json); parameters are layout-independent.
        token_major = h.shape[1] <= cfg.token_major_max_tokens
        if token_major:
            h = jnp.transpose(h, (1, 0, 2))
        h_inputs = h  # pre-fusion embedded tokens for cross-attention context

        layer_cls = FusionLayer
        if self.remat:
            from .deepseek import remat_wrap

            layer_cls = remat_wrap(
                FusionLayer, static_argnums=(4,), policy=self.remat_policy
            )
        for i in range(cfg.num_fusion_layers):
            layer = layer_cls(
                cfg, layer_idx=i,
                compute_dtype=self.compute_dtype, param_dtype=self.param_dtype,
                token_major=token_major,
                name=f"layer_{i}",
            )
            if i % cfg.cross_attention_freq == 0:
                ctx = h_inputs if cfg.cross_attention_context == "inputs" else h
            else:
                ctx = None
            h = layer(h, ctx, None, deterministic)

        h = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=self.compute_dtype,
            param_dtype=self.param_dtype, name="final_norm",
        )(h)
        if token_major:
            h = jnp.transpose(h, (1, 0, 2))

        out = {
            "fused_representation": h[:, 0],
            "all_tokens": h,
            "modality_tokens": {
                name: h[:, s:e] for name, (s, e) in boundaries.items() if name != "cls"
            },
        }
        return out


class HierarchicalFusion(nn.Module):
    """3-level fusion pyramid with conv down/up-sampling
    (reference: models/cross_modal_fusion.py:473-578)."""

    cfg: FusionConfig
    modality_names: Tuple[str, ...]
    num_levels: int = 3
    downscale_factor: int = 2
    compute_dtype: jnp.dtype = jnp.float32
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        modality_tokens: Dict[str, jnp.ndarray],
        spatial_positions: Optional[Dict[str, jnp.ndarray]] = None,
        temporal_positions: Optional[Dict[str, jnp.ndarray]] = None,
        deterministic: bool = True,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        D = cfg.universal_dim
        level_reps = []
        current = modality_tokens
        sp = spatial_positions

        for level in range(self.num_levels):
            out = CrossModalFusion(
                cfg, self.modality_names, self.compute_dtype, self.param_dtype,
                name=f"level_{level}",
            )(current, sp, temporal_positions, deterministic)
            level_reps.append(out["fused_representation"])
            if level < self.num_levels - 1:
                down = {}
                for name, tokens in out["modality_tokens"].items():
                    down[name] = nn.Conv(
                        D, kernel_size=(self.downscale_factor,),
                        strides=(self.downscale_factor,),
                        dtype=self.compute_dtype, param_dtype=self.param_dtype,
                        name=f"down_{level}_{name}",
                    )(tokens)
                current = down
                if sp is not None:
                    sp = {k: v[:, :: self.downscale_factor] for k, v in sp.items()}
                if temporal_positions is not None:
                    temporal_positions = {
                        k: v[:, :: self.downscale_factor]
                        for k, v in temporal_positions.items()
                    }

        multi_scale = jnp.concatenate(level_reps, axis=-1)
        final = nn.Dense(
            D, dtype=self.compute_dtype, param_dtype=self.param_dtype,
            name="final_fusion",
        )(multi_scale)
        return {
            "fused_representation": final,
            "level_representations": level_reps,
            "multi_scale_representation": multi_scale,
        }
