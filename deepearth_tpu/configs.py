"""Unified configuration system for DeepEarth-TPU.

The reference repo spread configuration across >=6 overlapping systems
(reference: models/configs.py, models/cross_modal_fusion.py:14,
encoders/configuration_deepseek.py, encoders/modality_config.py,
core/inductive_simulator.py:23). Here a single tree of dataclasses is the
source of truth; presets mirror the reference's named configurations.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax.numpy as jnp


# --------------------------------------------------------------------------- #
# Low-level building blocks
# --------------------------------------------------------------------------- #


@dataclass
class HashEncodingConfig:
    """Multi-resolution hash encoding (reference: models/hash_encoding.py:11).

    The TPU build adds d-linear interpolation (the reference gathers the
    nearest cell only); ``interpolation='nearest'`` reproduces reference
    behaviour for parity testing.
    """

    n_levels: int = 16
    n_features_per_level: int = 2
    coords_dim: int = 3
    hash_table_size: int = 2 ** 19
    base_resolution: int = 16
    finest_resolution: Optional[int] = None  # if set, geometric growth to it
    resolutions: Optional[List[int]] = None  # explicit override
    interpolation: str = "linear"  # 'linear' (d-linear) | 'nearest'

    def __post_init__(self):
        if self.resolutions is None:
            if self.finest_resolution is not None and self.n_levels > 1:
                growth = (self.finest_resolution / self.base_resolution) ** (
                    1.0 / (self.n_levels - 1)
                )
                self.resolutions = [
                    int(round(self.base_resolution * growth ** i))
                    for i in range(self.n_levels)
                ]
            else:
                # Reference default: powers of two starting at base
                # (models/configs.py:58).
                import math

                start = int(math.log2(self.base_resolution))
                self.resolutions = [2 ** (start + i) for i in range(self.n_levels)]
        self.resolutions = list(self.resolutions)[: self.n_levels]

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.n_features_per_level


@dataclass
class Grid4DConfig:
    """Grid4D spacetime encoder (reference: models/encoders.py:12 and
    SPECIFICATIONS.MD:1068-1200).

    ``use_decompositions`` enables the spec-stack xyt/yzt/xzt decomposed
    encodings on top of the A-stack xyz + t split.
    """

    spatial: HashEncodingConfig = None
    temporal: HashEncodingConfig = None
    use_decompositions: bool = False
    decomposition: HashEncodingConfig = None  # shared config for xyt/yzt/xzt

    n_spatial_levels: int = 16
    n_temporal_levels: int = 8
    n_features_per_level: int = 2
    hash_table_size: int = 2 ** 19

    # 'hash' — multi-resolution hash grids (A/spec stacks); 'sincos' — the
    # periodic-time + multi-scale-space MLP variant
    # (reference: training/vjepa2_integration.py:32-80).
    encoding_mode: str = "hash"
    # sincos mode: physical span of the normalized [0,1] coordinates, used to
    # recover seconds/meters for the periodic/scaled features.
    time_span_seconds: float = 86400.0 * 365.25 * 15  # dataset: 2010-2025
    spatial_span_meters: float = 100_000.0
    spatial_scales_m: Tuple[float, ...] = (10.0, 100.0, 1000.0)
    sincos_feat_dim: int = 128
    sincos_mlp_dim: int = 512

    def __post_init__(self):
        if self.spatial is None:
            self.spatial = HashEncodingConfig(
                n_levels=self.n_spatial_levels,
                n_features_per_level=self.n_features_per_level,
                coords_dim=3,
                hash_table_size=self.hash_table_size,
                base_resolution=16,
            )
        if self.temporal is None:
            self.temporal = HashEncodingConfig(
                n_levels=self.n_temporal_levels,
                n_features_per_level=self.n_features_per_level,
                coords_dim=1,
                # Smaller table for 1D (models/encoders.py:37)
                hash_table_size=self.hash_table_size // 4,
                base_resolution=4,
            )
        if self.use_decompositions and self.decomposition is None:
            self.decomposition = HashEncodingConfig(
                n_levels=self.n_spatial_levels // 2,
                n_features_per_level=self.n_features_per_level,
                coords_dim=3,
                hash_table_size=self.hash_table_size // 2,
                base_resolution=16,
            )

    @property
    def output_dim(self) -> int:
        dim = self.spatial.output_dim + self.temporal.output_dim
        if self.use_decompositions:
            dim += 3 * self.decomposition.output_dim
        return dim


@dataclass
class TransformerConfig:
    """Dense transformer block configuration (reference: models/configs.py:8)."""

    hidden_dim: int = 768
    n_heads: int = 12
    n_layers: int = 12
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    layer_norm_eps: float = 1e-6
    use_rope: bool = True
    rope_variant: str = "interleaved"  # 'interleaved' (A-stack) | 'half' (fusion)
    use_gated_mlp: bool = False
    rope_theta: float = 10000.0

    @property
    def head_dim(self) -> int:
        return self.hidden_dim // self.n_heads


@dataclass
class RopeScalingConfig:
    """RoPE scaling family (reference: encoders/modeling_deepseek.py:158-338)."""

    type: str = "none"  # 'none' | 'linear' | 'dynamic' | 'yarn'
    factor: float = 1.0
    original_max_position_embeddings: int = 4096
    beta_fast: float = 32.0
    beta_slow: float = 1.0
    mscale: float = 1.0
    mscale_all_dim: float = 0.0


@dataclass
class MLAConfig:
    """Multi-head Latent Attention (reference: encoders/modeling_deepseek.py:627)."""

    hidden_dim: int = 512
    n_heads: int = 8
    q_lora_rank: Optional[int] = None
    kv_lora_rank: int = 128
    qk_rope_head_dim: int = 32
    qk_nope_head_dim: int = 64
    v_head_dim: int = 64
    rope_theta: float = 10000.0
    rope_scaling: RopeScalingConfig = field(default_factory=RopeScalingConfig)
    attention_dropout: float = 0.0
    attention_bias: bool = False
    max_position_embeddings: int = 4096
    # Use the Pallas flash-attention kernel for long sequences (TPU only);
    # the 4608-patch V-JEPA2 path is the intended target.
    use_flash_attention: bool = False
    flash_min_seq: int = 1024
    # Sequence parallelism: when set (e.g. 'sequence') AND the ambient mesh
    # (jax.set_mesh) carries that axis with size > 1 and the sequence length
    # divides it, attention runs as ring attention (parallel/ring.py) with
    # k/v sharded over the axis — per-device attention memory drops by the
    # axis size. The batch dim co-shards over ring_batch_axis when present.
    sequence_axis: Optional[str] = None
    ring_batch_axis: str = "data"
    ring_min_seq: int = 512

    @property
    def q_head_dim(self) -> int:
        return self.qk_nope_head_dim + self.qk_rope_head_dim


@dataclass
class MoEConfig:
    """Sigmoid group-limited top-k MoE (reference: encoders/modeling_deepseek.py:393-608)."""

    n_routed_experts: int = 8
    num_experts_per_tok: int = 2
    n_group: int = 1
    topk_group: int = 1
    routed_scaling_factor: float = 1.0
    norm_topk_prob: bool = True
    n_shared_experts: Optional[int] = 1
    moe_intermediate_size: int = 512
    hidden_dim: int = 512
    # TPU-native dense dispatch: fraction of S*topk/E slots per expert.
    # None → drop-free (capacity = S*topk: exact reference semantics, used
    # for checkpoint-parity inference; memory O(S²·topk) in dispatch).
    capacity_factor: Optional[float] = 2.0
    # 'auto' — dense einsum below a size budget, scatter above (see
    # models/deepseek.py); 'dense' — capacity-factor one-hot einsum dispatch
    # (MXU-friendly, O(S·E·C·D)); 'scatter' — argsort+scatter dispatch with
    # identical capacity semantics, O(S·K·D) (the 64-128-expert path);
    # 'ragged' — drop-free sort + megablox grouped-matmul Pallas kernel
    # (single-chip fast path; TPU only).
    dispatch_mode: str = "auto"
    # Auxiliary load-balance loss weight (reference trains without aux via
    # bias correction; we expose both).
    aux_loss_weight: float = 0.0
    # Activation budget (bytes) for the dense_all dispatch mode. None →
    # derived at trace time from the local device's memory stats (60% of
    # bytes_limit − bytes_in_use), falling back to 6 GB when the backend
    # exposes none. Set explicitly to pin behavior near the OOM boundary
    # (models/deepseek.py select_dispatch_mode).
    dense_all_max_bytes: Optional[int] = None
    # Whether 'auto' may pick the ragged (megablox gmm) path for large
    # token counts on TPU. The expert-parallel trainer clears this: the
    # ragged kernel's argsort/bincount see per-shard token subsets and its
    # grouped kernel does not partition over an expert mesh axis
    # (training/distributed.py _demote_ragged_dispatch).
    allow_ragged: bool = True


@dataclass
class DeepSeekBlockConfig:
    """DeepSeek-style decoder stack: MLA attention + (dense|MoE) MLP.

    Mirrors the vendored stack (reference: encoders/modeling_deepseek.py:1142,
    encoders/deepseek_components.py:98-120).
    """

    hidden_dim: int = 512
    n_layers: int = 4
    intermediate_size: int = 2048
    mla: MLAConfig = None
    moe: Optional[MoEConfig] = None
    first_k_dense_replace: int = 1
    moe_layer_freq: int = 1
    rms_norm_eps: float = 1e-6
    dropout: float = 0.0
    # Pipeline parallelism over the layer stack (GPipe, SPMD-style): split
    # n_layers into `pipeline_stages` equal stages whose stacked parameters
    # shard over the mesh's 'pipe' axis (parallel/mesh.py param_spec) — each
    # device holds 1/P of the stack. 0/1 = off. pipeline_microbatches=0
    # auto-picks the largest M <= 4·P dividing the batch. Program structure
    # is a pure function of (config, batch shape) — never device state.
    pipeline_stages: int = 0
    pipeline_microbatches: int = 0

    def __post_init__(self):
        if self.mla is None:
            self.mla = MLAConfig(hidden_dim=self.hidden_dim)
        if self.moe is not None and self.moe.hidden_dim != self.hidden_dim:
            self.moe = dataclasses.replace(self.moe, hidden_dim=self.hidden_dim)


@dataclass
class FusionConfig:
    """Cross-modal fusion (reference: models/cross_modal_fusion.py:14)."""

    universal_dim: int = 2048
    num_fusion_layers: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    dropout: float = 0.0
    attention_dropout: float = 0.0
    layer_norm_eps: float = 1e-6
    use_rotary_embeddings: bool = True
    use_gated_mlp: bool = True
    cross_attention_freq: int = 3
    # Context for the periodic cross-attention layers: 'inputs' attends back
    # to the pre-fusion embedded modality tokens (the design intent);
    # 'self' reproduces the reference's shipped behavior of passing the
    # current hidden states (reference: models/cross_modal_fusion.py:435-445
    # — a second self-attention in practice).
    cross_attention_context: str = "inputs"
    # Token counts at or below this run the fusion stack token-major
    # (N, B, D) with pairwise small-seq attention — 2.62x measured at the
    # A-stack shape (ops/attention_smallseq.py). 0 disables.
    token_major_max_tokens: int = 8
    spatial_aware: bool = True
    temporal_aware: bool = True
    # gradient checkpointing over fusion layers (jax.checkpoint); the
    # reference exposed the flag but never wired it (train_deepearth.py:46)
    remat: bool = False
    # checkpoint policy for `remat`: 'full' recomputes everything;
    # 'dots' = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
    # keeps matmul outputs resident and recomputes only elementwise ops —
    # less recompute FLOPs for modest extra memory (round-4 verdict item 4:
    # involuntary-remat flops grew executed/model to 1.20x at B=96)
    remat_policy: str = "full"
    max_seq_length: int = 8192
    max_spatial_resolution: int = 64
    # When set, fusion layers use MLA + MoE DeepSeek blocks instead of dense
    # attention (the B/D-stack "inductive simulator" design,
    # reference: core/inductive_simulator.py:78).
    deepseek_block: Optional[DeepSeekBlockConfig] = None


@dataclass
class ModalityConfig:
    """Per-modality configuration (reference: models/configs.py:20 and
    encoders/modality_config.py:10-115)."""

    name: str = ""
    # 'learned_embedding' (categorical vocab) | 'continuous_values' (vector)
    encoding_type: str = "continuous_values"
    input_type: str = "numerical"  # 'categorical' | 'numerical'
    input_dim: int = 1  # native feature dim (or unused for categorical)
    vocab_size: Optional[int] = None  # for categorical modalities
    n_tokens: int = 1  # universal tokens generated for this modality
    column_name: Optional[str] = None
    column_names: Optional[List[str]] = None
    # Decode the full native patch sequence (B, S, input_dim) instead of the
    # pooled vector — the proper MAE objective for vision
    # (reference: training/bidirectional_reconstruction.py VisionDecoder
    # outputs the full 8·24·24·1408 grid)
    decode_sequence: bool = False
    # Universal-token generation (reference: encoders/modality_infrastructure.py:311)
    use_moe_projection: bool = False
    encoder_layers: int = 2
    encoder_heads: int = 8
    # rematerialize the per-modality encoder transformer's activations in
    # backward (jax.checkpoint): trades ~⅓ extra encoder FLOPs for O(layers)
    # less activation memory — what lets batch 64 fit the 16 GB chip on the
    # trainable flagship (the reference's grad-checkpointing flag was never
    # wired — reference: train_deepearth.py:46)
    encoder_remat: bool = False
    # checkpoint policy for encoder_remat: 'full' | 'dots' (see
    # FusionConfig.remat_policy)
    encoder_remat_policy: str = "full"
    # Sequence parallelism for the encoder transformer: when set (e.g.
    # 'sequence') and the ambient mesh (jax.set_mesh) carries that axis,
    # its attention runs as ring attention over the axis — for native
    # sequences (V-JEPA2's 4608 patches) too long for one chip's HBM.
    encoder_sequence_axis: Optional[str] = None
    encoder_ring_min_seq: int = 512
    loss_weight: float = 1.0
    mask_prob: float = 0.15  # per-sample modality masking probability


# Named modality presets (reference: encoders/modality_config.py:98-109).
PRESET_MODALITIES: Dict[str, ModalityConfig] = {
    "vision_standard": ModalityConfig(
        name="vision", input_dim=1408, n_tokens=16, use_moe_projection=True
    ),
    "vision_satellite": ModalityConfig(
        name="vision", input_dim=1408, n_tokens=64, use_moe_projection=True
    ),
    "language_standard": ModalityConfig(
        name="language", input_dim=7168, n_tokens=4, use_moe_projection=True
    ),
    "weather": ModalityConfig(name="weather", input_dim=5, n_tokens=1),
    "soil": ModalityConfig(name="soil", input_dim=10, n_tokens=1),
    "species": ModalityConfig(
        name="species",
        encoding_type="learned_embedding",
        input_type="categorical",
        vocab_size=232,
        n_tokens=1,
    ),
    "ndvi_timeseries": ModalityConfig(name="ndvi", input_dim=24, n_tokens=2),
    "hyperspectral": ModalityConfig(
        name="hyperspectral", input_dim=224, n_tokens=4, use_moe_projection=True
    ),
}


@dataclass
class MaskingConfig:
    """Masked-reconstruction objectives (reference:
    training/train_deepearth2.py:237-307, SPECIFICATIONS.MD:256-261)."""

    spatial_mask_prob: float = 0.15
    temporal_mask_prob: float = 0.15
    modality_mask_prob: float = 0.15  # whole-modality masking default
    vision_patch_mask_prob: float = 0.75  # MAE-style
    language_token_mask_prob: float = 0.15  # MLM-style


@dataclass
class OptimizerConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    warmup_steps: int = 100
    total_steps: int = 10_000
    grad_clip_norm: float = 1.0
    # >1 → optax.MultiSteps gradient accumulation
    # (reference: hpc/train_distrbuted.py grad-accum(4))
    grad_accum_steps: int = 1
    # adam FIRST-moment dtype; bfloat16 halves that accumulator's memory
    moment_dtype: str = "float32"  # 'float32' | 'bfloat16'
    # SECOND-moment layout (training/optimizers.py): 'float32' exact,
    # 'factored' = Adafactor-style row/col fp32 factors (~0 bytes/param,
    # recommended for >1B-param single-chip training), 'bfloat16' lossy.
    second_moment: str = "float32"
    # single-sweep fused AdamW with inline global-norm clipping (saves the
    # materialized scaled-gradient tree of optax.clip_by_global_norm);
    # False restores the stock optax.chain for comparison
    fused: bool = True
    b1: float = 0.9
    b2: float = 0.999
    schedule: str = "cosine"  # 'cosine' | 'onecycle' | 'constant'


@dataclass
class ShardingConfig:
    """Mesh layout. axes: data / expert / model (ICI-friendly)."""

    data_axis: str = "data"
    expert_axis: str = "expert"
    model_axis: str = "model"
    mesh_shape: Optional[Tuple[int, ...]] = None  # derived from devices if None


@dataclass
class DeepEarthConfig:
    """Main configuration (reference: models/configs.py:32)."""

    # Spatiotemporal encoding
    grid4d: Grid4DConfig = field(default_factory=Grid4DConfig)

    # Model dimensions
    hidden_dim: int = 768
    n_heads: int = 12
    n_layers: int = 12

    # Modalities
    modalities: Dict[str, ModalityConfig] = field(default_factory=dict)

    # Sub-model configurations (derived in __post_init__ if None)
    modality_encoder: TransformerConfig = None
    fusion: FusionConfig = None

    masking: MaskingConfig = field(default_factory=MaskingConfig)
    optimizer: OptimizerConfig = field(default_factory=OptimizerConfig)
    sharding: ShardingConfig = field(default_factory=ShardingConfig)

    # Numerics
    param_dtype: Any = jnp.float32
    compute_dtype: Any = jnp.bfloat16

    def __post_init__(self):
        if self.modality_encoder is None:
            # Reference derivation: half-width 4-layer encoder
            # (models/configs.py:61-66).
            self.modality_encoder = TransformerConfig(
                hidden_dim=self.hidden_dim // 2, n_heads=6, n_layers=4
            )
        if self.fusion is None:
            self.fusion = FusionConfig(
                universal_dim=self.hidden_dim,
                num_fusion_layers=self.n_layers,
                num_heads=self.n_heads,
            )

    def add_modality(self, cfg: ModalityConfig) -> "DeepEarthConfig":
        self.modalities[cfg.name] = cfg
        return self


# --------------------------------------------------------------------------- #
# Presets
# --------------------------------------------------------------------------- #


def tiny_config(**overrides) -> DeepEarthConfig:
    """Tiny end-to-end config mirroring examples/quick_test.py scale."""
    cfg = DeepEarthConfig(
        hidden_dim=128,
        n_heads=4,
        n_layers=2,
        grid4d=Grid4DConfig(
            n_spatial_levels=8,
            n_temporal_levels=4,
            n_features_per_level=2,
            hash_table_size=2 ** 14,
        ),
        modality_encoder=TransformerConfig(hidden_dim=64, n_heads=4, n_layers=1),
        **overrides,
    )
    cfg.add_modality(
        ModalityConfig(
            name="species",
            encoding_type="learned_embedding",
            input_type="categorical",
            vocab_size=232,
        )
    )
    return cfg


def small_config(**overrides) -> DeepEarthConfig:
    """A-stack default scale (reference: models/configs.py defaults)."""
    return DeepEarthConfig(**overrides)


def integrated_config(
    universal_dim: int = 2048,
    num_fusion_layers: int = 24,
    use_deepseek_fusion: bool = False,
    **overrides,
) -> DeepEarthConfig:
    """B/D-stack flagship: 2048-d universal tokens, deep fusion
    (reference: models/deepearth_integrated.py:26)."""
    ds = None
    if use_deepseek_fusion:
        ds = DeepSeekBlockConfig(
            hidden_dim=universal_dim,
            n_layers=num_fusion_layers,
            intermediate_size=universal_dim * 4,
            mla=MLAConfig(
                hidden_dim=universal_dim,
                n_heads=16,
                q_lora_rank=universal_dim // 2,
                kv_lora_rank=512,
                qk_rope_head_dim=64,
                qk_nope_head_dim=128,
                v_head_dim=128,
            ),
            moe=MoEConfig(
                n_routed_experts=8,
                num_experts_per_tok=2,
                n_group=2,
                topk_group=1,
                moe_intermediate_size=universal_dim,
                hidden_dim=universal_dim,
            ),
        )
    cfg = DeepEarthConfig(
        hidden_dim=universal_dim,
        n_heads=16,
        n_layers=num_fusion_layers,
        fusion=FusionConfig(
            universal_dim=universal_dim,
            num_fusion_layers=num_fusion_layers,
            num_heads=16,
            deepseek_block=ds,
        ),
        **overrides,
    )
    cfg.add_modality(dataclasses.replace(PRESET_MODALITIES["vision_standard"]))
    cfg.add_modality(dataclasses.replace(PRESET_MODALITIES["language_standard"]))
    return cfg


# Inductive-simulator presets (reference: core/inductive_simulator.py:126-154).
SIMULATOR_PRESETS: Dict[str, Dict[str, int]] = {
    "standard": dict(n_layers=24, hidden_dim=2048, n_heads=16, n_experts=8),
    "high_precision": dict(n_layers=32, hidden_dim=2560, n_heads=20, n_experts=16),
    "fast": dict(n_layers=12, hidden_dim=1024, n_heads=8, n_experts=4),
    "ultra": dict(n_layers=48, hidden_dim=4096, n_heads=32, n_experts=128),
}


def simulator_config(preset: str = "standard") -> DeepSeekBlockConfig:
    p = SIMULATOR_PRESETS[preset]
    return DeepSeekBlockConfig(
        hidden_dim=p["hidden_dim"],
        n_layers=p["n_layers"],
        intermediate_size=p["hidden_dim"] * 4,
        mla=MLAConfig(
            hidden_dim=p["hidden_dim"],
            n_heads=p["n_heads"],
            kv_lora_rank=min(512, p["hidden_dim"] // 4),
            qk_rope_head_dim=64,
            qk_nope_head_dim=128,
            v_head_dim=128,
        ),
        moe=MoEConfig(
            n_routed_experts=p["n_experts"],
            num_experts_per_tok=min(2, p["n_experts"]),
            moe_intermediate_size=p["hidden_dim"],
            hidden_dim=p["hidden_dim"],
        ),
    )


# --------------------------------------------------------------------------- #
# Serialization: config ↔ JSON (checkpoint reproducibility)
# --------------------------------------------------------------------------- #

_DTYPE_NAMES = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                "float16": jnp.float16}


def _encode(obj):
    import dataclasses as _dc

    if _dc.is_dataclass(obj) and not isinstance(obj, type):
        return {
            "__dataclass__": type(obj).__name__,
            **{f.name: _encode(getattr(obj, f.name)) for f in _dc.fields(obj)},
        }
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_encode(v) for v in obj]
    if obj in (jnp.bfloat16, jnp.float32, jnp.float16):
        return {"__dtype__": jnp.dtype(obj).name}
    return obj


_CONFIG_CLASSES = None


def _config_classes():
    global _CONFIG_CLASSES
    if _CONFIG_CLASSES is None:
        import dataclasses as _dc
        import sys

        mod = sys.modules[__name__]
        _CONFIG_CLASSES = {
            n: c for n, c in vars(mod).items()
            if isinstance(c, type) and _dc.is_dataclass(c)
        }
    return _CONFIG_CLASSES


def _decode(obj):
    if isinstance(obj, dict):
        if "__dtype__" in obj:
            return _DTYPE_NAMES[obj["__dtype__"]]
        if "__dataclass__" in obj:
            cls = _config_classes()[obj["__dataclass__"]]
            kwargs = {
                k: _decode(v) for k, v in obj.items() if k != "__dataclass__"
            }
            # dataclasses with derived fields accept them back as kwargs
            import dataclasses as _dc

            valid = {f.name for f in _dc.fields(cls) if f.init}
            return cls(**{k: v for k, v in kwargs.items() if k in valid})
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj


def config_to_json(cfg: DeepEarthConfig, path: Optional[str] = None) -> str:
    """Serialize any config dataclass tree to JSON (optionally to a file)."""
    import json

    payload = json.dumps(_encode(cfg), indent=2)
    if path:
        with open(path, "w") as f:
            f.write(payload)
    return payload


def config_from_json(source: str) -> DeepEarthConfig:
    """Inverse of :func:`config_to_json`; accepts a JSON string or a path."""
    import json
    import os

    if os.path.exists(source):
        with open(source) as f:
            source = f.read()
    return _decode(json.loads(source))
