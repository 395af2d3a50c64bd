"""Model layer: Grid4D encoder, transformers, DeepSeek blocks, fusion,
decoders, and the integrated DeepEarthModel."""

from .bidirectional import (
    BidirectionalReconstructor,
    MultimodalAutoencoder,
    VisionSequenceDecoder,
)
from .decoders import ModalityDecoder, SpatiotemporalDecoder
from .deepearth import DeepEarthModel
from .deepseek import (
    DeepSeekBlock,
    DeepSeekForCausalLM,
    DeepSeekForSequenceClassification,
    DeepSeekTransformer,
    MLAttention,
    MoELayer,
    SwiGLUMLP,
)
from .encoders import ModalityEncoder, UniversalTokenEncoder
from .fusion import (
    CrossModalFusion,
    FusionAttention,
    FusionLayer,
    HierarchicalFusion,
    SpatialTemporalEmbedding,
)
from .generation import causal_lm_decode_step, generate
from .grid4d import Grid4DEncoder
from .hf_convert import (
    config_from_hf,
    convert_hf_state_dict,
    load_hf_checkpoint,
)
from .mla_decode import (
    MLACache,
    cache_bytes_per_token,
    decode_sequence,
    decode_step,
    init_cache,
)
from .mlp_unet import BimodalMLPUNet, MLPUNet, MultimodalUNet, species_topk
from .shared_space import LatentPool, MultimodalSharedSpace
from .simulator import (
    DatasetSpecificDecoder,
    InductiveSimulator,
    MaskingStrategy,
    create_inductive_simulator,
)
from .transformer import (
    GatedMLP,
    MLP,
    MultiHeadAttention,
    Transformer,
    TransformerBlock,
)

__all__ = [
    "causal_lm_decode_step",
    "generate",
    "config_from_hf",
    "convert_hf_state_dict",
    "load_hf_checkpoint",
    "MLACache",
    "cache_bytes_per_token",
    "decode_sequence",
    "decode_step",
    "init_cache",
    "DeepSeekForCausalLM",
    "DeepSeekForSequenceClassification",
    "BimodalMLPUNet",
    "MLPUNet",
    "MultimodalUNet",
    "species_topk",
    "LatentPool",
    "MultimodalSharedSpace",
    "DatasetSpecificDecoder",
    "InductiveSimulator",
    "MaskingStrategy",
    "create_inductive_simulator",
    "BidirectionalReconstructor",
    "MultimodalAutoencoder",
    "VisionSequenceDecoder",
    "ModalityDecoder",
    "SpatiotemporalDecoder",
    "DeepEarthModel",
    "DeepSeekBlock",
    "DeepSeekTransformer",
    "MLAttention",
    "MoELayer",
    "SwiGLUMLP",
    "ModalityEncoder",
    "UniversalTokenEncoder",
    "CrossModalFusion",
    "FusionAttention",
    "FusionLayer",
    "HierarchicalFusion",
    "SpatialTemporalEmbedding",
    "Grid4DEncoder",
    "GatedMLP",
    "MLP",
    "MultiHeadAttention",
    "Transformer",
    "TransformerBlock",
]
