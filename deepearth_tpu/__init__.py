"""DeepEarth-TPU: a TPU-native (JAX/XLA/Pallas/pjit) multimodal Earth-science
foundation-model framework.

Rebuild of the capabilities of `jamesthesnake/deepearth` (see SURVEY.md) as one
coherent framework: Grid4D multi-resolution hash spacetime encoding, universal
modality tokens with DeepSeek-style MLA/MoE encoders, cross-modal fusion, and
masked multimodal reconstruction — all compiled to TPU via jit/pjit over a
device mesh.
"""

__version__ = "0.1.0"

from .configs import (  # noqa: F401
    DeepEarthConfig,
    DeepSeekBlockConfig,
    FusionConfig,
    Grid4DConfig,
    HashEncodingConfig,
    MaskingConfig,
    MLAConfig,
    ModalityConfig,
    MoEConfig,
    OptimizerConfig,
    PRESET_MODALITIES,
    RopeScalingConfig,
    ShardingConfig,
    TransformerConfig,
    config_from_json,
    config_to_json,
    integrated_config,
    simulator_config,
    small_config,
    tiny_config,
)
