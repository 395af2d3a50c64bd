"""TPU compute ops: hash encoding, attention, RoPE, MoE routing, norms."""

from .attention import dot_product_attention
from .hash_encoding import (
    HASH_PRIMES,
    HashEncoding,
    hash_encode,
    hash_grid_indices,
    init_hash_tables,
)
from .moe import (
    GateResult,
    expert_ffn,
    load_balance_aux_loss,
    make_dispatch_combine,
    moe_gate,
)
from .norms import RMSNorm
from .rope import (
    apply_rope_deepseek,
    apply_rope_half,
    apply_rope_interleaved,
    rope_cos_sin,
    rope_inv_freq,
    rotate_half,
    yarn_get_mscale,
)

__all__ = [
    "dot_product_attention",
    "HASH_PRIMES",
    "HashEncoding",
    "hash_encode",
    "hash_grid_indices",
    "init_hash_tables",
    "GateResult",
    "expert_ffn",
    "load_balance_aux_loss",
    "make_dispatch_combine",
    "moe_gate",
    "RMSNorm",
    "apply_rope_deepseek",
    "apply_rope_half",
    "apply_rope_interleaved",
    "rope_cos_sin",
    "rope_inv_freq",
    "rotate_half",
    "yarn_get_mscale",
]
