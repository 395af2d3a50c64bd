"""MLA compressed-cache decoding must match the full causal forward, and the
cache must actually be ~57x smaller at DeepSeek-V3 dimensions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import MLAConfig
from deepearth_tpu.models import MLAttention
from deepearth_tpu.models.mla_decode import (
    cache_bytes_per_token,
    decode_sequence,
    full_cache_bytes_per_token,
    init_cache,
)


@pytest.mark.parametrize("q_lora", [None, 24])
def test_decode_matches_full_causal_forward(q_lora):
    cfg = MLAConfig(
        hidden_dim=64, n_heads=4, q_lora_rank=q_lora, kv_lora_rank=16,
        qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
    )
    mod = MLAttention(cfg)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 64))
    params = mod.init(jax.random.PRNGKey(1), x)["params"]
    full = mod.apply({"params": params}, x, is_causal=True)
    decoded = decode_sequence(params, cfg, x)
    np.testing.assert_allclose(
        np.asarray(decoded), np.asarray(full), rtol=1e-4, atol=1e-4
    )


def test_cache_compression_ratio_is_57x_at_v3_dims():
    v3 = MLAConfig(
        hidden_dim=7168, n_heads=128, kv_lora_rank=512,
        qk_rope_head_dim=64, qk_nope_head_dim=128, v_head_dim=128,
    )
    ratio = full_cache_bytes_per_token(v3) / cache_bytes_per_token(v3)
    assert 55 < ratio < 72, ratio  # the reference's "57x" claim


def test_cache_grows_and_masks():
    cfg = MLAConfig(
        hidden_dim=32, n_heads=2, kv_lora_rank=8,
        qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8,
    )
    cache = init_cache(cfg, batch=1, max_len=10)
    assert cache.ckv.shape == (1, 10, 8)
    assert int(cache.length) == 0
