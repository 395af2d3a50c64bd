"""Multimodal train-step benchmark (species + vision 16x1408 + language
7168 through universal-token encoders and fusion). Separate from bench.py
because its compile alone can exceed the driver's bench time budget.

Usage: python tools/bench_multimodal.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_multimodal() -> dict:
    """Full multimodal train step: species + pre-extracted vision (16x1408)
    + language (7168) through universal-token encoders and fusion."""
    import jax
    import jax.numpy as jnp

    from deepearth_tpu.configs import (
        DeepEarthConfig,
        Grid4DConfig,
        ModalityConfig,
        TransformerConfig,
    )
    from deepearth_tpu.models import DeepEarthModel
    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    b = 32
    cfg = DeepEarthConfig(
        hidden_dim=512,
        n_heads=8,
        n_layers=4,
        grid4d=Grid4DConfig(
            n_spatial_levels=16, n_temporal_levels=8, hash_table_size=2 ** 19
        ),
        modality_encoder=TransformerConfig(hidden_dim=256, n_heads=4, n_layers=2),
        compute_dtype=jnp.bfloat16,
    )
    cfg.add_modality(
        ModalityConfig(name="species", encoding_type="learned_embedding",
                       input_type="categorical", vocab_size=232)
    )
    cfg.add_modality(
        ModalityConfig(name="vision", input_dim=1408, n_tokens=16,
                       encoder_layers=1, encoder_heads=8)
    )
    cfg.add_modality(
        ModalityConfig(name="language", input_dim=7168, n_tokens=4,
                       encoder_layers=1, encoder_heads=8)
    )
    model = DeepEarthModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "xyzt": jax.random.uniform(rng, (b, 4)),
        "modalities": {
            "species": jax.random.randint(rng, (b,), 0, 232),
            "vision": jax.random.normal(rng, (b, 16, 1408), jnp.bfloat16),
            "language": jax.random.normal(rng, (b, 7168), jnp.bfloat16),
        },
    }
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=create_optimizer(cfg.optimizer),
    )
    step = jax.jit(
        make_train_step(model, cfg, LossWeights(contrastive=0.1)),
        donate_argnums=(0,),
    )
    for i in range(3):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
    jax.block_until_ready(metrics["loss/total"])
    t0 = time.perf_counter()
    n = 15
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(100 + i))
    jax.block_until_ready(metrics["loss/total"])
    obs_per_s = b * n / (time.perf_counter() - t0)
    log(f"[ours multimodal] train obs/s: {obs_per_s:.1f}")
    return {"multimodal_obs_per_s": obs_per_s}



if __name__ == "__main__":
    out = bench_multimodal()
    payload = {k: round(v, 1) for k, v in out.items()}
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH_MULTIMODAL.json"),
        "w",
    ) as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
