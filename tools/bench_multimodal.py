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


def bench_multimodal(b: int = None) -> dict:
    """Full multimodal train step: species + pre-extracted vision (16x1408)
    + language (7168) through universal-token encoders and fusion.

    Batch default from the on-chip sweep (EXP_MULTIMODAL_BATCH.json):
    obs/s climbs ~linearly to B=256 then plateaus; 512 is the knee.
    """
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

    if b is None:
        b = int(os.environ.get("MM_BATCH", 512))
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

    # chained-slope methodology (see bench.py): distinct pre-staged device
    # batches, K async steps per host sync (a forced transfer —
    # block_until_ready can return early over the tunnel), slope between
    # K=8 and K=24 cancels the per-call host floor exactly
    batches = []
    for i in range(8):
        k = jax.random.PRNGKey(100 + i)
        bb = {
            "xyzt": jax.random.uniform(k, (b, 4)),
            "modalities": {
                "species": jax.random.randint(k, (b,), 0, 232),
                "vision": jax.random.normal(k, (b, 16, 1408), jnp.bfloat16),
                "language": jax.random.normal(k, (b, 7168), jnp.bfloat16),
            },
        }
        bb = jax.tree_util.tree_map(jax.device_put, bb)
        jax.block_until_ready(bb["xyzt"])
        batches.append(bb)

    def chain(s, n):
        m = None
        for i in range(n):
            s, m = step(s, batches[i % 8], jax.random.PRNGKey(i))
        float(np.asarray(m["loss/total"]))
        return s

    state = chain(state, 1)  # compile + warm
    t = {}
    for n in (8, 24):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            state = chain(state, n)
            ts.append(time.perf_counter() - t0)
        t[n] = float(np.median(ts))
    step_s = max((t[24] - t[8]) / 16, 1e-5)
    obs_per_s = b / step_s
    log(f"[ours multimodal] step {step_s*1e3:.2f} ms  train obs/s: {obs_per_s:.1f}")
    return {"multimodal_obs_per_s": obs_per_s, "step_ms": step_s * 1e3}



if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "sweep":
        rows = {}
        for bb in (32, 128, 256, 512, 1024):
            rows[bb] = {k: round(v, 1) for k, v in bench_multimodal(bb).items()}
        here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        with open(os.path.join(here, "EXP_MULTIMODAL_BATCH.json"), "w") as f:
            json.dump(rows, f, indent=2)
        print(json.dumps(rows))
        sys.exit(0)
    out = bench_multimodal()
    from deepearth_tpu.utils.artifacts import round_stamp

    payload = {k: round(v, 1) for k, v in out.items()}
    payload.update(round_stamp())
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "BENCH_MULTIMODAL.json"),
        "w",
    ) as f:
        json.dump(payload, f, indent=2)
    print(json.dumps(payload))
