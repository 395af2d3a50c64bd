"""On-chip check + bench: masked/padded flash attention at S=576.

VERDICT r2 weak #2: the trainable flagship's vision path (S=576 per-image
patches) was not flash-eligible (gate required N % 128 == 0 and no
key_mask), so its dominant attention materialized (B,H,576,576) scores.
The gate now pads to 640 with segment-id masking; this script, on the real
chip:

1. asserts flash output == materialized-scores output at S=576, with and
   without a key mask (bf16 tolerance);
2. measures the vision encoder block fwd+bwd both ways at the training
   shape (B=32, S=576, D=2048) with the chained-slope estimator;
3. writes BENCH_FLASH576.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_flash576.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_FLASH576.json",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepearth_tpu.configs import MLAConfig
    from deepearth_tpu.models.deepseek import MLAttention

    B, S, D, H = 32, 576, 2048, 8
    results = {"shape": {"B": B, "S": S, "D": D, "H": H}}

    def build(flash: bool):
        return MLAttention(
            MLAConfig(
                hidden_dim=D, n_heads=H, kv_lora_rank=512,
                qk_rope_head_dim=32, qk_nope_head_dim=96, v_head_dim=128,
                use_flash_attention=flash, flash_min_seq=256,
            ),
            compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )

    x = jax.random.normal(jax.random.PRNGKey(0), (B, S, D), jnp.bfloat16)
    mod_ref, mod_fl = build(False), build(True)
    params = mod_ref.init(jax.random.PRNGKey(1), x)

    # -- 1. equivalence ------------------------------------------------------ #
    key_mask = jax.random.uniform(jax.random.PRNGKey(2), (B, S)) > 0.25
    for name, km in (("nomask", None), ("keymask", key_mask)):
        o_ref = np.asarray(
            jax.jit(lambda p, x: mod_ref.apply(p, x, key_mask=km))(params, x),
            np.float32,
        )
        o_fl = np.asarray(
            jax.jit(lambda p, x: mod_fl.apply(p, x, key_mask=km))(params, x),
            np.float32,
        )
        err = np.abs(o_ref - o_fl)
        rms = float(np.sqrt((o_ref ** 2).mean()))
        rel = float(err.max() / rms)
        results[f"equiv_{name}_maxerr_over_rms"] = round(rel, 5)
        log(f"[equiv {name}] max|Δ|/rms = {rel:.2e}")
        assert rel < 5e-2, f"flash mismatch ({name}): {rel}"

    # -- 2. fwd+bwd bench (chained slope, distinct inputs) ------------------- #
    xs = [
        jax.device_put(
            jax.random.normal(jax.random.PRNGKey(10 + i), (B, S, D), jnp.bfloat16)
        )
        for i in range(24)
    ]
    jax.block_until_ready(xs[-1])

    for name, mod in (("materialized", mod_ref), ("flash", mod_fl)):
        @jax.jit
        def fb(p, x, mod=mod):
            def loss(p):
                return (mod.apply(p, x).astype(jnp.float32) ** 2).mean()

            l, g = jax.value_and_grad(loss)(p)
            return l + sum(
                jnp.sum(t.astype(jnp.float32))
                for t in jax.tree_util.tree_leaves(g)
            )

        def chain(n):
            acc = None
            for i in range(n):
                acc = fb(params, xs[i % 24])
            float(np.asarray(acc))

        chain(1)
        t = {}
        for n in (8, 24):
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                chain(n)
                ts.append(time.perf_counter() - t0)
            t[n] = float(np.median(ts))
        slope_ms = max((t[24] - t[8]) / 16, 1e-5) * 1e3
        results[f"{name}_fwdbwd_ms"] = round(slope_ms, 3)
        log(f"[{name}] fwd+bwd {slope_ms:.2f} ms")

    results["flash_speedup"] = round(
        results["materialized_fwdbwd_ms"] / results["flash_fwdbwd_ms"], 3
    )
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {OUT}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
