"""Serving-path decode benchmark: compressed-cache generation on the chip.

The reference served DeepSeek embeddings through llama.cpp and relied on HF
``generate`` for decoding (reference: encoders/modeling_deepseek.py:1514,
encoders/language/server.py); this framework decodes through MLA projection
absorption (models/mla_decode.py) where the per-token cache is
``kv_lora_rank + qk_rope_head_dim`` floats. This tool measures real decode
throughput (prefill 64 + 256 new tokens per call, one jit call per batch
size, tunnel-safe: the 320 sequential device steps dwarf the ~30 ms host
sync floor) and records the measured cache compression.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_decode.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_DECODE.json",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sections", default="bf16,int8,int4",
        help="comma list of bf16/int8/int4; omitted sections are kept "
             "from the existing BENCH_DECODE.json (so a new variant can "
             "run without re-benching the others)",
    )
    ap.add_argument("--batches", default="1,8,32")
    args = ap.parse_args()
    sections = set(args.sections.split(","))
    batch_sizes = tuple(int(b) for b in args.batches.split(","))

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(OUT), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from deepearth_tpu.configs import DeepSeekBlockConfig, MLAConfig, MoEConfig
    from deepearth_tpu.models import DeepSeekForCausalLM, generate
    from deepearth_tpu.models.mla_decode import (
        cache_bytes_per_token,
        full_cache_bytes_per_token,
    )

    log(f"devices: {jax.devices()}")

    # V3-ratio MLA (kv_lora 512, rope 64, nope 128) at a 16 GB-friendly
    # scale: 20 layers, 2048 hidden, 16-expert MoE past layer 0.
    VOCAB = 32000
    cfg = DeepSeekBlockConfig(
        hidden_dim=2048,
        n_layers=20,
        intermediate_size=8192,
        mla=MLAConfig(
            hidden_dim=2048, n_heads=16, kv_lora_rank=512,
            qk_rope_head_dim=64, qk_nope_head_dim=128, v_head_dim=128,
        ),
        moe=MoEConfig(
            n_routed_experts=16, num_experts_per_tok=4,
            moe_intermediate_size=1024, hidden_dim=2048, n_shared_experts=1,
        ),
        first_k_dense_replace=1,
    )
    model = DeepSeekForCausalLM(
        cfg, vocab_size=VOCAB,
        compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
    )
    prompt0 = jnp.zeros((1, 8), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), prompt0)["params"]
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    log(f"params: {n_params/1e9:.2f}B")

    S, T = 64, 256
    results = {
        "params_b": round(n_params / 1e9, 3),
        "prefill": S,
        "new_tokens": T,
        "cache_bytes_per_token_per_layer": cache_bytes_per_token(cfg.mla, 2),
        "full_kv_bytes_per_token_per_layer": full_cache_bytes_per_token(cfg.mla, 2),
        "cache_compression": round(
            full_cache_bytes_per_token(cfg.mla) / cache_bytes_per_token(cfg.mla), 1
        ),
        "batches": {},
    }
    # Stamp every measured section with a config hash (+ commit, for
    # traceability) so resume-merged sections are only compared when they
    # were measured under the same model config / shape list (ADVICE r4:
    # a fresh int8 time divided by a stale bf16 baseline mislabels the
    # speedup).
    import hashlib
    import subprocess

    stamp = {
        "config_sha": hashlib.sha256(
            repr((cfg, VOCAB, S, T, batch_sizes)).encode()
        ).hexdigest()[:12],
    }
    try:
        stamp["commit"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(OUT), capture_output=True, text=True,
            timeout=10,
        ).stdout.strip()
    except Exception:
        pass

    if os.path.exists(OUT):
        with open(OUT) as f:
            prev = json.load(f)
        for k in ("batches", "bf16_stamp", "int8", "int4"):
            if k in prev:
                results[k] = prev[k]

    def bench(p, tag):
        out = {}
        for B in batch_sizes:
            ids = jax.random.randint(jax.random.PRNGKey(B), (B, S), 0, VOCAB)
            t0 = time.perf_counter()
            toks = generate(p, cfg, ids, max_new_tokens=T,
                            cache_dtype=jnp.bfloat16)
            np.asarray(toks)
            compile_s = time.perf_counter() - t0
            reps = []
            for r in range(4):
                ids_r = jax.random.randint(
                    jax.random.PRNGKey(100 + B + r), (B, S), 0, VOCAB
                )
                t0 = time.perf_counter()
                toks = generate(p, cfg, ids_r, max_new_tokens=T,
                                cache_dtype=jnp.bfloat16)
                np.asarray(toks)
                reps.append(time.perf_counter() - t0)
            dt = float(np.median(sorted(reps)[:2]))
            out[str(B)] = {
                "wall_s": round(dt, 3),
                "decode_tokens_per_s": round(B * T / dt, 1),
                "sequential_steps_per_s": round((S + T) / dt, 1),
                "ms_per_step": round(dt / (S + T) * 1e3, 3),
                "compile_s": round(compile_s, 1),
            }
            log(f"{tag} B={B}: {out[str(B)]}")
        return out

    if "bf16" in sections:
        results["batches"] = bench(params, "bf16")
        results["bf16_stamp"] = stamp

    # -- int8/int4 weight-only variants (ops/quant.py fused-dequant) ------- #
    from deepearth_tpu.ops.quant import quantize_decoder_params, quantized_bytes

    bf16_bytes = int(sum(l.nbytes for l in jax.tree_util.tree_leaves(params)))
    for bits in (8, 4):
        key = f"int{bits}"
        if key not in sections:
            continue
        qp = jax.jit(
            lambda p, b=bits: quantize_decoder_params(p, bits=b)
        )(params)
        jax.block_until_ready(qp)
        cov = quantized_bytes(qp)
        results[key] = {
            f"{key}_weight_fraction": round(
                cov["int8_bytes"] / cov["total_bytes"], 3
            ),
            "weight_bytes_bf16": bf16_bytes,
            f"weight_bytes_{key}_tree": cov["total_bytes"],
            "batches": bench(qp, key),
            "stamp": stamp,
        }
        # weight-stream floor: a B=1 decode step must at minimum read the
        # whole (quantized) weight tree once from HBM at 819 GB/s (v5e);
        # fraction_of_weight_stream_floor = floor/measured per batch row
        # (PROFILE_DECODE_OPS.json attributes the int8 residual to GEMV
        # dequant ALU).
        floor_ms = cov["total_bytes"] / 819e9 * 1e3
        results[key]["weight_stream_floor_ms"] = round(floor_ms, 3)
        for r in results[key]["batches"].values():
            r["fraction_of_weight_stream_floor"] = round(
                floor_ms / r["ms_per_step"], 3
            )
        bf16_ok = (
            results.get("bf16_stamp", {}).get("config_sha")
            == stamp["config_sha"]
        )
        for B, r in results[key]["batches"].items():
            if B in results.get("batches", {}):
                if bf16_ok:
                    r["speedup_vs_bf16"] = round(
                        results["batches"][B]["wall_s"] / r["wall_s"], 3
                    )
                else:
                    # resume-merged bf16 baseline was measured under a
                    # different config — a ratio would be mislabeled
                    r["speedup_vs_bf16_stale_baseline"] = True

    from deepearth_tpu.utils.artifacts import round_stamp

    results.update(round_stamp())
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {OUT}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
