"""Per-op device-time attribution for the int8 decode step (round-4
verdict item 5).

docs/ROOFLINE.md put int8 decode at 62% of its own weight-stream floor
(5.0 ms measured vs 3.1 ms int8-weight-bytes / 819 GB/s) with the missing
1.9 ms unattributed. This tool profiles ONE B=1 single-token decode step of
the 2.42B BENCH_DECODE model (same config) through jax.profiler, joins the
device lane with the compiled HLO's per-instruction metadata (the
PROFILE_TRAIN_BUCKETS machinery), and attributes every microsecond to a
decode-specific bucket:

    int8-kernel (Pallas fused-dequant matmuls) / bf16-matmul-by-site
    (kv_b_proj, q_proj, o_proj, lm_head, embed, router, moe-expert) /
    cache-read-attend / cache-update / norms-rope / sampling / copies /
    other

Writes PROFILE_DECODE_OPS.json. Run:
    PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_decode_ops.py [bf16]
"""

from __future__ import annotations

import collections
import functools
import json
import os
import re
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

OUT = os.path.join(REPO, "PROFILE_DECODE_OPS.json")
V5E_HBM_GBS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


DECODE_BUCKETS = [
    ("int8-kernel", re.compile(r"int8_bmm|fused_dequant|quant|custom-call")),
    ("lm_head", re.compile(r"lm_head")),
    ("embed", re.compile(r"embed_tokens")),
    ("kv_b_proj", re.compile(r"kv_b_proj|absorbed")),
    ("kv_a_proj", re.compile(r"kv_a_proj")),
    ("q_proj", re.compile(r"q_a_proj|q_b_proj|q_proj")),
    ("o_proj", re.compile(r"o_proj")),
    ("moe-router", re.compile(r"router|gate\b|topk|top_k")),
    ("moe-expert", re.compile(r"w_gate|w_up|w_down|shared_expert|moe")),
    ("mlp-dense", re.compile(r"gate_proj|up_proj|down_proj|swiglu|mlp")),
    ("cache-update", re.compile(r"dynamic.update.slice|dynamic_update")),
    ("cache-attend", re.compile(r"attend|scores|softmax|attention|decode_step")),
    ("norms-rope", re.compile(r"rms|norm|rope|rotary|cos|sin")),
    ("sampling", re.compile(r"sample|argmax|categor|gumbel|random|threefry")),
]


def classify(op_name: str, src: str) -> str:
    s = (op_name + " " + src).lower()
    for bucket, pat in DECODE_BUCKETS:
        if pat.search(s):
            return bucket
    return "other"


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    import profile_train_buckets as ptb
    from bench_decode import main as _unused  # noqa: F401 (same config source)
    from deepearth_tpu.configs import DeepSeekBlockConfig, MLAConfig, MoEConfig
    from deepearth_tpu.models import DeepSeekForCausalLM
    from deepearth_tpu.models.generation import causal_lm_decode_step
    from deepearth_tpu.models.mla_decode import init_cache

    use_bf16 = "bf16" in sys.argv[1:]
    use_int4 = "int4" in sys.argv[1:]
    variant = "bf16" if use_bf16 else ("int4" if use_int4 else "int8")
    log(f"devices: {jax.devices()}")

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
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8), jnp.int32))[
        "params"
    ]
    weight_bytes = sum(
        l.nbytes for l in jax.tree_util.tree_leaves(params)
    )
    if not use_bf16:
        from deepearth_tpu.ops.quant import quantize_decoder_params, quantized_bytes

        params = jax.jit(
            functools.partial(
                quantize_decoder_params, bits=4 if use_int4 else 8
            )
        )(params)
        jax.block_until_ready(params)
        weight_bytes = quantized_bytes(params)["total_bytes"]

    B, MAX_LEN = 1, 320
    caches = tuple(
        init_cache(cfg.mla, B, MAX_LEN, jnp.bfloat16)
        for _ in range(cfg.n_layers)
    )
    tok = jnp.zeros((B,), jnp.int32)

    step = jax.jit(
        lambda p, c, t: causal_lm_decode_step(p, cfg, c, t, MAX_LEN),
        donate_argnums=(1,),
    )

    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
        if hasattr(x, "dtype") else x,
        (params, caches, tok),
    )
    log("compiling for HLO text...")
    compiled = step.lower(*abstract).compile()
    hlo = compiled.as_text()
    instrs, comps = ptb.parse_hlo(hlo)
    # re-classify with decode buckets
    attr = {}
    for name, (opcode, op_name, src, calls) in instrs.items():
        rep_op, rep_src = op_name, src
        if opcode == "fusion" and calls and calls in comps:
            members = [instrs[n] for n in comps[calls] if n in instrs]
            dots = [t for t in members if t[0] in ("dot", "convolution")]
            if dots:
                rep_op, rep_src = dots[0][1], dots[0][2]
            else:
                cnt = collections.Counter(
                    (t[1], t[2]) for t in members if t[1] or t[2]
                )
                if cnt:
                    rep_op, rep_src = cnt.most_common(1)[0][0]
        if opcode in ("copy", "copy-start", "copy-done", "bitcast"):
            attr[name] = ("copies", rep_op)
        elif opcode == "custom-call":
            attr[name] = ("int8-kernel", rep_op)
        else:
            attr[name] = (classify(rep_op, rep_src), rep_op)
    log(f"parsed {len(instrs)} instructions")

    # warm + profile
    logits, caches = step(params, caches, tok)
    float(np.asarray(logits).sum())
    reps = 12
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for i in range(reps):
                logits, caches = step(
                    params, caches, jnp.full((B,), i % VOCAB, jnp.int32)
                )
            float(np.asarray(logits).sum())
        total, agg = ptb.parse_device_events(td)

    buckets = collections.defaultdict(float)
    bucket_ops = collections.defaultdict(list)
    for name, (ms, calls) in agg.items():
        key = name if name in attr else name.split(":")[0]
        if key in attr:
            b, rep = attr[key]
        else:
            b, rep = classify(name, ""), ""
            if b == "other":
                b = "unattributed"
        buckets[b] += ms
        bucket_ops[b].append((round(ms / reps, 4), name, rep[:120]))

    step_ms = total / reps
    floor_ms = weight_bytes / (V5E_HBM_GBS * 1e9) * 1e3
    rows = {
        b: {
            "ms_per_step": round(ms / reps, 3),
            "pct": round(100 * ms / total, 1),
            "top_ops": sorted(bucket_ops[b], reverse=True)[:6],
        }
        for b, ms in sorted(buckets.items(), key=lambda kv: -kv[1])
    }
    result = {
        "variant": variant,
        "batch": B, "max_len": MAX_LEN, "reps": reps,
        "device_busy_ms_per_step": round(step_ms, 3),
        "weight_bytes": int(weight_bytes),
        "weight_stream_floor_ms": round(floor_ms, 3),
        "pct_of_floor": round(100 * floor_ms / step_ms, 1),
        "buckets": rows,
    }
    from deepearth_tpu.utils.artifacts import round_stamp

    result.update(round_stamp())
    out = (
        OUT
        if variant == "int8"
        else OUT.replace(".json", f"_{variant.upper()}.json")
    )
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    log(f"wrote {out}")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
