"""int8_bmm block-size sweep at the decode shapes (round-4 verdict item 5).

PROFILE_DECODE_OPS.json attributes 88% of the 5.1 ms int8 decode step to the
int8_bmm Pallas kernels themselves, summing to 4.50 ms against the 3.10 ms
weight-stream floor — the per-call bandwidth is ~59-69% of 819 GB/s. The
default 512×512 weight tiles give the 16-expert FFN calls 128 grid steps of
256 KB each; per-step fixed cost then eats the stream. This sweeps larger
tiles at the four dominant decode weight shapes (per-layer expert gate/up,
expert down, dense SwiGLU, lm_head-ish) and reports achieved GB/s.

Writes EXP_INT8_BLOCKS.json.
Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_int8_blocks.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "EXP_INT8_BLOCKS.json")


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepearth_tpu.ops.quant import int8_bmm, quantize_int8

    # (name, e, c, d, f): the decode-step call shapes
    # (tools/bench_decode.py config: 20L, hidden 2048, 16 experts x 1024,
    # dense intermediate 8192).
    shapes = [
        ("expert_gate_up", 16, 1, 2048, 1024),
        ("expert_down", 16, 1, 1024, 2048),
        ("dense_swiglu", 1, 1, 2048, 8192),
        ("wide_out", 1, 1, 8192, 2048),
    ]
    # (block_d, block_f) candidates; None = kernel default 512x512
    blocks = [
        (512, 512),
        (1024, 512),
        (2048, 512),
        (1024, 1024),
        (2048, 1024),
        (1024, 2048),
        (2048, 2048),
    ]
    rng = np.random.default_rng(0)
    results = {}
    for name, e, c, d, f in shapes:
        w = jnp.asarray(rng.standard_normal((e, d, f), dtype=np.float32))
        wq, s = quantize_int8(w)
        wq, s = jax.device_put(wq), jax.device_put(s)
        x = jax.device_put(
            jnp.asarray(
                rng.standard_normal((e, c, d), dtype=np.float32),
                dtype=jnp.bfloat16,
            )
        )
        weight_mb = e * d * f / 1e6
        row = {"weight_mb": round(weight_mb, 1)}
        for bd, bf in blocks:
            if d % bd or f % bf:
                continue
            try:
                fn = jax.jit(
                    lambda x, wq, s, bd=bd, bf=bf: int8_bmm(
                        x, wq, s, block_d=bd, block_f=bf
                    )
                )
                y = fn(x, wq, s)
                float(np.asarray(y).sum())  # force completion
                # chained-slope timing (CLAUDE.md): K calls per sync
                def run(k):
                    t0 = time.perf_counter()
                    out = y
                    for _ in range(k):
                        out = fn(x, wq, s)
                    float(np.asarray(out).sum())
                    return time.perf_counter() - t0

                run(4)
                t8, t40 = run(8), run(40)
                per_call = (t40 - t8) / 32.0
                gbs = weight_mb / 1e3 / per_call
                row[f"bd{bd}_bf{bf}"] = {
                    "ms": round(per_call * 1e3, 4),
                    "gb_per_s": round(gbs, 1),
                    "pct_819": round(100 * gbs / 819.0, 1),
                }
                log(f"{name} bd={bd} bf={bf}: {row[f'bd{bd}_bf{bf}']}")
            except Exception as ex:
                row[f"bd{bd}_bf{bf}"] = f"FAIL: {type(ex).__name__}: {str(ex)[:120]}"
                log(f"{name} bd={bd} bf={bf}: {row[f'bd{bd}_bf{bf}']}")
        results[name] = row

    with open(OUT, "w") as fo:
        json.dump(results, fo, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
