"""On-chip A/B of the MoE dispatch paths after the gmm tiling fix.

Modes (ops/moe.py): dense_all (E/K x math, zero dispatch machinery),
scatter (argsort+gather, capacity-bounded), ragged (sort + megablox
grouped matmul, drop-free).  Measures a full fwd+bwd (grad wrt weights
and tokens) per mode at:

  * the flagship in-proj site: E=4  K=2 D=F=2048, S=18432 (B=32 x 576)
  * the 'ultra' simulator preset scale: E=64 K=6 D=2048 F=1408, S=16384
    (reference: core/inductive_simulator.py:126-154 — 64-128 experts)
  * E=128 K=8 at the same token count

Each timed call cycles 4 distinct token buffers (relay-cache hygiene) and
reduces every output to a scalar inside jit so no multi-GB buffers queue
up across async calls (that artifact once inflated a 11 ms gather to 6 s).

Writes BENCH_MOE_DISPATCH.json. Run:
  PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_moe_dispatch.py
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def bench_shape(jax, jnp, *, E, K, D, F, S, modes, n=6):
    from deepearth_tpu.ops import moe as m

    key = jax.random.PRNGKey(0)
    w_gate = jax.random.normal(key, (E, D, F), jnp.bfloat16) * 0.02
    w_up = jax.random.normal(jax.random.PRNGKey(1), (E, D, F), jnp.bfloat16) * 0.02
    w_down = jax.random.normal(jax.random.PRNGKey(2), (E, F, D), jnp.bfloat16) * 0.02
    xs = [
        jax.random.normal(jax.random.PRNGKey(10 + i), (S, D), jnp.bfloat16)
        for i in range(4)
    ]
    logits = jax.random.normal(jax.random.PRNGKey(3), (S, E))
    topk_weight, topk_idx = jax.lax.top_k(jax.nn.softmax(logits), K)
    topk_weight = topk_weight.astype(jnp.float32)
    topk_idx = topk_idx.astype(jnp.int32)
    capacity = max(K, int(math.ceil(S * K / E * 2.0)))  # cf=2.0

    def run(mode, xf, wg, wu, wd):
        if mode == "dense_all":
            out, _ = m.dense_all_expert_ffn(xf, topk_idx, topk_weight, wg, wu, wd)
        elif mode == "scatter":
            out, _ = m.scatter_dispatch_ffn(
                xf, topk_idx, topk_weight, wg, wu, wd, capacity
            )
        elif mode == "ragged":
            out = m.ragged_expert_ffn(xf, topk_idx, topk_weight, wg, wu, wd)
        else:
            raise ValueError(mode)
        return out.astype(jnp.float32).sum()

    results = {}
    for mode in modes:
        try:
            g = jax.jit(
                jax.value_and_grad(
                    lambda xf, wg, wu, wd, mode=mode: run(mode, xf, wg, wu, wd),
                    argnums=(0, 1, 2, 3),
                )
            )

            def call(i):
                loss, grads = g(xs[i % 4], w_gate, w_up, w_down)
                # consume grads inside host loop cheaply: fetch loss only;
                # grads die immediately (no accumulation across calls)
                return loss

            float(np.asarray(call(0)))  # compile + warm
            t0 = time.perf_counter()
            last = None
            for i in range(n):
                last = call(i + 1)
            float(np.asarray(last))
            ms = (time.perf_counter() - t0) / n * 1e3
            results[mode] = round(ms, 2)
            log(f"  {mode}: {ms:.2f} ms")
        except Exception as ex:
            results[mode] = f"FAIL: {str(ex)[:110]}"
            log(f"  {mode}: FAIL {str(ex)[:160]}")
    return results


def main():
    import jax
    import jax.numpy as jnp

    log("devices:", jax.devices())
    out = {
        "what": "MoE dispatch fwd+bwd A/B after gmm tiling fix "
        "(tm<=512, tk=full, tn<=512; was 128^3 at 12 TF/s)",
        "method": "6 chained calls, 4 distinct token buffers, scalar loss "
        "fetch; grads computed wrt tokens+all weights",
    }
    shapes = [
        ("flagship_inproj_E4", dict(E=4, K=2, D=2048, F=2048, S=18432,
                                    modes=("dense_all", "scatter", "ragged"))),
        ("ultra_E64", dict(E=64, K=6, D=2048, F=1408, S=16384,
                           modes=("scatter", "ragged"))),
        ("ultra_E128", dict(E=128, K=8, D=2048, F=1408, S=16384,
                            modes=("scatter", "ragged"))),
    ]
    for name, kw in shapes:
        log(f"[{name}] E={kw['E']} K={kw['K']} S={kw['S']} D={kw['D']} F={kw['F']}")
        out[name] = bench_shape(jax, jnp, **kw)
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(here, "BENCH_MOE_DISPATCH.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
