"""On-chip A/B: VMEM-resident attention kernel vs XLA materialized einsums
at the trainable-flagship vision shape (B=32, H=8, S=576, dh=128), fwd and
fwd+bwd. Chained-loop timing (20+ fresh-input calls / total wall).

Writes BENCH_VMEM_ATTN.json.
Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_vmem_attn.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_VMEM_ATTN.json",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def chain_time(fn, args_list, lo=8, hi=24):
    """Chained-slope estimator (CLAUDE.md): fn must return a SCALAR (device
    reduction — never ship a big tensor through the ~30 MB/s tunnel). Slope
    between hi- and lo-length async chains cancels the host-sync floor."""

    def chain(n):
        o = fn(*args_list[0])
        float(np.asarray(o))  # warm + sync
        t0 = time.perf_counter()
        for i in range(n):
            o = fn(*args_list[i % len(args_list)])
        float(np.asarray(o))
        return time.perf_counter() - t0

    ts = [(chain(hi) - chain(lo)) / (hi - lo) for _ in range(3)]
    return float(np.median(ts))


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(OUT), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepearth_tpu.ops.attention_vmem import vmem_attention

    log(f"devices: {jax.devices()}")
    B, H, S, DH = 32, 8, 576, 128
    scale = DH ** -0.5

    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        p = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
        p = (p / jnp.sum(p, axis=-1, keepdims=True)).astype(q.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def pallas_attn(q, k, v):
        return vmem_attention(q, k, v, scale=scale)

    def make_inputs(n=8):
        outs = []
        for i in range(n):
            ks = jax.random.split(jax.random.PRNGKey(i), 3)
            outs.append(tuple(
                jax.device_put(jax.random.normal(kk, (B, H, S, DH),
                                                 jnp.bfloat16))
                for kk in ks
            ))
        return outs

    inputs = make_inputs()
    res = {"shape": {"B": B, "H": H, "S": S, "dh": DH}}

    for name, f in (("xla", xla_attn), ("pallas", pallas_attn)):
        fwd = jax.jit(lambda q, k, v, f=f: jnp.sum(
            f(q, k, v).astype(jnp.float32)))

        def loss(q, k, v, f=f):
            return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)

        def gsum(q, k, v, loss=loss):
            g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
            return sum(jnp.sum(x.astype(jnp.float32)) for x in g)

        fwdbwd = jax.jit(gsum)
        t_f = chain_time(fwd, inputs)
        t_fb = chain_time(fwdbwd, inputs)
        res[name] = {"fwd_ms": round(t_f * 1e3, 3),
                     "fwdbwd_ms": round(t_fb * 1e3, 3)}
        log(name, res[name])

    res["speedup_fwd"] = round(res["xla"]["fwd_ms"] / res["pallas"]["fwd_ms"], 3)
    res["speedup_fwdbwd"] = round(
        res["xla"]["fwdbwd_ms"] / res["pallas"]["fwdbwd_ms"], 3
    )
    # correctness on-chip
    q, k, v = inputs[0]
    d = np.abs(np.asarray(jax.jit(xla_attn)(q, k, v), np.float32)
               - np.asarray(jax.jit(pallas_attn)(q, k, v), np.float32))
    res["onchip_max_abs_diff"] = float(d.max())
    with open(OUT, "w") as f:
        json.dump(res, f, indent=2)
    log(f"wrote {OUT}")
    print(json.dumps(res))


if __name__ == "__main__":
    main()
