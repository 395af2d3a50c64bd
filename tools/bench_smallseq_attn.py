"""A/B: FusionAttention's BHND einsum path vs the token-major pairwise
formulation (ops/attention_smallseq.py) at the A-stack headline shape
(B=1024, N=3, D=768, H=12, bf16), 16 chained attention sites, fwd+bwd.

Chained-slope timing per CLAUDE.md (K=8 vs K=24 async calls per sync,
distinct pre-staged inputs). Writes BENCH_SMALLSEQ_ATTN.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_smallseq_attn.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from deepearth_tpu.ops.attention import dot_product_attention  # noqa: E402
from deepearth_tpu.ops.attention_smallseq import (  # noqa: E402
    pairwise_token_attention,
    rope_token_major,
)
from deepearth_tpu.ops.rope import apply_rope_half, rope_cos_sin  # noqa: E402

B, N, H, Dh = 1024, 3, 12, 64
D = H * Dh
SITES = 16
DT = jnp.bfloat16


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def make_params(key):
    ks = jax.random.split(key, 4)
    return {
        n: (jax.random.normal(kk, (D, D)) * 0.02).astype(DT)
        for n, kk in zip(("wq", "wk", "wv", "wo"), ks)
    }


def site_old(p, x):
    # x: (B, N, D) batch-major — mirrors FusionAttention's current path
    q = (x @ p["wq"]).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    k = (x @ p["wk"]).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    v = (x @ p["wv"]).reshape(B, N, H, Dh).transpose(0, 2, 1, 3)
    cos, sin = rope_cos_sin(N, Dh, layout="half")
    q = apply_rope_half(q, cos, sin).astype(v.dtype)
    k = apply_rope_half(k, cos, sin).astype(v.dtype)
    o = dot_product_attention(q, k, v, scale=Dh**-0.5)
    return (o.transpose(0, 2, 1, 3).reshape(B, N, D) @ p["wo"]).astype(DT)


def site_new(p, x):
    # x: (N, B, D) token-major
    q = rope_token_major(x @ p["wq"], H)
    k = rope_token_major(x @ p["wk"], H)
    v = x @ p["wv"]
    o = pairwise_token_attention(q, k, v, n_heads=H, scale=Dh**-0.5)
    return (o @ p["wo"]).astype(DT)


def make_step(site, token_major):
    def loss(p, x):
        h = x
        for _ in range(SITES):
            h = h + site(p, h)
        return jnp.sum(h.astype(jnp.float32) ** 2) * 1e-6

    g = jax.value_and_grad(loss)

    @jax.jit
    def step(p, x):
        l, grads = g(p, x)
        return l, grads["wq"].sum()

    return step


def bench(step, xs):
    def chain(n):
        acc = None
        for i in range(n):
            l, s = step(params, xs[i % len(xs)])
        float(np.asarray(l)), float(np.asarray(s))

    chain(2)  # compile + warm
    t = {}
    for n in (8, 24):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            chain(n)
            ts.append(time.perf_counter() - t0)
        t[n] = float(np.median(ts))
    return max((t[24] - t[8]) / 16, 1e-5)


params = make_params(jax.random.PRNGKey(0))
xs_bm = [
    (jax.random.normal(jax.random.PRNGKey(100 + i), (B, N, D)) * 0.1).astype(DT)
    for i in range(24)
]
xs_tm = [x.transpose(1, 0, 2) for x in xs_bm]
for x in xs_bm + xs_tm:
    jax.block_until_ready(x)

log("benching old (batch-major BHND)...")
t_old = bench(make_step(site_old, False), xs_bm)
log(f"old: {t_old*1e3:.2f} ms / 16-site fwd+bwd")
log("benching new (token-major pairwise)...")
t_new = bench(make_step(site_new, True), xs_tm)
log(f"new: {t_new*1e3:.2f} ms / 16-site fwd+bwd")

out = {
    "what": f"16 chained attention sites fwd+bwd, B={B} N={N} D={D} H={H} bf16",
    "old_bhnd_ms": round(t_old * 1e3, 2),
    "new_token_major_ms": round(t_new * 1e3, 2),
    "speedup": round(t_old / t_new, 2),
}
with open(os.path.join(REPO, "BENCH_SMALLSEQ_ATTN.json"), "w") as f:
    json.dump(out, f, indent=2)
print(json.dumps(out))
