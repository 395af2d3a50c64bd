"""MFU sweep round 2: optimizer-grouping A/B + B=96/128 train steps.

(1) Isolates the small-leaf-grouping change in fused_adamw (optimizers.py):
    times the optimizer-update-only step with grouping on vs off at 1.53B.
(2) Times the full train step at B=96 and B=128 with encoder remat — the
    B=64 point hit 62.8% MFU; fixed costs (~31 ms optimizer+residual)
    amortize further with batch if activations fit.

Writes EXP_MFU_SWEEP2.json.
Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_mfu_sweep2.py
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from bench_flagship import (  # noqa: E402
    V5E_BF16_PEAK_FLOPS,
    _enable_cache,
    build_model,
    flops_of,
    log,
    make_batch,
)
from exp_mfu_sweep import run_variant  # noqa: E402

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "EXP_MFU_SWEEP2.json",
)


def opt_ab():
    """Optimizer-update-only timing, grouping on vs off."""
    import jax
    import jax.numpy as jnp

    from deepearth_tpu.training import create_optimizer
    from deepearth_tpu.training import optimizers as O
    from deepearth_tpu.training.trainer import TrainState

    cfg, model = build_model(moe_experts=4, moe_intermediate=1024, n_layers=10)
    batch = make_batch(jax.random.PRNGKey(0), 2, 576, 16)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    del batch

    res = {}
    for tag, thresh in (("grouped", 1 << 17), ("per_leaf", 0)):
        O._SMALL_LEAF_ELEMS = thresh
        # donation below consumes the state's buffers — give each arm its
        # own copy of the params
        state = TrainState.create(
            apply_fn=model.apply,
            params=jax.tree_util.tree_map(jnp.copy, params),
            tx=create_optimizer(cfg.optimizer),
        )

        @functools.partial(jax.jit, donate_argnums=(0,))
        def opt_only(st, seed):
            g = jax.tree_util.tree_map(
                lambda p: (p.astype(jnp.float32) * 1e-4 + seed * 1e-9
                           ).astype(p.dtype),
                st.params,
            )
            st2 = st.apply_gradients(grads=g)
            return st2, jnp.float32(seed)

        def sync(o):
            float(np.asarray(o[1]))

        # chained-slope (distinct seeds; state threads through)
        def chain(n, s):
            o = opt_only(s, jnp.float32(0))
            sync(o)
            s = o[0]
            t0 = time.perf_counter()
            for i in range(n):
                o = opt_only(s, jnp.float32(i + 1))
                s = o[0]
            sync(o)
            return time.perf_counter() - t0, s

        state = opt_only(state, jnp.float32(0))[0]  # warm/compile
        ts = []
        for _ in range(3):
            t_hi, state = chain(24, state)
            t_lo, state = chain(8, state)
            ts.append((t_hi - t_lo) / 16)
        res[tag] = round(float(np.median(ts)) * 1e3, 2)
        log(f"[opt-ab] {tag}: {res[tag]} ms")
        del state
    O._SMALL_LEAF_ELEMS = 1 << 17
    del params
    return res


def main():
    _enable_cache()
    import jax

    log(f"devices: {jax.devices()}")
    results = {}
    try:
        results["opt_update_only_ms"] = opt_ab()
    except Exception as e:
        results["opt_update_only_ms"] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
        log(results["opt_update_only_ms"])
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)

    for tag, kw in (
        ("L10_B96_er_fr", dict(n_layers=10, B=96, encoder_remat=True,
                               fusion_remat=True)),
        ("L10_B128_er_fr", dict(n_layers=10, B=128, encoder_remat=True,
                                fusion_remat=True)),
    ):
        try:
            results[tag] = run_variant(tag, **kw)
        except Exception as e:
            results[tag] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
            log(f"[{tag}] {results[tag]}")
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
    log(f"wrote {OUT}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
