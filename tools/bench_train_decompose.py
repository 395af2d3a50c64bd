"""Decompose the flagship train step's cost on the real chip.

Separates (1) fwd+bwd math, (2) the optimizer update sweep, (3) the full
step, at B=8 and B=32, via the chained-slope estimator — identifies what
remains of the round-2 "fixed ≈38 ms" after the fused/factored optimizer.
Also tries B=64 WITHOUT encoder remat (factored ν freed ~6 GB of state).

Writes BENCH_TRAIN_DECOMP.json.
Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_train_decompose.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_TRAIN_DECOMP.json",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _sync(out):
    """Force a host transfer — block_until_ready can return early over the
    tunnel (CLAUDE.md timing lesson); floating a scalar leaf cannot."""
    import jax

    leaf = out[1] if isinstance(out, tuple) else out
    leaves = jax.tree_util.tree_leaves(leaf)
    scal = min(leaves, key=lambda t: getattr(t, "size", 1 << 60))
    float(np.asarray(scal).reshape(-1)[0])


def slope_time(fn, states, args_list, donate=True, lo=6, hi=18, reps=3):
    """states: initial state threaded through; args_list: distinct args."""

    s = states
    out = fn(s, *args_list[0])
    _sync(out)
    s = out[0] if isinstance(out, tuple) else s

    def chain(s, n):
        o = None
        for i in range(n):
            o = fn(s, *args_list[i % len(args_list)])
            if isinstance(o, tuple):
                s = o[0]
        _sync(o)
        return s

    t = {}
    for n in (lo, hi):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            s = chain(s, n)
            ts.append(time.perf_counter() - t0)
        t[n] = float(np.median(ts))
    return max((t[hi] - t[lo]) / (hi - lo), 1e-5), s


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench_flagship import build_model, make_batch
    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    results = {}
    SV, SL = 576, 16
    cfg, model = build_model(moe_experts=4, moe_intermediate=1024, n_layers=10)

    for B in (8, 32):
        batch = make_batch(jax.random.PRNGKey(0), B, SV, SL)
        params = model.init(jax.random.PRNGKey(1), batch)["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )
        del params
        step_fn = make_train_step(model, cfg, LossWeights(contrastive=0.0))

        # -- full step ------------------------------------------------------ #
        full = jax.jit(step_fn, donate_argnums=(0,))
        keys = [jax.random.PRNGKey(i) for i in range(24)]
        dt_full, state = slope_time(
            lambda s, k: full(s, batch, k), state, [(k,) for k in keys]
        )

        # -- optimizer-only: apply precomputed grads ------------------------ #
        @jax.jit
        def opt_only(s, seed):
            # cheap per-call-varying grads (relay-cache safe), same sweep
            g = jax.tree_util.tree_map(
                lambda p: jnp.full_like(p, 1e-6) * (1.0 + seed), s.params
            )
            s2 = s.apply_gradients(grads=g)
            return s2, s2.step

        opt_jit = jax.jit(opt_only, donate_argnums=(0,))
        dt_opt, state = slope_time(
            opt_jit, state, [(jnp.float32(0.01 * i),) for i in range(24)]
        )

        # -- fwd+bwd only: grads summed, no update -------------------------- #
        def fwdbwd(p, k):
            def loss(p):
                rngs = jax.random.split(k, 3)
                out, mut = model.apply(
                    {"params": p},
                    batch,
                    deterministic=False,
                    rngs={"dropout": rngs[2]},
                    mutable=["intermediates"],
                )
                from deepearth_tpu.training.losses import deepearth_loss

                l, _ = deepearth_loss(
                    out, batch, cfg, LossWeights(contrastive=0.0),
                    mut.get("intermediates"),
                )
                return l

            l, g = jax.value_and_grad(loss)(p)
            return l + sum(
                jnp.sum(t.astype(jnp.float32)) * 1e-12
                for t in jax.tree_util.tree_leaves(g)
            )

        fb = jax.jit(fwdbwd)
        p_live = state.params
        acc = fb(p_live, keys[0])
        jax.block_until_ready(acc)

        def chain_fb(n):
            a = None
            for i in range(n):
                a = fb(p_live, keys[i % 24])
            _sync(a)

        t = {}
        for n in (6, 18):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                chain_fb(n)
                ts.append(time.perf_counter() - t0)
            t[n] = float(np.median(ts))
        dt_fb = max((t[18] - t[6]) / 12, 1e-5)

        res = {
            "full_step_ms": round(dt_full * 1e3, 2),
            "opt_update_only_ms": round(dt_opt * 1e3, 2),
            "fwd_bwd_only_ms": round(dt_fb * 1e3, 2),
            "residual_ms": round((dt_full - dt_opt - dt_fb) * 1e3, 2),
        }
        log(f"[B={B}] {res}")
        results[f"B{B}"] = res
        del state, batch

    # -- B=64 without remat (factored nu freed ~6 GB) ----------------------- #
    try:
        B = 64
        batch = make_batch(jax.random.PRNGKey(0), B, SV, SL)
        params = model.init(jax.random.PRNGKey(1), batch)["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )
        del params
        full = jax.jit(
            make_train_step(model, cfg, LossWeights(contrastive=0.0)),
            donate_argnums=(0,),
        )
        keys = [jax.random.PRNGKey(i) for i in range(24)]
        dt, state = slope_time(
            lambda s, k: full(s, batch, k), state, [(k,) for k in keys]
        )
        abstract = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
            if hasattr(x, "dtype") else x,
            (state, batch, jax.random.PRNGKey(0)),
        )
        try:
            ca = full.lower(*abstract).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            flops = float(ca.get("flops", float("nan")))
        except Exception:
            flops = float("nan")
        results["B64_no_remat"] = {
            "step_ms": round(dt * 1e3, 2),
            "obs_per_s": round(B / dt, 1),
            "hlo_flops": flops if np.isfinite(flops) else None,
            "mfu": round(flops / dt / 197e12, 4) if np.isfinite(flops) else None,
        }
        log(f"[B=64 no-remat] {results['B64_no_remat']}")
    except Exception as e:
        results["B64_no_remat"] = f"FAIL: {type(e).__name__}: {str(e)[:200]}"
        log(results["B64_no_remat"])

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
