"""MFU sweep over trainable-flagship configs (VERDICT r2 item 1, round 3).

Round-3 state: 1.53B (n_layers=10) trains at 54.9% MFU @ B=32 and 60.6% @
B=64 (encoder remat). The fused/factored optimizer cut its sweep from ~38 to
~22.6 ms AND freed ~6 GB of second-moment state — so the "largest trainable
config" is no longer 10 layers. This sweep probes larger fusion stacks and
batches to find the best (MFU, obs/s) point on the 16 GB chip.

Writes EXP_MFU_SWEEP.json.
Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_mfu_sweep.py
"""

from __future__ import annotations

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
    pallas_attn_flops,
)

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "EXP_MFU_SWEEP.json",
)


def run_variant(tag, *, n_layers, B, encoder_remat, fusion_remat=False,
                moe_experts=4, moe_intermediate=1024):
    import jax

    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    SV, SL = 576, 16
    sync = lambda o: float(np.asarray(o[1]["loss/total"]))  # noqa: E731
    cfg, model = build_model(
        moe_experts=moe_experts, moe_intermediate=moe_intermediate,
        n_layers=n_layers, encoder_remat=encoder_remat,
    )
    if fusion_remat:
        import dataclasses
        cfg.fusion = dataclasses.replace(cfg.fusion, remat=True)
        from deepearth_tpu.models import DeepEarthModel
        model = DeepEarthModel(cfg)

    batch = make_batch(jax.random.PRNGKey(0), B, SV, SL)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    log(f"[{tag}] params {n_params/1e9:.3f}B  B={B}")
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=create_optimizer(cfg.optimizer)
    )
    del params
    step = jax.jit(
        make_train_step(model, cfg, LossWeights(contrastive=0.0)),
        donate_argnums=(0,),
    )
    noop = jax.jit(
        lambda st, b, k: (st, {"loss/total": b["xyzt"].sum() + k[0]}),
        donate_argnums=(0,),
    )
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "dtype") else x,
        (state, batch, jax.random.PRNGKey(0)),
    )
    flops = flops_of(step, *abstract)

    def t_loop(f, s, reps=6):
        out = f(s, batch, jax.random.PRNGKey(0))
        sync(out)
        s = out[0]
        ts = []
        for i in range(reps):
            t0 = time.perf_counter()
            out = f(s, batch, jax.random.PRNGKey(i))
            sync(out)
            ts.append(time.perf_counter() - t0)
            s = out[0]
        return float(np.median(sorted(ts)[: max(reps // 2, 1)])), s

    t_step, state = t_loop(step, state)
    t_noop, state = t_loop(noop, state)
    dt = max(t_step - t_noop, 1e-4)
    # Pallas VMEM attention flops are invisible to cost_analysis
    p_flops = pallas_attn_flops(B, S=SV, bwd=True, remat=encoder_remat)
    total_flops = flops + p_flops if np.isfinite(flops) else float("nan")
    mfu = (
        total_flops / dt / V5E_BF16_PEAK_FLOPS
        if np.isfinite(total_flops) else None
    )
    res = {
        "params_b": round(n_params / 1e9, 3),
        "n_layers": n_layers, "batch": B,
        "encoder_remat": encoder_remat, "fusion_remat": fusion_remat,
        "step_ms": round(dt * 1e3, 2),
        "obs_per_s": round(B / dt, 1),
        "hlo_flops": flops if np.isfinite(flops) else None,
        "pallas_attn_flops": p_flops,
        "mfu": round(mfu, 4) if mfu else None,
    }
    log(f"[{tag}] {res}")
    del state, batch, step, noop
    return res


def main():
    _enable_cache()
    import jax

    log(f"devices: {jax.devices()}")
    results = {}
    variants = [
        # does 12 layers fit at B=32 now that nu is factored?
        ("L12_B32", dict(n_layers=12, B=32, encoder_remat=False)),
        # larger stacks with remat
        ("L16_B32_er", dict(n_layers=16, B=32, encoder_remat=True)),
        ("L16_B32_er_fr", dict(n_layers=16, B=32, encoder_remat=True,
                               fusion_remat=True)),
        ("L12_B64_er", dict(n_layers=12, B=64, encoder_remat=True)),
        # flagship-width MoE (8 experts x 2048) at reduced depth
        ("L10_E8_B32_er", dict(n_layers=10, B=32, encoder_remat=True,
                               moe_experts=8, moe_intermediate=2048)),
    ]
    for tag, kw in variants:
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
