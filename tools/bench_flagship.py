"""Flagship-scale benchmark on the real TPU chip (VERDICT round-1 item 1).

The flagship shape is the reference B/D-stack integrated preset
(reference: models/deepearth_integrated.py:26 universal_dim=2048,
models/cross_modal_fusion.py:18 num_fusion_layers=24,
core/inductive_simulator.py:126-154 MoE presets,
encoders/modality_config.py:98-109 vision 1408→16 tok, language 7168→4 tok).

Measures, with the tunnel-safe subtraction methodology (see bench.py):
  1. full-flagship (MoE fusion, ~2.9B params) FORWARD: obs/s, tokens/s, MFU
  2. largest single-chip TRAINABLE flagship-shaped config (bf16 params +
     bf16 adam moments): train-step obs/s, MFU
  3. component time breakdown (grid4d / vision encode / language encode /
     fusion stack) → top time sinks

Writes BENCH_FLAGSHIP.json at the repo root; bench.py folds it into the
driver metric line when present.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_flagship.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK_FLOPS = 197e12  # v5e: 197 TFLOP/s bf16
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH_FLAGSHIP.json",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _enable_cache():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timed_subtracted(fn, noop, args, sync, reps=6):
    """Median-of-fast-half wall time of fn minus a same-signature noop —
    the only trustworthy timing over the tunnel (CLAUDE.md)."""

    def t(f):
        sync(f(*args))  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(*args))
            ts.append(time.perf_counter() - t0)
        return float(np.median(sorted(ts)[: max(reps // 2, 1)]))

    t_fn, t_noop = t(fn), t(noop)
    return max(t_fn - t_noop, 1e-4), t_fn, t_noop


def flops_of(jitted, *args) -> float:
    """Compiled-HLO flop count; falls back to NaN when the backend doesn't
    expose cost analysis."""
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception as e:
        log(f"[flops] cost_analysis unavailable: {e}")
        return float("nan")


def pallas_attn_flops(B, *, H=8, S=576, dh=128, layers=2, bwd=False,
                      remat=False) -> float:
    """Executed MXU flops inside the Pallas attention kernels, which XLA's
    cost analysis cannot see (custom-call boundary) — without this the
    reported MFU silently understates whenever attention runs in Pallas
    (flash at S=4608, VMEM kernel at S=576).

    fwd = QKᵀ + PV = 2 matmuls; the VMEM backward recomputes scores and
    runs dp/dq/dk/dv → 5 matmuls = 2.5× fwd. Sk counts the kernel's
    128-padding (those MACs execute). encoder remat re-runs fwd once more.
    """
    skp = ((S + 127) // 128) * 128
    fwd = layers * 4.0 * B * H * S * skp * dh
    total = fwd * (2 if remat else 1)
    if bwd:
        total += 2.5 * fwd
    return total


def build_model(moe_experts=8, moe_intermediate=2048, n_layers=24,
                second_moment="factored", encoder_remat=False,
                fusion_remat=False, remat_policy="full"):
    import jax.numpy as jnp

    from deepearth_tpu.configs import integrated_config

    cfg = integrated_config(
        universal_dim=2048,
        num_fusion_layers=n_layers,
        use_deepseek_fusion=True,
        param_dtype=jnp.bfloat16,
        compute_dtype=jnp.bfloat16,
    )
    import dataclasses

    ds = cfg.fusion.deepseek_block
    cfg.fusion.deepseek_block = dataclasses.replace(
        ds,
        moe=dataclasses.replace(
            ds.moe,
            n_routed_experts=moe_experts,
            moe_intermediate_size=moe_intermediate,
        ),
    )
    # single-sweep fused AdamW + factored second moment: the r2 step had a
    # fixed ≈38 ms optimizer sweep (27 GB of state); factored ν cuts the
    # state to params+μ and the sweep to one pass (training/optimizers.py)
    cfg.optimizer.moment_dtype = "bfloat16"
    cfg.optimizer.second_moment = second_moment
    cfg.optimizer.fused = True
    if encoder_remat:
        for m in cfg.modalities.values():
            m.encoder_remat = True
            m.encoder_remat_policy = remat_policy
    if fusion_remat:
        cfg.fusion = dataclasses.replace(
            cfg.fusion, remat=True, remat_policy=remat_policy
        )
    from deepearth_tpu.models import DeepEarthModel

    return cfg, DeepEarthModel(cfg)


def make_batch(rng, b, s_vision, s_language):
    import jax

    ks = jax.random.split(rng, 3)
    return {
        "xyzt": jax.random.uniform(ks[0], (b, 4)),
        "modalities": {
            "vision": jax.random.normal(
                ks[1], (b, s_vision, 1408), "bfloat16"
            ),
            "language": jax.random.normal(
                ks[2], (b, s_language, 7168), "bfloat16"
            ),
        },
    }


def bench_forward(results):
    """Full flagship (8 experts × 2048 moe-dim, 24 MoE fusion layers)."""
    import jax
    import jax.numpy as jnp

    B, SV, SL = 16, 4608, 16
    cfg, model = build_model()
    batch = make_batch(jax.random.PRNGKey(0), B, SV, SL)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    log(f"[flagship-fwd] params {n_params/1e9:.2f}B  batch {B}  vision S={SV}")

    fwd = jax.jit(
        lambda p, b: model.apply({"params": p}, b)["fused_representation"].sum()
    )
    noop = jax.jit(lambda p, b: b["xyzt"].sum() + b["modalities"]["vision"][0, 0, 0])
    sync = lambda o: float(np.asarray(o))  # noqa: E731
    dt, t_raw, t_noop = timed_subtracted(fwd, noop, (params, batch), sync)
    flops = flops_of(fwd, params, batch)
    # flash attention (S=4608 vision self-attn) runs in Pallas — invisible
    # to cost_analysis; add its executed matmul flops explicitly
    p_flops = pallas_attn_flops(B, S=SV)
    total_flops = flops + p_flops if np.isfinite(flops) else float("nan")
    mfu = (
        total_flops / dt / V5E_BF16_PEAK_FLOPS
        if np.isfinite(total_flops) else None
    )
    tokens = B * (1 + 1 + 16 + 4)  # cls + spacetime + vision + language universal tokens
    res = {
        "params_b": round(n_params / 1e9, 3),
        "batch": B, "vision_seq": SV, "language_seq": SL,
        "fwd_ms": round(dt * 1e3, 2),
        "obs_per_s": round(B / dt, 1),
        "universal_tokens_per_s": round(tokens / dt, 1),
        "native_patches_per_s": round(B * SV / dt, 1),
        "hlo_flops": flops if np.isfinite(flops) else None,
        "pallas_attn_flops": p_flops,
        "mfu": round(mfu, 4) if mfu else None,
        "raw_s": round(t_raw, 3), "io_noop_s": round(t_noop, 3),
    }
    log(f"[flagship-fwd] {res}")
    results["forward_full"] = res
    del params, batch
    return res


def bench_train(results, plan=None):
    """Largest single-chip trainable flagship-shaped config, batch-scaled.

    The per-step cost is fixed ≈ 38 ms (adamw HBM physics: clip-norm +
    update sweep ~27 GB of train state at 819 GB/s, independent of batch)
    plus ~40.5 ms of fwd+bwd math per 8 observations — so MFU climbs with
    batch until activations OOM (measured: 31% @ B=8 → 54% @ B=32).

    Round-4 (VERDICT r3 weak #4): the sweep PLAN pins the remat config per
    column and each row reports BOTH
      * executed_mfu — recompute FLOPs in the numerator (what the chip ran)
      * model_mfu    — model FLOPs only (the honest headline number),
        from compiling the same (B, no-remat) program for cost analysis
    plus the remat config that produced it. (64, enc, enc+fusion) isolates
    whether fusion remat itself causes the B=64→96 obs/s drop.
    """
    import jax
    import jax.numpy as jnp

    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    # Largest single-chip trainable flagship-shaped config: 2048-d universal
    # tokens, 10 dense fusion + 10 MoE simulator layers, 4 experts × 1024.
    # 1.53B params → bf16 params+grads+adam moments ≈ 12.3 GB; the
    # 12-layer variant (14.0 GB) OOMs the 16 GB v5e once XLA workspace is
    # added — measured, not estimated. The full 5B flagship needs ≥2 chips
    # for Adam state; dryrun_multichip proves the sharded step. Vision
    # S=576 is the reference adapter's per-image shape
    # (encoders/universal_encoder.py:70-137).
    SV, SL = 576, 16
    sync = lambda o: float(np.asarray(o[1]["loss/total"]))  # noqa: E731
    scaling = {}
    best = None
    model_flops_cache = {}

    # (batch, encoder_remat, fusion_remat[, remat_policy, microbatch]):
    # remat FIXED per column, plus the (64, enc, enc+fus) pair that isolates
    # the fusion-remat cost at fixed B. Round-5 entries add the two
    # recompute levers from VERDICT r4 item 4: 'dots' checkpoint policies
    # (matmul outputs saved, elementwise recomputed) and in-step microbatch
    # accumulation (per-microbatch activations of a batch that fits with NO
    # remat, optimizer swept once).
    if plan is None:
        plan = [
            (8, False, False), (16, False, False), (32, False, False),
            (64, True, False), (64, True, True),
            (96, True, True), (128, True, True),
        ]

    for entry in plan:
        B, enc_remat, fus_remat = entry[:3]
        policy = entry[3] if len(entry) > 3 else "full"
        mb = entry[4] if len(entry) > 4 else 1
        cfg, model = build_model(
            moe_experts=4, moe_intermediate=1024, n_layers=10,
            encoder_remat=enc_remat, fusion_remat=fus_remat,
            remat_policy=policy,
        )
        key = f"{B}" + ("+fr" if fus_remat and B == 64 else "") \
            + (f"+{policy}" if policy != "full" else "") \
            + (f"+mb{mb}" if mb > 1 else "")
        try:
            batch = make_batch(jax.random.PRNGKey(0), B, SV, SL)
            params = model.init(jax.random.PRNGKey(1), batch)["params"]
            n_params = sum(
                int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params)
            )
            log(f"[flagship-train] params {n_params/1e9:.2f}B  batch {B}")
            state = TrainState.create(
                apply_fn=model.apply, params=params,
                tx=create_optimizer(cfg.optimizer),
            )
            del params
            step = jax.jit(
                make_train_step(model, cfg, LossWeights(contrastive=0.0),
                                microbatch_steps=mb),
                donate_argnums=(0,),
            )
            noop = jax.jit(
                lambda st, b, k: (st, {"loss/total": b["xyzt"].sum() + k[0]}),
                donate_argnums=(0,),
            )

            # flops from abstract args BEFORE allocating anything extra — a
            # second live copy of the 12 GB train state OOMs (measured)
            abstract = jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype)
                if hasattr(x, "dtype") else x,
                (state, batch, jax.random.PRNGKey(0)),
            )
            flops = flops_of(step, *abstract)
            if mb > 1 and np.isfinite(flops):
                # XLA cost analysis counts the grad-accum lax.scan body
                # ONCE; the step executes it mb times. The optimizer
                # update (outside the scan, ~25 flops/param < 0.2% here)
                # is counted once in `flops`; scale only the body.
                opt_flops = 25.0 * n_params
                flops = mb * (flops - opt_flops) + opt_flops

            # model FLOPs: the same (B) step compiled WITHOUT remat, for
            # cost analysis only (executing it may OOM; compiling is fine)
            if (enc_remat or fus_remat) and B not in model_flops_cache:
                cfg_nr, model_nr = build_model(
                    moe_experts=4, moe_intermediate=1024, n_layers=10,
                )
                step_nr = jax.jit(
                    make_train_step(model_nr, cfg_nr, LossWeights(contrastive=0.0)),
                    donate_argnums=(0,),
                )
                model_flops_cache[B] = flops_of(step_nr, *abstract)
                del step_nr
            model_flops = model_flops_cache.get(B, flops)

            # subtraction timing with donation: ONE state threads through
            # both loops (donation reuses buffers in place; never copy it)
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
            # VMEM attention kernel (S=576 self-attn, fwd+bwd) runs in
            # Pallas — invisible to cost_analysis; count it explicitly
            p_flops = pallas_attn_flops(B, S=SV, bwd=True, remat=enc_remat)
            p_flops_model = pallas_attn_flops(B, S=SV, bwd=True, remat=False)
            total_flops = (
                flops + p_flops if np.isfinite(flops) else float("nan")
            )
            total_model = (
                model_flops + p_flops_model
                if np.isfinite(model_flops) else float("nan")
            )
            mfu = (
                total_flops / dt / V5E_BF16_PEAK_FLOPS
                if np.isfinite(total_flops) else None
            )
            model_mfu = (
                total_model / dt / V5E_BF16_PEAK_FLOPS
                if np.isfinite(total_model) else None
            )
            res = {
                "params_b": round(n_params / 1e9, 3),
                "batch": B, "vision_seq": SV,
                "remat": {"encoder": enc_remat, "fusion": fus_remat,
                          "policy": policy},
                "microbatch_steps": mb,
                "step_ms": round(dt * 1e3, 2),
                "obs_per_s": round(B / dt, 1),
                "native_patches_per_s": round(B * SV / dt, 1),
                "hlo_flops": flops if np.isfinite(flops) else None,
                "model_hlo_flops": (
                    model_flops if np.isfinite(model_flops) else None
                ),
                "pallas_attn_flops": p_flops,
                "executed_mfu": round(mfu, 4) if mfu else None,
                "model_mfu": round(model_mfu, 4) if model_mfu else None,
                "raw_s": round(t_step, 3), "io_noop_s": round(t_noop, 3),
            }
            log(f"[flagship-train] {res}")
            scaling[key] = res
            if best is None or res["obs_per_s"] > best["obs_per_s"]:
                best = res
            del state, batch, step, noop
        except Exception as e:
            scaling[key] = f"FAIL: {type(e).__name__}: {str(e)[:160]}"
            log(f"[flagship-train] B={B} {scaling[key]}")
            continue

    # merge (partial plans extend the table instead of wiping it); best is
    # re-picked over the WHOLE merged table so a partial run can't demote it
    merged = results.setdefault("train_batch_scaling", {})
    merged.update(scaling)
    numeric = [v for v in merged.values() if isinstance(v, dict)]
    if numeric:
        results["train_largest_single_chip"] = max(
            numeric, key=lambda e: e["obs_per_s"]
        )
    return best


def bench_components(results):
    """Per-component forward share: where flagship time actually goes."""
    import jax
    import jax.numpy as jnp

    from deepearth_tpu.configs import integrated_config
    from deepearth_tpu.models import Grid4DEncoder, UniversalTokenEncoder
    from deepearth_tpu.models.deepseek import DeepSeekTransformer

    cfg, model = build_model()
    B, SV, SL = 16, 4608, 16
    comps = {}
    sync = lambda o: float(np.asarray(o))  # noqa: E731

    # grid4d (2^19 tables)
    g = Grid4DEncoder(cfg.grid4d, hidden_dim=2048,
                      compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16)
    x = jax.random.uniform(jax.random.PRNGKey(0), (B, 4))
    gp = g.init(jax.random.PRNGKey(1), x)
    gf = jax.jit(lambda p, x: g.apply(p, x).sum())
    gn = jax.jit(lambda p, x: x.sum())
    dt, _, _ = timed_subtracted(gf, gn, (gp, x), sync)
    comps["grid4d_ms"] = round(dt * 1e3, 2)

    # vision universal-token encode (MoE in-proj + 2-layer deepseek + queries)
    vcfg = cfg.modalities["vision"]
    ute = UniversalTokenEncoder(vcfg, 2048, jnp.bfloat16, jnp.bfloat16)
    v = jax.random.normal(jax.random.PRNGKey(2), (B, SV, 1408), "bfloat16")
    vp = ute.init(jax.random.PRNGKey(3), v)
    vf = jax.jit(lambda p, v: ute.apply(p, v).sum())
    vn = jax.jit(lambda p, v: v[:, 0, 0].sum())
    dt, _, _ = timed_subtracted(vf, vn, (vp, v), sync)
    comps["vision_encode_ms"] = round(dt * 1e3, 2)

    # language encode
    lcfg = cfg.modalities["language"]
    utl = UniversalTokenEncoder(lcfg, 2048, jnp.bfloat16, jnp.bfloat16)
    lx = jax.random.normal(jax.random.PRNGKey(4), (B, SL, 7168), "bfloat16")
    lp = utl.init(jax.random.PRNGKey(5), lx)
    lf = jax.jit(lambda p, v: utl.apply(p, v).sum())
    dt, _, _ = timed_subtracted(lf, vn, (lp, lx), sync)
    comps["language_encode_ms"] = round(dt * 1e3, 2)

    # 24-layer MoE fusion stack on the 22-token universal sequence
    fus = DeepSeekTransformer(cfg.fusion.deepseek_block, jnp.bfloat16, jnp.bfloat16)
    tok = jax.random.normal(jax.random.PRNGKey(6), (B, 22, 2048), "bfloat16")
    fp = fus.init(jax.random.PRNGKey(7), tok)
    ff = jax.jit(lambda p, t: fus.apply(p, t).sum())
    fn_ = jax.jit(lambda p, t: t[:, 0, 0].sum())
    dt, _, _ = timed_subtracted(ff, fn_, (fp, tok), sync)
    comps["fusion_24L_ms"] = round(dt * 1e3, 2)

    log(f"[components] {comps}")
    results["component_forward_ms"] = comps
    return comps


def main():
    _enable_cache()
    import jax

    log(f"devices: {jax.devices()}")
    results = {}
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if os.path.exists(OUT):
        with open(OUT) as f:
            results = json.load(f)
    try:
        if which in ("all", "components"):
            bench_components(results)
        if which in ("all", "forward"):
            bench_forward(results)
        if which in ("all", "train"):
            bench_train(results)
        if which == "train5":
            # round-5 recompute-lever sweep (VERDICT r4 item 4): dots
            # policies at the remat-forced batches, microbatch accumulation
            # at B>=64 so each microbatch is the no-remat B=32 shape
            bench_train(results, plan=[
                (32, False, False),
                (64, False, False, "full", 2),
                (96, False, False, "full", 3),
                (128, False, False, "full", 4),
                (64, True, False, "dots", 1),
                (96, True, True, "dots", 1),
            ])
        if which == "train5c":
            # deeper microbatch accumulation: the fixed adamw sweep (~38 ms)
            # and per-microbatch accum-carry traffic amortize with mb —
            # projected from the mb4 point to cross 0.65 model-MFU at mb8
            bench_train(results, plan=[
                (256, False, False, "full", 8),
                (512, False, False, "full", 16),
            ])
    finally:
        from deepearth_tpu.utils.artifacts import round_stamp

        results.update(round_stamp())
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)
        log(f"wrote {OUT}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
