"""Benchmark: masked multimodal reconstruction throughput on the real chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value     = observation tokens/sec/chip through a full jit train step
            (forward + masked losses + backward + adam update) at A-stack
            reference scale (hidden 768, 12 fusion layers, Grid4D 16 spatial
            levels @ 2^19 tables — reference: models/configs.py defaults).
vs_baseline = value / (torch CPU reference throughput at the CPU's own
            best batch), measured once from the reference's own runnable
            A-stack modules (examples/quick_test.py composition) and cached
            in BENCH_BASELINE_CPU.json. North-star target is >=10x
            (BASELINE.md).

Extra diagnostic numbers go to stderr; stdout carries only the JSON line.
"""

from __future__ import annotations

import datetime
import json
import os
import sys
import time

import numpy as np

# Throughput-optimal batch from the on-chip sweep (EXP_ASTACK_BATCH.json,
# post token-major fusion + Pallas pairwise kernel): 31.6k obs/s @1024 ->
# 38.1k @2048 -> 42.1k @4096 -> 42.6k @8192 (plateau). 4096 takes ~99% of
# the plateau at half the memory/step latency. The torch CPU baseline is
# measured at the CPU's own best batch (see bench_reference_cpu) so the
# ratio never benefits from a thrashing denominator.
BATCH = 4096
STEPS = 30
WARMUP = 5
BASELINE_CACHE = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE_CPU.json")

# Fusion sequence: cls + spacetime + species (A-stack comparable scale).
TOKENS_PER_OBS = 3
HASH_TABLE_SIZE = 2 ** 19  # reference default (models/configs.py)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_astack(batch_size: int = BATCH):
    """A-stack model + deterministic batch at reference scale (also used by
    tools/profile_flagship.py astack mode)."""
    import jax
    import jax.numpy as jnp

    from deepearth_tpu.configs import Grid4DConfig, TransformerConfig
    from deepearth_tpu.configs import DeepEarthConfig, ModalityConfig
    from deepearth_tpu.models import DeepEarthModel

    cfg = DeepEarthConfig(
        hidden_dim=768,
        n_heads=12,
        n_layers=12,
        grid4d=Grid4DConfig(
            n_spatial_levels=16, n_temporal_levels=8,
            # Reference-default table size (models/configs.py: 2^19). The
            # torch CPU baseline below uses the same size for a fair ratio.
            n_features_per_level=2, hash_table_size=HASH_TABLE_SIZE,
        ),
        modality_encoder=TransformerConfig(hidden_dim=384, n_heads=6, n_layers=4),
        compute_dtype=jnp.bfloat16,
    )
    cfg.add_modality(
        ModalityConfig(
            name="species", encoding_type="learned_embedding",
            input_type="categorical", vocab_size=232,
        )
    )
    model = DeepEarthModel(cfg)
    rng = jax.random.PRNGKey(0)
    batch = {
        "xyzt": jax.random.uniform(rng, (batch_size, 4)),
        "modalities": {
            "species": jax.random.randint(rng, (batch_size,), 0, 232)
        },
    }
    return cfg, model, batch


def bench_ours() -> dict:
    import jax
    import jax.numpy as jnp

    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    cfg, model, batch = build_astack()
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    n_params = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    log(f"[ours] params: {n_params/1e6:.1f}M, devices: {jax.devices()}")

    tx = create_optimizer(cfg.optimizer)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    train_step = make_train_step(model, cfg, LossWeights(contrastive=0.0))

    # Timing methodology (chained-slope): single-call noop-subtraction
    # differences two ~50 ms tunnel round trips to estimate a ~20 ms
    # quantity — its jitter produced both 9 ms and 16 ms for a step the
    # profiler's device trace pins at 20.9 ms busy. Instead, enqueue K
    # async steps (distinct pre-staged device batches, state threaded with
    # donation), sync once, and take the slope between K=8 and K=24 — the
    # per-call host floor cancels exactly. Cross-validated: slope 21.7 ms
    # vs 20.9 ms profiler busy-sum (PROFILE_ASTACK.json).
    step = jax.jit(train_step, donate_argnums=(0,))

    # 24 distinct device batches: the K=24 chain leg must never replay an
    # identical (args) pair — the tunnel relay can serve repeats from cache,
    # deflating the slope (ADVICE r2). The train chain is additionally safe
    # because state is donated and threaded, but forward reuses params.
    batches = []
    for i in range(24):
        k = jax.random.PRNGKey(100 + i)
        b = {
            "xyzt": jax.random.uniform(k, (BATCH, 4)),
            "modalities": {
                "species": jax.random.randint(k, (BATCH,), 0, 232)
            },
        }
        b = jax.tree_util.tree_map(jax.device_put, b)
        jax.block_until_ready(b["xyzt"])
        batches.append(b)

    def chain(s, n):
        m = None
        for i in range(n):
            s, m = step(s, batches[i % 24], jax.random.PRNGKey(i))
        float(np.asarray(m["loss/total"]))
        return s

    state = chain(state, 1)  # compile + warm

    def slope(lo, hi, reps=4):
        nonlocal state
        t = {}
        for n in (lo, hi):
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                state = chain(state, n)
                ts.append(time.perf_counter() - t0)
            t[n] = float(np.median(ts))
        return max((t[hi] - t[lo]) / (hi - lo), 1e-4)

    step_s = slope(8, 24)
    log(f"[ours] chained-slope device step {step_s*1000:.1f} ms")
    obs_per_s = BATCH / step_s

    # forward latency: same slope estimator over stateless forwards
    fwd = jax.jit(
        lambda p, b: model.apply({"params": p}, b)["fused_representation"].sum()
    )

    def fwd_chain(n):
        acc = None
        for i in range(n):
            acc = fwd(state.params, batches[i % 24])
        float(np.asarray(acc))

    fwd_chain(1)
    tf = {}
    for n in (8, 24):
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            fwd_chain(n)
            ts.append(time.perf_counter() - t0)
        tf[n] = float(np.median(ts))
    p50 = max((tf[24] - tf[8]) / 16, 1e-4) * 1000.0
    log(f"[ours] train obs/s: {obs_per_s:.1f}  fwd p50: {p50:.2f} ms/batch")
    return {"obs_per_s": obs_per_s, "p50_forward_ms": p50}


def bench_reference_cpu() -> float:
    """Measure the torch reference A-stack on CPU once; cache the result.

    Composes the reference's own modules the way examples/quick_test.py does
    (Grid4D encoder + species embedding + 12-layer transformer + decoders)
    and times forward+masked-losses+backward+adam.

    The denominator is the CPU's BEST throughput over its own batch sweep —
    not the same batch as the TPU run. Measured: 48.8 obs/s @1024 vs
    19.2 @4096 (memory-bound collapse); dividing the B=4096 TPU number by
    the B=4096 CPU number would inflate the ratio ~2.5x with a pathological
    denominator. Each side runs at its own throughput-optimal batch.
    """
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            cached = json.load(f)
        # invalidate caches measured at a different table size or with the
        # old same-batch (non-sweep) policy
        if (
            cached.get("hash_table_size", 2 ** 17) == HASH_TABLE_SIZE
            and cached.get("policy") == "cpu_best_batch"
        ):
            return cached["obs_per_s"]
    try:
        sys.path.insert(0, "/root/reference")
        import torch
        from models.configs import DeepEarthConfig as RefConfig
        from models.encoders import Grid4DEncoder as RefGrid4D
        from models.transformers import Transformer as RefTransformer
        from models.decoders import (
            ModalityDecoder as RefModalityDecoder,
            SpatiotemporalDecoder as RefSTDecoder,
        )

        torch.set_num_threads(os.cpu_count() or 8)
        rc = RefConfig(hash_table_size=HASH_TABLE_SIZE)

        class RefModel(torch.nn.Module):
            def __init__(self):
                super().__init__()
                self.grid4d = RefGrid4D(rc)
                self.species_embed = torch.nn.Embedding(232, rc.hidden_dim)
                self.cls = torch.nn.Parameter(torch.randn(1, 1, rc.hidden_dim) * 0.02)
                self.fusion = RefTransformer(rc.cross_modal_fusion_config)
                self.spatial_dec = RefSTDecoder("spatial", 3, rc)
                self.temporal_dec = RefSTDecoder("temporal", 1, rc)
                self.species_dec = RefModalityDecoder("species", 232, rc)

            def forward(self, xyzt, species):
                st = self.grid4d(xyzt)[:, None, :]
                sp = self.species_embed(species)[:, None, :]
                cls = self.cls.expand(xyzt.shape[0], -1, -1)
                tokens = torch.cat([cls, st, sp], dim=1)
                fused = self.fusion(tokens)
                return (
                    self.spatial_dec(fused[:, 1]),
                    self.temporal_dec(fused[:, 1]),
                    self.species_dec(fused[:, 2]),
                )

        model = RefModel()
        opt = torch.optim.AdamW(model.parameters(), lr=1e-4)

        def measure(cpu_batch: int) -> float:
            xyzt = torch.rand(cpu_batch, 4)
            species = torch.randint(0, 232, (cpu_batch,))

            def step():
                opt.zero_grad()
                s, t, sl = model(xyzt, species)
                loss = (
                    torch.nn.functional.mse_loss(s, xyzt[:, :3])
                    + torch.nn.functional.mse_loss(t, xyzt[:, 3:4])
                    + torch.nn.functional.cross_entropy(sl, species)
                )
                loss.backward()
                opt.step()

            for _ in range(2):
                step()
            n = 6
            t0 = time.perf_counter()
            for _ in range(n):
                step()
            dt = time.perf_counter() - t0
            r = cpu_batch * n / dt
            log(f"[reference torch CPU] batch {cpu_batch}: {r:.1f} obs/s")
            return r

        # CPU's own batch sweep (larger batches thrash: 19.2 obs/s @4096)
        per_batch = {b: measure(b) for b in (256, 1024)}
        cpu_best_batch, obs_per_s = max(per_batch.items(), key=lambda kv: kv[1])
        log(f"[reference torch CPU] best: {obs_per_s:.1f} obs/s @ batch {cpu_best_batch}")
    except Exception as e:  # reference import breakage — record and fall back
        log(f"[reference] failed to benchmark ({e}); using recorded fallback")
        obs_per_s = float("nan")
    finally:
        if sys.path and sys.path[0] == "/root/reference":
            sys.path.pop(0)

    if np.isfinite(obs_per_s):
        with open(BASELINE_CACHE, "w") as f:
            json.dump(
                {
                    "obs_per_s": obs_per_s,
                    "hash_table_size": HASH_TABLE_SIZE,
                    "policy": "cpu_best_batch",
                    "batch": cpu_best_batch,
                    "per_batch": {str(k): round(v, 2) for k, v in per_batch.items()},
                    "what": "torch CPU reference A-stack fwd+bwd+adam at the "
                    "CPU's own best batch "
                    "(models/{encoders,transformers,decoders}.py)",
                },
                f,
            )
    return obs_per_s


def _enable_compile_cache():
    """Persistent compilation cache: repeat bench runs skip the multi-minute
    remote compiles."""
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(__file__), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log(f"[cache] persistent compile cache unavailable: {e}")


def main():
    _enable_compile_cache()
    baseline_obs_s = bench_reference_cpu()
    ours = bench_ours()
    # the multimodal variant lives in tools/bench_multimodal.py — its compile
    # alone can exceed the driver's bench budget on tunneled runtimes
    tokens_per_s = ours["obs_per_s"] * TOKENS_PER_OBS
    vs = (
        ours["obs_per_s"] / baseline_obs_s
        if np.isfinite(baseline_obs_s)
        else None
    )
    detail = {
        "obs_per_s": round(ours["obs_per_s"], 1),
        "hash_table_size": HASH_TABLE_SIZE,
        f"p50_forward_ms_batch{BATCH}": round(ours["p50_forward_ms"], 2),
        "reference_cpu_obs_per_s": (
            round(baseline_obs_s, 1) if np.isfinite(baseline_obs_s) else None
        ),
    }
    # fold in the big-model/pipeline artifacts measured by
    # tools/bench_flagship.py and tools/bench_e2e.py when present.
    # Each embed is stamped with its measurement round/date (round-4 verdict
    # weak #3: BENCH_r04 silently carried bit-identical round-3 sections) —
    # a missing or older-than-current `measured_round` is flagged stale.
    here = os.path.dirname(os.path.abspath(__file__))
    from deepearth_tpu.utils.artifacts import current_round

    this_round = current_round()
    for key, fname in (
        ("flagship", "BENCH_FLAGSHIP.json"),
        ("input_pipeline", "BENCH_E2E.json"),
        ("multimodal", "BENCH_MULTIMODAL.json"),
    ):
        p = os.path.join(here, fname)
        if os.path.exists(p):
            try:
                with open(p) as f:
                    sec = json.load(f)
                sec.setdefault("measured_round", None)
                sec["artifact_mtime"] = datetime.datetime.fromtimestamp(
                    os.path.getmtime(p), datetime.timezone.utc
                ).strftime("%Y-%m-%dT%H:%M:%SZ")
                if this_round is not None and (
                    sec["measured_round"] is None
                    or sec["measured_round"] < this_round
                ):
                    sec["stale"] = True
                    log(
                        f"[detail] WARNING: {fname} measured_round="
                        f"{sec['measured_round']} < current round "
                        f"{this_round} — re-measure it"
                    )
                detail[key] = sec
            except Exception:
                pass
    # The big detail blob goes to stderr + a separate stdout line ABOVE the
    # headline: round 2's final line embedded `detail` and overflowed the
    # driver's tail capture (BENCH_r02.json parsed=null). The FINAL stdout
    # line must stay compact and machine-parseable.
    log("[detail] " + json.dumps(detail))
    print(json.dumps({"detail": detail}))
    print(
        json.dumps(
            {
                "metric": "observation tokens/sec/chip, masked multimodal "
                "reconstruction train step (A-stack scale)",
                "value": round(tokens_per_s, 1),
                "unit": "tokens/s/chip",
                "vs_baseline": round(vs, 2) if vs is not None else None,
            }
        )
    )


if __name__ == "__main__":
    main()
