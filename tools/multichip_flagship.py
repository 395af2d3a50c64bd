"""Flagship-scale multi-chip evidence (VERDICT round-2 item 7).

Compiles (does NOT run) the full 5B-flagship train step against an
8-device virtual mesh (dp×ep×tp), then:

  1. computes per-shard parameter + optimizer-state memory from the actual
     NamedShardings (asserts it fits a 16 GB v5e chip with headroom),
  2. counts collective operations and bytes/step from the compiled,
     SPMD-partitioned HLO,
  3. records compiled flop count / arithmetic intensity.

This turns "multi-chip is how the 5B trains" from a toy-proxy claim
(dryrun_multichip's 64-dim model) into numbers at the real scale
(reference EP design: encoders/modeling_deepseek.py:485-608).

Writes MULTICHIP_FLAGSHIP.json.
Run: python tools/multichip_flagship.py   (CPU-only, no TPU needed)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(REPO, "MULTICHIP_FLAGSHIP.json")
N_DEVICES = 8
HBM_BYTES = 16e9  # v5e

_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "c64": 8, "s16": 2, "u16": 2,
}


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def _force_cpu(n: int) -> None:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        flags += f" --xla_force_host_platform_device_count={n}"
    # XLA:CPU's concurrency-optimized scheduler widens buffer live ranges to
    # overlap independent ops across host threads — a memory model a TPU core
    # (one kernel at a time, serial liveness) does not have. The serial
    # schedule is the honest analogue for a per-chip footprint gate.
    if "concurrency_optimized_scheduler" not in flags:
        flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
    os.environ["XLA_FLAGS"] = flags.strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


def hlo_collectives(hlo_text: str):
    """Histogram of collective ops with result bytes, from post-SPMD HLO."""
    ops = {}
    pat = re.compile(
        r"=\s*(\(?[a-z0-9\[\],{}: ]+\)?)\s*"
        r"(all-reduce|all-gather|all-to-all|reduce-scatter|"
        r"collective-permute)(-start)?\(",
    )
    shape_pat = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
    for m in pat.finditer(hlo_text):
        shapes, op = m.group(1), m.group(2)
        if m.group(3):  # -start (async): count once, skip the -done
            pass
        nbytes = 0
        for sm in shape_pat.finditer(shapes):
            dt, dims = sm.group(1), sm.group(2)
            n = 1
            for d in dims.split(","):
                if d.strip():
                    n *= int(d)
            nbytes += n * _DTYPE_BYTES.get(dt, 4)
        e = ops.setdefault(op, {"count": 0, "bytes": 0})
        e["count"] += 1
        e["bytes"] += nbytes
    return ops


def main():
    _force_cpu(N_DEVICES)
    import jax

    from bench_flagship import build_model, make_batch
    from deepearth_tpu.parallel import (
        batch_sharding,
        create_mesh,
        make_param_shardings,
        replicated,
    )
    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    devices = jax.devices()[:N_DEVICES]
    assert len(devices) == N_DEVICES
    mesh = create_mesh(devices)
    log(f"mesh: {dict(mesh.shape)}")

    # the 5B flagship (BENCH_FLAGSHIP forward config), trainable settings.
    # Remat is MANDATORY here: without it the compiled step's per-device
    # temp_bytes is 19.2 GB (round-3 artifact) — the sharded state fits but
    # the step as lowered would OOM a 16 GB chip. encoder_remat checkpoints
    # the per-modality encoder transformers, fusion remat the 24 MoE fusion
    # layers (same knobs the single-chip B>=64/96 train path uses,
    # tools/bench_flagship.py).
    remat_cfg = {"encoder_remat": True, "fusion_remat": True}
    cfg, model = build_model(
        moe_experts=8, moe_intermediate=2048, n_layers=24,
        second_moment="factored", **remat_cfg,
    )
    # In-step microbatching (lax.scan grad accumulation,
    # training/trainer.py make_train_step): activation/remat temporaries
    # scale with B/MICROBATCH_STEPS while the update still sees the
    # full-batch mean gradient. This is the remaining activation-memory
    # lever after remat: round-3's B=16 single-shot step lowered to
    # 17-19 GB of per-device temps.
    # Memory ladder (per-device peak from compiled memory_analysis):
    #   24.95 GB  dp/ep/tp rules only (round-3 config, B=16)
    #   15.61 GB  + FSDP storage sharding (state/shard 7.83 -> 2.70 GB)
    #   15.38 GB  + mb=8 (temps are NOT activation-dominated at B=16)
    # tools/multichip_memdump.py attribution of the residual temps: the
    # gathered FSDP weight set is hoisted live across the scan (~ the full
    # 3.9 GB compute layout) + batch-scaled fused/matmul temps. The weight
    # gather is layer-structure-bound (discrete layers -> loop-invariant
    # all-gathers); the batch-scaled half is the honest remaining knob.
    # mb=1: the grad-accum lax.scan makes every FSDP weight all-gather
    # loop-INVARIANT, so XLA hoists the whole 3.5 GB gathered set live
    # across the scan (memdump attribution). With no scan + block remat,
    # each layer's gather frees after its block and the backward re-gathers
    # inside the remat region.
    MICROBATCH_STEPS = 1
    # FSDP/ZeRO-3 storage sharding over the mesh axes the compute rules
    # leave idle for each param (parallel/mesh.py _fsdp_extend). Without it
    # the state is ~3.1x replicated (3.89 GB/dev params vs the 1.26 ideal)
    # and the grad/optimizer trees inherit the same replication — measured
    # via tools/param_attribution.py; that, not activations, was the bulk
    # of round-3's 17-19 GB of per-device temps.
    FSDP_AXES = ("data", "expert")
    B, SV, SL = 8, 576, 16
    batch = jax.eval_shape(
        lambda k: make_batch(k, B, SV, SL), jax.random.PRNGKey(0)
    )

    def make_state(rng, b):
        params = model.init(rng, b)["params"]
        return TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )

    t0 = time.time()
    # batch must be an eval_shape ARG (not a closure) so it traces abstract
    state_shape = jax.eval_shape(make_state, jax.random.PRNGKey(1), batch)
    log(f"abstract init: {time.time()-t0:.1f}s")

    state_sh = make_param_shardings(state_shape, mesh, fsdp_axes=FSDP_AXES)
    batch_sh = jax.tree_util.tree_map(lambda _: batch_sharding(mesh), batch)

    # ---- per-shard memory from the actual shardings ----------------------- #
    def shard_bytes(tree, shardings):
        total, per_shard = 0, 0
        for leaf, sh in zip(
            jax.tree_util.tree_leaves(tree),
            jax.tree_util.tree_leaves(
                shardings, is_leaf=lambda x: hasattr(x, "shard_shape")
            ),
        ):
            if not hasattr(leaf, "shape"):
                continue
            nb = int(np.prod(leaf.shape or (1,))) * leaf.dtype.itemsize
            total += nb
            ss = sh.shard_shape(leaf.shape) if leaf.shape else leaf.shape
            per_shard += int(np.prod(ss or (1,))) * leaf.dtype.itemsize
        return total, per_shard

    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(state_shape.params)
    )
    tot_params_b, shard_params_b = shard_bytes(
        state_shape.params,
        make_param_shardings(state_shape.params, mesh, fsdp_axes=FSDP_AXES),
    )
    tot_state_b, shard_state_b = shard_bytes(state_shape, state_sh)
    batch_b = sum(
        int(np.prod(l.shape)) * l.dtype.itemsize
        for l in jax.tree_util.tree_leaves(batch)
    )
    log(
        f"params {n_params/1e9:.2f}B | state total {tot_state_b/1e9:.2f} GB"
        f" | per-shard {shard_state_b/1e9:.2f} GB"
    )

    # ---- compile the SPMD train step -------------------------------------- #
    train_step = make_train_step(
        model, cfg, LossWeights(contrastive=0.0),
        microbatch_steps=MICROBATCH_STEPS,
        grad_accum_shardings=state_sh.params,
    )
    step = jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        # pin the returned state to the FSDP layout so grads reduce-scatter
        # into it instead of materializing at the compute replication
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    t0 = time.time()
    # ambient mesh context: activates the model's shard_hint constraints
    # (ops/sharding.py) so GSPMD pins the (E,S,F) MoE buffers and token
    # streams instead of inventing multi-GB reshards
    with jax.set_mesh(mesh):
        lowered = step.lower(
            state_shape, batch, jax.ShapeDtypeStruct((2,), np.uint32)
        )
    t_lower = time.time() - t0
    log(f"lowered in {t_lower:.1f}s; compiling (XLA:CPU, big graph)...")
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    log(f"compiled in {t_compile:.1f}s")

    hlo = compiled.as_text()
    coll = hlo_collectives(hlo)
    coll_bytes = sum(v["bytes"] for v in coll.values())

    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception as e:
        log(f"cost_analysis unavailable: {e}")

    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "output_bytes": int(ma.output_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_estimate_bytes": int(
                ma.argument_size_in_bytes + ma.temp_size_in_bytes
            ),
        }
    except Exception as e:
        log(f"memory_analysis unavailable: {e}")

    # The pass criterion is the COMPILED program's per-device footprint from
    # XLA's memory analysis (round-3 verdict item 1): arguments (the sharded
    # train state + batch — outputs alias them under donation) plus all
    # temporaries must fit a 16 GB v5e with 10% headroom. State-only checks
    # are necessary but not sufficient.
    peak_b = mem.get("peak_estimate_bytes")
    fits_state = (
        shard_state_b + batch_b / mesh.shape["data"] < 0.8 * HBM_BYTES
    )
    fits = fits_state and peak_b is not None and peak_b < 0.9 * HBM_BYTES
    result = {
        "mesh": dict(mesh.shape),
        "config": {
            "n_params_b": round(n_params / 1e9, 3),
            "n_layers": 24, "experts": 8, "universal_dim": 2048,
            "batch": B, "s_vision": SV, "s_language": SL,
            "second_moment": "factored", "moment_dtype": "bfloat16",
            "remat": remat_cfg,
            "microbatch_steps": MICROBATCH_STEPS,
            "fsdp_axes": list(FSDP_AXES),
        },
        "memory": {
            "state_total_gb": round(tot_state_b / 1e9, 3),
            "state_per_shard_gb": round(shard_state_b / 1e9, 3),
            "params_total_gb": round(tot_params_b / 1e9, 3),
            "params_per_shard_gb": round(shard_params_b / 1e9, 3),
            "batch_per_shard_mb": round(
                batch_b / mesh.shape["data"] / 1e6, 1
            ),
            "fits_16gb_chip": bool(fits),
            "fits_criterion": "argument_bytes + temp_bytes < 0.9 * 16e9 "
                              "(per-device, compiled memory_analysis) AND "
                              "sharded state < 0.8 * 16e9",
            "xla_memory_analysis_per_device": mem,
        },
        "collectives_per_step": {
            **coll,
            "total_bytes": coll_bytes,
            "total_mb": round(coll_bytes / 1e6, 1),
        },
        "hlo_flops": flops,
        "compile_s": round(t_compile, 1),
        "lower_s": round(t_lower, 1),
    }
    from deepearth_tpu.utils.artifacts import round_stamp

    result.update(round_stamp())
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    assert fits, (
        f"compiled step does not fit a 16 GB chip: per-device peak "
        f"{(peak_b or 0)/1e9:.2f} GB (state/shard {shard_state_b/1e9:.2f} GB)"
    )


if __name__ == "__main__":
    main()
