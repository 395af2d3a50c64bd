"""Project the 8-chip flagship train-step time from compiled SPMD HLO
(VERDICT round-4 item 3).

MULTICHIP_FLAGSHIP.json proved the 5B step FITS (10.36 GB/device peak) but
said nothing about speed: 20.7 GB/step of collectives against ~1.35 TF/device
of math at B=8 is almost certainly ICI-bound. Single real chips can't run the
8-chip program, so this tool does the honest single-chip-era equivalent of
the reference's measured distributed loop (reference:
hpc/train_distrbuted.py:216-358, hpc/slurm_train.sh): a roofline projection
from the ACTUAL compiled, SPMD-partitioned HLO per batch point —

  per-device step time >= max( math_flops/device / 197 TF/s,
                               ICI wire-bytes / ring bandwidth )

For every (batch, microbatch) point it compiles the full 5B train step
against the virtual 8-device (data 2, expert 2, model 2) mesh with
FSDP/ZeRO-3 storage sharding (exactly the MULTICHIP_FLAGSHIP.json config),
then extracts per-collective wire bytes (result bytes x the standard ring
factor for the op's replica-group size parsed from the HLO), per-device
executed flops (XLA cost analysis of the per-device module), and the
per-device memory-analysis peak for the 14.4 GB criterion.

ICI model (v5e, scaling-book numbers): 45 GB/s one-way per link, 2 links
per torus axis -> 90 GB/s bidirectional ring bandwidth per chip per mesh
axis. Wire bytes per device: all-gather R(n-1)/n, reduce-scatter R(n-1)
(R = scattered result), all-reduce 2R(n-1)/n, all-to-all R(n-1)/n,
collective-permute R (one hop). Two bounds are reported: `overlapped`
(max(math, ici) — perfect compute/comm overlap) and `serial` (math + ici).

Flop-count calibration: XLA:CPU and XLA:TPU count flops over differently
fused HLO. `--calibrate` compiles the 1.53B single-chip train step (the
exact BENCH_FLAGSHIP train_batch_scaling B=8 config) on XLA:CPU and compares
its cost analysis to the TPU-measured 4.849e12 executed flops; the ratio
scales every projected math time.

Writes MULTICHIP_PROJECTION.json and folds a `projected_step` block +
chosen `operating_point` into MULTICHIP_FLAGSHIP.json (v2).

Run (CPU-only, big compiles — hours on this 1-core box):
  python tools/multichip_projection.py [--points 16:2,32:4,64:8] [--calibrate]
Resume: already-measured points in MULTICHIP_PROJECTION.json are skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

OUT = os.path.join(REPO, "MULTICHIP_PROJECTION.json")
FLAGSHIP = os.path.join(REPO, "MULTICHIP_FLAGSHIP.json")
N_DEVICES = 8
HBM_BYTES = 16e9
MEM_CRITERION = 0.9 * HBM_BYTES  # 14.4 GB (the gate's criterion)
PEAK_FLOPS = 197e12  # v5e bf16
# v5e ICI: 45 GB/s one-way per link (scaling book), 2 links per torus axis
# -> 90 GB/s bidirectional ring bandwidth per chip on each mesh axis.
ICI_RING_BW = 2 * 45e9
# TPU-measured executed flops of the 1.53B single-chip train step at B=8
# (BENCH_FLAGSHIP.json train_batch_scaling["8"].hlo_flops) — the --calibrate
# anchor for the XLA:CPU flop counter.
CALIB_TPU_FLOPS = 4.849063165952e12

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
    # serial liveness = the honest per-chip footprint (CLAUDE.md)
    if "concurrency_optimized_scheduler" not in flags:
        flags += " --xla_cpu_enable_concurrency_optimized_scheduler=false"
    os.environ["XLA_FLAGS"] = flags.strip()
    import jax

    jax.config.update("jax_platforms", "cpu")


_GROUPS_BRACE = re.compile(r"replica_groups=\{\{([0-9, ]+)\}")
_GROUPS_IOTA = re.compile(r"replica_groups=\[(\d+),(\d+)\]")


def _group_size(line: str) -> int:
    """Replica-group size of a collective from its HLO text line."""
    m = _GROUPS_IOTA.search(line)
    if m:  # [n_groups, group_size]<=[...]
        return int(m.group(2))
    m = _GROUPS_BRACE.search(line)
    if m:
        return len(m.group(1).split(","))
    return N_DEVICES  # conservative: whole slice


_COLL = re.compile(
    r"=\s*(\(?[a-z0-9\[\],{}: ]+\)?)\s*"
    r"(all-reduce|all-gather|all-to-all|reduce-scatter|collective-permute)"
    r"(-start)?\((.*)"
)
_SHAPE = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")


def collective_wire_bytes(hlo_text: str):
    """Per-op-type {count, result_bytes, wire_bytes, max(group)} from
    post-SPMD HLO. Result shapes in the partitioned module are per-device;
    wire bytes apply the standard ring-algorithm factor per op type."""
    ops = {}
    for raw in hlo_text.splitlines():
        m = _COLL.search(raw)
        if not m:
            continue
        shapes, op = m.group(1), m.group(2)
        n = _group_size(raw)
        rb = 0
        for sm in _SHAPE.finditer(shapes):
            dt, dims = sm.group(1), sm.group(2)
            cnt = 1
            for d in dims.split(","):
                if d.strip():
                    cnt *= int(d)
            rb += cnt * _DTYPE_BYTES.get(dt, 4)
        if op == "all-gather":
            wire = rb * (n - 1) / n
        elif op == "reduce-scatter":
            wire = rb * (n - 1)
        elif op == "all-reduce":
            wire = 2 * rb * (n - 1) / n
        elif op == "all-to-all":
            wire = rb * (n - 1) / n
        else:  # collective-permute: one hop
            wire = rb
        e = ops.setdefault(
            op, {"count": 0, "bytes": 0, "wire_bytes": 0, "group": n}
        )
        e["count"] += 1
        e["bytes"] += rb
        e["wire_bytes"] += int(wire)
        e["group"] = max(e["group"], n)
    return ops


def compile_point(B, mb, mesh, model, cfg):
    """Compile the SPMD train step at (batch B, microbatch mb); return the
    measured block (collectives, flops/device, memory, compile_s)."""
    import jax

    from bench_flagship import make_batch
    from deepearth_tpu.parallel import (
        batch_sharding,
        make_param_shardings,
        replicated,
    )
    from deepearth_tpu.training import (
        LossWeights,
        create_optimizer,
        make_train_step,
    )
    from deepearth_tpu.training.trainer import TrainState

    SV, SL = 576, 16
    batch = jax.eval_shape(
        lambda k: make_batch(k, B, SV, SL), jax.random.PRNGKey(0)
    )

    def make_state(rng, b):
        params = model.init(rng, b)["params"]
        return TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )

    state_shape = jax.eval_shape(make_state, jax.random.PRNGKey(1), batch)
    state_sh = make_param_shardings(
        state_shape, mesh, fsdp_axes=("data", "expert")
    )
    batch_sh = jax.tree_util.tree_map(lambda _: batch_sharding(mesh), batch)
    train_step = make_train_step(
        model, cfg, LossWeights(contrastive=0.0),
        microbatch_steps=mb, grad_accum_shardings=state_sh.params,
    )
    step = jax.jit(
        train_step,
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    t0 = time.time()
    with jax.set_mesh(mesh):
        lowered = step.lower(
            state_shape, batch, jax.ShapeDtypeStruct((2,), np.uint32)
        )
    log(f"  [B={B} mb={mb}] lowered in {time.time()-t0:.0f}s; compiling...")
    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0
    log(f"  [B={B} mb={mb}] compiled in {t_compile:.0f}s")

    coll = collective_wire_bytes(compiled.as_text())
    flops = None
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        # cost analysis runs on the per-device partitioned module
        flops = float(ca.get("flops", float("nan")))
    except Exception as e:
        log(f"  cost_analysis unavailable: {e}")
    mem = {}
    try:
        ma = compiled.memory_analysis()
        mem = {
            "argument_bytes": int(ma.argument_size_in_bytes),
            "temp_bytes": int(ma.temp_size_in_bytes),
            "peak_estimate_bytes": int(
                ma.argument_size_in_bytes + ma.temp_size_in_bytes
            ),
        }
    except Exception as e:
        log(f"  memory_analysis unavailable: {e}")
    return {
        "batch": B,
        "microbatch_steps": mb,
        "collectives": coll,
        "flops_per_device": flops,
        "memory_per_device": mem,
        "compile_s": round(t_compile, 1),
    }


def calibrate_cpu_flops():
    """XLA:CPU executed flops of the EXACT single-chip 1.53B B=8 train step
    that BENCH_FLAGSHIP measured on TPU (train_batch_scaling['8']) — the
    counter-discrepancy ratio scales projected math times."""
    import jax

    from bench_flagship import build_model, make_batch
    from deepearth_tpu.training import (
        LossWeights,
        create_optimizer,
        make_train_step,
    )
    from deepearth_tpu.training.trainer import TrainState

    cfg, model = build_model(
        moe_experts=4, moe_intermediate=1024, n_layers=10,
    )
    B = 8
    batch = jax.eval_shape(
        lambda k: make_batch(k, B, 576, 16), jax.random.PRNGKey(0)
    )

    def make_state(rng, b):
        params = model.init(rng, b)["params"]
        return TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )

    state_shape = jax.eval_shape(make_state, jax.random.PRNGKey(1), batch)
    n_params = sum(
        int(np.prod(l.shape))
        for l in jax.tree_util.tree_leaves(state_shape.params)
    )
    step = jax.jit(make_train_step(model, cfg, LossWeights(contrastive=0.0)))
    t0 = time.time()
    compiled = step.lower(
        state_shape, batch, jax.ShapeDtypeStruct((2,), np.uint32)
    ).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    cpu_flops = float(ca.get("flops", float("nan")))
    log(
        f"  calibration: {n_params/1e9:.3f}B params, CPU flops "
        f"{cpu_flops:.3e} vs TPU {CALIB_TPU_FLOPS:.3e} "
        f"[{time.time()-t0:.0f}s]"
    )
    return {
        "n_params_b": round(n_params / 1e9, 3),
        "cpu_flops": cpu_flops,
        "tpu_flops": CALIB_TPU_FLOPS,
        "tpu_over_cpu": CALIB_TPU_FLOPS / cpu_flops if cpu_flops else None,
    }


def project(points, calib_ratio):
    """Roofline projection per measured point + the operating-point pick.

    XLA cost analysis and the HLO text both show a ``lax.scan`` body ONCE,
    but a microbatched step executes it microbatch_steps times — so raw
    flops AND in-scan collective bytes at mb>1 are per-MICROBATCH numbers
    (verified: all four points report near-identical raw totals because the
    per-microbatch batch is 8 at every point). Per-step outputs here scale
    both by mb; fractions and the bound are mb-invariant. The optimizer
    update (outside the scan, no collectives on this config beyond the
    in-scan grad reduce-scatters) is the approximation error, <1% of step.
    """
    # The B-independent floor of all-gather wire bytes across the RAW
    # per-microbatch bodies is the FSDP weight-gather component
    # (activation gathers scale with the per-microbatch batch).
    ag_floor = min(
        p["collectives"].get("all-gather", {}).get("wire_bytes", 0)
        for p in points
    )
    out = {}
    for p in points:
        B, mb = p["batch"], p["microbatch_steps"]
        flops_dev = (p["flops_per_device"] or 0.0) * calib_ratio * mb
        t_math = flops_dev / PEAK_FLOPS
        t_ici = mb * sum(
            v["wire_bytes"] / ICI_RING_BW for v in p["collectives"].values()
        )
        t_ag = (
            mb * p["collectives"].get("all-gather", {}).get("wire_bytes", 0)
            / ICI_RING_BW
        )
        t_ag_fsdp = mb * ag_floor / ICI_RING_BW
        t_over = max(t_math, t_ici)
        t_serial = t_math + t_ici
        peak = p["memory_per_device"].get("peak_estimate_bytes")
        out[f"{B}"] = {
            "batch": B,
            "microbatch_steps": mb,
            "flops_per_device_calibrated": flops_dev,
            "math_s": round(t_math, 4),
            "ici_s": round(t_ici, 4),
            "ici_wire_gb": round(
                mb
                * sum(v["wire_bytes"] for v in p["collectives"].values())
                / 1e9,
                2,
            ),
            "projected_step_s_overlapped": round(t_over, 4),
            "projected_step_s_serial": round(t_serial, 4),
            "projected_mfu_overlapped": round(t_math / t_over, 4),
            "projected_mfu_serial": round(t_math / t_serial, 4),
            "allgather_fraction_of_step": round(t_ag / t_over, 4),
            "fsdp_allgather_fraction_of_step": round(t_ag_fsdp / t_over, 4),
            "bound": "ici" if t_ici > t_math else "compute",
            "memory_peak_gb": round((peak or 0) / 1e9, 2) if peak else None,
            "fits_14p4_gb": bool(peak and peak < MEM_CRITERION),
            "scan_body_scaling": mb,
        }
    return out


def extrapolate(points, proj, calib_ratio):
    """Analytic answer to "where does the 5B train turn compute-bound?"

    Every constant below is a measured artifact field; the only model is
    linear scaling of math and activation-collective bytes in the
    per-microbatch batch size (both are per-token quantities).
    """
    # decompose the measured B=8/mb=1 body (counted exactly — no scan)
    base = next(p for p in points if p["microbatch_steps"] == 1)
    b0 = base["batch"]
    ag_floor = min(
        p["collectives"].get("all-gather", {}).get("wire_bytes", 0)
        for p in points
    )
    wire0 = sum(v["wire_bytes"] for v in base["collectives"].values())
    t_math0 = base["flops_per_device"] * calib_ratio / PEAK_FLOPS
    t_wg = ag_floor / ICI_RING_BW          # FSDP weight gathers, B-invariant
    t_act0 = (wire0 - ag_floor) / ICI_RING_BW  # scales with microbatch B
    # current mesh (dp2,ep2,tp2 + ring attention): math > ici requires
    # (t_math0 - t_act0) * B/b0 > t_wg — impossible when activation
    # collectives alone exceed math.
    current_mesh = {
        "math_ms_at_B8": round(t_math0 * 1e3, 1),
        "fsdp_weight_gather_ms": round(t_wg * 1e3, 1),
        "activation_collectives_ms_at_B8": round(t_act0 * 1e3, 1),
        "compute_bound_batch": None if t_act0 >= t_math0 else int(
            np.ceil(b0 * t_wg / (t_math0 - t_act0))
        ),
        "verdict": (
            "structurally ICI-bound: activation collectives (EP "
            "all-to-alls, TP/ring permutes, activation gathers) are "
            f"{t_act0 / t_math0:.0f}x the math at ANY batch — both scale "
            "linearly with tokens, so batch amortizes only the weight "
            "gathers. Fixing this mesh means removing the per-token "
            "collectives, not growing the batch."
        ) if t_act0 >= t_math0 else "compute-bound at the stated batch",
    }
    # pure FSDP-DP alternative (the repo's single-chip compute path, which
    # needs NO per-token collectives: dense_all MoE, full-chip attention):
    # per-step wire = 2x param gather (fwd+bwd) + 1x grad reduce-scatter,
    # each (n-1)/n ring-scaled; math unchanged.
    n = N_DEVICES
    # params from the measured artifact (MULTICHIP_FLAGSHIP.json memory
    # block) — inverting ring factors from ag_floor is ambiguous because
    # the partitioner picks different group sizes per point
    param_bytes = 10.109e9
    if os.path.exists(FLAGSHIP):
        with open(FLAGSHIP) as f:
            _fl = json.load(f)
        param_bytes = (
            _fl.get("memory", {}).get("params_total_gb", 10.109) * 1e9
        )
    wire_dp = 3.0 * param_bytes * (n - 1.0) / n
    t_dp_ici = wire_dp / ICI_RING_BW
    per_obs_math = t_math0 / b0
    b_cross = int(np.ceil(t_dp_ici / per_obs_math))
    b_amort20 = int(np.ceil(4.0 * t_dp_ici / per_obs_math))
    return {
        "model": "t_math scales with per-microbatch batch; FSDP weight "
                 "gathers are batch-invariant; activation collectives "
                 "scale with per-microbatch batch",
        "current_mesh": current_mesh,
        "pure_fsdp_dp_mesh": {
            "assumes": "dp=8 + ZeRO-3 only — no EP/TP/SP, dense_all MoE "
                       "(measured fastest at E=4 single-chip), so zero "
                       "per-token collectives; wire/step = 2x param "
                       "all-gather + 1x grad reduce-scatter",
            "param_bytes_gb": round(param_bytes / 1e9, 2),
            "ici_ms_per_step": round(t_dp_ici * 1e3, 1),
            "compute_bound_global_batch": b_cross,
            "global_batch_for_ici_under_20pct": b_amort20,
            "per_device_microbatch_at_crossover": round(b_cross / n, 1),
            "caveat": "activation memory at this per-device batch needs "
                      "remat ('dots' policy) — validated single-chip at "
                      "B=32/device (BENCH_FLAGSHIP train_batch_scaling); "
                      "grad accumulation does NOT help here: weight "
                      "gathers repeat per microbatch",
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", default="16:2,32:4,64:8",
                    help="batch:microbatch list to compile (8:1 reused from "
                         "MULTICHIP_FLAGSHIP.json round-4 measurement)")
    ap.add_argument("--calibrate", action="store_true",
                    help="also compile the 1.53B single-chip calibration step")
    ap.add_argument("--project-only", action="store_true",
                    help="skip compiles; re-project from saved points")
    args = ap.parse_args()

    _force_cpu(N_DEVICES)
    import jax

    result = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            result = json.load(f)
    pts = result.setdefault("points", {})

    # Fold in the round-4 B=8 measurement (same config, same extractor
    # lineage) if this tool hasn't re-measured it.
    if "8" not in pts and os.path.exists(FLAGSHIP):
        with open(FLAGSHIP) as f:
            fl = json.load(f)
        coll4 = {
            k: v
            for k, v in fl.get("collectives_per_step", {}).items()
            if isinstance(v, dict)
        }
        # round-4 artifact lacks wire bytes/groups: apply the ring factors
        # with the conservative full-slice group size
        for op, v in coll4.items():
            n = N_DEVICES
            rb = v["bytes"]
            wire = {
                "all-gather": rb * (n - 1) / n,
                "reduce-scatter": rb * (n - 1),
                "all-reduce": 2 * rb * (n - 1) / n,
                "all-to-all": rb * (n - 1) / n,
                "collective-permute": rb,
            }[op]
            v["wire_bytes"] = int(wire)
            v["group"] = n
        pts["8"] = {
            "batch": 8,
            "microbatch_steps": 1,
            "collectives": coll4,
            "flops_per_device": fl.get("hlo_flops"),
            "memory_per_device": fl.get("memory", {}).get(
                "xla_memory_analysis_per_device", {}
            ),
            "compile_s": fl.get("compile_s"),
            "source": "MULTICHIP_FLAGSHIP.json round-4 measurement "
                      "(ring factors applied at full-slice group size)",
        }

    if not args.project_only:
        if args.calibrate and "calibration" not in result:
            log("calibrating the CPU flop counter (1.53B single-chip)...")
            result["calibration"] = calibrate_cpu_flops()
            with open(OUT, "w") as f:
                json.dump(result, f, indent=2)

        from bench_flagship import build_model
        from deepearth_tpu.parallel import create_mesh

        devices = jax.devices()[:N_DEVICES]
        mesh = create_mesh(devices)
        cfg, model = build_model(
            moe_experts=8, moe_intermediate=2048, n_layers=24,
            second_moment="factored", encoder_remat=True, fusion_remat=True,
        )
        for spec in args.points.split(","):
            B, mb = map(int, spec.split(":"))
            if str(B) in pts:
                log(f"point B={B} already measured; skipping")
                continue
            log(f"compiling point B={B} mb={mb} ...")
            pts[str(B)] = compile_point(B, mb, mesh, model, cfg)
            with open(OUT, "w") as f:
                json.dump(result, f, indent=2)

    calib = (result.get("calibration") or {}).get("tpu_over_cpu") or 1.0
    ordered = sorted(pts.values(), key=lambda p: p["batch"])
    proj = project(ordered, calib)
    result["ici_model"] = {
        "peak_flops_per_chip": PEAK_FLOPS,
        "ici_ring_bw_bytes_per_s": ICI_RING_BW,
        "assumptions": "v5e 45 GB/s one-way per ICI link x2 links per torus "
                       "axis; ring algorithms; per-axis collectives get the "
                       "full axis bandwidth; overlapped bound assumes "
                       "perfect compute/comm overlap",
        "flops_calibration_tpu_over_cpu": calib,
    }
    result["projected_step"] = proj
    result["extrapolation"] = extrapolate(ordered, proj, calib)
    # operating point: smallest batch that fits 14.4 GB with FSDP
    # all-gathers amortized below 20% of the overlapped step
    op_pt = None
    for b in sorted(proj, key=int):
        e = proj[b]
        if e["fits_14p4_gb"] and e["fsdp_allgather_fraction_of_step"] < 0.20:
            op_pt = e
            break
    best = max(proj.values(), key=lambda e: e["projected_mfu_overlapped"])
    result["operating_point"] = {
        "chosen": op_pt or best,
        "criterion": "smallest batch with memory_peak < 14.4 GB and FSDP "
                     "all-gather fraction < 20% of the overlapped step"
                     + ("" if op_pt else
                        " — NO measured point satisfies both; reporting the "
                        "highest projected-MFU point instead"),
    }
    from deepearth_tpu.utils.artifacts import round_stamp

    result.update(round_stamp())
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)

    # fold into MULTICHIP_FLAGSHIP.json (v2)
    if os.path.exists(FLAGSHIP):
        with open(FLAGSHIP) as f:
            fl = json.load(f)
        fl["projected_step"] = proj
        fl["ici_model"] = result["ici_model"]
        fl["extrapolation"] = result["extrapolation"]
        fl["operating_point"] = result["operating_point"]
        fl["projection_tool"] = "tools/multichip_projection.py"
        with open(FLAGSHIP, "w") as f:
            json.dump(fl, f, indent=2)
    print(json.dumps({"projected_step": proj,
                      "operating_point": result["operating_point"]}))


if __name__ == "__main__":
    main()
