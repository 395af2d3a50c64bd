"""Capture a real jax.profiler device trace of the flagship forward.

Round-1 verdict flagged that no profiler trace was ever captured (the
component breakdown used subtraction timing). This tool runs the 5B
flagship forward under ``jax.profiler.trace``, parses the Chrome-trace
export's ``/device:TPU:0`` lane, and writes PROFILE_FLAGSHIP.json with
total device time and the top fusions/ops by accumulated duration — the
ground-truth complement to BENCH_FLAGSHIP.json's wall-clock numbers.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/profile_flagship.py
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "PROFILE_FLAGSHIP.json",
)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def parse_device_lane(trace_dir: str):
    """Aggregate /device:TPU:0 complete events by name."""
    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    with gzip.open(paths[-1]) as f:
        t = json.load(f)
    pids = {
        e["pid"]: e["args"].get("name")
        for e in t["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    agg = collections.defaultdict(lambda: [0.0, 0])
    total = 0.0
    t_min, t_max = float("inf"), 0.0
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or not str(pids.get(e["pid"], "")).startswith(
            "/device:"
        ):
            continue
        name = e.get("name", "?")
        dur_ms = e.get("dur", 0) / 1e3
        ts = e.get("ts", 0) / 1e3
        t_min = min(t_min, ts)
        t_max = max(t_max, ts + dur_ms)
        # skip computation ENVELOPES, which contain the leaf ops and would
        # double-count: the jit module frame and the numeric-named
        # while/scan/remat body frames
        if name.startswith("jit_") or name.replace(".", "").isdigit():
            continue
        agg[name][0] += dur_ms
        agg[name][1] += 1
        total += dur_ms
    # busy-sum can EXCEED wall when DMA queues overlap compute (gather-heavy
    # programs) — report the device-lane span too so both are visible
    span = (t_max - t_min) if t_max > 0 else 0.0
    return total, span, agg


def profile_forward(jax):
    from bench_flagship import build_model, make_batch

    B, SV, SL = 16, 4608, 16
    cfg, model = build_model()
    batch = make_batch(jax.random.PRNGKey(0), B, SV, SL)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    fwd = jax.jit(
        lambda p, b: model.apply({"params": p}, b)["fused_representation"].sum()
    )
    float(np.asarray(fwd(params, batch)))  # compile + warm

    reps = 3
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                float(np.asarray(fwd(params, batch)))
        total, span, agg = parse_device_lane(td)
    return "flagship 5.04B forward, batch 16", reps, total, span, agg


def profile_train(jax):
    """1.53B train step at batch 8 — the fixed-cost decomposition's ground
    truth: optimizer/elementwise fusions over the 12 GB state should show
    a large batch-independent share."""
    from bench_flagship import build_model, make_batch
    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    B, SV, SL = 8, 576, 16
    cfg, model = build_model(moe_experts=4, moe_intermediate=1024, n_layers=10)
    batch = make_batch(jax.random.PRNGKey(0), B, SV, SL)
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params, tx=create_optimizer(cfg.optimizer)
    )
    del params
    step = jax.jit(
        make_train_step(model, cfg, LossWeights(contrastive=0.0)),
        donate_argnums=(0,),
    )

    def run(s):
        out = step(s, batch, jax.random.PRNGKey(0))
        float(np.asarray(out[1]["loss/total"]))
        return out[0]

    state = run(state)  # compile + warm
    reps = 3
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                state = run(state)
        total, span, agg = parse_device_lane(td)
    return "1.53B train step, batch 8", reps, total, span, agg


def profile_astack(jax):
    """The driver bench's A-stack train step (batch 256, 2^19 tables):
    validates the 'gather-bound' claim for the hash-encoder path."""
    from bench import build_astack
    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    cfg, model, batch = build_astack()
    params = model.init(jax.random.PRNGKey(1), batch)["params"]
    state = TrainState.create(
        apply_fn=model.apply, params=params,
        tx=create_optimizer(cfg.optimizer),
    )
    step = jax.jit(make_train_step(model, cfg, LossWeights(contrastive=0.0)))

    def run(s):
        out = step(s, batch, jax.random.PRNGKey(0))
        float(np.asarray(out[1]["loss/total"]))
        return out[0]

    state = run(state)
    reps = 4
    with tempfile.TemporaryDirectory() as td:
        with jax.profiler.trace(td):
            for _ in range(reps):
                state = run(state)
        total, span, agg = parse_device_lane(td)
    return "A-stack train step, batch 256, 2^19 tables", reps, total, span, agg


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(os.path.dirname(OUT), ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, os.path.join(os.path.dirname(OUT), "tools"))
    sys.path.insert(0, os.path.dirname(OUT))  # repo root for bench.py

    log(f"devices: {jax.devices()}")
    which = sys.argv[1] if len(sys.argv) > 1 else "forward"
    fns = {"forward": profile_forward, "train": profile_train,
           "astack": profile_astack}
    what, reps, total, span, agg = fns[which](jax)

    rows = sorted(
        (
            {"op": k, "total_ms": round(v[0] / reps, 3), "calls": v[1] // reps,
             "share": round(v[0] / total, 4)}
            for k, v in agg.items()
        ),
        key=lambda r: -r["total_ms"],
    )
    result = {
        "what": f"{what}, per-op device time (jax.profiler, avg of {reps})",
        "device_total_ms": round(total / reps, 2),
        "device_span_ms": round(span / reps, 2),
        "top_ops": rows[:30],
        "n_distinct_ops": len(rows),
    }
    suffix = {"forward": "PROFILE_FLAGSHIP", "train": "PROFILE_TRAIN",
              "astack": "PROFILE_ASTACK"}[which]
    out_path = OUT.replace("PROFILE_FLAGSHIP", suffix)
    # keep the forward artifact's historical field name
    if which == "forward":
        result["device_total_ms_per_fwd"] = result["device_total_ms"]
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    log(f"wrote {out_path}: device total {result['device_total_ms']} ms")
    print(json.dumps({"device_total_ms": result["device_total_ms"],
                      "top5": rows[:5]}))


if __name__ == "__main__":
    main()
