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
    for e in t["traceEvents"]:
        if e.get("ph") != "X" or not str(pids.get(e["pid"], "")).startswith(
            "/device:"
        ):
            continue
        name = e.get("name", "?")
        dur_ms = e.get("dur", 0) / 1e3
        if name.startswith("jit_"):  # module-level envelope, not an op
            continue
        agg[name][0] += dur_ms
        agg[name][1] += 1
        total += dur_ms
    return total, agg


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(os.path.dirname(OUT), ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    sys.path.insert(0, os.path.join(os.path.dirname(OUT), "tools"))
    from bench_flagship import build_model, make_batch

    log(f"devices: {jax.devices()}")
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
        total, agg = parse_device_lane(td)

    rows = sorted(
        (
            {"op": k, "total_ms": round(v[0] / reps, 3), "calls": v[1] // reps,
             "share": round(v[0] / total, 4)}
            for k, v in agg.items()
        ),
        key=lambda r: -r["total_ms"],
    )
    result = {
        "what": "flagship 5.04B forward, batch 16, per-op device time "
                "(jax.profiler, averaged over 3 reps)",
        "device_total_ms_per_fwd": round(total / reps, 2),
        "top_ops": rows[:30],
        "n_distinct_ops": len(rows),
    }
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    log(f"wrote {OUT}: device total {result['device_total_ms_per_fwd']} ms/fwd")
    print(json.dumps({"device_total_ms_per_fwd": result["device_total_ms_per_fwd"],
                      "top5": rows[:5]}))


if __name__ == "__main__":
    main()
