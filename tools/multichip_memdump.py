"""Attribute the flagship multi-chip step's per-device temp bytes.

Compiles a (reduced or full) flagship train step on the virtual 8-device
mesh with --xla_dump_to, parses the buffer-assignment dump, and reports the
largest allocations grouped by what they hold (gradient accumulators, remat
temporaries, collective buffers, optimizer sweep, ...). This is the
diagnosis tool behind tools/multichip_flagship.py's fits gate: XLA's
memory_analysis() gives one temp_bytes total; this says WHERE it lives.

Run: python tools/multichip_memdump.py [--layers 6] [--batch 8] [--mb 2]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

DUMP = "/tmp/xla_memdump"


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--mb", type=int, default=2)
    ap.add_argument("--sv", type=int, default=576)
    ap.add_argument("--experts", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    os.makedirs(DUMP, exist_ok=True)
    for f in glob.glob(os.path.join(DUMP, "*")):
        os.remove(f)
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count=8 "
        "--xla_cpu_enable_concurrency_optimized_scheduler=false "
        f"--xla_dump_to={DUMP} --xla_dump_hlo_module_re=train_step"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

    from bench_flagship import build_model, make_batch
    from deepearth_tpu.parallel import (
        batch_sharding,
        create_mesh,
        make_param_shardings,
        replicated,
    )
    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    mesh = create_mesh(jax.devices()[:8])
    log(f"mesh: {dict(mesh.shape)}")
    cfg, model = build_model(
        moe_experts=args.experts, moe_intermediate=2048, n_layers=args.layers,
        second_moment="factored", encoder_remat=True, fusion_remat=True,
    )
    batch = jax.eval_shape(
        lambda k: make_batch(k, args.batch, args.sv, 16), jax.random.PRNGKey(0)
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

    step = jax.jit(
        make_train_step(
            model, cfg, LossWeights(contrastive=0.0),
            microbatch_steps=args.mb,
            grad_accum_shardings=state_sh.params,
        ),
        in_shardings=(state_sh, batch_sh, replicated(mesh)),
        out_shardings=(state_sh, None),
        donate_argnums=(0,),
    )
    t0 = time.time()
    with jax.set_mesh(mesh):
        compiled = step.lower(
            state_shape, batch, jax.ShapeDtypeStruct((2,), np.uint32)
        ).compile()
    log(f"compiled in {time.time()-t0:.1f}s")
    ma = compiled.memory_analysis()
    log(
        f"args {ma.argument_size_in_bytes/1e9:.2f} GB | "
        f"temps {ma.temp_size_in_bytes/1e9:.2f} GB | "
        f"peak {(ma.argument_size_in_bytes+ma.temp_size_in_bytes)/1e9:.2f} GB"
    )

    # ---- parse the buffer assignment dump --------------------------------- #
    ba_files = sorted(glob.glob(os.path.join(DUMP, "*buffer*assignment*")))
    if not ba_files:
        log("dump files present:", os.listdir(DUMP)[:20])
        raise SystemExit("no buffer-assignment dump found")
    ba = open(ba_files[-1]).read()

    # Format (XLA:CPU buffer-assignment.txt):
    #   allocation N: size S, <flags>:
    #    value: <id instr.name @0> (size=S,offset=O): bf16[...]{...}
    # The big "preallocated-temp" allocation packs thousands of logical
    # buffers by (offset, size) SLOT; values sharing a slot reuse it over
    # time. The static footprint attribution is per-slot: classify each
    # slot by its assigned instruction names and sum slot sizes per class.
    allocs = []
    cur = None
    val_re = re.compile(
        r"value: <\d+ (\S+) @\d+> \(size=(\d+),offset=(\d+)\)"
    )
    for line in ba.splitlines():
        m = re.match(r"allocation (\d+): size (\d+),(.*)", line)
        if m:
            cur = {
                "id": int(m.group(1)),
                "size": int(m.group(2)),
                "flags": m.group(3).strip(),
                "vals": [],  # (name, size, offset)
            }
            allocs.append(cur)
            continue
        if cur is not None:
            vm = val_re.search(line)
            if vm:
                cur["vals"].append(
                    (vm.group(1), int(vm.group(2)), int(vm.group(3)))
                )

    temps = [
        a for a in allocs
        if "parameter" not in a["flags"] and "constant" not in a["flags"]
    ]
    temps.sort(key=lambda a: -a["size"])
    total_temp = sum(a["size"] for a in temps)
    log(f"parsed {len(allocs)} allocations, temp-ish total "
        f"{total_temp/1e9:.2f} GB across {len(temps)}")

    def classify(names):
        joined = " ".join(names[:12])
        if "all-gather" in joined:
            return "all-gather (gathered FSDP weights)"
        if "all-to-all" in joined:
            return "all-to-all (EP dispatch)"
        if "collective-permute" in joined:
            return "collective-permute"
        if "all-reduce" in joined or "reduce-scatter" in joined:
            return "all-reduce / reduce-scatter"
        if "while" in joined:
            return "scan carry/body (grad accumulation)"
        if "convolution" in joined or "dot" in joined:
            return "matmul results"
        if "broadcast" in joined:
            return "broadcasts"
        if "fusion" in joined:
            return "fused elementwise/temp"
        if "copy" in joined:
            return "copies"
        return "other"

    by_cls = {}
    top_slots = []
    for a in temps:
        if not a["vals"]:
            e = by_cls.setdefault("unattributed", {"bytes": 0, "count": 0})
            e["bytes"] += a["size"]
            e["count"] += 1
            continue
        # group values into slots by offset
        slots = {}
        for name, size, offset in a["vals"]:
            s = slots.setdefault(offset, {"size": 0, "names": []})
            s["size"] = max(s["size"], size)
            s["names"].append(name)
        for offset, s in slots.items():
            c = classify(s["names"])
            e = by_cls.setdefault(c, {"bytes": 0, "count": 0})
            e["bytes"] += s["size"]
            e["count"] += 1
            top_slots.append(
                (s["size"], c, s["names"][0], len(s["names"]))
            )
    top_slots.sort(reverse=True)

    out = {
        "config": {
            "layers": args.layers, "batch": args.batch, "mb": args.mb,
            "sv": args.sv, "experts": args.experts,
        },
        "memory_analysis": {
            "argument_gb": round(ma.argument_size_in_bytes / 1e9, 3),
            "temp_gb": round(ma.temp_size_in_bytes / 1e9, 3),
        },
        "by_class_gb": {
            k: round(v["bytes"] / 1e9, 3)
            for k, v in sorted(by_cls.items(), key=lambda kv: -kv[1]["bytes"])
        },
        "top_slots": [
            {
                "size_mb": round(size / 1e6, 1),
                "class": cls,
                "first_value": name,
                "n_values_sharing_slot": n,
            }
            for size, cls, name, n in top_slots[: args.top]
        ],
    }
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
