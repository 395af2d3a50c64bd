"""A-stack train-step batch-size sweep on the real chip.

The headline bench (bench.py) runs batch 256 — the same lesson that moved
the 1.53B flagship from 31% → 69.6% MFU (always bench at the largest
fitting batch, BENCH_FLAGSHIP.json train_batch_scaling) may apply here.
Chained-slope timing per CLAUDE.md; distinct pre-staged batches per leg.

Writes EXP_ASTACK_BATCH.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import bench as benchmod
    from deepearth_tpu.training import (
        LossWeights,
        create_optimizer,
        make_train_step,
    )
    from deepearth_tpu.training.trainer import TrainState

    results = []
    sizes = (
        tuple(int(a) for a in sys.argv[1:])
        if len(sys.argv) > 1
        else (256, 512, 1024, 2048)
    )
    for bs in sizes:
        cfg, model, batch = benchmod.build_astack(bs)
        params = model.init(jax.random.PRNGKey(1), batch)["params"]
        tx = create_optimizer(cfg.optimizer)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
        train_step = make_train_step(model, cfg, LossWeights(contrastive=0.0))
        step = jax.jit(train_step, donate_argnums=(0,))

        batches = []
        for i in range(24):
            k = jax.random.PRNGKey(100 + i)
            b = {
                "xyzt": jax.random.uniform(k, (bs, 4)),
                "modalities": {
                    "species": jax.random.randint(k, (bs,), 0, 232)
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

        try:
            state = chain(state, 1)
        except Exception as e:  # OOM at compile
            results.append({"batch": bs, "error": str(e)[:200]})
            print(f"[exp] B={bs}: {str(e)[:120]}", flush=True)
            continue

        t = {}
        for n in (8, 24):
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                state = chain(state, n)
                ts.append(time.perf_counter() - t0)
            t[n] = float(np.median(ts))
        step_s = max((t[24] - t[8]) / 16, 1e-4)
        r = {
            "batch": bs,
            "step_ms": round(step_s * 1000, 2),
            "obs_per_s": round(bs / step_s, 1),
        }
        results.append(r)
        print(f"[exp] {r}", flush=True)
        del state, batches, step

    out = {
        "what": "A-stack train step batch sweep, 2^19 tables, chained slope",
        "results": results,
    }
    with open(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "EXP_ASTACK_BATCH.json"), "w"
    ) as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
