"""Per-device parameter-byte attribution for the flagship multi-chip mesh.

Answers: where do the 7.83 GB/shard of train-state bytes live, and which
modules are REPLICATED (sharding spec covers no mesh axis) vs sharded?
Pure eval_shape — no init, no compile, runs in seconds.

Run: python tools/param_attribution.py
"""

from __future__ import annotations

import os
import sys
from collections import defaultdict

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8"
)


def main():
    import jax
    import numpy as np

    jax.config.update("jax_platforms", "cpu")

    from bench_flagship import build_model, make_batch
    from deepearth_tpu.parallel import create_mesh, make_param_shardings

    mesh = create_mesh(jax.devices()[:8])
    axis_sizes = dict(mesh.shape)
    cfg, model = build_model(
        moe_experts=8, moe_intermediate=2048, n_layers=24,
        second_moment="factored", encoder_remat=True, fusion_remat=True,
    )
    batch = jax.eval_shape(
        lambda k: make_batch(k, 16, 576, 16), jax.random.PRNGKey(0)
    )
    params = jax.eval_shape(
        lambda r, b: model.init(r, b)["params"], jax.random.PRNGKey(0), batch
    )
    fsdp = tuple(
        a for a in sys.argv[1:] if a in ("data", "expert", "model")
    )
    shardings = make_param_shardings(params, mesh, fsdp_axes=fsdp)

    flat_p = jax.tree_util.tree_leaves_with_path(params)
    flat_s = jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec")
    )
    assert len(flat_p) == len(flat_s)

    by_group = defaultdict(lambda: [0.0, 0.0])  # total_gb, per_dev_gb
    rows = []
    for (path, leaf), sh in zip(flat_p, flat_s):
        nbytes = float(np.prod(leaf.shape)) * leaf.dtype.itemsize
        spec = sh.spec
        shard_factor = 1
        for axis_entry in spec:
            if axis_entry is None:
                continue
            names = (
                axis_entry if isinstance(axis_entry, tuple) else (axis_entry,)
            )
            for nm in names:
                shard_factor *= axis_sizes.get(nm, 1)
        per_dev = nbytes / shard_factor
        keys = [getattr(k, "key", str(k)) for k in path]
        group = "/".join(keys[:2])
        by_group[group][0] += nbytes / 1e9
        by_group[group][1] += per_dev / 1e9
        rows.append((per_dev, nbytes, "/".join(keys), str(spec)))

    print(f"mesh: {axis_sizes}")
    tot = sum(v[0] for v in by_group.values())
    tot_dev = sum(v[1] for v in by_group.values())
    print(f"params total {tot:.3f} GB | per-device {tot_dev:.3f} GB "
          f"(ideal {tot / 8:.3f})\n")
    print("== by top-level module (total_gb, per_dev_gb, replication_x) ==")
    for g, (t, d) in sorted(by_group.items(), key=lambda kv: -kv[1][1]):
        repl = d / (t / 8) if t else 0
        print(f"{d:8.3f}  {t:8.3f}  {repl:5.1f}x  {g}")
    print("\n== top 25 per-device leaves ==")
    rows.sort(reverse=True)
    for per_dev, nbytes, name, spec in rows[:25]:
        print(f"{per_dev / 1e9:8.3f} GB/dev  (tot {nbytes / 1e9:7.3f})  "
              f"{name}  {spec}")


if __name__ == "__main__":
    main()
