"""Per-device memory evidence for the in-model pipeline (round-4 item 2;
round 5: runs the AS-CONFIGURED flagship stack, first_k_dense_replace=1).

Compiles the 5B flagship's 24-layer MoE simulator stack (hidden 2048,
8 experts × 2048, first_k_dense_replace=1 — the exact DeepSeekBlockConfig
the flagship uses, configs.py defaults) as a train-style fwd+bwd+update
step in three forms:

  * sequential (pipeline_stages=0) on ONE device;
  * pipelined (pipeline_stages=4) over a ('data'=2, 'pipe'=4) mesh: the
    non-uniform dense/MoE pattern pipelines via the sequential alignment
    prefix (models/deepseek.py _pipeline_split — 4 prefix layers replicated,
    20 uniform MoE layers stacked and sharded 1/4 by parallel/mesh.py's
    'stages' rule);
  * pipelined + FSDP storage sharding over ('data','pipe') — the prefix
    layers' (and every other replicated leaf's) storage ZeRO-3-shards over
    all 8 devices, the production composition;

and records per-device ``memory_analysis()`` for each: pipelining must cut
per-device argument bytes toward 1/P of the sequential stack (plus the
prefix, which FSDP then scatters), which is the point of PP — models whose
weights don't fit one chip. Loss equality of the programs at tiny scale is
pinned by tests/test_parallel_pp_sp.py and __graft_entry__.dryrun_multichip.

Writes MULTICHIP_PIPELINE.json. Run (CPU, no TPU needed):
    python tools/multichip_pipeline_memory.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

OUT = os.path.join(REPO, "MULTICHIP_PIPELINE.json")
N_DEV = 8


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={N_DEV}"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import jax.numpy as jnp
    import optax

    from deepearth_tpu.configs import DeepSeekBlockConfig, MLAConfig, MoEConfig
    from deepearth_tpu.models.deepseek import DeepSeekTransformer
    from deepearth_tpu.parallel import create_mesh, make_param_shardings

    # the flagship simulator (BENCH_FLAGSHIP forward config's fusion stack)
    base = DeepSeekBlockConfig(
        hidden_dim=2048,
        n_layers=24,
        intermediate_size=8192,
        mla=MLAConfig(
            hidden_dim=2048, n_heads=16, kv_lora_rank=512,
            qk_rope_head_dim=64, qk_nope_head_dim=96, v_head_dim=128,
        ),
        moe=MoEConfig(
            n_routed_experts=8, num_experts_per_tok=2,
            moe_intermediate_size=2048, hidden_dim=2048, n_shared_experts=1,
        ),
        first_k_dense_replace=1,  # the configs.py:254 default — round-5
        # _pipeline_split handles the non-uniform pattern via a prefix
    )
    B, N = 16, 22  # flagship fusion sequence (cls + st + 16 vision + 4 lang)
    x_shape = jax.ShapeDtypeStruct((B, N, 2048), jnp.bfloat16)
    tx = optax.sgd(1e-3)

    def make_step(cfg):
        model = DeepSeekTransformer(cfg, jnp.bfloat16, jnp.bfloat16)

        def step(params, opt, x):
            def loss(p):
                return (model.apply({"params": p}, x) ** 2).mean().astype(
                    jnp.float32
                )

            l, g = jax.value_and_grad(loss)(params)
            upd, opt = tx.update(g, opt)
            return optax.apply_updates(params, upd), opt, l

        return model, step

    N_PIPE = 4
    result = {"config": {
        "n_layers": 24, "hidden": 2048, "experts": 8,
        "moe_intermediate": 2048, "batch": B, "seq": N,
        "first_k_dense_replace": 1, "pipeline_stages": N_PIPE,
        "mesh": {"data": N_DEV // N_PIPE, "pipe": N_PIPE},
    }}

    legs = (
        ("sequential_1dev", 0, ()),
        ("pipelined_8dev", N_PIPE, ()),
        ("pipelined_fsdp_8dev", N_PIPE, ("data", "pipe")),
    )
    for tag, stages, fsdp_axes in legs:
        cfg = dataclasses.replace(
            base, pipeline_stages=stages,
            pipeline_microbatches=(16 if stages else 0),
        )
        model, step = make_step(cfg)
        t0 = time.time()
        params = jax.eval_shape(
            lambda k: model.init(k, jnp.zeros((B, N, 2048), jnp.bfloat16))[
                "params"
            ],
            jax.random.PRNGKey(0),
        )
        opt = jax.eval_shape(tx.init, params)
        n_bytes = sum(
            int(np.prod(l.shape)) * l.dtype.itemsize
            for l in jax.tree_util.tree_leaves(params)
        )
        if stages:
            mesh = create_mesh(
                jax.devices()[:N_DEV],
                mesh_shape=(N_DEV // N_PIPE, N_PIPE),
                axis_names=("data", "pipe"),
            )
            p_sh = make_param_shardings(params, mesh, fsdp_axes=fsdp_axes)
            o_sh = make_param_shardings(opt, mesh, fsdp_axes=fsdp_axes)
            from deepearth_tpu.parallel import batch_sharding

            jitted = jax.jit(
                step,
                in_shardings=(p_sh, o_sh, batch_sharding(mesh)),
                donate_argnums=(0, 1),
            )
            # per-shard param bytes from the actual shardings
            shard_bytes = 0
            for leaf, sh in zip(
                jax.tree_util.tree_leaves(params),
                jax.tree_util.tree_leaves(
                    p_sh, is_leaf=lambda s: hasattr(s, "shard_shape")
                ),
            ):
                ss = sh.shard_shape(leaf.shape)
                shard_bytes += int(np.prod(ss)) * leaf.dtype.itemsize
        else:
            jitted = jax.jit(step, donate_argnums=(0, 1))
            shard_bytes = n_bytes
        log(f"[{tag}] lowering + compiling...")
        compiled = jitted.lower(params, opt, x_shape).compile()
        ma = compiled.memory_analysis()
        result[tag] = {
            "params_total_gb": round(n_bytes / 1e9, 3),
            "params_per_device_gb": round(shard_bytes / 1e9, 3),
            "xla_per_device": {
                "argument_bytes": int(ma.argument_size_in_bytes),
                "temp_bytes": int(ma.temp_size_in_bytes),
                "peak_estimate_gb": round(
                    (ma.argument_size_in_bytes + ma.temp_size_in_bytes) / 1e9,
                    3,
                ),
            },
            "compile_s": round(time.time() - t0, 1),
        }
        log(f"[{tag}] {result[tag]}")

    seq = result["sequential_1dev"]["xla_per_device"]["argument_bytes"]
    pp = result["pipelined_8dev"]["xla_per_device"]["argument_bytes"]
    ppf = result["pipelined_fsdp_8dev"]["xla_per_device"]["argument_bytes"]
    result["argument_bytes_ratio"] = round(seq / max(pp, 1), 2)
    result["argument_bytes_ratio_fsdp"] = round(seq / max(ppf, 1), 2)
    from deepearth_tpu.utils.artifacts import round_stamp

    result.update(round_stamp())
    with open(OUT, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
