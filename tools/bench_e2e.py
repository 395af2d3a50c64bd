"""Sustained end-to-end (data + device) training benchmark
(VERDICT round-1 item 2).

Pipeline under test — exactly the production path:
  mmap store (fp16, FULL 8×24×24×1408 rows) → threaded_producer (C threaded
  gather + collate) → device_prefetch (async H2D, double-buffered) →
  jit train step (species + full-grid vision via universal-token encoder +
  7168-d language).

Reports end-to-end obs/s vs device-only obs/s (same model, pre-staged
batch), plus the host-side breakdown: store gather / collate / H2D. The
reference treated the data path as a first-class benchmark
(reference: training/README.md:24,76,125, dashboard/mmap_embedding_loader.py:6).

Writes BENCH_E2E.json at the repo root.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_e2e.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_E2E.json"
)
N_ROWS = 192  # store rows; 192 × 12.4 MB ≈ 2.4 GB on disk
BATCH = 16
STEPS = 12
VISION_SHAPE = (8, 24, 24, 1408)  # full V-JEPA2 grid (dataset_config.json)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_store(td: str):
    from deepearth_tpu.data import convert_arrays_to_store

    rng = np.random.default_rng(0)
    ids = np.arange(1000, 1000 + N_ROWS)
    path = os.path.join(td, "vision")
    chunk = rng.standard_normal((N_ROWS,) + VISION_SHAPE).astype(np.float16)
    t0 = time.perf_counter()
    loader = convert_arrays_to_store(path, ids, chunk, dtype="float16")
    log(f"[store] built {N_ROWS} rows in {time.perf_counter()-t0:.1f}s "
        f"({chunk.nbytes/1e9:.1f} GB)")
    return loader, ids


def build_model():
    import jax.numpy as jnp

    from deepearth_tpu.configs import (
        DeepEarthConfig, Grid4DConfig, ModalityConfig, TransformerConfig,
    )
    from deepearth_tpu.models import DeepEarthModel

    cfg = DeepEarthConfig(
        hidden_dim=512,
        n_heads=8,
        n_layers=4,
        grid4d=Grid4DConfig(
            n_spatial_levels=16, n_temporal_levels=8, hash_table_size=2 ** 19
        ),
        modality_encoder=TransformerConfig(hidden_dim=256, n_heads=4, n_layers=2),
        compute_dtype=jnp.bfloat16,
    )
    cfg.add_modality(
        ModalityConfig(name="species", encoding_type="learned_embedding",
                       input_type="categorical", vocab_size=232)
    )
    # FULL-grid vision: (B, 4608, 1408) through the universal-token encoder
    cfg.add_modality(
        ModalityConfig(name="vision", input_dim=1408, n_tokens=16,
                       encoder_layers=1, encoder_heads=8)
    )
    cfg.add_modality(
        ModalityConfig(name="language", input_dim=7168, n_tokens=4,
                       encoder_layers=1, encoder_heads=8)
    )
    return cfg, DeepEarthModel(cfg)


def main():
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepearth_tpu.data.batches import device_prefetch, threaded_producer
    from deepearth_tpu.training import LossWeights, create_optimizer, make_train_step
    from deepearth_tpu.training.trainer import TrainState

    log(f"devices: {jax.devices()}")
    results: dict = {}
    rng = np.random.default_rng(1)

    with tempfile.TemporaryDirectory(dir="/root") as td:
        loader, ids = build_store(td)
        language = rng.standard_normal((N_ROWS, 7168)).astype(np.float16)
        species = rng.integers(0, 232, N_ROWS)
        coords = rng.random((N_ROWS, 4)).astype(np.float32)

        cfg, model = build_model()

        # host-side assembly timings (one pass, outside the pipeline)
        t_gather, t_collate = [], []

        def assemble(batch_ids):
            t0 = time.perf_counter()
            vis, _ = loader.get_batch(batch_ids, out_dtype=np.float16,
                                      n_threads=4)
            t1 = time.perf_counter()
            rows = np.asarray([int(i) - 1000 for i in batch_ids])
            batch = {
                "xyzt": coords[rows],
                "modalities": {
                    "species": species[rows],
                    # reshape is a view: (B, 8, 24, 24, 1408) → (B, 4608, 1408)
                    "vision": vis.reshape(len(rows), -1, VISION_SHAPE[-1]),
                    "language": language[rows],
                },
            }
            t2 = time.perf_counter()
            t_gather.append(t1 - t0)
            t_collate.append(t2 - t1)
            return batch

        def batch_iter(steps):
            def gen():
                for _ in range(steps):
                    yield assemble(rng.choice(ids, BATCH, replace=False))
            return gen

        # model + step
        sample = assemble(ids[:BATCH])
        params = model.init(jax.random.PRNGKey(0), jax.device_put(sample))["params"]
        n_params = sum(int(np.prod(l.shape))
                       for l in jax.tree_util.tree_leaves(params))
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )
        step = jax.jit(make_train_step(model, cfg, LossWeights(contrastive=0.1)))
        log(f"[model] {n_params/1e6:.1f}M params, batch {BATCH}, "
            f"vision {sample['modalities']['vision'].shape}")

        # ---- device-only rate: pre-staged batch, subtraction timing ------- #
        staged = jax.device_put(sample)
        out = step(state, staged, jax.random.PRNGKey(0))  # compile
        float(np.asarray(out[1]["loss/total"]))
        ts = []
        st = state
        for i in range(8):
            t0 = time.perf_counter()
            st, m = step(st, staged, jax.random.PRNGKey(i))
            float(np.asarray(m["loss/total"]))
            ts.append(time.perf_counter() - t0)
        dev_step_s = float(np.median(sorted(ts)[:4]))
        dev_obs_s = BATCH / dev_step_s
        log(f"[device-only] step {dev_step_s*1e3:.1f} ms → {dev_obs_s:.1f} obs/s")

        # ---- H2D cost alone: fresh device_put per step -------------------- #
        t0 = time.perf_counter()
        for _ in range(4):
            b = jax.device_put(sample)
            jax.block_until_ready(b["modalities"]["vision"])
        h2d_s = (time.perf_counter() - t0) / 4
        log(f"[h2d] {h2d_s*1e3:.1f} ms/batch "
            f"({sample['modalities']['vision'].nbytes/1e6:.0f} MB vision)")

        # ---- isolated store gather (no pipeline contention) --------------- #
        t0 = time.perf_counter()
        for _ in range(4):
            loader.get_batch(
                rng.choice(ids, BATCH, replace=False), out_dtype=np.float16,
                n_threads=4,
            )
        gather_iso_ms = (time.perf_counter() - t0) / 4 * 1e3
        log(f"[gather-isolated] {gather_iso_ms:.1f} ms/batch")

        # ---- end-to-end: producer thread → prefetch → train --------------- #
        t_gather.clear(); t_collate.clear()
        it = device_prefetch(threaded_producer(batch_iter(STEPS)), size=2)
        st = state
        first = next(it)
        st, m = step(st, first, jax.random.PRNGKey(100))  # warm pipeline
        float(np.asarray(m["loss/total"]))
        t0 = time.perf_counter()
        n_done = 0
        for i, b in enumerate(it):
            st, m = step(st, b, jax.random.PRNGKey(200 + i))
            n_done += 1
        float(np.asarray(m["loss/total"]))
        e2e_s = (time.perf_counter() - t0) / max(n_done, 1)
        e2e_obs_s = BATCH / e2e_s
        ratio = e2e_obs_s / dev_obs_s
        log(f"[end-to-end] step {e2e_s*1e3:.1f} ms → {e2e_obs_s:.1f} obs/s "
            f"({100*ratio:.0f}% of device rate)")

        # ---- int8-compressed transfer: same full rows, half the wire ------- #
        # data/transfer.py: per-row int8 + f16 scales on the host, dequant
        # fused into the jitted step on device. 2× fewer link bytes than the
        # fp16 default with <1% feature rounding.
        import jax.numpy as jnp

        from deepearth_tpu.data import compress_batch, decompress_on_device

        cstep = jax.jit(
            lambda st, b, r: step(st, decompress_on_device(b, jnp.bfloat16), r)
        )

        def batch_iter_c(steps):
            def gen():
                for _ in range(steps):
                    yield compress_batch(
                        assemble(rng.choice(ids, BATCH, replace=False)),
                        ("vision", "language"),
                    )
            return gen

        sample_c = compress_batch(assemble(ids[:BATCH]), ("vision", "language"))
        t0 = time.perf_counter()
        for _ in range(4):
            b = jax.device_put(sample_c)
            jax.block_until_ready(b["modalities"]["vision"]["_int8_q"])
        h2d_c_s = (time.perf_counter() - t0) / 4
        log(f"[h2d-int8] {h2d_c_s*1e3:.1f} ms/batch")

        itc = device_prefetch(threaded_producer(batch_iter_c(STEPS)), size=2)
        sc = state
        sc, m = cstep(sc, next(itc), jax.random.PRNGKey(500))  # compile
        float(np.asarray(m["loss/total"]))
        t0 = time.perf_counter()
        n_done = 0
        for i, b in enumerate(itc):
            sc, m = cstep(sc, b, jax.random.PRNGKey(600 + i))
            n_done += 1
        loss_c = float(np.asarray(m["loss/total"]))
        e2e_c_s = (time.perf_counter() - t0) / max(n_done, 1)
        ratio_c = (BATCH / e2e_c_s) / dev_obs_s
        log(f"[int8 e2e] step {e2e_c_s*1e3:.1f} ms → {BATCH/e2e_c_s:.1f} obs/s "
            f"({100*ratio_c:.0f}% of device rate, loss {loss_c:.3f})")

        # ---- data echoing on top of int8: amortize each transfer ---------- #
        # echo_on_device (Choi et al. 2019): E optimizer steps per shipped
        # batch, fresh masking rng per step. With transfer >> compute the
        # optimizer-step rate approaches E / transfer_time.
        from deepearth_tpu.data import echo_on_device

        ECHO = 8
        n_transfers = 6
        ite = echo_on_device(
            device_prefetch(
                threaded_producer(batch_iter_c(n_transfers)), size=2
            ),
            factor=ECHO,
        )
        se = state
        se, m = cstep(se, next(ite), jax.random.PRNGKey(700))  # warm
        float(np.asarray(m["loss/total"]))
        t0 = time.perf_counter()
        n_done = 0
        for i, b in enumerate(ite):
            se, m = cstep(se, b, jax.random.PRNGKey(800 + i))
            n_done += 1
        float(np.asarray(m["loss/total"]))
        e2e_echo_s = (time.perf_counter() - t0) / max(n_done, 1)
        ratio_e = (BATCH / e2e_echo_s) / dev_obs_s
        log(f"[int8+echo{ECHO}] {e2e_echo_s*1e3:.1f} ms/optimizer-step → "
            f"{BATCH/e2e_echo_s:.1f} obs/s ({100*ratio_e:.0f}% of device rate)")

        # ---- mitigation: pre-pooled vision (45 KB/obs instead of 13 MB) ---- #
        # The documented fallback when the host↔device link can't carry full
        # grids (reference C-stack pooled inside the model anyway:
        # training/deepearth_multimodal_training.py VisionMLP pools (1,2,3)).
        import dataclasses as _dc

        pcfg, pmodel = build_model()
        pcfg.modalities["vision"] = _dc.replace(
            pcfg.modalities["vision"], input_dim=1408, n_tokens=1,
        )
        pmodel = type(pmodel)(pcfg)

        # pre-pooled store: pooling happens once at ingestion, rows are
        # (1408,) fp16 = 2.8 KB — the data path ships 4600× fewer bytes
        from deepearth_tpu.data import convert_arrays_to_store

        pooled_rows = np.stack(
            [
                loader.get(int(i), out_dtype=np.float16)
                .reshape(-1, VISION_SHAPE[-1])
                .mean(axis=0)
                for i in ids
            ]
        ).astype(np.float16)
        ploader = convert_arrays_to_store(
            os.path.join(td, "vision_pooled"), ids, pooled_rows,
            dtype="float16",
        )

        def assemble_pooled(batch_ids):
            vis, _ = ploader.get_batch(batch_ids, out_dtype=np.float16,
                                       n_threads=2)
            rows = np.asarray([int(i) - 1000 for i in batch_ids])
            return {
                "xyzt": coords[rows],
                "modalities": {
                    "species": species[rows],
                    "vision": vis,
                    "language": language[rows],
                },
            }

        sample_p = assemble_pooled(ids[:BATCH])
        pparams = pmodel.init(jax.random.PRNGKey(0), jax.device_put(sample_p))[
            "params"
        ]
        pstate = TrainState.create(
            apply_fn=pmodel.apply, params=pparams,
            tx=create_optimizer(pcfg.optimizer),
        )
        pstep = jax.jit(make_train_step(pmodel, pcfg, LossWeights(contrastive=0.1)))
        staged_p = jax.device_put(sample_p)
        out = pstep(pstate, staged_p, jax.random.PRNGKey(0))
        float(np.asarray(out[1]["loss/total"]))
        ts = []
        sp = pstate
        for i in range(8):
            t0 = time.perf_counter()
            sp, m = pstep(sp, staged_p, jax.random.PRNGKey(i))
            float(np.asarray(m["loss/total"]))
            ts.append(time.perf_counter() - t0)
        dev_p_s = float(np.median(sorted(ts)[:4]))

        def batch_iter_p(steps):
            def gen():
                for _ in range(steps):
                    yield assemble_pooled(rng.choice(ids, BATCH, replace=False))
            return gen

        itp = device_prefetch(threaded_producer(batch_iter_p(STEPS)), size=2)
        sp, m = pstep(sp, next(itp), jax.random.PRNGKey(300))
        float(np.asarray(m["loss/total"]))
        t0 = time.perf_counter()
        n_done = 0
        for i, b in enumerate(itp):
            sp, m = pstep(sp, b, jax.random.PRNGKey(400 + i))
            n_done += 1
        float(np.asarray(m["loss/total"]))
        e2e_p_s = (time.perf_counter() - t0) / max(n_done, 1)
        ratio_p = dev_p_s / e2e_p_s
        log(f"[pooled] device {dev_p_s*1e3:.1f} ms  e2e {e2e_p_s*1e3:.1f} ms "
            f"({100*ratio_p:.0f}% of device rate)")

        results = {
            "model_params_m": round(n_params / 1e6, 1),
            "batch": BATCH,
            "vision_row_mb": round(
                np.prod(VISION_SHAPE) * 2 / 1e6, 1
            ),
            "device_only_obs_per_s": round(dev_obs_s, 1),
            "device_step_ms": round(dev_step_s * 1e3, 1),
            "end_to_end_obs_per_s": round(e2e_obs_s, 1),
            "end_to_end_step_ms": round(e2e_s * 1e3, 1),
            "e2e_fraction_of_device_rate": round(ratio, 3),
            "host_breakdown_ms": {
                "store_gather_contended": round(1e3 * float(np.mean(t_gather)), 1),
                "store_gather_isolated": round(gather_iso_ms, 1),
                "collate": round(1e3 * float(np.mean(t_collate)), 1),
                "h2d_transfer": round(h2d_s * 1e3, 1),
            },
            "int8_compressed_transfer": {
                "h2d_ms": round(h2d_c_s * 1e3, 1),
                "end_to_end_step_ms": round(e2e_c_s * 1e3, 1),
                "end_to_end_obs_per_s": round(BATCH / e2e_c_s, 1),
                "e2e_fraction_of_device_rate": round(ratio_c, 3),
            },
            "int8_plus_echo": {
                "echo_factor": ECHO,
                "ms_per_optimizer_step": round(e2e_echo_s * 1e3, 1),
                "obs_per_s": round(BATCH / e2e_echo_s, 1),
                "e2e_fraction_of_device_rate": round(ratio_e, 3),
            },
            "pooled_store_mitigation": {
                "device_step_ms": round(dev_p_s * 1e3, 1),
                "end_to_end_step_ms": round(e2e_p_s * 1e3, 1),
                "e2e_fraction_of_device_rate": round(ratio_p, 3),
            },
            "notes": f"h2d over the axon tunnel ships buffers per call at "
            f"~{208/ max(h2d_s, 1e-9):.0f} MB/s this run (link rate varies "
            "run to run); on a co-located TPU VM host this is PCIe-local. "
            "int8_compressed_transfer ships the same rows at half the "
            "bytes (data/transfer.py); the pre-pooled store is the "
            "documented mitigation when the link cannot carry full "
            "13 MB rows.",
        }

    from deepearth_tpu.utils.artifacts import round_stamp

    results.update(round_stamp())
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"wrote {OUT}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
