"""Full-scale synthetic soak of the data path (round-4 verdict item 4).

The reference demonstrably trained on 33,665 observations with 7,113 full
12.97 MB vision rows (206 GB mmap store) — reference:
dashboard/dataset_config.json statistics, dashboard/README.md:147-151,
training/deepearth_multimodal_training.py:325. The repo's prior e2e proof
ran at 48 observations. This tool pushes the WHOLE pipeline at half
reference scale (configurable):

  1. synthesize observations.parquet (reference schema: gbif_id /
     taxon_name / lat/lon / y/m/d / per-row 7168-d language_embedding /
     split) at >=33k rows;
  2. synthesize >=3,500 FULL 6,488,064-float vision rows in bounded-disk
     chunks, each converted through the REAL scripts/prepare_data.py CLI
     (--append) into one mmap store (~45 GB fp16), staging chunks deleted
     as they convert;
  3. store stats: size, cold single-row latency on FRESH random rows
     (the hypervisor cache trap — CLAUDE.md), batch-of-100 fetch
     (reference baselines #1/#2: ~71 ms/row, ~25 ms/item);
  4. ONE full training epoch over all observations with the pooled-store
     path: threaded batch assembly -> device_prefetch -> jit train step;
     records epoch wall time, end-to-end obs/s, and the device-only rate
     (same step on a resident batch) for the data-stall fraction;
  5. linear probe on the trained embeddings + the dashboard's
     POST /api/training/batch over real HTTP against the same store.

Writes BENCH_E2E_FULLSCALE.json.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_e2e_fullscale.py
     (--n-obs 1200 --n-vision 40 --steps-cap 8 for a quick smoke)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

VISION_FLAT = 6_488_064
VISION_SHAPE = (8, 24, 24, 1408)
LANGUAGE_DIM = 7168
BOUNDS = {"north": 28.978, "south": 28.033, "east": -80.902, "west": -81.934}
YEARS = (2010, 2025)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def write_observations(path, n_obs, n_species, n_vision, rng):
    import pandas as pd

    sp = rng.integers(0, n_species, n_obs)
    year = rng.integers(YEARS[0], YEARS[1] + 1, n_obs)
    gbif = np.arange(6_000_000_001, 6_000_000_001 + n_obs, dtype=np.int64)
    has_vision = np.zeros(n_obs, bool)
    has_vision[rng.choice(n_obs, n_vision, replace=False)] = True
    proto = rng.standard_normal((n_species, LANGUAGE_DIM)).astype(np.float16)
    lang = proto[sp] + (
        0.1 * rng.standard_normal((n_obs, LANGUAGE_DIM))
    ).astype(np.float16)
    pd.DataFrame({
        "gbif_id": gbif,
        "taxon_id": sp + 1_000_000,
        "taxon_name": [f"Species {s}" for s in sp],
        "latitude": BOUNDS["south"]
        + rng.random(n_obs) * (BOUNDS["north"] - BOUNDS["south"]),
        "longitude": BOUNDS["west"]
        + rng.random(n_obs) * (BOUNDS["east"] - BOUNDS["west"]),
        "year": year, "month": rng.integers(1, 13, n_obs),
        "day": rng.integers(1, 29, n_obs),
        "has_vision": has_vision,
        "language_embedding": list(lang.astype(np.float32)),
        "split": np.where(year == 2025, "temporal_test", "train"),
    }).to_parquet(path)
    return gbif, sp, has_vision


def convert_vision_chunks(store, vis_ids, chunk_rows, rng, staging):
    """Chunked parquet -> prepare_data.py --append -> delete staging."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(staging, exist_ok=True)
    t_gen = t_conv = 0.0
    n = len(vis_ids)
    for s in range(0, n, chunk_rows):
        ids = vis_ids[s : s + chunk_rows]
        t0 = time.time()
        flat = rng.standard_normal((len(ids), VISION_FLAT), dtype=np.float32)
        chunk = os.path.join(staging, "chunk.parquet")
        arr = pa.FixedSizeListArray.from_arrays(
            pa.array(flat.reshape(-1)), VISION_FLAT
        )
        pq.write_table(
            pa.table({"gbif_id": pa.array(ids), "embedding": arr}), chunk
        )
        t_gen += time.time() - t0
        t0 = time.time()
        cmd = [
            sys.executable, os.path.join(REPO, "scripts", "prepare_data.py"),
            "--input", chunk, "--id-column", "gbif_id",
            "--embedding-column", "embedding",
            "--shape", *map(str, VISION_SHAPE),
            "--output", store, "--dtype", "float16",
        ]
        if s:
            cmd.append("--append")
        r = subprocess.run(
            cmd, capture_output=True, text=True, timeout=3600,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-2000:]
        t_conv += time.time() - t0
        os.remove(chunk)
        log(f"  converted {min(s + chunk_rows, n)}/{n} vision rows "
            f"(gen {t_gen:.0f}s conv {t_conv:.0f}s)")
    return t_gen, t_conv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-obs", type=int, default=33_665)
    ap.add_argument("--n-vision", type=int, default=3_560)
    ap.add_argument("--n-species", type=int, default=64)
    ap.add_argument("--chunk-rows", type=int, default=96)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps-cap", type=int, default=0,
                    help="cap epoch steps (smoke); 0 = full epoch")
    ap.add_argument("--workdir", default="/tmp/deepearth_fullscale")
    ap.add_argument("--keep", action="store_true",
                    help="keep the store after the run")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke runs; env vars alone "
                         "cannot override the axon sitecustomize)")
    ap.add_argument("--out", default=os.path.join(REPO, "BENCH_E2E_FULLSCALE.json"))
    ap.add_argument("--resume", action="store_true",
                    help="reuse workdir artifacts + the .partial result from "
                         "a crashed run (stages already recorded are skipped)")
    ap.add_argument("--stop-after", default="",
                    choices=("", "conversion", "store", "pool"),
                    help="checkpoint and exit after this stage — lets the "
                         "CPU/disk-bound store build run in the background "
                         "while the epoch later runs on a quiet core "
                         "(--resume picks up where it stopped)")
    args = ap.parse_args()

    # a resumed run once wedged silently for 25+ min in a futex wait with
    # no stage output; dump all-thread stacks every 5 min so the next
    # stall is diagnosable from the log
    import faulthandler

    faulthandler.dump_traceback_later(300, repeat=True, file=sys.stderr)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from deepearth_tpu.configs import ModalityConfig, tiny_config
    from deepearth_tpu.data import (
        DatasetConfig, MMapEmbeddingLoader, MMapEmbeddingWriter,
        ObservationDataset, UnifiedDataCache, device_prefetch,
        threaded_producer,
    )
    from deepearth_tpu.evaluation import DeepEarthEvaluator
    from deepearth_tpu.models import DeepEarthModel
    from deepearth_tpu.serving.server import DashboardServer, DataService
    from deepearth_tpu.training import LossWeights, Trainer

    os.makedirs(args.workdir, exist_ok=True)
    partial_path = args.out + ".partial"
    result = {"scale": {
        "n_obs": args.n_obs, "n_vision_full_rows": args.n_vision,
        "vision_floats_per_row": VISION_FLAT,
        "store_gb_fp16": round(args.n_vision * VISION_FLAT * 2 / 1e9, 1),
        "reference": "33,665 obs / 7,113 rows / 206 GB fp32 "
                     "(dashboard/dataset_config.json)",
    }}
    if args.resume and os.path.exists(partial_path):
        with open(partial_path) as f:
            result.update(json.load(f))
        log(f"resuming with stages: {sorted(result)}")

    def checkpoint():
        with open(partial_path, "w") as f:
            json.dump(result, f, indent=2)

    # Independent per-stage RNG streams (ADVICE r4): the resume branch
    # replays only the sp/year/has_vision draws, not every draw
    # write_observations consumes, so later stages must not share its
    # generator — spawned children keep each stage's stream independent of
    # whether earlier stages ran or were skipped.
    _root = np.random.default_rng(11)
    rng_obs, rng_vision, rng_store, rng = _root.spawn(4)

    # -- 1) observations parquet -------------------------------------------- #
    obs_path = os.path.join(args.workdir, "observations.parquet")
    store = os.path.join(args.workdir, "vision_store")
    if (
        args.resume and "observations_parquet" in result
        and os.path.exists(obs_path) and os.path.exists(store + ".bin")
    ):
        # same seed -> same draw; regenerate the id/species/vision arrays
        # without rewriting the (identical) files
        sp = rng_obs.integers(0, args.n_species, args.n_obs)
        rng_obs.integers(YEARS[0], YEARS[1] + 1, args.n_obs)
        gbif = np.arange(
            6_000_000_001, 6_000_000_001 + args.n_obs, dtype=np.int64
        )
        has_vision = np.zeros(args.n_obs, bool)
        has_vision[
            rng_obs.choice(args.n_obs, args.n_vision, replace=False)
        ] = True
        vis_ids = gbif[has_vision]
        log("resume: reusing observations.parquet + vision_store")
    else:
        t0 = time.time()
        gbif, sp, has_vision = write_observations(
            obs_path, args.n_obs, args.n_species, args.n_vision, rng_obs
        )
        result["observations_parquet"] = {
            "rows": args.n_obs, "write_s": round(time.time() - t0, 1),
            "size_mb": round(os.path.getsize(obs_path) / 1e6, 1),
        }
        log(f"observations.parquet: {result['observations_parquet']}")
        checkpoint()

        # -- 2) chunked vision conversion through the real CLI --------------- #
        vis_ids = gbif[has_vision]
        t_gen, t_conv = convert_vision_chunks(
            store, vis_ids, args.chunk_rows, rng_vision,
            os.path.join(args.workdir, "staging"),
        )
        store_gb = os.path.getsize(store + ".bin") / 1e9
        result["conversion"] = {
            "rows": int(len(vis_ids)), "store_gb": round(store_gb, 2),
            "generate_s": round(t_gen, 1), "prepare_data_s": round(t_conv, 1),
            "convert_mb_per_s": round(store_gb * 1e3 / max(t_conv, 1e-9), 1),
        }
        log(f"conversion: {result['conversion']}")
        checkpoint()

    if args.stop_after == "conversion":
        checkpoint()
        log("stopped after conversion (--stop-after)")
        return

    # -- 3) store stats: cold rows + batch-of-100 ---------------------------- #
    vloader = MMapEmbeddingLoader(store)
    if not (args.resume and "store" in result):
        fresh = rng_store.choice(vis_ids, min(24, len(vis_ids)), replace=False)
        lat = []
        for oid in fresh[:8]:
            t0 = time.time()
            assert vloader.get(int(oid)) is not None
            lat.append(time.time() - t0)
        t0 = time.time()
        got, found = vloader.get_batch([int(i) for i in fresh[8:24]])
        batch_ms = (time.time() - t0) * 1e3 / max(len(fresh) - 8, 1)
        result["store"] = {
            "single_row_ms_p50_fresh": round(float(np.median(lat)) * 1e3, 1),
            "batch_fetch_ms_per_row_fresh": round(batch_ms, 1),
            "reference_baseline_ms": {"single": 71, "batch100_per_item": 25},
        }
        log(f"store: {result['store']}")
        checkpoint()
    if args.stop_after == "store":
        log("stopped after store stats (--stop-after)")
        return

    # -- 3.5) pooled store: the documented IO mitigation, built AT SCALE ----- #
    # One pass over the full-grid store pools every row to (1408,) fp16
    # (the exact reduction get_training_batch(pool_vision=True) applies
    # after reading 12.97 MB — done once here, so every epoch reads 2.8 KB
    # rows instead; BENCH_E2E.json small-scale pooled variant, round-4
    # verdict item 5 demanded it at scale).
    pooled_path = os.path.join(args.workdir, "vision_pooled")
    if not (
        args.resume and "pooling" in result
        and os.path.exists(pooled_path + ".bin")
    ):
        t0 = time.time()
        CH = 48
        with MMapEmbeddingWriter(
            pooled_path, embedding_shape=(VISION_SHAPE[-1],), dtype="float16"
        ) as w:
            for s in range(0, len(vis_ids), CH):
                ids = [int(i) for i in vis_ids[s : s + CH]]
                arr, found = vloader.get_batch(ids, out_dtype=np.float16)
                assert all(found), ids
                pooled = (
                    arr.reshape(arr.shape[0], -1, arr.shape[-1])
                    .mean(axis=1, dtype=np.float32)
                    .astype(np.float16)
                )
                for oid, prow in zip(ids, pooled):
                    w.add(oid, prow)
                if (s // CH) % 8 == 0:
                    log(f"  pooled {min(s + CH, len(vis_ids))}/{len(vis_ids)}")
        pool_s = time.time() - t0
        full_gb = len(vis_ids) * VISION_FLAT * 2 / 1e9
        result["pooling"] = {
            "rows": int(len(vis_ids)),
            "pooled_row_shape": [VISION_SHAPE[-1]],
            "pooled_store_mb": round(
                os.path.getsize(pooled_path + ".bin") / 1e6, 1
            ),
            "pass_s": round(pool_s, 1),
            "read_mb_per_s": round(full_gb * 1e3 / max(pool_s, 1e-9), 1),
        }
        log(f"pooling: {result['pooling']}")
        checkpoint()
    if args.stop_after == "pool":
        log("stopped after pooling (--stop-after)")
        return

    # -- 4) one training epoch through the PRE-POOLED store + prefetch ------- #
    log("loading observations parquet...")
    ds = ObservationDataset.from_parquet(obs_path)
    log(f"loaded {len(ds)} observations")
    cfg_ds = DatasetConfig(
        bbox=(BOUNDS["south"], BOUNDS["west"], BOUNDS["north"], BOUNDS["east"]),
        year_range=YEARS,
    )
    cache = UnifiedDataCache(ds, cfg_ds, vision_loader=vloader)
    cache_pooled = UnifiedDataCache(
        ds, cfg_ds, vision_loader=MMapEmbeddingLoader(pooled_path)
    )

    cfg = tiny_config()
    cfg.modalities.clear()
    cfg.add_modality(ModalityConfig(
        name="species", encoding_type="learned_embedding",
        input_type="categorical", vocab_size=args.n_species,
    ))
    cfg.add_modality(ModalityConfig(
        name="vision", input_dim=1408, n_tokens=1,
        encoder_layers=1, encoder_heads=4,
    ))
    cfg.add_modality(ModalityConfig(
        name="language", input_dim=LANGUAGE_DIM, n_tokens=1,
        encoder_layers=1, encoder_heads=4,
    ))
    n_steps = args.n_obs // args.batch
    if args.steps_cap:
        n_steps = min(n_steps, args.steps_cap)
    cfg.optimizer.total_steps = n_steps
    cfg.optimizer.warmup_steps = max(n_steps // 10, 1)
    model = DeepEarthModel(cfg)
    trainer = Trainer(model, cfg, LossWeights(contrastive=0.02))

    order = rng.permutation(args.n_obs)

    def epoch_batches():
        for s in range(n_steps):
            sel = gbif[order[s * args.batch : (s + 1) * args.batch]]
            yield cache_pooled.get_training_batch(sel)

    log("building first batch (language matrix) + init_state...")
    state = trainer.init_state(
        cache_pooled.get_training_batch(gbif[: args.batch])
    )
    log("init_state done")
    # device-only rate: same jit step re-running on one resident batch
    import functools

    from deepearth_tpu.training import make_train_step

    step_fn = jax.jit(
        make_train_step(model, cfg, LossWeights(contrastive=0.02)),
        donate_argnums=(0,),
    )
    resident = jax.tree_util.tree_map(
        jnp.asarray,
        cache_pooled.get_training_batch(gbif[: args.batch]),
    )
    # donation threads ONE state through both loops: step_fn donates its
    # input buffers, so the epoch below must continue from the threaded
    # state — reusing the original `state` after this loop hands the relay
    # deleted buffers (surfaces as a deferred INVALID_ARGUMENT at the next
    # sync — the CLAUDE.md donation lesson, hit live in this tool)
    state, m = step_fn(state, resident, jax.random.PRNGKey(0))
    float(np.asarray(m["loss/total"]))  # compile + sync
    # K matched to the epoch length so the ~30 ms tunnel sync amortizes
    # identically in numerator and denominator (K=8 understated the
    # device rate ~30% and flattered every e2e fraction computed from it)
    K_dev = max(n_steps, 32)
    t0 = time.time()
    for i in range(K_dev):
        state, m = step_fn(state, resident, jax.random.PRNGKey(i))
    float(np.asarray(m["loss/total"]))
    device_obs_s = K_dev * args.batch / (time.time() - t0)

    t0 = time.time()
    it = device_prefetch(threaded_producer(epoch_batches, capacity=4), size=2)
    n_done = 0
    for batch in it:
        state, m = step_fn(state, batch, jax.random.PRNGKey(n_done))
        n_done += 1
    loss = float(np.asarray(m["loss/total"]))
    epoch_s = time.time() - t0
    e2e_obs_s = n_done * args.batch / epoch_s
    result["epoch"] = {
        "path": "pooled_store",
        "steps": n_done, "batch": args.batch,
        "wall_s": round(epoch_s, 1),
        "e2e_obs_per_s": round(e2e_obs_s, 1),
        "device_only_obs_per_s": round(device_obs_s, 1),
        "e2e_fraction_of_device_rate": round(e2e_obs_s / device_obs_s, 3),
        "data_stall_fraction": round(
            max(0.0, 1.0 - e2e_obs_s / device_obs_s), 3
        ),
        "final_loss": loss,
    }
    log(f"epoch: {result['epoch']}")
    checkpoint()

    # -- 4a0) streaming epoch with int8 wire compression --------------------- #
    # Same producer, but vision/language go over the tunnel as int8 + fp16
    # row scales (data/transfer.py) and dequantize in a jitted pass on
    # device — halves the 4.4 MB/step H2D that bounds the streaming path.
    from deepearth_tpu.data import device_prefetch_compressed

    # warm OUTSIDE the timed region: fp16 dequant output matches the
    # uncompressed path's leaf dtypes (a bf16 default would force a fresh
    # step compile on the first timed batch), and the tiny dequant program
    # itself compiles here.
    warm_iter = device_prefetch_compressed(
        iter([cache_pooled.get_training_batch(gbif[: args.batch])]),
        dtype=jnp.float16,
    )
    state, m = step_fn(state, next(warm_iter), jax.random.PRNGKey(0))
    float(np.asarray(m["loss/total"]))

    t0 = time.time()
    it_c = device_prefetch_compressed(
        threaded_producer(epoch_batches, capacity=4), size=2,
        dtype=jnp.float16,
    )
    n_done = 0
    for batch in it_c:
        state, m = step_fn(state, batch, jax.random.PRNGKey(n_done))
        n_done += 1
    loss_c = float(np.asarray(m["loss/total"]))
    epoch_c_s = time.time() - t0
    e2e_c = n_done * args.batch / epoch_c_s
    result["epoch_streaming_compressed"] = {
        "path": "pooled_store + int8 wire compression",
        "steps": n_done, "batch": args.batch,
        "wall_s": round(epoch_c_s, 1),
        "e2e_obs_per_s": round(e2e_c, 1),
        "device_only_obs_per_s": round(device_obs_s, 1),
        "e2e_fraction_of_device_rate": round(e2e_c / device_obs_s, 3),
        "final_loss": loss_c,
    }
    log(f"epoch_streaming_compressed: {result['epoch_streaming_compressed']}")
    checkpoint()

    # -- 4a) device-RESIDENT pooled epoch ------------------------------------- #
    # The TPU-native production layout: the pooled stores fit HBM outright
    # (language 33,665 x 7168 fp16 = 483 MB, pooled vision 95 MB on a 16 GB
    # chip), so upload ONCE and gather per-step batches by index INSIDE the
    # jit step. Per-step host traffic drops from 4.4 MB of embeddings to a
    # 1 KB index vector — the streaming path's H2D/dispatch stall (the 0.74
    # data_stall_fraction above) disappears. The 46 GB full-grid store can
    # never be resident; this is the pooled tier's end state, not a trick.
    t0 = time.time()
    # reuse the fp16 matrix UnifiedDataCache already built for the stage-4
    # batches (None-tolerant, no 966 MB fp32 np.stack intermediate)
    lang_mat = cache_pooled._language_matrix()
    assert lang_mat is not None, "language matrix unavailable"
    vis_mat = np.zeros((args.n_obs, VISION_SHAPE[-1]), np.float16)
    vrows = np.asarray([ds.row_for_id(int(i)) for i in vis_ids]).astype(int)
    pooled_rows, pfound = cache_pooled.vision_loader.get_batch(
        [int(i) for i in vis_ids], out_dtype=np.float16
    )
    # a partial pooled store (e.g. resumed after a mid-conversion kill)
    # returns zero rows + found=False — fail loudly, don't train on zeros
    assert all(pfound), f"pooled store missing {sum(not f for f in pfound)} rows"
    vis_mat[vrows] = pooled_rows
    xyzt_mat = ds.normalized_xyzt(
        None, bbox=cfg_ds.bbox, year_range=cfg_ds.year_range
    )
    sp_mat = ds.df["species_idx"].to_numpy(np.int32)
    build_s = time.time() - t0
    t0 = time.time()
    xyzt_d, sp_d, vis_d, lang_d = (
        jax.device_put(a) for a in (xyzt_mat, sp_mat, vis_mat, lang_mat)
    )
    # sync EVERY transfer (block_until_ready alone can return early over
    # the tunnel; syncing only lang_d let the 95 MB vis_d transfer leak
    # into downstream timings)
    for a in (xyzt_d, sp_d, vis_d, lang_d):
        float(np.asarray(a.reshape(-1)[0]))
    h2d_s = time.time() - t0

    base_step = make_train_step(model, cfg, LossWeights(contrastive=0.02))

    def _resident_step(st, key, idx, xyzt_a, sp_a, vis_a, lang_a):
        batch = {
            "xyzt": xyzt_a[idx],
            "modalities": {
                "species": sp_a[idx],
                "vision": vis_a[idx],
                "language": lang_a[idx],
            },
        }
        return base_step(st, batch, key)

    assert n_steps > 0, (
        f"n_obs={args.n_obs} < batch={args.batch}: no steps to run"
    )
    res_step = jax.jit(_resident_step, donate_argnums=(0,))
    idx0 = jnp.asarray(order[: args.batch].astype(np.int32))
    state, m = res_step(state, jax.random.PRNGKey(0), idx0,
                        xyzt_d, sp_d, vis_d, lang_d)
    float(np.asarray(m["loss/total"]))  # compile + sync
    # device-only rate: K pre-staged distinct index vectors, one end sync.
    # K matches the e2e step count so the ~30 ms tunnel sync floor amortizes
    # identically in both loops (K=16 made the denominator look SLOWER than
    # the e2e loop, fraction 1.3). Positions wrap mod n_obs so every staged
    # vector is exactly batch-sized (a short/empty tail slice would
    # recompile inside the timed loop).
    K = n_steps
    staged = [
        jax.device_put(
            order[(i * args.batch + np.arange(args.batch)) % args.n_obs]
            .astype(np.int32)
        )
        for i in range(K)
    ]
    t0 = time.time()
    for i in range(K):
        state, m = res_step(state, jax.random.PRNGKey(i), staged[i],
                            xyzt_d, sp_d, vis_d, lang_d)
    float(np.asarray(m["loss/total"]))
    res_device_obs_s = K * args.batch / (time.time() - t0)
    # e2e epoch: host index vectors transferred per step, sync only at end
    t0 = time.time()
    for s in range(n_steps):
        idx = order[s * args.batch : (s + 1) * args.batch].astype(np.int32)
        state, m = res_step(state, jax.random.PRNGKey(s), idx,
                            xyzt_d, sp_d, vis_d, lang_d)
    res_loss = float(np.asarray(m["loss/total"]))
    res_s = time.time() - t0
    res_obs_s = n_steps * args.batch / res_s
    result["epoch_device_resident"] = {
        "path": "device_resident_pooled",
        "setup": {
            "lang_matrix_mb": round(lang_mat.nbytes / 1e6, 1),
            "vision_matrix_mb": round(vis_mat.nbytes / 1e6, 1),
            "build_s": round(build_s, 1),
            "h2d_s": round(h2d_s, 1),
        },
        "steps": n_steps, "batch": args.batch,
        "wall_s": round(res_s, 1),
        "e2e_obs_per_s": round(res_obs_s, 1),
        "device_only_obs_per_s": round(res_device_obs_s, 1),
        "e2e_fraction_of_device_rate": round(
            res_obs_s / res_device_obs_s, 3
        ),
        "data_stall_fraction": round(
            max(0.0, 1.0 - res_obs_s / res_device_obs_s), 3
        ),
        "final_loss": res_loss,
    }
    log(f"epoch_device_resident: {result['epoch_device_resident']}")
    checkpoint()
    del xyzt_d, sp_d, vis_d, lang_d, staged

    # -- 4b) full-grid contrast sample: a few steps reading 12.97 MB rows ---- #
    # (the 23 GB full epoch on this path is round 4's measured datapoint:
    # data_stall_fraction 0.999 — re-sampled here at 46 GB, capped, so the
    # contrast is recorded without burning 40 minutes on a known result)
    fg_steps = min(12, n_steps)

    def fullgrid_batches():
        for s in range(fg_steps):
            sel = gbif[order[s * args.batch : (s + 1) * args.batch]]
            yield cache.get_training_batch(sel, pool_vision=True)

    t0 = time.time()
    n_fg = 0
    for batch in device_prefetch(
        threaded_producer(fullgrid_batches, capacity=2), size=2
    ):
        state, m = step_fn(state, batch, jax.random.PRNGKey(1000 + n_fg))
        n_fg += 1
    float(np.asarray(m["loss/total"]))
    fg_s = time.time() - t0
    fg_rate = n_fg * args.batch / fg_s
    result["epoch_fullgrid_sample"] = {
        "steps": n_fg, "batch": args.batch, "wall_s": round(fg_s, 1),
        "e2e_obs_per_s": round(fg_rate, 1),
        "e2e_fraction_of_device_rate": round(fg_rate / device_obs_s, 3),
        "store_bytes_read_gb": round(
            n_fg * args.batch * (len(vis_ids) / args.n_obs)
            * VISION_FLAT * 2 / 1e9, 1,
        ),
    }
    log(f"epoch_fullgrid_sample: {result['epoch_fullgrid_sample']}")

    # -- 5) probe + dashboard over HTTP -------------------------------------- #
    test_sel = gbif[rng.choice(args.n_obs, 512, replace=False)]
    eval_batch = cache_pooled.get_training_batch(test_sel)
    out = model.apply({"params": state.params}, eval_batch, deterministic=True)
    feats = np.asarray(out["fused_representation"], np.float32)
    labels = np.asarray(eval_batch["modalities"]["species"])
    ev = DeepEarthEvaluator(lambda b: feats)
    probe = ev.evaluate_classification(
        feats, labels, n_classes=args.n_species, steps=200
    )
    result["probe_accuracy"] = float(probe.metrics["accuracy"])
    result["probe_chance"] = 1.0 / args.n_species

    cols = ds.columns()
    service = DataService(observations=cols, vision_loader=vloader)
    srv = DashboardServer(service, port=0).start()
    try:
        import urllib.request

        t0 = time.time()
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/training/batch",
            data=json.dumps(
                {"observation_ids": [int(i) for i in vis_ids[:16]]}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=600) as resp:
            served = json.loads(resp.read())
        result["http_training_batch"] = {
            "rows": 16, "ms_per_row": round((time.time() - t0) * 1e3 / 16, 1),
            "found_all": all(served["found"]),
            "vision_shape": served["vision_shape"],
        }
        t0 = time.time()
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/api/observations?limit=40000",
            timeout=600,
        ) as resp:
            n_served = len(json.loads(resp.read())["observations"])
        result["http_observations"] = {
            "rows": n_served, "s": round(time.time() - t0, 2)
        }
    finally:
        srv.stop()
    log(f"http: {result['http_training_batch']}")

    from deepearth_tpu.utils.artifacts import round_stamp

    result.update(round_stamp())
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))
    # --resume implies the workdir is being iterated on; deleting it here
    # once forced a 2.3-hour 46 GB rebuild on the next resume (and a
    # mid-conversion timeout leaves a silently-partial store that the
    # stage guard would then trust).
    if not args.keep and not args.resume:
        shutil.rmtree(args.workdir, ignore_errors=True)


if __name__ == "__main__":
    main()
