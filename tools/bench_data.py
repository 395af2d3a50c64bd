"""Data-access benchmark: direct import vs HTTP API
(reference: training/scripts/benchmark_data_access.py — targets: <50 ms/batch
direct, <100 ms via API, ~15 ms/observation; dashboard/README.md retrieval
numbers).

Builds a synthetic mmap store, then measures:
  1. single-embedding retrieval latency (reference #1: ~71 ms)
  2. batch-of-100 retrieval (reference #2: ~25 ms/item)
  3. get_training_batch direct (reference #7: <50 ms/batch)
  4. the same through the REST API (reference #8: <100 ms)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from deepearth_tpu.data import (
        DatasetConfig,
        ObservationDataset,
        UnifiedDataCache,
        convert_arrays_to_store,
    )
    from deepearth_tpu.serving import DashboardClient, DashboardServer, DataService

    n = 512
    rng = np.random.default_rng(0)
    ids = np.arange(1000, 1000 + n)
    # V-JEPA2-shaped embeddings scaled down 8x per axis to keep the bench fast
    # but shape-realistic: (8, 24, 24, 176) ≈ 0.8 MB each in f16
    emb_shape = (8, 24, 24, 176)
    with tempfile.TemporaryDirectory() as td:
        store = os.path.join(td, "vision")
        embs = rng.standard_normal((n, *emb_shape)).astype(np.float16)
        t0 = time.perf_counter()
        loader = convert_arrays_to_store(store, ids, embs.astype(np.float32))
        build_s = time.perf_counter() - t0

        ds = ObservationDataset.from_arrays(
            gbif_id=ids,
            species=rng.integers(0, 232, n),
            latitude=28.03 + rng.random(n) * 0.9,
            longitude=-81.93 + rng.random(n),
            year=rng.integers(2010, 2026, n),
        )
        cache = UnifiedDataCache(ds, DatasetConfig(cache_size=0), loader, None)

        # 1) single retrieval (uncached)
        lat1 = []
        for oid in rng.choice(ids, 50, replace=False):
            t0 = time.perf_counter()
            loader.get(int(oid))
            lat1.append((time.perf_counter() - t0) * 1000)

        # 2) batch of 100
        batch_ids = rng.choice(ids, 100, replace=False).tolist()
        t0 = time.perf_counter()
        loader.get_batch(batch_ids)
        batch_ms = (time.perf_counter() - t0) * 1000

        # 3) direct training batch (64 obs, reference optimum)
        tb_ids = rng.choice(ids, 64, replace=False).tolist()
        t0 = time.perf_counter()
        cache.get_training_batch(tb_ids)
        direct_ms = (time.perf_counter() - t0) * 1000

        # 4) via REST (metadata-only route mirrors the ML data service)
        srv = DashboardServer(DataService(observations=ds.columns())).start()
        try:
            client = DashboardClient(f"http://127.0.0.1:{srv.port}")
            api = client.benchmark_training_batch(tb_ids, runs=10)
        finally:
            srv.stop()

        report = {
            "store_build_s": round(build_s, 2),
            "single_retrieval_p50_ms": round(float(np.percentile(lat1, 50)), 3),
            "batch100_ms_per_item": round(batch_ms / 100, 3),
            "training_batch64_direct_ms": round(direct_ms, 2),
            "training_batch64_api_p50_ms": round(api["p50_ms"], 2),
            "reference_targets": {
                "single_retrieval_ms": 71,
                "batch_ms_per_item": 25,
                "direct_batch_ms": 50,
                "api_batch_ms": 100,
            },
        }
        print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
