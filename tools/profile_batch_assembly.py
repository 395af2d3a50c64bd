"""Profile host-side get_training_batch assembly at soak scale.

Times each component of UnifiedDataCache.get_training_batch for B=256
against the /tmp/deepearth_fullscale workdir (46 GB soak artifacts), to
attribute the pooled-epoch data_stall_fraction (BENCH_E2E_FULLSCALE.json).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepearth_tpu.data.observations import (  # noqa: E402
    DatasetConfig,
    ObservationDataset,
    UnifiedDataCache,
)
from deepearth_tpu.data.mmap_store import MMapEmbeddingLoader  # noqa: E402

WORKDIR = "/tmp/deepearth_fullscale"
B = 256


def t(fn, n=20):
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n * 1e3


def main():
    t0 = time.time()
    ds = ObservationDataset.from_parquet(
        os.path.join(WORKDIR, "observations.parquet")
    )
    print(f"parquet load: {time.time()-t0:.1f}s, {len(ds)} rows")
    cfg = DatasetConfig()
    cache = UnifiedDataCache(
        ds, cfg,
        vision_loader=MMapEmbeddingLoader(
            os.path.join(WORKDIR, "vision_pooled")
        ),
    )
    gbif = ds.df["gbif_id"].to_numpy()
    rng = np.random.default_rng(0)

    def fresh_sel():
        return gbif[rng.choice(len(gbif), B, replace=False)]

    sel = fresh_sel()
    rows = np.asarray([ds.row_for_id(i) for i in sel]).astype(int)

    print(f"row_for_id loop:   {t(lambda: [ds.row_for_id(i) for i in sel]):7.2f} ms")
    print(f"normalized_xyzt:   {t(lambda: ds.normalized_xyzt(rows, bbox=cfg.bbox, year_range=cfg.year_range)):7.2f} ms")
    print(f"species lookup:    {t(lambda: ds.df['species_idx'].to_numpy(np.int32)[rows]):7.2f} ms")
    print(f"vision get_batch:  {t(lambda: cache.vision_loader.get_batch(sel, out_dtype=np.float16)):7.2f} ms")

    col = ds.df["language_embedding"]

    def lang_iloc():
        vals = [col.iloc[r] for r in rows]
        zero = np.zeros(7168, np.float16)
        return np.stack([
            zero if v is None else np.asarray(v, np.float16) for v in vals
        ])

    print(f"language iloc:     {t(lang_iloc, n=5):7.2f} ms")
    print(f"full batch (same): {t(lambda: cache.get_training_batch(sel), n=5):7.2f} ms")
    print(f"full batch (fresh sel incl.): {t(lambda: cache.get_training_batch(fresh_sel()), n=5):7.2f} ms")


if __name__ == "__main__":
    main()
