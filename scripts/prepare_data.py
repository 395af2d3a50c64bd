"""Data preparation CLI: parquet embeddings → mmap store
(reference: dashboard/prepare_embeddings.py CLI).

Converts per-observation embedding columns from a parquet file into the
binary blob + flat index layout that MMapEmbeddingLoader serves, with a
verification pass.

Usage:
    python scripts/prepare_data.py --input embeddings.parquet \
        --id-column gbif_id --embedding-column embedding \
        --shape 8 24 24 1408 --output /data/vision_store --dtype float16
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="parquet → mmap embedding store")
    ap.add_argument("--input", required=True, nargs="+",
                    help="parquet file(s), converted in order")
    ap.add_argument("--append", action="store_true",
                    help="extend an existing store instead of overwriting "
                         "(chunked conversion with bounded staging disk)")
    ap.add_argument("--id-column", default="gbif_id")
    ap.add_argument("--embedding-column", default="embedding")
    ap.add_argument("--shape", type=int, nargs="+", required=True,
                    help="per-embedding shape, e.g. 8 24 24 1408")
    ap.add_argument("--output", required=True, help="store path prefix")
    ap.add_argument("--dtype", default="float16", choices=["float16", "float32"])
    ap.add_argument("--batch-rows", type=int, default=64)
    args = ap.parse_args()

    import pyarrow.parquet as pq

    from deepearth_tpu.data import MMapEmbeddingLoader, MMapEmbeddingWriter

    t0 = time.time()
    n_written = 0
    with MMapEmbeddingWriter(
        args.output, args.shape, args.dtype, append=args.append
    ) as w:
        for path in args.input:
            pf = pq.ParquetFile(path)
            for batch in pf.iter_batches(
                batch_size=args.batch_rows,
                columns=[args.id_column, args.embedding_column],
            ):
                ids = batch.column(args.id_column).to_pylist()
                col = batch.column(args.embedding_column)
                try:
                    # fast path for (fixed-size-)list columns: flatten to one
                    # contiguous numpy buffer instead of 6.5M-element pylists
                    # (the reference row is 6,488,064 floats — to_pylist() on
                    # those is ~100× slower)
                    if hasattr(col, "combine_chunks"):
                        col = col.combine_chunks()
                    embs = (
                        col.flatten()
                        .to_numpy(zero_copy_only=False)
                        .reshape(len(ids), -1)
                    )
                except Exception:
                    embs = col.to_pylist()
                for oid, emb in zip(ids, embs):
                    w.add(
                        int(oid), np.asarray(emb, np.float32).reshape(args.shape)
                    )
                    n_written += 1
                if n_written % 1000 < args.batch_rows:
                    print(f"  {n_written} embeddings written...", flush=True)

    loader = MMapEmbeddingLoader(args.output)
    # verification pass (reference: prepare_embeddings.py:290)
    rng = np.random.default_rng(0)
    for i in rng.choice(len(loader), min(8, len(loader)), replace=False):
        oid = int(loader.ids[i])
        assert loader.get(oid) is not None, f"verification failed for {oid}"
    size_gb = os.path.getsize(args.output + ".bin") / 1e9
    print(
        f"done: {n_written} embeddings, {size_gb:.2f} GB, "
        f"{time.time() - t0:.1f}s → {args.output}.bin"
    )


if __name__ == "__main__":
    main()
