"""Production dashboard/data-service entrypoint
(reference: dashboard/run_production.sh + gunicorn scripts).

Serves observations + embedding stores + optional model inference over the
REST API in deepearth_tpu.serving.

Usage:
    python scripts/serve.py --observations obs.parquet \
        --vision-store /data/vision --port 8080
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description="DeepEarth-TPU data service")
    ap.add_argument("--observations", type=str, default=None,
                    help="observations parquet file")
    ap.add_argument("--vision-store", type=str, default=None,
                    help="mmap store prefix for vision embeddings")
    ap.add_argument("--language-store", type=str, default=None)
    ap.add_argument("--host", type=str, default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--with-predictor", action="store_true",
                    help="expose /api/predict with a fresh DeepEarth model")
    args = ap.parse_args()

    from deepearth_tpu.data import MMapEmbeddingLoader, ObservationDataset
    from deepearth_tpu.serving import DashboardServer, DataService
    from deepearth_tpu.utils.logging import setup_logging

    setup_logging()

    observations = None
    if args.observations:
        ds = ObservationDataset.from_parquet(args.observations)
        observations = ds.columns()

    vision = MMapEmbeddingLoader(args.vision_store) if args.vision_store else None
    language = (
        MMapEmbeddingLoader(args.language_store) if args.language_store else None
    )

    predictor = None
    if args.with_predictor:
        from deepearth_tpu.api import DeepEarth

        predictor = DeepEarth()
        predictor.register("species", type="categorical", num_classes=232)

    service = DataService(
        observations=observations,
        vision_loader=vision,
        language_loader=language,
        predictor=predictor,
    )
    server = DashboardServer(service, host=args.host, port=args.port).start()
    print(f"serving on http://{server.host}:{server.port} — Ctrl-C to stop")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()


if __name__ == "__main__":
    main()
