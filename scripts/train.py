"""Training CLI: argparse + optional YAML override merge
(reference: hpc/train_distrbuted.py:652-724 CLI, yaml merge :716-723;
launcher parity with hpc/slurm_train.sh).

Examples:
    # single host, synthetic data smoke run
    python scripts/train.py --steps 200 --batch-size 32

    # multi-host (set COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID or SLURM
    # MASTER_ADDR/WORLD_SIZE/RANK env vars)
    python scripts/train.py --distributed --steps 10000 \
        --config configs/train.yaml --checkpoint-dir ckpts/
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="DeepEarth-TPU trainer")
    p.add_argument("--config", type=str, default=None, help="YAML override file")
    p.add_argument("--steps", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--learning-rate", type=float, default=1e-4)
    p.add_argument("--warmup-steps", type=int, default=100)
    p.add_argument("--hidden-dim", type=int, default=256)
    p.add_argument("--n-layers", type=int, default=4)
    p.add_argument("--checkpoint-dir", type=str, default=None)
    p.add_argument("--resume", action="store_true",
                   help="resume from latest checkpoint")
    p.add_argument("--distributed", action="store_true")
    p.add_argument("--log-every", type=int, default=50)
    p.add_argument("--eval-every", type=int, default=0)
    p.add_argument("--save-every", type=int, default=500)
    p.add_argument("--metrics-jsonl", type=str, default=None)
    p.add_argument(
        "--modalities", type=str, default="species",
        help="comma list from: species,weather,vision,language",
    )
    p.add_argument(
        "--data-dir", type=str, default=None,
        help="real dataset directory (observations.parquet + optional "
        "vision/language mmap stores + dataset_config.json); omit for "
        "synthetic data",
    )
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args()

    # YAML merge: file values override CLI defaults, explicit CLI wins
    if args.config:
        import yaml

        with open(args.config) as f:
            overrides = yaml.safe_load(f) or {}
        explicit = {
            a.dest for a in p._actions
            if any(opt in sys.argv for opt in a.option_strings)
        }
        for k, v in overrides.items():
            key = k.replace("-", "_")
            if hasattr(args, key) and key not in explicit:
                setattr(args, key, v)
    return args


def main():
    args = parse_args()

    from deepearth_tpu.configs import (
        DeepEarthConfig,
        Grid4DConfig,
        ModalityConfig,
        TransformerConfig,
    )
    from deepearth_tpu.data import SyntheticConfig, SyntheticEarthDataGenerator
    from deepearth_tpu.data.batches import device_prefetch
    from deepearth_tpu.models import DeepEarthModel
    from deepearth_tpu.training import LossWeights, Trainer
    from deepearth_tpu.utils.logging import JSONLMetricWriter, setup_logging

    setup_logging()

    if args.distributed:
        from deepearth_tpu.training.distributed import initialize_distributed

        initialize_distributed()

    cfg = DeepEarthConfig(
        hidden_dim=args.hidden_dim,
        n_heads=max(4, args.hidden_dim // 64),
        n_layers=args.n_layers,
        grid4d=Grid4DConfig(
            n_spatial_levels=12, n_temporal_levels=6, hash_table_size=2 ** 17
        ),
        modality_encoder=TransformerConfig(
            hidden_dim=args.hidden_dim // 2, n_heads=4, n_layers=2
        ),
    )
    cfg.optimizer.learning_rate = args.learning_rate
    cfg.optimizer.warmup_steps = args.warmup_steps
    cfg.optimizer.total_steps = args.steps
    wanted = tuple(m.strip() for m in args.modalities.split(",") if m.strip())
    syn_cfg = SyntheticConfig()

    if args.data_dir:
        # real dataset: observations.parquet + mmap embedding stores
        # (reference training path: training/deepearth_multimodal_training.py)
        from deepearth_tpu.data import (
            DatasetConfig,
            MMapEmbeddingLoader,
            ObservationDataset,
            UnifiedDataCache,
        )
        from deepearth_tpu.data.batches import threaded_producer

        dcfg_path = os.path.join(args.data_dir, "dataset_config.json")
        dcfg = (
            DatasetConfig.from_json(dcfg_path)
            if os.path.exists(dcfg_path)
            else DatasetConfig()
        )
        ds = ObservationDataset.from_parquet(
            os.path.join(args.data_dir, "observations.parquet")
        )
        loaders = {}
        for store in ("vision", "language"):
            base = os.path.join(args.data_dir, store)
            if os.path.exists(base + ".bin"):
                loaders[store] = MMapEmbeddingLoader(base)
        cache = UnifiedDataCache(
            ds, dcfg, loaders.get("vision"), loaders.get("language")
        )
        cfg.add_modality(
            ModalityConfig(
                name="species", encoding_type="learned_embedding",
                input_type="categorical", vocab_size=ds.n_species,
            )
        )
        if "vision" in loaders:
            cfg.add_modality(
                ModalityConfig(
                    name="vision",
                    input_dim=loaders["vision"].embedding_shape[-1],
                    n_tokens=16, encoder_layers=1, encoder_heads=8,
                )
            )
        if "language" in loaders:
            lshape = loaders["language"].embedding_shape
            cfg.add_modality(
                ModalityConfig(
                    name="language", input_dim=lshape[-1], n_tokens=4,
                    encoder_layers=1, encoder_heads=8,
                )
            )
        model = DeepEarthModel(cfg)

        def make_batches():
            return cache.batch_iterator(
                args.batch_size, seed=args.seed,
                steps=args.steps + 1, process_shard=args.distributed,
            )

        batches = device_prefetch(threaded_producer(make_batches), size=2)
        first_batch = next(
            cache.batch_iterator(args.batch_size, steps=1, shuffle=False)
        )
    else:
        registry = {
            "species": ModalityConfig(
                name="species", encoding_type="learned_embedding",
                input_type="categorical", vocab_size=232,
            ),
            "weather": ModalityConfig(
                name="weather", input_dim=syn_cfg.weather_dim, n_tokens=1,
                encoder_layers=1, encoder_heads=4,
            ),
            "vision": ModalityConfig(
                name="vision", input_dim=syn_cfg.vision_dim, n_tokens=4,
                encoder_layers=1, encoder_heads=4,
            ),
            "language": ModalityConfig(
                name="language", input_dim=syn_cfg.language_dim, n_tokens=2,
                encoder_layers=1, encoder_heads=4,
            ),
        }
        for m in wanted:
            if m not in registry:
                raise SystemExit(
                    f"unknown modality {m!r}; choose from {list(registry)}"
                )
            cfg.add_modality(registry[m])
        model = DeepEarthModel(cfg)

        gen = SyntheticEarthDataGenerator(syn_cfg)
        batches = device_prefetch(
            gen.batch_iterator(args.batch_size, modalities=wanted), size=2
        )
        first_batch = next(
            gen.batch_iterator(args.batch_size, modalities=wanted, steps=1)
        )

    if args.distributed:
        from deepearth_tpu.training.distributed import DistributedTrainer

        trainer = DistributedTrainer(model, cfg, seed=args.seed)
        state = trainer.init_state(
            first_batch
        )
        state, metrics = trainer.fit(
            state, batches, args.steps, log_every=args.log_every
        )
    else:
        trainer = Trainer(
            model, cfg, LossWeights(contrastive=0.01),
            checkpoint_dir=args.checkpoint_dir, seed=args.seed,
        )
        state = trainer.init_state(
            first_batch
        )
        if args.resume and args.checkpoint_dir:
            state = trainer.restore(state)
        state, metrics = trainer.fit(
            state,
            batches,
            args.steps,
            log_every=args.log_every,
            save_every=args.save_every if args.checkpoint_dir else 0,
        )
        if args.checkpoint_dir:
            trainer.save(state, int(state.step))

    if args.metrics_jsonl:
        w = JSONLMetricWriter(args.metrics_jsonl)
        w.log(metrics, int(state.step))
        w.close()
    print({k: round(v, 5) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
