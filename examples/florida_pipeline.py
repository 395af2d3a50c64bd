"""End-to-end Central-Florida-shaped pipeline demo.

Chains the whole data+training stack the way the reference's working C-stack
did (reference call stack: training/deepearth_multimodal_training.py:325):

  synthetic observations → parquet + mmap embedding stores →
  ObservationDataset + UnifiedDataCache → spatial/temporal splits →
  masked multimodal training → linear-probe evaluation + ecosystem analysis.

Runs on CPU in ~2 minutes (shrunken embedding dims).
"""

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    if not os.environ.get("DEMO_TPU"):
        # the demo's shapes are CPU-sized; remote TPU compiles would
        # dominate its runtime (set DEMO_TPU=1 to run on the chip anyway)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass

    from deepearth_tpu.configs import ModalityConfig, tiny_config
    from deepearth_tpu.data import (
        DatasetConfig,
        ObservationDataset,
        SplitConfig,
        SyntheticConfig,
        SyntheticEarthDataGenerator,
        UnifiedDataCache,
        convert_arrays_to_store,
        create_spatial_temporal_split,
    )
    from deepearth_tpu.evaluation import DeepEarthEvaluator, analyze_ecosystems
    from deepearth_tpu.models import DeepEarthModel
    from deepearth_tpu.training import LossWeights, Trainer

    t_start = time.time()
    n_obs = 600
    gen = SyntheticEarthDataGenerator(
        SyntheticConfig(vision_dim=64, vision_patches=4, language_dim=96)
    )
    obs = gen.sample_observations(n_obs, seed=0)
    ids = np.arange(10_000, 10_000 + n_obs)

    with tempfile.TemporaryDirectory() as td:
        # 1) build the storage layer: parquet observations + mmap stores
        import pandas as pd

        df = pd.DataFrame(
            {
                "gbif_id": ids,
                "species": obs["species"],
                "latitude": obs["lat"],
                "longitude": obs["lon"],
                "altitude": obs["alt"],
                "year": (2010 + obs["xyzt"][:, 3] * 15).astype(int),
                "month": np.ones(n_obs, int) * 6,
            }
        )
        pq = os.path.join(td, "observations.parquet")
        df.to_parquet(pq)
        vstore = convert_arrays_to_store(
            os.path.join(td, "vision"), ids, obs["vision"]
        )
        lstore = convert_arrays_to_store(
            os.path.join(td, "language"), ids, obs["language"]
        )
        print(f"storage built: {n_obs} obs, vision {vstore.embedding_shape}, "
              f"language {lstore.embedding_shape}")

        # 2) dataset + cache + splits
        ds = ObservationDataset.from_parquet(pq)
        cache = UnifiedDataCache(ds, DatasetConfig(), vstore, lstore)
        split = create_spatial_temporal_split(
            df["latitude"].to_numpy(), df["longitude"].to_numpy(),
            df["year"].to_numpy(),
            SplitConfig(n_spatial_regions=2, region_radius_km=4.0,
                        min_separation_km=8.0, holdout_years=(2024,)),
        )
        train_ids = ids[split["train_idx"]]
        test_ids = ids[split["temporal_test_idx"]]
        print(f"split: train {len(train_ids)}, spatial test "
              f"{len(split['spatial_test_idx'])}, temporal test {len(test_ids)}")

        # 3) model + training on masked multimodal reconstruction
        cfg = tiny_config()
        cfg.modalities.clear()
        cfg.add_modality(
            ModalityConfig(name="species", encoding_type="learned_embedding",
                           input_type="categorical", vocab_size=232)
        )
        cfg.add_modality(
            ModalityConfig(name="vision", input_dim=64, n_tokens=2,
                           encoder_layers=1, encoder_heads=2)
        )
        cfg.add_modality(
            ModalityConfig(name="language", input_dim=96, n_tokens=1,
                           encoder_layers=1, encoder_heads=2)
        )
        cfg.optimizer.learning_rate = 2e-3
        cfg.optimizer.warmup_steps = 5
        cfg.optimizer.total_steps = 80
        model = DeepEarthModel(cfg)
        trainer = Trainer(model, cfg, LossWeights(contrastive=0.05))

        rng = np.random.default_rng(0)

        def batches(id_pool, bs=16):
            while True:
                sel = rng.choice(id_pool, bs, replace=False)
                yield cache.get_training_batch(sel)

        state = trainer.init_state(next(batches(train_ids)))
        state, metrics = trainer.fit(
            state, batches(train_ids), num_steps=80, log_every=40
        )
        print(f"trained 80 steps: loss {metrics['loss/total']:.4f}, "
              f"species acc {metrics.get('acc/species', 0):.3f}")

        # 4) frozen-feature evaluation on the temporal holdout
        def feature_fn(batch):
            return np.asarray(
                model.apply(
                    {"params": state.params}, batch, deterministic=True
                )["fused_representation"],
                np.float32,
            )

        eval_ids = test_ids[:128] if len(test_ids) >= 16 else train_ids[:128]
        eval_batch = cache.get_training_batch(eval_ids)
        feats = feature_fn(eval_batch)
        labels = np.asarray(eval_batch["modalities"]["species"])
        ev = DeepEarthEvaluator(feature_fn)
        res = ev.evaluate_classification(
            feats, labels, n_classes=232, steps=200
        )
        print(f"temporal-holdout probe: acc {res.metrics['accuracy']:.3f} "
              f"(chance ≈ {1/len(np.unique(labels)):.3f})")

        # 5) ecosystem clustering of learned embeddings
        eco = analyze_ecosystems(
            feats, labels,
            np.asarray(eval_batch["xyzt"][:, 0]),
            np.asarray(eval_batch["xyzt"][:, 1]),
            n_clusters=4,
        )
        print(f"ecosystems: {len(eco['clusters'])} clusters, "
              f"silhouette {eco['silhouette']:.3f}")

    print(f"\npipeline demo completed in {time.time() - t_start:.1f}s ✓")


if __name__ == "__main__":
    main()
