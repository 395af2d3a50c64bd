"""End-to-end pipeline over the EXACT reference dataset schema.

Synthesizes a dataset matching ``dashboard/dataset_config.json`` column for
column (reference: dashboard/dataset_config.json data_schema — gbif_id keys,
``taxon_name`` species column, per-row 7168-d ``language_embedding``,
6,488,064-float vision rows, train/temporal_test-2025 split), then runs the
FULL chain the reference's working C-stack ran:

  observations.parquet + vision_embeddings.parquet + vision_index.parquet
    → scripts/prepare_data.py (subprocess CLI) → mmap store
    → ObservationDataset / UnifiedDataCache (reference-schema adaptation)
    → masked multimodal training on the train split
    → linear probe + ecosystem analysis on the TRAINED embeddings
    → human-unit metrics (xyz metres / t hours)
    → served through POST /api/training/batch over real HTTP

and records the metrics in REFERENCE_E2E.json at the repo root
(reference: dashboard/services/training_data.py:22-80,
training/scripts/create_train_test_split.py, SPECIFICATIONS.MD:1811-1927).
"""

import json
import os
import subprocess
import sys
import urllib.request

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# exact reference constants (dashboard/dataset_config.json)
VISION_FLAT = 6_488_064
VISION_SHAPE = (8, 24, 24, 1408)
LANGUAGE_DIM = 7168
BOUNDS = {"north": 28.978, "south": 28.033, "east": -80.902, "west": -81.934}
YEARS = (2010, 2025)

N_OBS = 48
N_SPECIES = 6
N_VISION = 6  # full-size 6,488,064-float rows

SPECIES = [
    ("Serenoa repens", 2874344),
    ("Quercus virginiana", 2878688),
    ("Sabal palmetto", 2733007),
    ("Pinus elliottii", 5285637),
    ("Ilex cassine", 3039206),
    ("Myrica cerifera", 3052351),
]


def synthesize_reference_dataset(tmp_path):
    """Write observations/vision/index parquets with the exact reference
    schema (dashboard/dataset_config.json data_schema.observations
    required_columns, vision_embeddings.flattened_size)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    species_idx = rng.integers(0, N_SPECIES, N_OBS)
    year = rng.integers(YEARS[0], YEARS[1] + 1, N_OBS)
    # guarantee both splits are populated
    year[:8] = 2025
    year[8:] = rng.integers(YEARS[0], 2025, N_OBS - 8)
    gbif_id = np.arange(5_000_000_001, 5_000_000_001 + N_OBS, dtype=np.int64)
    has_vision = np.zeros(N_OBS, bool)
    has_vision[np.nonzero(year < 2025)[0][:N_VISION]] = True

    # species-structured language embeddings so probes/ecosystems have signal
    lang_proto = rng.standard_normal((N_SPECIES, LANGUAGE_DIM)).astype(np.float32)
    lang = (
        lang_proto[species_idx]
        + 0.05 * rng.standard_normal((N_OBS, LANGUAGE_DIM)).astype(np.float32)
    )

    df = pd.DataFrame(
        {
            "gbif_id": gbif_id,
            "taxon_id": np.asarray([SPECIES[s][1] for s in species_idx]),
            "taxon_name": [SPECIES[s][0] for s in species_idx],
            "latitude": BOUNDS["south"]
            + rng.random(N_OBS) * (BOUNDS["north"] - BOUNDS["south"]),
            "longitude": BOUNDS["west"]
            + rng.random(N_OBS) * (BOUNDS["east"] - BOUNDS["west"]),
            "year": year,
            "month": rng.integers(1, 13, N_OBS),
            "day": rng.integers(1, 29, N_OBS),
            "image_urls": [
                [f"https://example.org/img/{g}_1.jpg"] if hv else []
                for g, hv in zip(gbif_id, has_vision)
            ],
            "has_vision": has_vision,
            "language_embedding": list(lang),
            "split": np.where(year == 2025, "temporal_test", "train"),
        }
    )
    obs_path = str(tmp_path / "observations.parquet")
    df.to_parquet(obs_path)

    # vision embeddings: exact 6,488,064-float rows, species-structured
    vis_ids = gbif_id[has_vision]
    vis_species = species_idx[has_vision]
    flat = np.empty((N_VISION, VISION_FLAT), np.float32)
    patch_proto = rng.standard_normal((N_SPECIES, 1408)).astype(np.float32)
    for i, s in enumerate(vis_species):
        block = np.broadcast_to(
            patch_proto[s], (VISION_FLAT // 1408, 1408)
        ) + 0.1 * rng.standard_normal((VISION_FLAT // 1408, 1408)).astype(
            np.float32
        )
        flat[i] = block.reshape(-1)
    arr = pa.FixedSizeListArray.from_arrays(pa.array(flat.reshape(-1)), VISION_FLAT)
    vis_path = str(tmp_path / "vision_embeddings.parquet")
    pq.write_table(
        pa.table({"gbif_id": pa.array(vis_ids), "embedding": arr}), vis_path
    )
    # vision_index.parquet (reference data_paths.vision_index)
    pd.DataFrame(
        {
            "gbif_id": vis_ids,
            "embedding_file": ["vision_embeddings.parquet"] * N_VISION,
            "row": np.arange(N_VISION),
        }
    ).to_parquet(str(tmp_path / "vision_index.parquet"))
    return obs_path, vis_path, flat, vis_ids


@pytest.mark.slow
def test_reference_schema_end_to_end(tmp_path):
    import jax

    from deepearth_tpu.configs import ModalityConfig, tiny_config
    from deepearth_tpu.data import (
        DatasetConfig,
        MMapEmbeddingLoader,
        ObservationDataset,
        UnifiedDataCache,
    )
    from deepearth_tpu.evaluation import DeepEarthEvaluator, analyze_ecosystems
    from deepearth_tpu.models import DeepEarthModel
    from deepearth_tpu.serving.server import DataService, DashboardServer
    from deepearth_tpu.training import LossWeights, Trainer
    from deepearth_tpu.training.metrics import (
        coordinate_error_meters,
        time_error_hours,
    )

    obs_path, vis_path, vis_truth, vis_ids = synthesize_reference_dataset(tmp_path)

    # -- 1) CLI conversion: vision parquet → mmap store (real subprocess) ----- #
    store = str(tmp_path / "vision_store")
    r = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts", "prepare_data.py"),
            "--input", vis_path, "--id-column", "gbif_id",
            "--embedding-column", "embedding",
            "--shape", "8", "24", "24", "1408",
            "--output", store, "--dtype", "float16",
        ],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert f"{N_VISION} embeddings" in r.stdout

    vloader = MMapEmbeddingLoader(store)
    assert vloader.embedding_shape == VISION_SHAPE
    got = vloader.get(int(vis_ids[0]))
    np.testing.assert_allclose(
        got.reshape(-1), vis_truth[0], atol=2e-3, rtol=1e-2
    )  # float16 store round-trip

    # -- 2) dataset + cache over the reference schema ------------------------- #
    ds = ObservationDataset.from_parquet(obs_path)
    assert ds.n_species == N_SPECIES  # taxon_name adaptation
    cfg_ds = DatasetConfig(
        bbox=(BOUNDS["south"], BOUNDS["west"], BOUNDS["north"], BOUNDS["east"]),
        year_range=YEARS,
    )
    cache = UnifiedDataCache(ds, cfg_ds, vision_loader=vloader)

    # language embeddings come from the observations parquet itself
    lang0 = cache.get_language_embedding(int(ds.df["gbif_id"].iloc[0]))
    assert lang0 is not None and lang0.shape == (LANGUAGE_DIM,)

    # the published split column drives train/test (reference splits block)
    split_col = ds.df["split"].to_numpy()
    train_ids = ds.df["gbif_id"].to_numpy()[split_col == "train"]
    test_ids = ds.df["gbif_id"].to_numpy()[split_col == "temporal_test"]
    assert len(test_ids) >= 8
    assert (ds.df["year"].to_numpy()[split_col == "temporal_test"] == 2025).all()

    batch = cache.get_training_batch(train_ids[:8], pool_vision=True)
    assert batch["modalities"]["vision"].shape == (8, 1408)
    assert batch["modalities"]["language"].shape == (8, LANGUAGE_DIM)
    assert batch["xyzt"].shape == (8, 4)

    # -- 3) masked multimodal training on the train split --------------------- #
    cfg = tiny_config()
    cfg.modalities.clear()
    cfg.add_modality(
        ModalityConfig(name="species", encoding_type="learned_embedding",
                       input_type="categorical", vocab_size=N_SPECIES)
    )
    cfg.add_modality(
        ModalityConfig(name="vision", input_dim=1408, n_tokens=1,
                       encoder_layers=1, encoder_heads=2)
    )
    cfg.add_modality(
        ModalityConfig(name="language", input_dim=LANGUAGE_DIM, n_tokens=1,
                       encoder_layers=1, encoder_heads=2)
    )
    cfg.optimizer.learning_rate = 2e-3
    cfg.optimizer.warmup_steps = 5
    cfg.optimizer.total_steps = 40
    model = DeepEarthModel(cfg)
    trainer = Trainer(model, cfg, LossWeights(contrastive=0.05))

    rng = np.random.default_rng(0)

    def batches(pool, bs=8):
        while True:
            sel = rng.choice(pool, bs, replace=len(pool) < bs)
            yield cache.get_training_batch(sel, pool_vision=True)

    state = trainer.init_state(next(batches(train_ids)))
    state, metrics = trainer.fit(
        state, batches(train_ids), num_steps=40, log_every=20
    )
    assert np.isfinite(metrics["loss/total"])

    # -- 4) evaluation on the 2025 temporal holdout, human-unit metrics ------- #
    eval_batch = cache.get_training_batch(test_ids, pool_vision=True)
    out = model.apply({"params": state.params}, eval_batch, deterministic=True)
    feats = np.asarray(out["fused_representation"], np.float32)
    labels = np.asarray(eval_batch["modalities"]["species"])

    # bbox spans: ~105 km lat, ~101 km lon, 1 km alt; 16-year time span
    span_m = (
        (BOUNDS["north"] - BOUNDS["south"]) * 111_000.0,
        (BOUNDS["east"] - BOUNDS["west"]) * 111_000.0 * np.cos(np.deg2rad(28.5)),
        1000.0,
    )
    xyz_m = float(coordinate_error_meters(
        out["reconstructions"]["spatial"], eval_batch["xyzt"][:, :3], span_m
    ))
    t_h = float(time_error_hours(
        out["reconstructions"]["temporal"][:, 0], eval_batch["xyzt"][:, 3],
        (YEARS[1] - YEARS[0] + 1) * 365.25 * 24,
    ))
    assert np.isfinite(xyz_m) and np.isfinite(t_h)

    ev = DeepEarthEvaluator(lambda b: feats)
    probe = ev.evaluate_classification(
        feats, labels, n_classes=N_SPECIES, steps=200
    )
    # language embeddings are species prototypes → the trained fused
    # representation must beat chance on held-out 2025 observations
    assert probe.metrics["accuracy"] > 1.5 / N_SPECIES

    eco = analyze_ecosystems(
        feats, labels,
        np.asarray(eval_batch["xyzt"][:, 0]), np.asarray(eval_batch["xyzt"][:, 1]),
        n_clusters=3,
    )
    assert len(eco["clusters"]) == 3

    # -- 5) serve the same engine through POST /api/training/batch ------------ #
    cols = ds.columns()
    cols["t_norm"] = ds.normalized_xyzt(bbox=cfg_ds.bbox, year_range=YEARS)[:, 3]
    service = DataService(observations=cols, vision_loader=vloader)
    srv = DashboardServer(service, port=0).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{srv.port}/api/training/batch",
            data=json.dumps(
                {"observation_ids": [int(i) for i in vis_ids[:2]]}
            ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            served = json.loads(resp.read())
        assert served["found"] == [True, True]
        assert served["vision_shape"] == [2, *VISION_SHAPE]
        assert served["species"][0] == int(
            ds.df["species_idx"][ds.row_for_id(int(vis_ids[0]))]
        )
    finally:
        srv.stop()

    # -- 6) artifact with the human-unit metrics ------------------------------ #
    artifact = {
        "schema": "dashboard/dataset_config.json data_schema (exact)",
        "n_observations": N_OBS,
        "n_species": N_SPECIES,
        "n_vision_rows": N_VISION,
        "vision_floats_per_row": VISION_FLAT,
        "language_dim": LANGUAGE_DIM,
        "split": {"train": int(len(train_ids)), "temporal_test_2025": int(len(test_ids))},
        "train_steps": 40,
        "final_loss": float(metrics["loss/total"]),
        "temporal_holdout": {
            "probe_accuracy": float(probe.metrics["accuracy"]),
            "chance": 1.0 / N_SPECIES,
            "xyz_error_m": xyz_m,
            "t_error_h": t_h,
            "ecosystem_silhouette": float(eco["silhouette"]),
        },
        "served_via_http": True,
    }
    with open(os.path.join(REPO, "REFERENCE_E2E.json"), "w") as f:
        json.dump(artifact, f, indent=2)
