"""Data-layer tests: synthetic generator, mmap store, prefetch, splits."""

import numpy as np
import pytest

from deepearth_tpu.data import (
    MMapEmbeddingLoader,
    MMapEmbeddingWriter,
    SplitConfig,
    SyntheticConfig,
    SyntheticEarthDataGenerator,
    collate_observations,
    convert_arrays_to_store,
    create_spatial_temporal_split,
    device_prefetch,
    haversine_km,
    load_split,
    save_split,
    threaded_producer,
)


@pytest.fixture(scope="module")
def gen():
    return SyntheticEarthDataGenerator(
        SyntheticConfig(vision_dim=32, vision_patches=4, language_dim=16)
    )


class TestSynthetic:
    def test_observation_schema(self, gen):
        obs = gen.sample_observations(16)
        assert obs["xyzt"].shape == (16, 4)
        assert obs["xyzt"].min() >= 0 and obs["xyzt"].max() <= 1
        assert obs["species"].shape == (16,)
        assert obs["species"].max() < 232
        assert obs["vision"].shape == (16, 4, 32)
        assert obs["language"].shape == (16, 16)
        assert obs["weather"].shape == (16, 5)
        # inside Central Florida bbox
        assert obs["lat"].min() >= 28.03 and obs["lat"].max() <= 28.98

    def test_determinism(self, gen):
        a = gen.sample_observations(8, seed=42)
        b = gen.sample_observations(8, seed=42)
        np.testing.assert_array_equal(a["species"], b["species"])
        np.testing.assert_allclose(a["vision"], b["vision"])

    def test_learnable_structure(self, gen):
        """Embeddings must carry species signal (low intra-species variance)."""
        obs = gen.sample_observations(256, seed=7)
        sp = obs["species"]
        vis = obs["vision"].mean(axis=1)
        # pick the most frequent species
        vals, counts = np.unique(sp, return_counts=True)
        s = vals[np.argmax(counts)]
        intra = vis[sp == s].std(axis=0).mean()
        inter = vis.std(axis=0).mean()
        assert intra < inter * 0.5

    def test_batch_iterator(self, gen):
        it = gen.batch_iterator(4, modalities=("species", "weather"), steps=3)
        batches = list(it)
        assert len(batches) == 3
        assert batches[0]["xyzt"].shape == (4, 4)
        assert set(batches[0]["modalities"]) == {"species", "weather"}


class TestMMapStore:
    def test_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        ids = [101, 202, 303, 404, 505]
        embs = rng.standard_normal((5, 8, 16)).astype(np.float32)
        path = str(tmp_path / "store")
        loader = convert_arrays_to_store(path, ids, embs, dtype="float32")
        assert len(loader) == 5
        got = loader.get(303)
        np.testing.assert_allclose(got, embs[2], atol=1e-6)

    def test_float16_storage(self, tmp_path):
        rng = np.random.default_rng(1)
        ids = list(range(10))
        embs = rng.standard_normal((10, 4)).astype(np.float32)
        path = str(tmp_path / "f16")
        loader = convert_arrays_to_store(path, ids, embs, dtype="float16")
        got = loader.get(3)
        assert got.dtype == np.float32
        np.testing.assert_allclose(got, embs[3], atol=1e-2)
        # storage is half size
        import os
        assert os.path.getsize(path + ".bin") == 10 * 4 * 2

    def test_batch_and_misses(self, tmp_path):
        ids = [1, 2, 3]
        embs = np.ones((3, 4), np.float32)
        loader = convert_arrays_to_store(str(tmp_path / "b"), ids, embs)
        batch, found = loader.get_batch([1, 99, 3])
        assert found.tolist() == [True, False, True]
        np.testing.assert_allclose(batch[1], 0.0)
        assert loader.stats["misses"] == 1
        assert loader.mean_load_ms() >= 0

    def test_writer_shape_validation(self, tmp_path):
        w = MMapEmbeddingWriter(str(tmp_path / "v"), (4,))
        with pytest.raises(ValueError):
            w.add(1, np.ones(5))
        w.finalize()

    def test_append_extends_store(self, tmp_path):
        """Chunked conversion: --append rows land after the existing payload
        and every row stays fetchable (the bounded-staging-disk path the
        full-scale soak uses)."""
        rng = np.random.default_rng(3)
        path = str(tmp_path / "chunked")
        embs = rng.standard_normal((6, 3, 4)).astype(np.float32)
        with MMapEmbeddingWriter(path, (3, 4), dtype="float16") as w:
            for i in range(3):
                w.add(100 + i, embs[i])
        with MMapEmbeddingWriter(path, (3, 4), dtype="float16", append=True) as w:
            for i in range(3, 6):
                w.add(100 + i, embs[i])
        from deepearth_tpu.data import MMapEmbeddingLoader

        loader = MMapEmbeddingLoader(path)
        assert len(loader) == 6
        for i in range(6):
            np.testing.assert_allclose(
                loader.get(100 + i), embs[i], atol=1e-2
            )
        # shape/dtype mismatches refuse to append
        with pytest.raises(ValueError):
            MMapEmbeddingWriter(path, (4, 3), dtype="float16", append=True)
        with pytest.raises(ValueError):
            MMapEmbeddingWriter(path, (3, 4), dtype="float32", append=True)


class TestBatches:
    def test_collate(self, gen):
        obs = [
            {k: v[i] for k, v in gen.sample_observations(3).items()}
            for i in range(3)
        ]
        batch = collate_observations(obs, ("species", "weather"))
        assert batch["xyzt"].shape == (3, 4)
        assert batch["modalities"]["species"].shape == (3,)

    def test_device_prefetch(self, gen):
        import jax

        it = gen.batch_iterator(2, modalities=("species",), steps=4)
        out = list(device_prefetch(it, size=2))
        assert len(out) == 4
        assert isinstance(out[0]["xyzt"], jax.Array)

    def test_echo_on_device(self, gen):
        """Each transferred batch repeats `factor` times reusing the SAME
        device buffer (no re-transfer), and echoed masked train steps make
        progress (the step rng re-randomizes targets per echo)."""
        import jax

        from deepearth_tpu.data import echo_on_device

        it = gen.batch_iterator(2, modalities=("species",), steps=2)
        out = list(echo_on_device(device_prefetch(it, size=1), factor=3))
        assert len(out) == 6
        # echoes share the underlying device buffer — zero extra transfer
        assert out[0]["xyzt"] is out[1]["xyzt"] is out[2]["xyzt"]
        assert out[3]["xyzt"] is not out[2]["xyzt"]

        with pytest.raises(ValueError):
            next(echo_on_device(iter([{}]), factor=0))

        from deepearth_tpu.configs import tiny_config
        from deepearth_tpu.models import DeepEarthModel
        from deepearth_tpu.training import (
            LossWeights,
            create_optimizer,
            make_train_step,
        )
        from deepearth_tpu.training.trainer import TrainState

        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        batch = next(iter(gen.batch_iterator(8, modalities=("species",),
                                             steps=1)))
        params = model.init(jax.random.PRNGKey(0), batch)["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )
        step = jax.jit(make_train_step(model, cfg, LossWeights()))
        losses = []
        echoed = echo_on_device(device_prefetch(iter([batch])), factor=12)
        for b in echoed:
            # fixed masking rng: per-step losses are comparable (random
            # masks would re-randomize the prediction problem each echo)
            state, m = step(state, b, jax.random.PRNGKey(7))
            losses.append(float(m["loss/total"]))
        assert len(losses) == 12
        # default optimizer warmup keeps early lr small — progress, not
        # convergence, is the claim
        assert losses[-1] < losses[0] - 0.05

    def test_threaded_producer(self, gen):
        out = list(
            threaded_producer(
                lambda: gen.batch_iterator(2, modalities=("species",), steps=5)
            )
        )
        assert len(out) == 5


class TestSplits:
    def test_haversine(self):
        # Orlando to Tampa ≈ 135 km
        d = haversine_km(28.538, -81.379, 27.950, -82.457)
        assert 120 < float(d) < 150

    def test_split_properties(self, gen):
        obs = gen.sample_observations(2000, seed=3)
        year = (2010 + obs["xyzt"][:, 3] * 15).astype(int)
        cfg = SplitConfig(n_spatial_regions=3, region_radius_km=5.0,
                          min_separation_km=10.0, holdout_years=(2024,))
        split = create_spatial_temporal_split(obs["lat"], obs["lon"], year, cfg)
        n = 2000
        tr, sp, te = (
            split["train_idx"], split["spatial_test_idx"], split["temporal_test_idx"]
        )
        # partitions are disjoint
        assert len(set(tr) & set(sp)) == 0
        assert len(set(tr) & set(te)) == 0
        assert len(set(sp) & set(te)) == 0
        assert len(tr) > 0 and len(sp) > 0 and len(te) > 0
        # temporal holdout is exactly the holdout year
        assert np.all(year[te] == 2024)
        assert not np.any(year[tr] == 2024)
        # spatial test points are inside some region; train points outside all
        for clat, clon in split["region_centres"]:
            d_train = haversine_km(obs["lat"][tr], obs["lon"][tr], clat, clon)
            assert np.all(d_train > 5.0)

    def test_split_io(self, gen, tmp_path):
        obs = gen.sample_observations(500, seed=4)
        year = (2010 + obs["xyzt"][:, 3] * 15).astype(int)
        split = create_spatial_temporal_split(obs["lat"], obs["lon"], year)
        p = str(tmp_path / "split.json")
        save_split(split, p)
        loaded = load_split(p)
        np.testing.assert_array_equal(loaded["train_idx"], split["train_idx"])
        assert loaded["config"].holdout_years == (2025,)


class TestNativeGather:
    def test_native_builds_and_matches_numpy(self, tmp_path):
        from deepearth_tpu.data.native import gather_rows, native_available

        rng = np.random.default_rng(0)
        blob = rng.standard_normal(4096).astype(np.float16)
        p = tmp_path / "blob.bin"
        blob.tofile(p)
        mm = np.memmap(p, dtype=np.float16, mode="r")
        row_elems = 64
        rows = np.asarray([3, 0, 17, 42], np.int64)
        offsets = rows * row_elems * 2  # bytes
        out = gather_rows(mm, offsets, row_elems * 2, n_threads=2)
        got = out.view(np.float16).reshape(4, row_elems)
        for i, r in enumerate(rows):
            np.testing.assert_array_equal(
                got[i], blob[r * row_elems : (r + 1) * row_elems]
            )
        # in this image a compiler exists, so the native path must be active
        assert native_available()

    def test_get_batch_uses_gather_and_counts_misses(self, tmp_path):
        from deepearth_tpu.data import convert_arrays_to_store

        ids = [10, 20, 30]
        embs = np.arange(3 * 8, dtype=np.float32).reshape(3, 8)
        loader = convert_arrays_to_store(str(tmp_path / "g"), ids, embs,
                                         dtype="float32")
        batch, found = loader.get_batch([20, 99, 10], n_threads=2)
        assert found.tolist() == [True, False, True]
        np.testing.assert_allclose(batch[0], embs[1])
        np.testing.assert_allclose(batch[2], embs[0])
        np.testing.assert_allclose(batch[1], 0.0)


class TestNpySampleDataset:
    def test_write_load_collate(self, tmp_path):
        """HPC npy-per-sample layout round trip
        (reference: hpc/train_distrbuted.py:62-157)."""
        from deepearth_tpu.data import NpySampleDataset, write_npy_dataset

        rng = np.random.default_rng(0)
        samples = [
            {
                "id": f"s{i}",
                "xyzt": rng.random(4),
                "images": rng.random((3, 8, 8)),
                "input_ids": np.arange(5) + i,
                "modalities": {"weather": rng.random(5)},
            }
            for i in range(7)
        ]
        write_npy_dataset(str(tmp_path), "train", samples)
        ds = NpySampleDataset(str(tmp_path), "train", cache_size=3)
        assert len(ds) == 7
        item = ds[2]
        assert item["xyzt"].shape == (4,)
        assert item["images"].shape == (3, 8, 8)
        assert item["input_ids"].dtype == np.int32
        np.testing.assert_allclose(
            item["weather"], samples[2]["modalities"]["weather"], rtol=1e-6
        )
        # FIFO cache caps at 3 entries
        for i in range(7):
            ds[i]
        assert len(ds._cache) == 3
        # batch iteration in the framework schema
        batch = next(ds.batch_iterator(4, modalities=("weather",), steps=1))
        assert batch["xyzt"].shape == (4, 4)
        assert batch["modalities"]["weather"].shape == (4, 5)
        # max_samples truncation
        assert len(NpySampleDataset(str(tmp_path), "train", max_samples=3)) == 3
