"""Tests for the observation data engine, REST serving layer, and training
recipes (C-stack equivalents)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepearth_tpu.data import (
    ObservationDataset,
    UnifiedDataCache,
    DatasetConfig,
    convert_arrays_to_store,
    image_level_mean,
    reshape_vision_embedding,
    spatial_attention_map,
    spatial_patch,
    temporal_frame,
)
from deepearth_tpu.models import (
    BidirectionalReconstructor,
    MultimodalAutoencoder,
    VisionSequenceDecoder,
)
from deepearth_tpu.serving import DashboardClient, DashboardServer, DataService
from deepearth_tpu.training import (
    TrainState,
    create_optimizer,
    create_vision_decoder_finetune_state,
    make_autoencoder_step,
    make_bidirectional_step,
)
from deepearth_tpu.configs import OptimizerConfig


def make_dataset(n=50, seed=0):
    rng = np.random.default_rng(seed)
    return ObservationDataset.from_arrays(
        gbif_id=np.arange(1000, 1000 + n),
        species=rng.choice(["Quercus", "Pinus", "Acer"], n),
        latitude=28.03 + rng.random(n) * 0.9,
        longitude=-81.93 + rng.random(n) * 1.0,
        altitude=rng.random(n) * 50,
        year=rng.integers(2010, 2026, n),
        month=rng.integers(1, 13, n),
    )


class TestVisionReshape:
    def test_reshape_helpers(self):
        flat = np.arange(8 * 4 * 4 * 6, dtype=np.float32)
        emb = flat.reshape(8, 4, 4, 6)
        assert temporal_frame(emb, 2).shape == (4, 4, 6)
        assert spatial_patch(emb, 1, 3).shape == (8, 6)
        assert image_level_mean(emb).shape == (6,)
        assert spatial_attention_map(emb).shape == (4, 4)

    def test_full_vjepa2_shape(self):
        flat = np.zeros(6488064, np.float32)
        assert reshape_vision_embedding(flat).shape == (8, 24, 24, 1408)


class TestObservationDataset:
    def test_species_vocab(self):
        ds = make_dataset()
        assert ds.n_species == 3
        assert ds.species_vocab == ["Acer", "Pinus", "Quercus"]
        assert ds.df["species_idx"].max() <= 2

    def test_normalized_xyzt(self):
        ds = make_dataset()
        xyzt = ds.normalized_xyzt(
            bbox=(28.03, -81.93, 28.98, -80.90), year_range=(2010, 2026)
        )
        assert xyzt.shape == (50, 4)
        assert xyzt.min() >= 0 and xyzt.max() <= 1

    def test_parquet_roundtrip(self, tmp_path):
        ds = make_dataset()
        p = str(tmp_path / "obs.parquet")
        ds.df.drop(columns=["species_idx"]).to_parquet(p)
        ds2 = ObservationDataset.from_parquet(p)
        assert len(ds2) == len(ds)
        assert ds2.row_for_id(1005) == 5


class TestUnifiedCache:
    def test_training_batch(self, tmp_path):
        ds = make_dataset(20)
        rng = np.random.default_rng(1)
        ids = ds.df["gbif_id"].to_numpy()[:10]
        vis = rng.standard_normal((10, 4, 6, 6, 8)).astype(np.float32)
        lang = rng.standard_normal((10, 16)).astype(np.float32)
        vloader = convert_arrays_to_store(str(tmp_path / "v"), ids, vis)
        lloader = convert_arrays_to_store(str(tmp_path / "l"), ids, lang)
        cache = UnifiedDataCache(
            ds, DatasetConfig(cache_size=4), vloader, lloader
        )
        batch = cache.get_training_batch(ids[:4])
        assert batch["xyzt"].shape == (4, 4)
        assert batch["modalities"]["species"].shape == (4,)
        # 4D+ vision flattened to (B, S, C)
        assert batch["modalities"]["vision"].shape == (4, 4 * 6 * 6, 8)
        assert batch["modalities"]["language"].shape == (4, 16)
        # LRU cache works
        _ = cache.get_vision_embedding(int(ids[0]))
        assert len(cache._vision_cache) <= 4
        # unknown id raises
        with pytest.raises(KeyError):
            cache.get_training_batch([999999])

    def test_null_language_embedding_rows_zero_fill(self):
        """Reference-schema parquets can carry per-row None in
        language_embedding (get_language_embedding guards it); the batch
        path must zero-fill those rows, not crash np.stack."""
        ds = make_dataset(6)
        emb = [np.ones(8, np.float32) * i for i in range(6)]
        emb[2] = None
        ds.df["language_embedding"] = emb
        cache = UnifiedDataCache(ds, DatasetConfig(), None, None)
        ids = ds.df["gbif_id"].to_numpy()[:4]
        batch = cache.get_training_batch(ids, include_vision=False)
        lang = batch["modalities"]["language"]
        assert lang.shape == (4, 8)
        np.testing.assert_array_equal(lang[2], np.zeros(8))
        np.testing.assert_array_equal(lang[1], np.ones(8))

    def test_language_matrix_semantics(self):
        """The fp16 matrix fast path must match the loop path's contract:
        an all-None selection omits the 'language' key, and a wider
        embedding_dtype request bypasses the fp16 matrix."""
        ds = make_dataset(6)
        emb = [np.ones(8, np.float32) * i for i in range(6)]
        emb[0] = emb[1] = None
        ds.df["language_embedding"] = emb
        cache = UnifiedDataCache(ds, DatasetConfig(), None, None)
        ids = ds.df["gbif_id"].to_numpy()
        # rows 0,1 are both None -> no language modality in that batch
        b_none = cache.get_training_batch(ids[:2], include_vision=False)
        assert "language" not in b_none["modalities"]
        # mixed batch: fast path, zero-fill, fp16
        b_mix = cache.get_training_batch(ids[1:4], include_vision=False)
        lang = b_mix["modalities"]["language"]
        assert lang.dtype == np.float16
        np.testing.assert_array_equal(lang[0], np.zeros(8))
        np.testing.assert_array_equal(lang[2], np.full(8, 3.0))
        # wider dtype request honors the ask (loop path, float32 out)
        b32 = cache.get_training_batch(
            ids[2:4], include_vision=False, embedding_dtype=np.float32
        )
        assert b32["modalities"]["language"].dtype == np.float32

    def test_pooled_vision(self, tmp_path):
        ds = make_dataset(5)
        ids = ds.df["gbif_id"].to_numpy()[:5]
        vis = np.ones((5, 2, 3, 3, 4), np.float32)
        vloader = convert_arrays_to_store(str(tmp_path / "v2"), ids, vis)
        cache = UnifiedDataCache(ds, DatasetConfig(), vloader, None)
        batch = cache.get_training_batch(ids, pool_vision=True)
        assert batch["modalities"]["vision"].shape == (5, 4)


@pytest.fixture(scope="module")
def server():
    ds = make_dataset(30)
    cols = ds.columns()
    service = DataService(observations=cols)
    srv = DashboardServer(service, port=0).start()
    yield srv, cols
    srv.stop()


class TestServing:
    def test_health(self, server):
        srv, cols = server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        h = c.health()
        assert h["status"] == "healthy"
        assert h["n_observations"] == 30

    def test_observations_bbox_filter(self, server):
        srv, cols = server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        all_obs = c.observations()
        assert all_obs["count"] == 30
        tiny = c.observations(bbox=(28.03, -81.93, 28.10, -81.80))
        assert tiny["count"] < 30

    def test_single_observation_and_404(self, server):
        srv, cols = server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        obs = c.observation(int(cols["gbif_id"][0]))
        assert obs["gbif_id"] == int(cols["gbif_id"][0])
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            c.observation(42)

    def test_species_route(self, server):
        srv, _ = server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        sp = c.species()
        assert sp["n_species"] == 3

    def test_training_batch_route(self, server):
        srv, cols = server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        ids = [int(i) for i in cols["gbif_id"][:5]]
        out = c.training_batch(ids)
        assert out["found"] == [True] * 5
        assert len(out["locations"]) == 5
        bench = c.benchmark_training_batch(ids, runs=3)
        assert bench["p50_ms"] > 0

    def test_projection_route(self, server):
        srv, _ = server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        emb = np.random.default_rng(0).standard_normal((20, 8))
        proj = c.projection(emb, n_components=2)
        assert proj.shape == (20, 2)

    def test_grid_statistics(self, server):
        srv, _ = server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        g = c._get("/api/grid_statistics?n_bins=5")
        assert np.asarray(g["grid"]).shape == (5, 5)
        assert np.asarray(g["grid"]).sum() == 30


class TestRecipes:
    def test_bidirectional_step_trains(self):
        model = BidirectionalReconstructor(
            vision_dim=16, language_dim=24, hidden_dim=32
        )
        rng = jax.random.PRNGKey(0)
        batch = {
            "vision": jax.random.normal(rng, (8, 5, 16)),
            "language": jax.random.normal(jax.random.PRNGKey(1), (8, 24)),
        }
        params = model.init(
            jax.random.PRNGKey(2), vision=batch["vision"], language=batch["language"]
        )["params"]
        cfg = OptimizerConfig(learning_rate=1e-2, warmup_steps=1, total_steps=50)
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=create_optimizer(cfg)
        )
        step = jax.jit(make_bidirectional_step(model))
        _, m0 = step(state, batch, jax.random.PRNGKey(3))
        for i in range(15):
            state, m = step(state, batch, jax.random.PRNGKey(4 + i))
        assert float(m["loss/total"]) < float(m0["loss/total"])

    def test_autoencoder_step_with_contrastive(self):
        model = MultimodalAutoencoder(
            vision_dim=16, language_dim=24, bottleneck_dim=8,
            n_species=4, hidden_dim=32,
        )
        rng = jax.random.PRNGKey(0)
        batch = {
            "vision": jax.random.normal(rng, (8, 16)),
            "language": jax.random.normal(jax.random.PRNGKey(1), (8, 24)),
            "species": jnp.asarray([0, 0, 1, 1, 2, 2, 3, 3]),
        }
        params = model.init(
            jax.random.PRNGKey(2), vision=batch["vision"], language=batch["language"]
        )["params"]
        cfg = OptimizerConfig(learning_rate=1e-2, warmup_steps=1, total_steps=50)
        state = TrainState.create(
            apply_fn=model.apply, params=params, tx=create_optimizer(cfg)
        )
        step = jax.jit(make_autoencoder_step(model))
        _, m0 = step(state, batch, jax.random.PRNGKey(3))
        assert "loss/contrastive" in m0
        for i in range(15):
            state, m = step(state, batch, jax.random.PRNGKey(4 + i))
        assert float(m["loss/total"]) < float(m0["loss/total"])

    def test_vision_decoder_finetune_freezes(self):
        model = BidirectionalReconstructor(
            vision_dim=16, language_dim=24, hidden_dim=32
        )
        batch = {
            "vision": jax.random.normal(jax.random.PRNGKey(0), (4, 16)),
            "language": jax.random.normal(jax.random.PRNGKey(1), (4, 24)),
        }
        params = model.init(
            jax.random.PRNGKey(2), vision=batch["vision"], language=batch["language"]
        )["params"]
        state = create_vision_decoder_finetune_state(
            model, params,
            OptimizerConfig(learning_rate=1e-2, warmup_steps=0, total_steps=10),
        )
        step = jax.jit(make_bidirectional_step(model))
        before = jax.tree_util.tree_map(np.asarray, state.params)
        state, _ = step(state, batch, jax.random.PRNGKey(3))
        after = state.params
        # frozen branch unchanged
        np.testing.assert_allclose(
            np.asarray(after["vision_to_language"]["fc0"]["kernel"]),
            before["vision_to_language"]["fc0"]["kernel"],
        )
        # trained branch changed
        assert not np.allclose(
            np.asarray(after["language_to_vision"]["fc0"]["kernel"]),
            before["language_to_vision"]["fc0"]["kernel"],
        )

    def test_vision_sequence_decoder_shape(self):
        dec = VisionSequenceDecoder(
            grid=(2, 3, 3), channels=8, hidden_dim=16, n_heads=2, n_layers=1
        )
        cond = jax.random.normal(jax.random.PRNGKey(0), (2, 12))
        params = dec.init(jax.random.PRNGKey(1), cond)
        out = dec.apply(params, cond)
        assert out.shape == (2, 2, 3, 3, 8)


class TestLanguageService:
    def test_embed_tokenize_health(self):
        from deepearth_tpu.serving import (
            HashEmbedder,
            LanguageClient,
            LanguageEmbeddingService,
            LanguageServer,
        )

        srv = LanguageServer(
            LanguageEmbeddingService(HashEmbedder(dim=32))
        ).start()
        try:
            c = LanguageClient(f"http://127.0.0.1:{srv.port}")
            assert c.health()["dim"] == 32
            e1 = c.embed("live oak")
            e2 = c.embed("live oak")
            np.testing.assert_allclose(e1, e2)  # deterministic
            assert not np.allclose(e1, c.embed("saw palmetto"))
            assert c.embed(["a", "b"]).shape == (2, 32)
            assert len(c.tokenize("hello world")) == 2
        finally:
            srv.stop()


class TestAnalysisRoutes:
    def test_attention_umap_ecosystem_routes(self, tmp_path):
        ds = make_dataset(40, seed=9)
        cols = ds.columns()
        ids = cols["gbif_id"][:40]
        rng = np.random.default_rng(10)
        # species-structured embeddings so ecosystems are meaningful
        proto = rng.standard_normal((3, 2, 4, 4, 16))
        vis = proto[cols["species"][:40]] + 0.05 * rng.standard_normal(
            (40, 2, 4, 4, 16)
        )
        vloader = convert_arrays_to_store(
            str(tmp_path / "va"), ids, vis.astype(np.float32)
        )
        service = DataService(observations=cols, vision_loader=vloader)
        srv = DashboardServer(service, port=0).start()
        try:
            c = DashboardClient(f"http://127.0.0.1:{srv.port}")
            att = c._get(f"/api/attention_map/{int(ids[0])}")
            assert att["shape"] == [4, 4]
            a = np.asarray(att["attention"])
            assert a.min() >= 0 and a.max() <= 1

            umap = c._get("/api/vision_umap?max_items=30&n_components=2")
            assert np.asarray(umap["projection"]).shape == (30, 2)

            eco = c._get("/api/ecosystems?n_clusters=3")
            assert len(eco["clusters"]) == 3
            assert all(cl["species_purity"] > 0.5 for cl in eco["clusters"])

            # interactive map route: self-contained HTML (no CDN)
            import urllib.request

            with urllib.request.urlopen(
                f"http://127.0.0.1:{srv.port}/api/ecosystem_map?n_clusters=3",
                timeout=60,
            ) as r:
                assert "text/html" in r.headers["Content-Type"]
                html = r.read().decode()
            assert "<canvas" in html and "https://" not in html
        finally:
            srv.stop()


class TestDashboardSurfaceRoutes:
    """Route-count parity with the reference dashboard
    (reference: dashboard/deepearth_dashboard.py:94-438)."""

    @pytest.fixture(scope="class")
    def full_server(self, tmp_path_factory):
        tmp_path = tmp_path_factory.mktemp("dash")
        ds = make_dataset(24, seed=4)
        cols = ds.columns()
        ids = cols["gbif_id"][:24]
        rng = np.random.default_rng(5)
        vis = rng.standard_normal((24, 2, 4, 4, 16)).astype(np.float32)
        vloader = convert_arrays_to_store(str(tmp_path / "vd"), ids, vis)
        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        (img_dir / f"{int(ids[0])}_1.png").write_bytes(
            bytes.fromhex(  # 1x1 png
                "89504e470d0a1a0a0000000d49484452000000010000000108060000001f"
                "15c4890000000d4944415478da63fccf0000030101004c2f0296c8000000"
                "0049454e44ae426082"
            )
        )
        static_dir = tmp_path / "static"
        static_dir.mkdir()
        (static_dir / "app.js").write_text("console.log('deepearth')")
        service = DataService(
            observations=cols, vision_loader=vloader,
            config={"dataset": "synthetic", "n": 24},
            image_dir=str(img_dir), static_dir=str(static_dir),
        )
        srv = DashboardServer(service, port=0).start()
        yield srv, service, cols, ids
        srv.stop()

    def test_index_html(self, full_server):
        import urllib.request

        srv, *_ = full_server
        with urllib.request.urlopen(
            f"http://127.0.0.1:{srv.port}/", timeout=30
        ) as r:
            body = r.read().decode()
            assert r.headers["Content-Type"].startswith("text/html")
        # '/' now serves the interactive single-page app
        # (tests/test_dashboard_frontend.py covers it in depth)
        assert "DeepEarth" in body and "/ui/app.js" in body

    def test_config_and_progress(self, full_server):
        srv, service, *_ = full_server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        assert c._get("/api/config")["dataset"] == "synthetic"
        assert c._get("/api/progress")["status"] == "idle"
        service.set_progress(status="training", step=42, loss=1.5)
        p = c._get("/api/progress")
        assert p["step"] == 42 and p["status"] == "training"

    def test_species_colors_and_observations(self, full_server):
        srv, _, cols, _ = full_server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        colors = c._get("/api/species_umap_colors")["colors"]
        assert len(colors) == len(np.unique(cols["species"]))
        for v in colors.values():
            assert len(v) == 3 and all(0 <= x <= 1 for x in v)
        sp = int(cols["species"][0])
        obs = c._get(f"/api/species/{sp}/observations")
        assert obs["count"] >= 1
        assert all(
            int(cols["species"][list(cols["gbif_id"]).index(o["gbif_id"])])
            == sp
            for o in obs["observations"]
        )

    def test_vision_available_and_feature_routes(self, full_server):
        srv, _, _, ids = full_server
        c = DashboardClient(f"http://127.0.0.1:{srv.port}")
        avail = c._get("/api/vision_embeddings/available")
        assert avail["count"] == 24
        gid = int(ids[0])
        rgb = c._get(f"/api/features/{gid}/umap-rgb")
        assert rgb["shape"] == [4, 4, 3]
        arr = np.asarray(rgb["rgb"])
        assert arr.min() >= 0 and arr.max() <= 1
        stats = c._get(f"/api/features/{gid}/statistics")
        assert stats["channels"] == 16 and stats["patch_norm_max"] > 0
        pca = c._get(f"/api/features/{gid}/pca-raw")
        assert np.asarray(pca["components"]).shape == (4, 4, 3)
        att = c._get(f"/api/features/{gid}/attention")
        assert att["shape"] == [4, 4]

    def test_image_proxy_and_static(self, full_server):
        import urllib.error
        import urllib.request

        srv, _, _, ids = full_server
        base = f"http://127.0.0.1:{srv.port}"
        with urllib.request.urlopen(
            f"{base}/api/image_proxy/{int(ids[0])}/1", timeout=30
        ) as r:
            assert r.headers["Content-Type"] == "image/png"
            assert r.read()[:4] == b"\x89PNG"
        # missing image → 404 JSON
        try:
            urllib.request.urlopen(f"{base}/api/image_proxy/999999/1", timeout=30)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        with urllib.request.urlopen(f"{base}/static/app.js", timeout=30) as r:
            assert b"deepearth" in r.read()
        # path traversal rejected
        try:
            urllib.request.urlopen(
                f"{base}/static/../../etc/passwd", timeout=30
            )
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404


class TestFullVisionBidirectional:
    def test_language_to_full_vision_grid(self):
        model = BidirectionalReconstructor(
            vision_dim=8, language_dim=16, hidden_dim=32,
            vision_grid=(2, 3, 3), full_vision_output=True,
        )
        lang = jax.random.normal(jax.random.PRNGKey(0), (2, 16))
        params = model.init(jax.random.PRNGKey(1), language=lang)["params"]
        out = model.apply({"params": params}, language=lang)
        assert out["vision_from_language"].shape == (2, 2, 3, 3, 8)

    def test_bidirectional_step_full_grid_trains(self):
        model = BidirectionalReconstructor(
            vision_dim=8, language_dim=16, hidden_dim=32,
            vision_grid=(2, 2, 2), full_vision_output=True,
        )
        rng = jax.random.PRNGKey(0)
        # vision target as the full grid flattened to (B, S, C): S = 2*2*2
        batch = {
            "vision": jax.random.normal(rng, (4, 8, 8)),
            "language": jax.random.normal(jax.random.PRNGKey(1), (4, 16)),
        }
        params = model.init(
            jax.random.PRNGKey(2), vision=batch["vision"],
            language=batch["language"],
        )["params"]
        out = model.apply(
            {"params": params}, vision=batch["vision"],
            language=batch["language"],
        )
        # full grid output reshapes to the flat patch sequence
        full = out["vision_from_language"].reshape(4, 8, 8)
        loss = jnp.mean((full - batch["vision"]) ** 2)
        g = jax.grad(
            lambda p: jnp.mean(
                (
                    model.apply(
                        {"params": p}, vision=batch["vision"],
                        language=batch["language"],
                    )["vision_from_language"].reshape(4, 8, 8)
                    - batch["vision"]
                ) ** 2
            )
        )(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)
        assert np.isfinite(float(loss))


class TestPredictRoute:
    def test_predict_over_http(self):
        from deepearth_tpu.api import DeepEarth

        earth = DeepEarth(hidden_dim=64, n_layers=1)
        earth.register("temperature", shape=(1,), type="numerical")
        # pre-warm: first predict compiles (~30s) and would trip HTTP timeouts
        earth.predict((28.5, -81.4), data={"temperature": [20.0]})
        service = DataService(predictor=earth)
        srv = DashboardServer(service, port=0).start()
        try:
            c = DashboardClient(f"http://127.0.0.1:{srv.port}", timeout=120)
            emb = c.predict((28.5, -81.4), "2024-06-15",
                            {"temperature": [21.0]})
            assert emb.shape == (64,)
            assert np.isfinite(emb).all()
            # no predictor → clean 500 with message
            srv2 = DashboardServer(DataService(), port=0).start()
            try:
                import urllib.error

                c2 = DashboardClient(f"http://127.0.0.1:{srv2.port}")
                with pytest.raises(urllib.error.HTTPError):
                    c2.predict((0.0, 0.0))
            finally:
                srv2.stop()
        finally:
            srv.stop()


class TestRealDataTraining:
    def test_cache_batch_iterator(self, tmp_path):
        ds = make_dataset(40, seed=2)
        ids = ds.df["gbif_id"].to_numpy()
        rng = np.random.default_rng(3)
        vis = rng.standard_normal((40, 2, 3, 3, 8)).astype(np.float32)
        vloader = convert_arrays_to_store(str(tmp_path / "vb"), ids, vis)
        cache = UnifiedDataCache(ds, DatasetConfig(), vloader, None)
        batches = list(cache.batch_iterator(16, seed=1, steps=3))
        assert len(batches) == 3
        for b in batches:
            assert b["xyzt"].shape == (16, 4)
            assert b["modalities"]["vision"].shape == (16, 18, 8)
        # deterministic given the seed
        again = list(cache.batch_iterator(16, seed=1, steps=3))
        np.testing.assert_array_equal(batches[0]["xyzt"], again[0]["xyzt"])
        # epoch mode (steps=None) terminates after one pass
        per_epoch = len(list(cache.batch_iterator(16, steps=None)))
        assert per_epoch == 40 // 16

    @pytest.mark.slow
    def test_train_cli_on_real_dataset(self, tmp_path, monkeypatch):
        """scripts/train.py --data-dir end-to-end on a tiny real-format
        dataset (parquet observations + mmap vision store)."""
        import sys as _sys

        ds = make_dataset(32, seed=5)
        ds.df.to_parquet(tmp_path / "observations.parquet")
        ids = ds.df["gbif_id"].to_numpy()
        rng = np.random.default_rng(6)
        vis = rng.standard_normal((32, 2, 3, 3, 8)).astype(np.float32)
        convert_arrays_to_store(str(tmp_path / "vision"), ids, vis)

        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "train_cli", "scripts/train.py"
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        monkeypatch.setattr(
            _sys, "argv",
            ["train.py", "--data-dir", str(tmp_path), "--steps", "3",
             "--batch-size", "8", "--hidden-dim", "64", "--n-layers", "1",
             "--log-every", "0"],
        )
        mod.main()  # must run 3 real-data steps without error
