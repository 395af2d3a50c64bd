"""Tests for MLP-UNet, shared latent pool, and extractor infrastructure."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.data import StubExtractor, run_parallel_extraction
from deepearth_tpu.models import (
    LatentPool,
    MLPUNet,
    MultimodalSharedSpace,
    MultimodalUNet,
)


class TestMLPUNet:
    def test_shapes_and_skip_structure(self):
        net = MLPUNet(input_dim=40, output_dim=24, base_width=64, depth=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 40))
        params = net.init(jax.random.PRNGKey(1), x)
        out = net.apply(params, x)
        assert out.shape == (4, 24)
        names = params["params"].keys()
        assert any(n.startswith("enc") for n in names)
        assert any(n.startswith("dec") for n in names)

    def test_multimodal_unet_masking(self):
        net = MultimodalUNet(
            vision_dim=16, language_dim=24, base_width=32, depth=2,
            language_mask_prob=0.5,
        )
        v = jax.random.normal(jax.random.PRNGKey(0), (4, 3, 16))
        l = jax.random.normal(jax.random.PRNGKey(1), (4, 24))
        params = net.init(
            {"params": jax.random.PRNGKey(2), "mask": jax.random.PRNGKey(3)},
            v, l, deterministic=False,
        )
        out = net.apply(
            params, v, l, deterministic=False,
            rngs={"mask": jax.random.PRNGKey(4)},
        )
        assert out["vision_recon"].shape == (4, 16)
        assert out["language_recon"].shape == (4, 24)
        # deterministic path needs no mask rng
        out_d = net.apply(params, v, l, deterministic=True)
        assert np.isfinite(np.asarray(out_d["vision_recon"])).all()

    def test_unet_trains(self):
        import optax

        net = MLPUNet(input_dim=8, output_dim=8, base_width=32, depth=2)
        x = jax.random.normal(jax.random.PRNGKey(0), (16, 8))
        params = net.init(jax.random.PRNGKey(1), x)
        tx = optax.adam(1e-2)
        opt = tx.init(params)

        @jax.jit
        def step(p, o):
            def loss(p):
                return jnp.mean((net.apply(p, x) - x) ** 2)

            l, g = jax.value_and_grad(loss)(p)
            up, o = tx.update(g, o)
            return optax.apply_updates(p, up), o, l

        params, opt, l0 = step(params, opt)
        for _ in range(30):
            params, opt, l = step(params, opt)
        assert float(l) < float(l0) * 0.5


class TestSharedSpace:
    def test_latent_pool_shapes(self):
        pool = LatentPool(n_latents=8, dim=32, n_heads=4, n_layers=1)
        tokens = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
        params = pool.init(jax.random.PRNGKey(1), tokens)
        out = pool.apply(params, tokens)
        assert out.shape == (2, 8, 32)

    def test_shared_space_end_to_end(self):
        model = MultimodalSharedSpace(
            modality_dims={"vision": 20, "language": 12},
            dim=32, n_latents=4, n_heads=4, n_layers=1,
        )
        feats = {
            "vision": jax.random.normal(jax.random.PRNGKey(0), (3, 5, 20)),
            "language": jax.random.normal(jax.random.PRNGKey(1), (3, 12)),
        }
        params = model.init(jax.random.PRNGKey(2), feats)
        out = model.apply(params, feats)
        assert out["shared_embedding"].shape == (3, 32)
        assert out["reconstructions"]["vision"].shape == (3, 20)
        assert out["reconstructions"]["language"].shape == (3, 12)
        assert out["modality_projections"]["vision"].shape == (3, 32)


class TestExtractors:
    def test_stub_deterministic(self):
        ex = StubExtractor(dim=16, seq_len=3)
        a = ex.extract_native_embeddings(["img1", "img2"])
        b = ex.extract_native_embeddings(["img1", "img2"])
        np.testing.assert_allclose(a, b)
        assert a.shape == (2, 3, 16)
        assert not np.allclose(a[0], a[1])
        assert ex.get_native_dim() == 16

    def test_parallel_extraction(self):
        ex = StubExtractor(dim=8, seq_len=1)
        items = [f"item{i}" for i in range(20)]
        out = run_parallel_extraction(ex, items, n_workers=3, chunk_size=4)
        assert out.shape == (20, 8)
        # same results as serial
        serial = ex.extract_native_embeddings(items)
        np.testing.assert_allclose(out, serial)


class TestExport:
    def test_export_reload_roundtrip(self):
        """StableHLO export → deserialize → same outputs (reference
        run_tests.py TorchScript/ONNX export-check equivalent)."""
        from deepearth_tpu.configs import tiny_config
        from deepearth_tpu.models import DeepEarthModel
        from deepearth_tpu.export import export_model_forward, load_exported

        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        batch = {
            "xyzt": jax.random.uniform(jax.random.PRNGKey(0), (2, 4)),
            "modalities": {"species": jnp.asarray([1, 2])},
        }
        params = model.init(jax.random.PRNGKey(1), batch)["params"]
        blob = export_model_forward(model, params, batch)
        assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000

        fn = load_exported(bytes(blob))
        fused, recon = fn(batch)
        expected = model.apply({"params": params}, batch)
        # tiny_config computes in bfloat16 → compare at bf16 precision
        np.testing.assert_allclose(
            np.asarray(fused, np.float32),
            np.asarray(expected["fused_representation"], np.float32),
            rtol=3e-2, atol=3e-2,
        )
        assert recon["species"].shape == (2, 232)


class TestBimodalMLPUNet:
    def test_learnable_table_trains_and_retrieves(self):
        """Image↔species system (reference: reconstruction/mlp_unet/
        model.py:228-344): train the shared U-Net to map masked image
        embeddings onto their species embedding; cosine top-k must then
        retrieve the right species."""
        import jax
        import jax.numpy as jnp
        import optax

        from deepearth_tpu.models import BimodalMLPUNet, species_topk

        S, D, B = 6, 64, 24
        key = jax.random.PRNGKey(0)
        # frozen "text" species table with well-separated rows
        table = jax.random.normal(key, (S, D)) * 2.0
        model = BimodalMLPUNet(
            n_species=S, embedding_dim=D, hidden_dim=64, mask_ratio=0.3,
            species_table=table,
        )
        # synthetic image embeddings: species embedding + noise
        sp = jax.random.randint(jax.random.PRNGKey(1), (B,), 0, S)
        img = table[sp] + 0.1 * jax.random.normal(jax.random.PRNGKey(2), (B, D))

        params = model.init(
            {"params": jax.random.PRNGKey(3), "mask": jax.random.PRNGKey(4),
             "dropout": jax.random.PRNGKey(5)},
            embedding=img, deterministic=False,
        )["params"]
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, rng):
            def loss_fn(p):
                out = model.apply(
                    {"params": p}, embedding=img, deterministic=False,
                    rngs={"mask": rng, "dropout": jax.random.fold_in(rng, 1)},
                )
                # image→species: reconstruct toward the species embedding
                return jnp.mean((out["recon"] - table[sp]) ** 2)

            loss, g = jax.value_and_grad(loss_fn)(params)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(params, up), opt, loss

        l0 = None
        for i in range(150):
            params, opt, loss = step(params, opt, jax.random.PRNGKey(10 + i))
            l0 = l0 if l0 is not None else float(loss)
        assert float(loss) < l0 * 0.5, (l0, float(loss))

        out = model.apply({"params": params}, embedding=img)
        pred = species_topk(out["recon"], out["species_table"], k=1)[:, 0]
        acc = float(jnp.mean((pred == sp).astype(jnp.float32)))
        assert acc > 0.8, acc

    def test_species_direction_and_learnable_table(self):
        import jax
        import jax.numpy as jnp

        from deepearth_tpu.models import BimodalMLPUNet

        model = BimodalMLPUNet(n_species=5, embedding_dim=32, hidden_dim=32)
        ids = jnp.asarray([0, 3, 4])
        v = model.init(jax.random.PRNGKey(0), species_ids=ids)
        assert "species_embeddings" in v["params"]  # learnable table
        out = model.apply(v, species_ids=ids)
        assert out["recon"].shape == (3, 32)
        with pytest.raises(ValueError):
            model.apply(v)  # neither input
