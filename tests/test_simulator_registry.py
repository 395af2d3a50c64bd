"""Tests for the inductive simulator, masking strategies, and data registry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import DeepSeekBlockConfig, MLAConfig, SIMULATOR_PRESETS
from deepearth_tpu.models.simulator import (
    DatasetSpecificDecoder,
    InductiveSimulator,
    MaskingStrategy,
    create_inductive_simulator,
)
from deepearth_tpu.registry import (
    DataSourceRegistry,
    create_deepearth_with_registry,
    timeseries_to_image,
    vector_to_image,
)


def tiny_block_cfg():
    return DeepSeekBlockConfig(
        hidden_dim=32, n_layers=2, intermediate_size=64,
        mla=MLAConfig(
            hidden_dim=32, n_heads=2, kv_lora_rank=8,
            qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8,
        ),
    )


class TestSimulator:
    def test_forward_and_mask_token(self):
        sim = InductiveSimulator(tiny_block_cfg())
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
        mask = jnp.ones((2, 6), bool).at[:, 2].set(False)
        params = sim.init(jax.random.PRNGKey(1), x, mask)
        out = sim.apply(params, x, mask)
        assert out.shape == x.shape
        assert "mask_token" in params["params"]

    def test_presets_exist(self):
        assert set(SIMULATOR_PRESETS) == {
            "standard", "high_precision", "fast", "ultra"
        }
        sim, cfg = create_inductive_simulator("fast")
        assert cfg.n_layers == 12
        assert cfg.moe.n_routed_experts == 4

    def test_dataset_decoder(self):
        dec = DatasetSpecificDecoder({"temp": 1, "landcover": 10})
        x = jax.random.normal(jax.random.PRNGKey(0), (4, 32))
        params = dec.init(jax.random.PRNGKey(1), x)
        out = dec.apply(params, x)
        assert out["temp"].shape == (4, 1)
        assert out["landcover"].shape == (4, 10)


class TestMaskingStrategy:
    def test_random(self):
        m = MaskingStrategy(0.5).random(jax.random.PRNGKey(0), 500, 10)
        rate = 1 - np.asarray(m).mean()
        assert 0.45 < rate < 0.55

    def test_block_is_contiguous(self):
        m = MaskingStrategy(0.3).block(jax.random.PRNGKey(0), 8, 20)
        m = np.asarray(m)
        for row in m:
            hidden = np.nonzero(~row)[0]
            assert len(hidden) == 6  # round(20 * 0.3)
            assert np.all(np.diff(hidden) == 1)  # contiguous

    def test_temporal_spatial(self):
        ms = MaskingStrategy(0.5, grid=(4, 5))
        mt = np.asarray(ms.temporal(jax.random.PRNGKey(0), 3, 20)).reshape(3, 4, 5)
        # whole temporal slices hidden
        assert np.all((mt.all(axis=-1)) | (~mt.any(axis=-1)))
        msp = np.asarray(ms.spatial(jax.random.PRNGKey(1), 3, 20)).reshape(3, 4, 5)
        assert np.all((msp.all(axis=1)) | (~msp.any(axis=1)))

    def test_grid_validation(self):
        with pytest.raises(ValueError):
            MaskingStrategy(0.5).temporal(jax.random.PRNGKey(0), 1, 20)
        with pytest.raises(ValueError):
            MaskingStrategy(0.5, grid=(3, 5)).temporal(jax.random.PRNGKey(0), 1, 20)


class TestRegistry:
    def test_adapters(self):
        v = np.arange(10, dtype=np.float32)
        img = vector_to_image(v)
        assert img.shape == (4, 4, 1)
        np.testing.assert_allclose(img.reshape(-1)[:10], v)
        ts = np.ones((6, 3), np.float32)
        assert timeseries_to_image(ts).shape == (6, 3, 1)

    def test_register_and_config_heuristics(self):
        reg = DataSourceRegistry()
        reg.register_data_source("weather", shape=(5,), source_type="vector")
        reg.register_data_source(
            "hyperspectral", shape=(224,), source_type="vector"
        )
        reg.register_data_source(
            "species", source_type="categorical", num_classes=232
        )
        m = reg.modality_config("weather")
        assert not m.use_moe_projection and m.n_tokens == 1
        m = reg.modality_config("hyperspectral")
        assert m.use_moe_projection  # >100 dims → auto MoE
        m = reg.modality_config("species")
        assert m.encoding_type == "learned_embedding"

    def test_validation(self):
        reg = DataSourceRegistry()
        with pytest.raises(ValueError):
            reg.register_data_source("bad", source_type="categorical")
        with pytest.raises(ValueError):
            reg.register_data_source("bad2", shape=(3,), adapter="nope")

    def test_create_model_with_registry(self):
        from deepearth_tpu.configs import tiny_config

        reg = DataSourceRegistry()
        reg.register_data_source("weather", shape=(5,), source_type="vector")
        reg.register_data_source(
            "species", source_type="categorical", num_classes=50
        )
        base = tiny_config()
        base.modalities.clear()
        model, cfg = create_deepearth_with_registry(reg, base)
        assert set(cfg.modalities) == {"weather", "species"}
        batch = {
            "xyzt": jax.random.uniform(jax.random.PRNGKey(0), (2, 4)),
            "modalities": {
                "weather": jax.random.normal(jax.random.PRNGKey(1), (2, 5)),
                "species": jnp.asarray([1, 2]),
            },
        }
        params = model.init(jax.random.PRNGKey(2), batch)
        out = model.apply(params, batch)
        assert out["reconstructions"]["weather"].shape == (2, 5)
        assert out["reconstructions"]["species"].shape == (2, 50)
