"""Parity vs the reference's ACTUAL torch modules (VERDICT r2 next #4).

Unlike the retired re-written oracles (old tests/test_parity.py), these
tests importlib-load ``/root/reference/models/{configs,hash_encoding,
transformers,encoders,decoders,cross_modal_fusion}.py`` — the reference's
own code — transplant flax weights into the real torch classes, and assert
<1e-4 end-to-end, including the full quick_test composition
(reference: examples/quick_test.py:22-60). A shared misreading of the
reference's semantics can no longer pass.

Pattern follows tests/test_hf_convert.py's importlib load of the vendored
modeling_deepseek.py (which already pins MLA/MoE/decoder-stack parity
against the reference's real code at 2.6e-7 full-model logits error —
tests/test_hf_convert.py:105). The old tests/test_parity.py is retired:
every module it covered with a re-written oracle is covered here with the
reference's own implementation.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

TOL = 1e-4
_REF_DIR = "/root/reference/models"


def _load_ref():
    """Load the reference models package (without its broken __init__)."""
    if "refmodels.cross_modal_fusion" in sys.modules:
        return sys.modules
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [_REF_DIR]
    sys.modules["refmodels"] = pkg
    for name in (
        "configs",
        "hash_encoding",
        "transformers",
        "encoders",
        "decoders",
        "cross_modal_fusion",
    ):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", f"{_REF_DIR}/{name}.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = m
        spec.loader.exec_module(m)
    return sys.modules


def t(x):
    return torch.tensor(np.asarray(x, np.float32))


def _set(dst_param, value):
    with torch.no_grad():
        dst_param.copy_(value)


def _load_linear(linear, p, transpose=True):
    _set(linear.weight, t(p["kernel"]).T if transpose else t(p["kernel"]))
    if linear.bias is not None:
        _set(linear.bias, t(p["bias"]))


def _load_ln(ln, p):
    _set(ln.weight, t(p["scale"]))
    _set(ln.bias, t(p["bias"]))


def _load_transformer(ref_tr, p, n_layers):
    """flax Transformer params → reference models/transformers.py Transformer."""
    for i in range(n_layers):
        bp = p[f"block_{i}"]
        blk = ref_tr.blocks[i]
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _load_linear(getattr(blk.attention, name), bp["attention"][name])
        _load_ln(blk.norm1, bp["norm1"])
        _load_ln(blk.norm2, bp["norm2"])
        _load_linear(blk.mlp[0], bp["mlp"]["fc1"])
        _load_linear(blk.mlp[3], bp["mlp"]["fc2"])
    _load_ln(ref_tr.norm, p["final_norm"])


class TestTransformerStackParity:
    def test_transformer_vs_reference_module(self):
        """flax Transformer == reference models/transformers.py:164-213
        with transplanted weights, with and without a key mask."""
        mods = _load_ref()
        RefCfg = mods["refmodels.configs"].TransformerConfig
        RefTransformer = mods["refmodels.transformers"].Transformer

        from deepearth_tpu.configs import TransformerConfig
        from deepearth_tpu.models import Transformer

        cfg = TransformerConfig(hidden_dim=64, n_heads=4, n_layers=2)
        mod = Transformer(cfg)
        x = np.random.default_rng(0).standard_normal((2, 6, 64)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

        ref = RefTransformer(
            RefCfg(hidden_dim=64, n_heads=4, n_layers=2)
        ).eval()
        _load_transformer(ref, params, 2)

        with torch.no_grad():
            ref_out = ref(t(x)).numpy()
        ours = np.asarray(mod.apply({"params": params}, jnp.asarray(x)))
        assert np.abs(ours - ref_out).max() < TOL

        # masked path: boolean (B, N) key mask → -inf semantics
        mask = np.array(
            [[True, True, True, False, False, True]] * 2
        )
        with torch.no_grad():
            ref_m = ref(t(x), mask=torch.tensor(mask)).numpy()
        ours_m = np.asarray(
            mod.apply({"params": params}, jnp.asarray(x), mask=jnp.asarray(mask))
        )
        assert np.abs(ours_m - ref_m).max() < TOL


class TestHashEncodingParity:
    def test_hash_encoding_vs_reference_module(self):
        """flax nearest-mode hash encode == reference
        models/hash_encoding.py:11-97 (bit-identical for pow-2 tables)."""
        mods = _load_ref()
        RefHash = mods["refmodels.hash_encoding"].MultiResolutionHashEncoding

        from deepearth_tpu.configs import HashEncodingConfig
        from deepearth_tpu.ops import hash_encode, init_hash_tables

        cfg = HashEncodingConfig(
            n_levels=4, n_features_per_level=2, coords_dim=3,
            hash_table_size=2 ** 12, base_resolution=16,
        )
        tables = init_hash_tables(jax.random.PRNGKey(0), cfg)
        coords = np.random.default_rng(2).random((32, 3)).astype(np.float32)
        ours = np.asarray(
            hash_encode(
                jnp.asarray(coords), tables,
                jnp.asarray(cfg.resolutions, jnp.float32),
                interpolation="nearest", table_size=cfg.hash_table_size,
            )
        )
        ref = RefHash(
            n_levels=4, n_features_per_level=2,
            resolutions=list(cfg.resolutions),
            hash_table_size=2 ** 12, coords_dim=3,
        ).eval()
        for li in range(4):
            _set(ref.hash_tables[li].weight, t(np.asarray(tables)[li]))
        with torch.no_grad():
            ref_out = ref(torch.tensor(coords)).numpy()
        np.testing.assert_array_equal(ours, ref_out)


def _ref_deepearth_config(mods, hidden=32, table=2 ** 10, sl=4, tl=2):
    return mods["refmodels.configs"].DeepEarthConfig(
        n_spatial_levels=sl, n_temporal_levels=tl, n_features_per_level=2,
        hash_table_size=table, hidden_dim=hidden,
    )


def _flax_grid4d(hidden=32, table=2 ** 10, sl=4, tl=2):
    import dataclasses

    from deepearth_tpu.configs import Grid4DConfig
    from deepearth_tpu.models import Grid4DEncoder

    cfg = Grid4DConfig(
        n_spatial_levels=sl, n_temporal_levels=tl, n_features_per_level=2,
        hash_table_size=table,
    )
    cfg.spatial = dataclasses.replace(cfg.spatial, interpolation="nearest")
    cfg.temporal = dataclasses.replace(cfg.temporal, interpolation="nearest")
    return Grid4DEncoder(cfg, hidden_dim=hidden)


def _load_grid4d(ref_g, p, sl=4, tl=2):
    for li in range(sl):
        _set(ref_g.spatial_encoder.hash_tables[li].weight,
             t(np.asarray(p["spatial"]["tables"])[li]))
    for li in range(tl):
        _set(ref_g.temporal_encoder.hash_tables[li].weight,
             t(np.asarray(p["temporal"]["tables"])[li]))
    _load_linear(ref_g.projection[0], p["proj_in"])
    _load_ln(ref_g.projection[1], p["proj_norm"])
    _load_linear(ref_g.projection[3], p["proj_out"])


class TestGrid4DParityReference:
    def test_grid4d_vs_reference_module(self):
        """flax Grid4DEncoder (nearest) == reference models/encoders.py:12-85
        Grid4DEncoder, including the reference's temporal-table //4 sizing
        and multiplicative feature masking."""
        mods = _load_ref()
        ref = mods["refmodels.encoders"].Grid4DEncoder(
            _ref_deepearth_config(mods)
        ).eval()

        mod = _flax_grid4d()
        # flax temporal table must mirror the reference's //4 rule
        assert mod.cfg.temporal.hash_table_size == 2 ** 10 // 4

        xyzt = np.random.default_rng(0).random((8, 4)).astype(np.float32)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(xyzt))["params"]
        _load_grid4d(ref, params)

        with torch.no_grad():
            ref_out = ref(t(xyzt)).numpy()
        ours = np.asarray(mod.apply({"params": params}, jnp.asarray(xyzt)))
        assert np.abs(ours - ref_out).max() < TOL

        # masked: reference multiplies features to zero, not attention masks
        sm = np.array([True, False, True, True, False, True, True, False])
        tm = np.array([False, True, True, False, True, True, False, True])
        with torch.no_grad():
            ref_m = ref(
                t(xyzt), spatial_mask=torch.tensor(sm),
                temporal_mask=torch.tensor(tm),
            ).numpy()
        ours_m = np.asarray(
            mod.apply({"params": params}, jnp.asarray(xyzt),
                      spatial_mask=jnp.asarray(sm), temporal_mask=jnp.asarray(tm))
        )
        assert np.abs(ours_m - ref_m).max() < TOL


class TestDecoderParityReference:
    def test_modality_decoder_vs_reference(self):
        mods = _load_ref()
        ref = mods["refmodels.decoders"].ModalityDecoder(
            "species", 17, _ref_deepearth_config(mods, hidden=32)
        ).eval()

        from deepearth_tpu.models import ModalityDecoder

        mod = ModalityDecoder(hidden_dim=32, output_dim=17)
        x = np.random.default_rng(1).standard_normal((8, 32)).astype(np.float32)
        p = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        # reference Sequential: 0 Linear, 1 LN, 4 Linear, 5 LN, 8 Linear
        _load_linear(ref.decoder[0], p["fc1"])
        _load_ln(ref.decoder[1], p["ln1"])
        _load_linear(ref.decoder[4], p["fc2"])
        _load_ln(ref.decoder[5], p["ln2"])
        _load_linear(ref.decoder[8], p["fc3"])
        with torch.no_grad():
            ref_out = ref(t(x)).numpy()
        ours = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
        assert np.abs(ours - ref_out).max() < TOL

    def test_spatiotemporal_decoder_vs_reference(self):
        mods = _load_ref()
        ref = mods["refmodels.decoders"].SpatiotemporalDecoder(
            "spatial", 3, _ref_deepearth_config(mods, hidden=32)
        ).eval()

        from deepearth_tpu.models import SpatiotemporalDecoder

        mod = SpatiotemporalDecoder(hidden_dim=32, output_dim=3)
        x = np.random.default_rng(2).standard_normal((8, 32)).astype(np.float32)
        p = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
        # reference Sequential: 0 Linear, 1 LN, 3 Linear, 4 LN, 6 Linear
        _load_linear(ref.decoder[0], p["fc1"])
        _load_ln(ref.decoder[1], p["ln1"])
        _load_linear(ref.decoder[3], p["fc2"])
        _load_ln(ref.decoder[4], p["ln2"])
        _load_linear(ref.decoder[6], p["fc3"])
        with torch.no_grad():
            ref_out = ref(t(x)).numpy()
        ours = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
        assert np.abs(ours - ref_out).max() < TOL


class TestModalityEncoderParityReference:
    def test_modality_encoder_vs_reference(self):
        """flax ModalityEncoder == reference models/encoders.py:88-146
        (input proj + learned modality token + Transformer + out proj + LN)."""
        mods = _load_ref()
        RefTC = mods["refmodels.configs"].TransformerConfig
        enc_cfg_ref = RefTC(hidden_dim=32, n_heads=4, n_layers=2)
        ref = mods["refmodels.encoders"].ModalityEncoder(
            "temperature", 5, _ref_deepearth_config(mods, hidden=48),
            enc_cfg_ref,
        ).eval()

        from deepearth_tpu.configs import TransformerConfig
        from deepearth_tpu.models import ModalityEncoder

        mod = ModalityEncoder(
            input_dim=5, output_dim=48,
            encoder_cfg=TransformerConfig(hidden_dim=32, n_heads=4, n_layers=2),
        )
        x = np.random.default_rng(3).standard_normal((6, 5)).astype(np.float32)
        p = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

        _load_linear(ref.input_projection, p["input_projection"])
        _set(ref.modality_embedding, t(p["modality_embedding"]))
        _load_transformer(ref.transformer, p["transformer"], 2)
        _load_linear(ref.output_projection, p["output_projection"])
        _load_ln(ref.norm, p["norm"])

        with torch.no_grad():
            ref_out = ref(t(x)).numpy()
        ours = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
        assert np.abs(ours - ref_out).max() < TOL


class TestFusionLayerParityReference:
    def test_fusion_layer_vs_reference(self):
        """flax FusionLayer == reference models/cross_modal_fusion.py:273-350
        (self-attn with rotate_half RoPE + gated MLP), self-attn-only layer."""
        mods = _load_ref()
        RefFusionCfg = mods["refmodels.cross_modal_fusion"].FusionConfig
        RefFusionLayer = mods["refmodels.cross_modal_fusion"].FusionLayer

        from deepearth_tpu.configs import FusionConfig
        from deepearth_tpu.models import FusionLayer

        cfg = FusionConfig(universal_dim=64, num_fusion_layers=1, num_heads=4,
                           cross_attention_freq=100)
        mod = FusionLayer(cfg, layer_idx=1)
        x = np.random.default_rng(3).standard_normal((2, 5, 64)).astype(np.float32)
        p = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]

        ref = RefFusionLayer(
            RefFusionCfg(universal_dim=64, num_heads=4, cross_attention_freq=3),
            layer_idx=1,  # 1 % 3 != 0 → self-attention only
        ).eval()
        assert not ref.use_cross_attention
        for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
            _load_linear(getattr(ref.self_attn, name), p["self_attn"][name])
        _load_ln(ref.self_attn_norm, p["self_attn_norm"])
        _load_ln(ref.mlp_norm, p["mlp_norm"])
        _load_linear(ref.mlp.gate_proj, p["mlp"]["gate_proj"])
        _load_linear(ref.mlp.up_proj, p["mlp"]["up_proj"])
        _load_linear(ref.mlp.down_proj, p["mlp"]["down_proj"])

        with torch.no_grad():
            ref_out = ref(t(x)).numpy()
        ours = np.asarray(mod.apply({"params": p}, jnp.asarray(x)))
        assert np.abs(ours - ref_out).max() < TOL

    def test_cross_attention_layer_vs_reference(self):
        """Cross-attention layer (layer_idx % freq == 0) with encoder hidden
        states — the path quick-test never exercises.

        N_q == N_k: the REFERENCE's own cross-attention crashes when the
        encoder sequence length differs from the query length (it applies
        Q-length rotary tables to K — models/cross_modal_fusion.py:91-94
        raises "size of tensor a (7) must match ... (5)"). The flax rebuild
        applies per-length tables (models/fusion.py FusionAttention), so it
        is equivalent where the reference works and defined where the
        reference crashes; parity is asserted on the working overlap."""
        mods = _load_ref()
        RefFusionCfg = mods["refmodels.cross_modal_fusion"].FusionConfig
        RefFusionLayer = mods["refmodels.cross_modal_fusion"].FusionLayer

        from deepearth_tpu.configs import FusionConfig
        from deepearth_tpu.models import FusionLayer

        cfg = FusionConfig(universal_dim=64, num_fusion_layers=3, num_heads=4,
                           cross_attention_freq=3)
        mod = FusionLayer(cfg, layer_idx=3)
        rng = np.random.default_rng(5)
        x = rng.standard_normal((2, 5, 64)).astype(np.float32)
        enc = rng.standard_normal((2, 5, 64)).astype(np.float32)
        p = mod.init(
            jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(enc)
        )["params"]

        ref = RefFusionLayer(
            RefFusionCfg(universal_dim=64, num_heads=4, cross_attention_freq=3),
            layer_idx=3,
        ).eval()
        assert ref.use_cross_attention
        for attn_name in ("self_attn", "cross_attn"):
            for name in ("q_proj", "k_proj", "v_proj", "out_proj"):
                _load_linear(getattr(getattr(ref, attn_name), name),
                             p[attn_name][name])
        _load_ln(ref.self_attn_norm, p["self_attn_norm"])
        _load_ln(ref.cross_attn_norm, p["cross_attn_norm"])
        _load_ln(ref.mlp_norm, p["mlp_norm"])
        _load_linear(ref.mlp.gate_proj, p["mlp"]["gate_proj"])
        _load_linear(ref.mlp.up_proj, p["mlp"]["up_proj"])
        _load_linear(ref.mlp.down_proj, p["mlp"]["down_proj"])

        with torch.no_grad():
            ref_out = ref(t(x), encoder_hidden_states=t(enc)).numpy()
        ours = np.asarray(
            mod.apply({"params": p}, jnp.asarray(x), jnp.asarray(enc))
        )
        assert np.abs(ours - ref_out).max() < TOL


class TestQuickTestCompositionParity:
    def test_quick_test_forward_end_to_end(self):
        """The full quick_test composition (reference: examples/quick_test.py:
        22-60): Grid4D → modality encoder → fusion Transformer → spatial/
        temporal/modality decoders, every stage the reference's own module
        with transplanted flax weights, compared at the final outputs."""
        mods = _load_ref()
        ref_cfg = _ref_deepearth_config(mods, hidden=48)
        RefTC = mods["refmodels.configs"].TransformerConfig

        from deepearth_tpu.configs import TransformerConfig
        from deepearth_tpu.models import (
            Grid4DEncoder as FlaxGrid4D,  # noqa: F401  (alias clarity)
        )
        from deepearth_tpu.models import (
            ModalityDecoder,
            ModalityEncoder,
            SpatiotemporalDecoder,
            Transformer,
        )

        B = 4
        rng = np.random.default_rng(7)
        xyzt = rng.random((B, 4)).astype(np.float32)
        temp = rng.standard_normal((B, 5)).astype(np.float32)

        # --- flax pipeline ------------------------------------------------ #
        g4 = _flax_grid4d(hidden=48)
        enc_cfg = TransformerConfig(hidden_dim=32, n_heads=4, n_layers=2)
        me = ModalityEncoder(input_dim=5, output_dim=48, encoder_cfg=enc_cfg)
        fus_cfg = TransformerConfig(hidden_dim=48, n_heads=4, n_layers=2)
        fus = Transformer(fus_cfg)
        sdec = SpatiotemporalDecoder(hidden_dim=48, output_dim=3)
        tdec = SpatiotemporalDecoder(hidden_dim=48, output_dim=1,
                                     coord_type="temporal")
        mdec = ModalityDecoder(hidden_dim=48, output_dim=5)

        k = jax.random.split(jax.random.PRNGKey(0), 6)
        pg = g4.init(k[0], jnp.asarray(xyzt))["params"]
        pm = me.init(k[1], jnp.asarray(temp))["params"]
        st_tok = g4.apply({"params": pg}, jnp.asarray(xyzt))[:, None, :]
        md_tok = me.apply({"params": pm}, jnp.asarray(temp))[:, None, :]
        tokens = jnp.concatenate([st_tok, md_tok], axis=1)
        pf = fus.init(k[2], tokens)["params"]
        fused = fus.apply({"params": pf}, tokens)
        ps = sdec.init(k[3], fused[:, 0])["params"]
        pt = tdec.init(k[4], fused[:, 0])["params"]
        pd = mdec.init(k[5], fused[:, 1])["params"]
        ours = (
            np.asarray(sdec.apply({"params": ps}, fused[:, 0])),
            np.asarray(tdec.apply({"params": pt}, fused[:, 0])),
            np.asarray(mdec.apply({"params": pd}, fused[:, 1])),
        )

        # --- reference pipeline, transplanted ----------------------------- #
        ref_g = mods["refmodels.encoders"].Grid4DEncoder(ref_cfg).eval()
        _load_grid4d(ref_g, pg)
        ref_me = mods["refmodels.encoders"].ModalityEncoder(
            "temperature", 5, ref_cfg, RefTC(hidden_dim=32, n_heads=4, n_layers=2)
        ).eval()
        _load_linear(ref_me.input_projection, pm["input_projection"])
        _set(ref_me.modality_embedding, t(pm["modality_embedding"]))
        _load_transformer(ref_me.transformer, pm["transformer"], 2)
        _load_linear(ref_me.output_projection, pm["output_projection"])
        _load_ln(ref_me.norm, pm["norm"])
        ref_fus = mods["refmodels.transformers"].Transformer(
            RefTC(hidden_dim=48, n_heads=4, n_layers=2)
        ).eval()
        _load_transformer(ref_fus, pf, 2)
        ref_s = mods["refmodels.decoders"].SpatiotemporalDecoder(
            "spatial", 3, ref_cfg
        ).eval()
        ref_t = mods["refmodels.decoders"].SpatiotemporalDecoder(
            "temporal", 1, ref_cfg
        ).eval()
        ref_m = mods["refmodels.decoders"].ModalityDecoder(
            "temperature", 5, ref_cfg
        ).eval()
        for ref_d, p in ((ref_s, ps), (ref_t, pt)):
            _load_linear(ref_d.decoder[0], p["fc1"])
            _load_ln(ref_d.decoder[1], p["ln1"])
            _load_linear(ref_d.decoder[3], p["fc2"])
            _load_ln(ref_d.decoder[4], p["ln2"])
            _load_linear(ref_d.decoder[6], p["fc3"])
        _load_linear(ref_m.decoder[0], pd["fc1"])
        _load_ln(ref_m.decoder[1], pd["ln1"])
        _load_linear(ref_m.decoder[4], pd["fc2"])
        _load_ln(ref_m.decoder[5], pd["ln2"])
        _load_linear(ref_m.decoder[8], pd["fc3"])

        with torch.no_grad():
            r_st = ref_g(t(xyzt))[:, None, :]
            r_md = ref_me(t(temp))[:, None, :]
            r_fused = ref_fus(torch.cat([r_st, r_md], dim=1))
            ref_out = (
                ref_s(r_fused[:, 0]).numpy(),
                ref_t(r_fused[:, 0]).numpy(),
                ref_m(r_fused[:, 1]).numpy(),
            )

        for o, r, name in zip(ours, ref_out, ("spatial", "temporal", "modality")):
            d = np.abs(o - r).max()
            assert d < TOL, f"{name} divergence {d:.2e}"
