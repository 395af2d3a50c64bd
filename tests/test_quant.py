"""Int8 weight-only quantization + Pallas fused-dequant matmul (ops/quant.py).

The kernel's numerics are pinned against an explicit dequant-then-matmul
oracle (same quantized weights, XLA path); the end-to-end decode check then
only needs to confirm the *wiring* — that a quantize_decoder_params tree
drives generate()/causal_lm_decode_step through the int8 path and lands
within quantization error of the bf16 decode.

Serving-efficiency parity target: the reference's llama.cpp-quantized
language service (reference: README.md:29, encoders/language/server.py).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import DeepSeekBlockConfig, MLAConfig, MoEConfig
from deepearth_tpu.ops.quant import (
    dequantize,
    dequantize_int4,
    expert_ffn_q,
    int4_bmm,
    int4_matmul,
    int8_bmm,
    int8_matmul,
    linear_p,
    quantize_decoder_params,
    quantize_int4,
    quantize_int8,
    quantized_bytes,
)


class TestQuantizeInt8:
    def test_roundtrip_error_bounded_by_half_step(self):
        w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * 3.0
        q, s = quantize_int8(w)
        assert q.dtype == jnp.int8
        assert q.shape == (64, 128)  # lane-padded
        assert s.shape == (1, 96)
        err = np.abs(np.asarray(dequantize(q, s)) - np.asarray(w))
        assert (err <= np.asarray(s)[0] * 0.5 + 1e-7).all()

    def test_batched_weights(self):
        w = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 48))
        q, s = quantize_int8(w)
        assert q.shape == (4, 32, 128) and s.shape == (4, 1, 48)
        rel = np.abs(np.asarray(dequantize(q, s) - w)).max() / np.abs(w).max()
        assert rel < 0.01


class TestInt8Bmm:
    """Kernel vs explicit dequant oracle — the numeric equivalence pin."""

    def _oracle(self, x, q, s):
        return jnp.einsum(
            "ecd,edf->ecf",
            x.astype(jnp.float32),
            dequantize(q, s),
            preferred_element_type=jnp.float32,
        )

    @pytest.mark.parametrize("shape", [(2, 5, 256, 384), (1, 32, 128, 128)])
    def test_matches_dequant_oracle(self, shape):
        e, c, d, f = shape
        kx, kw = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (e, c, d), jnp.bfloat16)
        q, s = quantize_int8(jax.random.normal(kw, (e, d, f)))
        out = np.asarray(int8_bmm(x, q, s)).astype(np.float32)
        ref = np.asarray(self._oracle(x, q, s))
        assert out.shape == (e, c, f)
        # only bf16-widening rounding separates the two paths
        denom = np.abs(ref).max()
        assert np.abs(out - ref).max() / denom < 0.02

    def test_fallback_non_tiling_reduction_dim(self):
        # D=100 can't tile on 128 lanes → XLA dequant fallback, same result
        x = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 100), jnp.bfloat16)
        q, s = quantize_int8(jax.random.normal(jax.random.PRNGKey(4), (2, 100, 64)))
        out = np.asarray(int8_bmm(x, q, s)).astype(np.float32)
        ref = np.asarray(self._oracle(x, q, s))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02

    def test_int8_matmul_leading_dims_and_odd_width(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (3, 5, 128), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(6), (128, 200))
        q, s = quantize_int8(w)  # pads F 200→256
        out = np.asarray(int8_matmul(x, q, s)).astype(np.float32)
        ref = np.asarray(
            x.astype(jnp.float32) @ dequantize(q, s)
        )
        assert out.shape == (3, 5, 200)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02

    def test_expert_ffn_q_matches_dequant_swiglu(self):
        e, c, d, f = 2, 8, 128, 128
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        x = jax.random.normal(keys[0], (e, c, d), jnp.bfloat16)
        p = {}
        for i, k in enumerate(("w_gate", "w_up", "w_down")):
            shape = (e, d, f) if k != "w_down" else (e, f, d)
            q, s = quantize_int8(jax.random.normal(keys[i + 1], shape) * 0.1)
            p[k + "_q"], p[k + "_scale"] = q, s
        out = np.asarray(expert_ffn_q(p, x)).astype(np.float32)
        xf = x.astype(jnp.float32)
        g = jnp.einsum("ecd,edf->ecf", xf, dequantize(p["w_gate_q"], p["w_gate_scale"]))
        u = jnp.einsum("ecd,edf->ecf", xf, dequantize(p["w_up_q"], p["w_up_scale"]))
        ref = np.asarray(jnp.einsum(
            "ecf,efd->ecd", jax.nn.silu(g) * u,
            dequantize(p["w_down_q"], p["w_down_scale"]),
        ))
        atol = 0.03 * np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=atol)


def _decode_cfg():
    """Tiny config whose kernels all satisfy the int8 gates (reduction dims
    multiples of 128) so the quantizer covers the whole decode path."""
    return DeepSeekBlockConfig(
        hidden_dim=128,
        n_layers=2,
        intermediate_size=128,
        mla=MLAConfig(
            hidden_dim=128, n_heads=2, q_lora_rank=128, kv_lora_rank=64,
            qk_rope_head_dim=64, qk_nope_head_dim=64, v_head_dim=64,
        ),
        moe=MoEConfig(
            n_routed_experts=4, num_experts_per_tok=2,
            moe_intermediate_size=128, hidden_dim=128, n_shared_experts=1,
        ),
        first_k_dense_replace=1,
    )


class TestQuantizedDecode:
    @pytest.fixture(scope="class")
    def lm(self):
        from deepearth_tpu.models import DeepSeekForCausalLM

        cfg = _decode_cfg()
        model = DeepSeekForCausalLM(
            cfg, vocab_size=256, tie_embeddings=False,
            compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )
        ids = jnp.zeros((1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        return cfg, params

    def test_tree_structure_and_coverage(self, lm):
        cfg, params = lm
        qp = quantize_decoder_params(params, min_dim=64)
        l0 = qp["model"]["layer_0"]
        # MLA projections + dense mlp quantized; kv_b_proj stays bf16
        assert "kernel_q" in l0["self_attn"]["q_b_proj"]
        assert "kernel_q" in l0["self_attn"]["o_proj"]
        assert "kernel" in l0["self_attn"]["kv_b_proj"]
        assert "kernel_q" not in l0["self_attn"]["kv_b_proj"]
        assert "kernel_q" in l0["mlp"]["gate_proj"]
        # MoE layer: routed experts + shared expert quantized, router not
        l1 = qp["model"]["layer_1"]["moe"]
        assert "w_gate_q" in l1 and "w_up_q" in l1 and "w_down_q" in l1
        assert "router_weight" in l1
        assert "kernel_q" in l1["shared_experts"]["gate_proj"]
        assert "kernel_q" in qp["lm_head"]
        cov = quantized_bytes(qp)
        assert cov["int8_bytes"] / cov["total_bytes"] > 0.3

    def test_decode_matches_bf16_within_quant_error(self, lm):
        from deepearth_tpu.models.generation import causal_lm_decode_step
        from deepearth_tpu.models.mla_decode import init_cache

        cfg, params = lm
        qp = quantize_decoder_params(params, min_dim=64)
        ids = jnp.asarray([[3, 17, 42, 9, 56, 11]], jnp.int32)
        S = ids.shape[1]

        def run(p):
            caches = tuple(
                init_cache(cfg.mla, 1, S, jnp.bfloat16)
                for _ in range(cfg.n_layers)
            )
            outs = []
            for t in range(S):
                logits, caches = causal_lm_decode_step(p, cfg, caches, ids[:, t], S)
                outs.append(np.asarray(logits))
            return np.stack(outs, 1)[0]

        ref = run(params)
        out = run(qp)
        # int8 per-channel quantization error through 2 layers: the logits
        # must stay highly correlated and close in RMS
        corr = np.corrcoef(ref.ravel(), out.ravel())[0, 1]
        rel_rms = np.sqrt(((out - ref) ** 2).mean()) / (ref.std() + 1e-9)
        assert corr > 0.99, corr
        assert rel_rms < 0.1, rel_rms

    def test_generate_runs_on_quantized_tree(self, lm):
        from deepearth_tpu.models import generate

        cfg, params = lm
        qp = quantize_decoder_params(params, min_dim=64)
        prompt = jnp.asarray([[3, 17, 42]], jnp.int32)
        toks = generate(qp, cfg, prompt, max_new_tokens=4,
                        cache_dtype=jnp.bfloat16)
        t = np.asarray(toks)
        assert t.shape == (1, 4) and (t >= 0).all() and (t < 256).all()

    def test_embedder_quantize_int8_serving_path(self, lm):
        """DeepSeekFlaxEmbedder(quantize_int8=True): generation runs over
        the int8 tree, embeddings over the bf16 tree (serving parity with
        the reference's quantized llama.cpp service)."""
        from deepearth_tpu.serving.language_server import DeepSeekFlaxEmbedder

        cfg, params = lm
        full = {"embed_tokens": params["embed_tokens"],
                "model": params["model"], "lm_head": params["lm_head"]}
        e_bf16 = DeepSeekFlaxEmbedder(full, cfg, 256)
        e_int8 = DeepSeekFlaxEmbedder(full, cfg, 256, quantize_int8=True,
                                      quant_min_dim=64)
        assert "kernel_q" in e_int8.gen_params["lm_head"]
        v1 = e_bf16.embed("quercus virginiana")
        v2 = e_int8.embed("quercus virginiana")
        np.testing.assert_allclose(v1, v2)  # embed path untouched
        toks = e_int8.generate("live oak", max_new_tokens=4)
        assert len(toks) == 4 and all(0 <= t < 256 for t in toks)

    def test_linear_p_bias_and_bf16_passthrough(self):
        w = jax.random.normal(jax.random.PRNGKey(8), (16, 8))
        b = jnp.ones((8,))
        x = jax.random.normal(jax.random.PRNGKey(9), (3, 16))
        out = linear_p({"kernel": w, "bias": b}, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(x @ w + b), rtol=1e-5
        )


class TestQuantizeInt4:
    def test_pack_roundtrip_exact_on_grid(self):
        # weights already on the int4 grid → dequant recovers them exactly
        rng = np.random.default_rng(0)
        q4 = rng.integers(-7, 8, (256, 96)).astype(np.float32)
        scale = 1.0  # absmax 7 → scale 1 when max |q|=7
        q4[0, :] = 7  # pin absmax per channel
        w = jnp.asarray(q4 * scale)
        p, s = quantize_int4(w)
        assert p.dtype == jnp.int8
        assert p.shape == (128, 128)  # D packed 256→128, F padded 96→128
        assert s.shape == (1, 96)
        np.testing.assert_allclose(np.asarray(dequantize_int4(p, s)), q4,
                                   atol=1e-5)

    def test_roundtrip_error_bounded_by_half_step(self):
        w = jax.random.normal(jax.random.PRNGKey(20), (256, 96)) * 3.0
        p, s = quantize_int4(w)
        err = np.abs(np.asarray(dequantize_int4(p, s)) - np.asarray(w))
        assert (err <= np.asarray(s)[0] * 0.5 + 1e-6).all()

    def test_odd_reduction_dim_rejected(self):
        with pytest.raises(ValueError):
            quantize_int4(jnp.zeros((33, 8)))


class TestInt4Bmm:
    def _oracle(self, x, p, s):
        return jnp.einsum(
            "ecd,edf->ecf",
            x.astype(jnp.float32),
            dequantize_int4(p, s),
            preferred_element_type=jnp.float32,
        )

    @pytest.mark.parametrize("shape", [(2, 5, 512, 384), (1, 32, 256, 128)])
    def test_matches_dequant_oracle(self, shape):
        e, c, d, f = shape
        kx, kw = jax.random.split(jax.random.PRNGKey(21))
        x = jax.random.normal(kx, (e, c, d), jnp.bfloat16)
        p, s = quantize_int4(jax.random.normal(kw, (e, d, f)))
        out = np.asarray(int4_bmm(x, p, s)).astype(np.float32)
        ref = np.asarray(self._oracle(x, p, s))
        assert out.shape == (e, c, f)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02

    def test_fallback_non_tiling_packed_dim(self):
        # D=100 → packed 50, can't tile on 128 lanes → XLA dequant fallback
        x = jax.random.normal(jax.random.PRNGKey(22), (2, 4, 100), jnp.bfloat16)
        p, s = quantize_int4(jax.random.normal(jax.random.PRNGKey(23), (2, 100, 64)))
        out = np.asarray(int4_bmm(x, p, s)).astype(np.float32)
        ref = np.asarray(self._oracle(x, p, s))
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02

    def test_int4_matmul_leading_dims_and_odd_width(self):
        x = jax.random.normal(jax.random.PRNGKey(24), (3, 5, 256), jnp.bfloat16)
        w = jax.random.normal(jax.random.PRNGKey(25), (256, 200))
        p, s = quantize_int4(w)  # pads F 200→256
        out = np.asarray(int4_matmul(x, p, s)).astype(np.float32)
        ref = np.asarray(x.astype(jnp.float32) @ dequantize_int4(p, s))
        assert out.shape == (3, 5, 200)
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02


class TestInt4Decode:
    def test_tree_bits4_structure_and_fallback(self):
        """bits=4 packs 256-divisible reduction dims; others fall back to
        int8 (so the whole tree still avoids bf16 weight streaming)."""
        from deepearth_tpu.models import DeepSeekForCausalLM

        cfg = _decode_cfg()
        model = DeepSeekForCausalLM(
            cfg, vocab_size=256, tie_embeddings=False,
            compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )
        ids = jnp.zeros((1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        qp = quantize_decoder_params(params, min_dim=64, bits=4)
        l0 = qp["model"]["layer_0"]
        # q_b_proj reduction dim = q_lora_rank = 128 (not 256-divisible) →
        # int8 fallback; o_proj reduction = n_heads*v_head_dim = 128 → int8
        assert "kernel_q" in l0["self_attn"]["q_b_proj"]
        # mlp gate_proj reduction = hidden 128 → int8; lm_head 128 → int8.
        # Nothing in the tiny config is 256-divisible, so force one:
        w = jax.random.normal(jax.random.PRNGKey(1), (512, 384))
        qp2 = quantize_decoder_params({"big": {"kernel": w}}, bits=4)
        assert "kernel_q4" in qp2["big"]
        x = jax.random.normal(jax.random.PRNGKey(2), (3, 512), jnp.bfloat16)
        out = np.asarray(linear_p(qp2["big"], x)).astype(np.float32)
        ref = np.asarray(
            x.astype(jnp.float32)
            @ dequantize_int4(qp2["big"]["kernel_q4"], qp2["big"]["scale"])
        )
        assert np.abs(out - ref).max() / np.abs(ref).max() < 0.02

    def test_expert_ffn_q_int4(self):
        e, c, d, f = 2, 8, 256, 256
        keys = jax.random.split(jax.random.PRNGKey(26), 4)
        x = jax.random.normal(keys[0], (e, c, d), jnp.bfloat16)
        p = {}
        for i, k in enumerate(("w_gate", "w_up", "w_down")):
            shape = (e, d, f) if k != "w_down" else (e, f, d)
            q, s = quantize_int4(jax.random.normal(keys[i + 1], shape) * 0.1)
            p[k + "_q4"], p[k + "_scale"] = q, s
        out = np.asarray(expert_ffn_q(p, x)).astype(np.float32)
        xf = x.astype(jnp.float32)
        g = jnp.einsum("ecd,edf->ecf", xf,
                       dequantize_int4(p["w_gate_q4"], p["w_gate_scale"]))
        u = jnp.einsum("ecd,edf->ecf", xf,
                       dequantize_int4(p["w_up_q4"], p["w_up_scale"]))
        ref = np.asarray(jnp.einsum(
            "ecf,efd->ecd", jax.nn.silu(g) * u,
            dequantize_int4(p["w_down_q4"], p["w_down_scale"]),
        ))
        atol = 0.03 * np.abs(ref).max()
        np.testing.assert_allclose(out, ref, atol=atol)



    def test_generate_runs_on_int4_tree(self):
        """generate() over a bits=4 tree whose MoE reduction dims ARE
        256-divisible, so the experts land on the w_gate_q4 path —
        the exact wiring a tiny all-fallback config never exercises
        (caught live: _moe_apply only looked for the int8 key and
        KeyError'd on w_gate in the 2.42B int4 decode bench)."""
        from deepearth_tpu.models import DeepSeekForCausalLM, generate

        cfg = _decode_cfg()
        cfg = dataclasses.replace(
            cfg, hidden_dim=256,
            mla=dataclasses.replace(cfg.mla, hidden_dim=256),
            moe=dataclasses.replace(
                cfg.moe, hidden_dim=256, moe_intermediate_size=256,
            ),
            intermediate_size=256,
        )
        model = DeepSeekForCausalLM(
            cfg, vocab_size=256, tie_embeddings=False,
            compute_dtype=jnp.bfloat16, param_dtype=jnp.bfloat16,
        )
        ids = jnp.zeros((1, 4), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        qp = quantize_decoder_params(params, min_dim=64, bits=4)
        l1 = qp["model"]["layer_1"]
        assert "w_gate_q4" in l1["moe"], sorted(l1["moe"])
        prompt = jnp.asarray([[3, 17, 42]], jnp.int32)
        toks = generate(qp, cfg, prompt, max_new_tokens=4,
                        cache_dtype=jnp.bfloat16)
        t = np.asarray(toks)
        assert t.shape == (1, 4) and (t >= 0).all() and (t < 256).all()
