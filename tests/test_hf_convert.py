"""HF/torch DeepSeek-V3 checkpoint conversion + generation tests.

Loads the reference's vendored modeling file (read-only, as a test oracle —
reference: encoders/modeling_deepseek.py) at tiny random-init scale, converts
its state_dict with deepearth_tpu.models.hf_convert, and checks logits parity
of the flax stack. Then exercises greedy/temperature generation over the
compressed-cache decoder.
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.models import (
    DeepSeekForCausalLM,
    causal_lm_decode_step,
    config_from_hf,
    convert_hf_state_dict,
    generate,
)
from deepearth_tpu.models.mla_decode import (
    cache_bytes_per_token,
    full_cache_bytes_per_token,
    init_cache,
)


def _load_reference_module():
    torch = pytest.importorskip("torch")  # noqa: F841
    if "refds.modeling_deepseek" in sys.modules:
        return sys.modules["refds.modeling_deepseek"]
    pkg = types.ModuleType("refds")
    pkg.__path__ = ["/root/reference/encoders"]
    sys.modules["refds"] = pkg
    for name in ("configuration_deepseek", "modeling_deepseek"):
        spec = importlib.util.spec_from_file_location(
            f"refds.{name}", f"/root/reference/encoders/{name}.py"
        )
        m = importlib.util.module_from_spec(spec)
        sys.modules[f"refds.{name}"] = m
        spec.loader.exec_module(m)
    return sys.modules["refds.modeling_deepseek"]


def _tiny_hf_config(ref_cfg_mod, **overrides):
    kw = dict(
        vocab_size=97,
        hidden_size=64,
        intermediate_size=128,
        moe_intermediate_size=48,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        n_shared_experts=1,
        n_routed_experts=8,
        routed_scaling_factor=1.0,
        num_experts_per_tok=2,
        n_group=2,
        topk_group=1,
        norm_topk_prob=True,
        scoring_func="sigmoid",
        topk_method="noaux_tc",
        first_k_dense_replace=1,
        moe_layer_freq=1,
        q_lora_rank=32,
        kv_lora_rank=32,
        qk_rope_head_dim=16,
        qk_nope_head_dim=32,
        v_head_dim=32,
        max_position_embeddings=128,
        rms_norm_eps=1e-6,
        attention_bias=False,
        attention_dropout=0.0,
        use_cache=False,
        aux_loss_alpha=0.0,
        seq_aux=False,
        tie_word_embeddings=False,
    )
    kw.update(overrides)
    return ref_cfg_mod.DeepseekV3Config(**kw)


@pytest.fixture(scope="module")
def tiny_ref_model():
    import torch

    ref = _load_reference_module()
    cfg_mod = sys.modules["refds.configuration_deepseek"]
    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config(cfg_mod)
    model = ref.DeepseekV3ForCausalLM(hf_cfg).eval()
    # nonzero router bias so the correction-bias path is actually exercised
    with torch.no_grad():
        for mod in model.modules():
            if hasattr(mod, "e_score_correction_bias"):
                mod.e_score_correction_bias.uniform_(-0.05, 0.05)
    return hf_cfg, model


class TestHFConversion:
    def test_logits_parity(self, tiny_ref_model):
        """Converted flax params reproduce the reference module's logits
        (<1e-3, VERDICT round-1 item 3)."""
        import torch

        hf_cfg, ref_model = tiny_ref_model
        cfg, vocab = config_from_hf(hf_cfg)
        assert vocab == 97 and cfg.n_layers == 3
        params = convert_hf_state_dict(ref_model.state_dict(), cfg)

        ids = np.array(
            [[3, 17, 42, 9, 56, 11, 80, 2], [1, 5, 7, 90, 33, 21, 60, 4]],
            dtype=np.int64,
        )
        with torch.no_grad():
            ref_logits = (
                ref_model(
                    input_ids=torch.from_numpy(ids),
                    attention_mask=torch.ones_like(torch.from_numpy(ids)),
                )
                .logits.float()
                .numpy()
            )

        model = DeepSeekForCausalLM(cfg, vocab_size=vocab, tie_embeddings=False)
        ours = np.asarray(
            model.apply({"params": params}, jnp.asarray(ids, jnp.int32))
        )
        assert ours.shape == ref_logits.shape
        err = np.max(np.abs(ours - ref_logits))
        scale = np.max(np.abs(ref_logits)) + 1e-9
        assert err / scale < 1e-3, f"relative logits error {err/scale:.2e}"

    def test_decode_matches_converted_forward(self, tiny_ref_model):
        """Compressed-cache decode over converted weights matches the full
        causal forward token-by-token."""
        hf_cfg, ref_model = tiny_ref_model
        cfg, vocab = config_from_hf(hf_cfg)
        params = convert_hf_state_dict(ref_model.state_dict(), cfg)
        model = DeepSeekForCausalLM(cfg, vocab_size=vocab, tie_embeddings=False)

        ids = jnp.asarray([[3, 17, 42, 9, 56, 11]], jnp.int32)
        full = np.asarray(model.apply({"params": params}, ids))

        caches = tuple(
            init_cache(cfg.mla, 1, ids.shape[1]) for _ in range(cfg.n_layers)
        )
        dec = []
        for t in range(ids.shape[1]):
            logits, caches = causal_lm_decode_step(
                params, cfg, caches, ids[:, t], ids.shape[1]
            )
            dec.append(np.asarray(logits))
        dec = np.stack(dec, axis=1)
        np.testing.assert_allclose(dec, full, atol=1e-3, rtol=1e-3)

    def test_generate_greedy_and_sampled(self, tiny_ref_model):
        hf_cfg, ref_model = tiny_ref_model
        cfg, vocab = config_from_hf(hf_cfg)
        params = convert_hf_state_dict(ref_model.state_dict(), cfg)

        prompt = jnp.asarray([[3, 17, 42], [9, 56, 11]], jnp.int32)
        toks = generate(params, cfg, prompt, max_new_tokens=5)
        assert toks.shape == (2, 5)
        assert (np.asarray(toks) >= 0).all() and (np.asarray(toks) < vocab).all()
        # greedy is deterministic
        toks2 = generate(params, cfg, prompt, max_new_tokens=5)
        np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
        # sampling with temperature draws valid tokens and differs across rngs
        s1 = generate(
            params, cfg, prompt, max_new_tokens=8, temperature=1.5,
            top_k=20, rng=jax.random.PRNGKey(1),
        )
        s2 = generate(
            params, cfg, prompt, max_new_tokens=8, temperature=1.5,
            top_k=20, rng=jax.random.PRNGKey(2),
        )
        assert not np.array_equal(np.asarray(s1), np.asarray(s2))

    def test_generate_prompt_padding_equivalence(self, tiny_ref_model):
        """Right-padding the prompt to a bucketed length (the serving-side
        anti-recompile bucketing, ADVICE r2) must not change greedy output:
        pad slots are overwritten during decode and masked out of
        attention."""
        hf_cfg, ref_model = tiny_ref_model
        cfg, vocab = config_from_hf(hf_cfg)
        params = convert_hf_state_dict(ref_model.state_dict(), cfg)

        prompt = jnp.asarray([[3, 17, 42, 9, 56]], jnp.int32)
        ref = np.asarray(generate(params, cfg, prompt, max_new_tokens=6))

        padded = jnp.concatenate(
            [prompt, jnp.zeros((1, 11), jnp.int32)], axis=1
        )  # bucketed to 16
        out = np.asarray(
            generate(
                params, cfg, padded, max_new_tokens=6,
                prompt_len=5, max_len=16 + 6,
            )
        )
        np.testing.assert_array_equal(out, ref)

        # runtime temperature does not recompile: same compiled run object
        from deepearth_tpu.models.generation import _RUN_CACHE
        n_before = len(_RUN_CACHE)
        generate(params, cfg, padded, max_new_tokens=6, prompt_len=5,
                 max_len=16 + 6, temperature=0.7,
                 rng=jax.random.PRNGKey(3))
        assert len(_RUN_CACHE) == n_before

    def test_greedy_matches_full_forward_argmax(self, tiny_ref_model):
        """First generated token == argmax of the training-path forward at
        the last prompt position (decode path consistency end-to-end)."""
        hf_cfg, ref_model = tiny_ref_model
        cfg, vocab = config_from_hf(hf_cfg)
        params = convert_hf_state_dict(ref_model.state_dict(), cfg)
        model = DeepSeekForCausalLM(cfg, vocab_size=vocab, tie_embeddings=False)

        prompt = jnp.asarray([[3, 17, 42, 9]], jnp.int32)
        full_logits = model.apply({"params": params}, prompt)
        expected_first = int(jnp.argmax(full_logits[0, -1]))
        toks = generate(params, cfg, prompt, max_new_tokens=1)
        assert int(toks[0, 0]) == expected_first

    def test_language_service_real_weight_path(self, tiny_ref_model):
        """Converted checkpoint served through the language embedding
        service over HTTP (replaces the reference's GGUF llama.cpp server,
        reference: encoders/language/server.py:31-50)."""
        from deepearth_tpu.serving import (
            DeepSeekFlaxEmbedder,
            LanguageClient,
            LanguageEmbeddingService,
            LanguageServer,
        )

        hf_cfg, ref_model = tiny_ref_model
        cfg, vocab = config_from_hf(hf_cfg)
        params = convert_hf_state_dict(ref_model.state_dict(), cfg)
        emb = DeepSeekFlaxEmbedder(params, cfg, vocab)
        srv = LanguageServer(LanguageEmbeddingService(emb)).start()
        try:
            c = LanguageClient(f"http://127.0.0.1:{srv.port}", timeout=300)
            h = c.health()
            assert h["backend"] == "DeepSeekFlaxEmbedder"
            assert h["dim"] == cfg.hidden_dim
            v1 = c.embed("quercus virginiana in florida")
            v2 = c.embed("quercus virginiana in florida")
            v3 = c.embed("something entirely different")
            assert v1.shape == (cfg.hidden_dim,)
            np.testing.assert_allclose(v1, v2)
            assert not np.allclose(v1, v3)
            toks = c.tokenize("live oak")
            assert all(0 <= t < vocab for t in toks)
            # greedy decode over HTTP through the memoized compressed-cache
            # loop; deterministic across calls
            out1 = c.generate("live oak", max_new_tokens=4)
            out2 = c.generate("live oak", max_new_tokens=4)
            assert len(out1) == 4 and all(0 <= t < vocab for t in out1)
            assert out1 == out2
        finally:
            srv.stop()

    def test_prompt_bucketing_bounded(self, tiny_ref_model):
        """Prompt shapes that key into jit come from a FINITE bucket set;
        arbitrarily long prompts truncate (keeping the most recent tokens)
        instead of compiling a new O(prompt) program per request."""
        from deepearth_tpu.serving import DeepSeekFlaxEmbedder

        hf_cfg, ref_model = tiny_ref_model
        cfg, vocab = config_from_hf(hf_cfg)
        params = convert_hf_state_dict(ref_model.state_dict(), cfg)
        e = DeepSeekFlaxEmbedder(params, cfg, vocab)
        max_prompt = e._max_prompt()
        allowed = {b for b in e.PROMPT_BUCKETS if b <= max_prompt}
        allowed.add(max_prompt)

        ids, plen = e._bucket_prompt([1, 2, 3])
        assert plen == 3 and len(ids) in allowed and ids[:3] == [1, 2, 3]

        huge = list(range(100_000))
        ids, plen = e._bucket_prompt(huge)
        assert plen == max_prompt and len(ids) in allowed
        assert ids[plen - 1] == huge[-1]  # most recent tokens kept

    def test_cache_compression_at_v3_dims(self):
        """57× cache-ratio claim holds for real V3 dims during decode
        (reference: README.md:29)."""
        from deepearth_tpu.configs import MLAConfig

        v3 = MLAConfig(
            hidden_dim=7168, n_heads=128, q_lora_rank=1536,
            kv_lora_rank=512, qk_rope_head_dim=64, qk_nope_head_dim=128,
            v_head_dim=128,
        )
        ratio = full_cache_bytes_per_token(v3) / cache_bytes_per_token(v3)
        assert ratio > 56.0


class TestConvertCLI:
    @pytest.mark.slow
    def test_convert_save_load_generate_cli(self, tiny_ref_model, tmp_path):
        """scripts/convert_checkpoint.py + generate_cli.py end-to-end:
        torch checkpoint file → converted dir → verified forward → decode
        (the reference's from_pretrained+generate workflow as CLIs)."""
        import json
        import subprocess
        import sys as _sys

        import torch

        hf_cfg, ref_model = tiny_ref_model
        ckpt = tmp_path / "model.pt"
        torch.save(ref_model.state_dict(), ckpt)
        cfg_json = tmp_path / "config.json"
        cfg_json.write_text(json.dumps(hf_cfg.to_dict()))
        out_dir = tmp_path / "converted"

        env = dict(__import__("os").environ, JAX_PLATFORMS="cpu")
        r = subprocess.run(
            [_sys.executable, "scripts/convert_checkpoint.py", str(ckpt),
             str(out_dir), "--config", str(cfg_json), "--verify"],
            capture_output=True, text=True, timeout=600, env=env,
            cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert "verify OK" in r.stdout

        # generate path in-process (a second cold subprocess would double
        # the test's wall time for no extra coverage): converted-dir load +
        # hash tokenizer + decode, exactly what generate_cli.py wires up
        _sys.path.insert(0, "/root/repo/scripts")
        from convert_checkpoint import load_converted
        from deepearth_tpu.serving.language_server import HashEmbedder

        params, cfg2, vocab2 = load_converted(str(out_dir))
        assert vocab2 == 97 and cfg2.n_layers == 3
        ids = [t % vocab2 for t in HashEmbedder().tokenize("live oak")]
        toks = generate(
            params, cfg2, jnp.asarray([ids], jnp.int32), max_new_tokens=5
        )
        toks = np.asarray(toks)[0]
        assert toks.shape == (5,) and (0 <= toks).all() and (toks < 97).all()
