"""System validation runner (reference: tests/run_tests.py:29-329).

Runs architecture checks, forward passes across config variants, memory
scaling by batch size with OOM degradation, a latency/throughput benchmark,
and feature-quality statistics; writes a JSON report.

Usage: python tools/validate.py [--output report.json] [--quick]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from typing import Any, Dict

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

if "--cpu" in sys.argv:
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp

from deepearth_tpu.configs import ModalityConfig, tiny_config
from deepearth_tpu.models import DeepEarthModel
from deepearth_tpu.utils.profiling import benchmark_fn


def make_batch(cfg, batch_size, key, with_vision=True, with_language=True):
    keys = jax.random.split(key, 4)
    mods = {}
    if "species" in cfg.modalities:
        mods["species"] = jax.random.randint(keys[0], (batch_size,), 0, 232)
    if with_vision and "vision" in cfg.modalities:
        m = cfg.modalities["vision"]
        mods["vision"] = jax.random.normal(keys[1], (batch_size, 16, m.input_dim))
    if with_language and "language" in cfg.modalities:
        m = cfg.modalities["language"]
        mods["language"] = jax.random.normal(keys[2], (batch_size, m.input_dim))
    return {
        "xyzt": jax.random.uniform(keys[3], (batch_size, 4)),
        "modalities": mods,
    }


def build_cfg():
    cfg = tiny_config()
    cfg.add_modality(
        ModalityConfig(name="vision", input_dim=64, n_tokens=4,
                       encoder_layers=1, encoder_heads=4)
    )
    cfg.add_modality(
        ModalityConfig(name="language", input_dim=128, n_tokens=2,
                       encoder_layers=1, encoder_heads=4)
    )
    return cfg


class DeepEarthValidator:
    def __init__(self, quick: bool = False):
        self.quick = quick
        self.results: Dict[str, Any] = {}
        self.cfg = build_cfg()
        self.model = DeepEarthModel(self.cfg)
        batch = make_batch(self.cfg, 2, jax.random.PRNGKey(0))
        self.params = self.model.init(jax.random.PRNGKey(1), batch)["params"]

    def run_all_tests(self) -> Dict[str, Any]:
        for name in (
            "architecture",
            "forward_configs",
            "memory_scaling",
            "latency_throughput",
            "feature_quality",
            "generation",
            "moe_dispatch_modes",
            "pallas_kernels",
            "adaptive_splat",
            "export_roundtrip",
        ):
            t0 = time.time()
            try:
                getattr(self, f"test_{name}")()
                self.results.setdefault(name, {})["status"] = "pass"
            except Exception as e:  # report, don't crash the runner
                self.results.setdefault(name, {})["status"] = f"fail: {e}"
            self.results[name]["seconds"] = round(time.time() - t0, 2)
        return self.results

    # -- checks ---------------------------------------------------------------- #

    def test_architecture(self):
        """Parameter counts per submodule (reference: run_tests.py architecture)."""
        counts = {}
        for top, sub in self.params.items():
            counts[top] = int(
                sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(sub))
            )
        self.results["architecture"] = {
            "param_counts": counts,
            "total_params": int(sum(counts.values())),
        }

    def test_forward_configs(self):
        """Forward variants {minimal, vision_only, language_only, full}
        (reference: run_tests.py:142-147)."""
        out = {}
        for name, (v, l) in {
            "minimal": (False, False),
            "vision_only": (True, False),
            "language_only": (False, True),
            "full": (True, True),
        }.items():
            batch = make_batch(self.cfg, 2, jax.random.PRNGKey(2), v, l)
            res = self.model.apply({"params": self.params}, batch)
            out[name] = {
                "fused_shape": list(res["fused_representation"].shape),
                "recon_keys": sorted(res["reconstructions"]),
                "finite": bool(
                    np.isfinite(np.asarray(res["fused_representation"])).all()
                ),
            }
        self.results["forward_configs"] = out

    def test_memory_scaling(self):
        """Batch-size scaling with graceful OOM handling
        (reference: run_tests.py:220-260)."""
        out = {}
        sizes = [2, 8] if self.quick else [2, 8, 32, 128]
        for b in sizes:
            try:
                batch = make_batch(self.cfg, b, jax.random.PRNGKey(3))
                res = self.model.apply({"params": self.params}, batch)
                jax.block_until_ready(res["fused_representation"])
                out[str(b)] = "ok"
            except (RuntimeError, MemoryError) as e:
                out[str(b)] = f"oom: {str(e)[:80]}"
                break
        self.results["memory_scaling"] = out

    def test_latency_throughput(self):
        """samples/sec + ms/sample @ batch 8 (reference: run_tests.py:264-329)."""
        b = 8
        batch = make_batch(self.cfg, b, jax.random.PRNGKey(4))
        fwd = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x)["fused_representation"]
        )
        iters = 20 if self.quick else 100
        stats = benchmark_fn(
            lambda: fwd(self.params, batch),
            iters=iters,
            warmup=5 if self.quick else 10,
            samples_per_call=b,
        )
        self.results["latency_throughput"] = stats

    def test_feature_quality(self):
        """Fused-feature statistics (reference: run_tests.py feature quality)."""
        batch = make_batch(self.cfg, 16, jax.random.PRNGKey(5))
        feats = np.asarray(
            self.model.apply({"params": self.params}, batch)["fused_representation"]
        )
        self.results["feature_quality"] = {
            "mean": float(feats.mean()),
            "std": float(feats.std()),
            "frac_dead_dims": float((feats.std(0) < 1e-6).mean()),
            "finite": bool(np.isfinite(feats).all()),
        }


    def test_generation(self):
        """Compressed-cache decode agrees with the full causal forward and
        generate() produces valid tokens (round 2)."""
        from deepearth_tpu.configs import DeepSeekBlockConfig, MLAConfig
        from deepearth_tpu.models import DeepSeekForCausalLM, generate

        cfg = DeepSeekBlockConfig(
            hidden_dim=64, n_layers=2, intermediate_size=128,
            mla=MLAConfig(hidden_dim=64, n_heads=4, kv_lora_rank=16,
                          qk_rope_head_dim=8, qk_nope_head_dim=16,
                          v_head_dim=16),
        )
        model = DeepSeekForCausalLM(cfg, vocab_size=97, tie_embeddings=False)
        ids = jnp.asarray([[3, 17, 42, 9]], jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids)["params"]
        full = model.apply({"params": params}, ids)
        toks = generate(params, cfg, ids, max_new_tokens=4)
        self.results["generation"] = {
            "first_matches_forward_argmax": bool(
                int(toks[0, 0]) == int(jnp.argmax(full[0, -1]))
            ),
            "tokens_valid": bool(
                (np.asarray(toks) >= 0).all() and (np.asarray(toks) < 97).all()
            ),
        }
        assert self.results["generation"]["first_matches_forward_argmax"]

    def test_moe_dispatch_modes(self):
        """dense einsum and scatter dispatch agree (round 2)."""
        from deepearth_tpu.ops.moe import (
            expert_ffn, make_dispatch_combine, moe_gate, scatter_dispatch_ffn,
        )

        rng = np.random.default_rng(0)
        n, d, e, k, f, cap = 64, 16, 16, 2, 32, 10
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        logits = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)
        wg = jnp.asarray(rng.standard_normal((e, d, f)) * 0.1, jnp.float32)
        wu = jnp.asarray(rng.standard_normal((e, d, f)) * 0.1, jnp.float32)
        wd = jnp.asarray(rng.standard_normal((e, f, d)) * 0.1, jnp.float32)
        res = moe_gate(logits, jnp.zeros(e), top_k=k, n_group=1, topk_group=1,
                       norm_topk_prob=True, routed_scaling_factor=1.0)
        # TPU f32 matmuls default to reduced-precision MXU passes; the two
        # dispatch formulations contract in different orders, so pin full
        # precision for the equivalence check (CPU is unaffected)
        with jax.default_matmul_precision("highest"):
            disp, comb, _ = make_dispatch_combine(
                res.topk_idx, res.topk_weight, n_experts=e, capacity=cap
            )
            y_dense = jnp.einsum(
                "nec,ecd->nd", comb,
                expert_ffn(jnp.einsum("nec,nd->ecd", disp, x), wg, wu, wd),
            )
            y_sc, _ = scatter_dispatch_ffn(
                x, res.topk_idx, res.topk_weight, wg, wu, wd, cap
            )
        err = float(jnp.max(jnp.abs(y_sc - y_dense)))
        self.results["moe_dispatch_modes"] = {"max_abs_diff": err}
        assert err < 1e-4, f"dispatch modes diverge: {err}"

    def test_pallas_kernels(self):
        """Round-3 Pallas kernels vs their XLA references ON THIS BACKEND —
        CI only exercises interpret mode on CPU; this is the real-silicon
        equivalence evidence (vmem attention, pairwise tiny-seq attention,
        int8 fused-dequant matmul, megablox gmm fixed tiling)."""
        on_tpu = jax.default_backend() == "tpu"
        out: Dict[str, Any] = {"backend": jax.default_backend()}

        from deepearth_tpu.ops.attention import dot_product_attention
        from deepearth_tpu.ops.attention_vmem import vmem_attention

        ks = jax.random.split(jax.random.PRNGKey(11), 3)
        b, h, s, dh = 2, 4, 576, 128
        q = jax.random.normal(ks[0], (b, h, s, dh), jnp.float32)
        k = jax.random.normal(ks[1], (b, h, s, dh), jnp.float32)
        v = jax.random.normal(ks[2], (b, h, s, dh), jnp.float32)

        def xla_ref(q, k, v):  # einsum formulation, no kernel routing
            s_ = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * (dh ** -0.5)
            p = jax.nn.softmax(s_, axis=-1)
            return jnp.einsum("bhqk,bhkd->bhqd", p, v)

        with jax.default_matmul_precision("highest"):
            o_k = vmem_attention(q, k, v, scale=dh ** -0.5,
                                 interpret=not on_tpu)
            o_r = xla_ref(q, k, v)
        err_vmem = float(jnp.max(jnp.abs(o_k - o_r)))
        out["vmem_attention_max_abs_diff"] = err_vmem
        assert err_vmem < 5e-4, f"vmem kernel diverges: {err_vmem}"

        from deepearth_tpu.ops.attention_smallseq import (
            pairwise_token_attention,
        )

        nq, bb, d = 3, 512, 512
        q2 = jax.random.normal(ks[0], (nq, bb, d), jnp.float32)
        k2 = jax.random.normal(ks[1], (nq, bb, d), jnp.float32)
        v2 = jax.random.normal(ks[2], (nq, bb, d), jnp.float32)
        with jax.default_matmul_precision("highest"):
            o_pk = pairwise_token_attention(
                q2, k2, v2, n_heads=4, scale=(d // 4) ** -0.5,
                use_kernel=True,
            )
            o_px = pairwise_token_attention(
                q2, k2, v2, n_heads=4, scale=(d // 4) ** -0.5,
                use_kernel=False,
            )
        err_pw = float(jnp.max(jnp.abs(o_pk - o_px)))
        out["pairwise_kernel_max_abs_diff"] = err_pw
        assert err_pw < 5e-4, f"pairwise kernel diverges: {err_pw}"

        from deepearth_tpu.ops.quant import (
            dequantize,
            int8_matmul,
            quantize_int8,
        )

        wk = jax.random.normal(ks[1], (256, 384), jnp.float32) * 0.05
        xq = jax.random.normal(ks[0], (16, 256), jnp.bfloat16)
        w_q, scale = quantize_int8(wk)
        y_q = int8_matmul(xq, w_q, scale, interpret=not on_tpu)
        y_ref = xq.astype(jnp.float32) @ dequantize(w_q, scale)
        denom = float(jnp.abs(y_ref).max()) + 1e-9
        err_i8 = float(
            jnp.max(jnp.abs(y_q.astype(jnp.float32) - y_ref))
        ) / denom
        out["int8_matmul_rel_err"] = err_i8
        assert err_i8 < 0.02, f"int8 kernel diverges: {err_i8}"

        from deepearth_tpu.ops.moe import moe_gate, ragged_expert_ffn

        s_tok, dd, ff, e, kk = 256, 256, 128, 4, 2
        xg = jax.random.normal(ks[0], (s_tok, dd), jnp.float32)
        wg = jax.random.normal(ks[1], (e, dd, ff), jnp.float32) * 0.05
        wu = jax.random.normal(ks[2], (e, dd, ff), jnp.float32) * 0.05
        wd = jax.random.normal(ks[0], (e, ff, dd), jnp.float32) * 0.05
        logits = jax.random.normal(ks[1], (s_tok, e), jnp.float32)
        res = moe_gate(logits, jnp.zeros(e), top_k=kk, n_group=1,
                       topk_group=1, norm_topk_prob=True,
                       routed_scaling_factor=1.0)
        with jax.default_matmul_precision("highest"):
            y_gmm = ragged_expert_ffn(
                xg, res.topk_idx, res.topk_weight, wg, wu, wd
            )
            per_e = jnp.stack([
                (jax.nn.silu(xg @ wg[i]) * (xg @ wu[i])) @ wd[i]
                for i in range(e)
            ], axis=1)  # (S, E, D)
            y_ref = jnp.einsum(
                "sk,skd->sd", res.topk_weight,
                jnp.take_along_axis(
                    per_e, res.topk_idx[..., None], axis=1
                ),
            )
        err_gmm = float(jnp.max(jnp.abs(y_gmm - y_ref)))
        out["ragged_gmm_max_abs_diff"] = err_gmm
        assert err_gmm < 5e-3, f"gmm diverges: {err_gmm}"

        self.results["pallas_kernels"] = out

    def test_adaptive_splat(self):
        """Densify/prune grows the scene and the fit improves (round 2)."""
        from deepearth_tpu.reconstruction import (
            Camera, fit_scene_adaptive, init_scene, render,
        )

        cam = Camera(rotation=jnp.eye(3), translation=jnp.asarray([0.0, 0.0, 2.0]),
                     fx=16.0, fy=16.0, cx=8.0, cy=8.0, width=16, height=16)
        true = init_scene(jax.random.PRNGKey(3), 6, extent=0.2)
        true = true._replace(opacity_logits=jnp.full((6,), 2.0))
        target = render(true, cam)
        steps = 60 if self.quick else 180
        scene, loss = fit_scene_adaptive(
            target, cam, n_init=6, steps=steps, densify_every=steps // 3,
            grad_threshold=1e-4, split_scale=0.08,
        )
        self.results["adaptive_splat"] = {
            "final_gaussians": int(scene.means.shape[0]),
            "final_loss": float(loss),
        }
        assert np.isfinite(loss)

    def test_export_roundtrip(self):
        """StableHLO export reloads and reproduces the forward (the
        reference validator's TorchScript/ONNX role)."""
        from deepearth_tpu.export import export_forward, load_exported

        batch = make_batch(self.cfg, 2, jax.random.PRNGKey(7))
        blob = export_forward(self.model, self.params, batch)
        fused_direct = jax.jit(
            lambda p, b: self.model.apply({"params": p}, b, deterministic=True)
        )(self.params, batch)["fused_representation"]
        fused_loaded, _ = load_exported(blob)(self.params, batch)
        err = float(jnp.max(jnp.abs(fused_loaded - fused_direct)))
        self.results["export_roundtrip"] = {
            "artifact_bytes": len(blob), "max_abs_diff": err,
        }
        assert err < 1e-5


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--output", default="validation_report.json")
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (fast validation)")
    args = ap.parse_args()

    v = DeepEarthValidator(quick=args.quick)
    results = v.run_all_tests()
    results["device"] = str(jax.devices()[0])
    with open(args.output, "w") as f:
        json.dump(results, f, indent=2)
    statuses = {
        k: r.get("status") for k, r in results.items() if isinstance(r, dict)
    }
    print(json.dumps(statuses, indent=2))
    print(f"report → {args.output}")


if __name__ == "__main__":
    main()
