"""Tests for RoPE, attention core, RMSNorm, and MoE routing — including
parity checks against the reference's torch formulations (re-implemented
inline, not imported)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.configs import RopeScalingConfig
from deepearth_tpu.ops import (
    RMSNorm,
    apply_rope_deepseek,
    apply_rope_half,
    apply_rope_interleaved,
    dot_product_attention,
    expert_ffn,
    load_balance_aux_loss,
    make_dispatch_combine,
    moe_gate,
    rope_cos_sin,
)

torch = pytest.importorskip("torch")


class TestRope:
    def test_interleaved_matches_complex_formulation(self):
        """A-stack parity (models/transformers.py:57-71): complex multiply."""
        B, H, N, D = 2, 3, 8, 16
        x = np.random.default_rng(0).standard_normal((B, H, N, D)).astype(np.float32)
        cos, sin = rope_cos_sin(N, D, layout="interleaved")
        got = np.asarray(apply_rope_interleaved(jnp.asarray(x), cos, sin))

        xt = torch.tensor(x).reshape(B, H, N, D // 2, 2)
        xc = torch.view_as_complex(xt)
        freqs = 1.0 / (10000 ** (torch.arange(0, D, 2).float() / D))
        t = torch.arange(N).float()
        fr = torch.outer(t, freqs)
        freqs_cis = torch.polar(torch.ones_like(fr), fr)
        expected = torch.view_as_real(xc * freqs_cis).reshape(B, H, N, D).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-5)

    def test_half_matches_rotate_half_formulation(self):
        """Fusion-stack parity (models/cross_modal_fusion.py:81-96)."""
        B, H, N, D = 2, 2, 6, 8
        x = np.random.default_rng(1).standard_normal((B, H, N, D)).astype(np.float32)
        cos, sin = rope_cos_sin(N, D, layout="half")
        got = np.asarray(apply_rope_half(jnp.asarray(x), cos, sin))

        inv = 1.0 / (10000 ** (torch.arange(0, D, 2).float() / D))
        fr = torch.outer(torch.arange(N).float(), inv)
        emb = torch.cat((fr, fr), dim=-1)
        c, s = emb.cos(), emb.sin()
        xt = torch.tensor(x)
        x1, x2 = xt[..., : D // 2], xt[..., D // 2 :]
        rot = torch.cat((-x2, x1), dim=-1)
        expected = (xt * c + rot * s).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-5)

    def test_deepseek_variant_deinterleaves(self):
        """MLA parity (modeling_deepseek.py:360-371): view/transpose trick."""
        B, H, N, D = 1, 2, 4, 8
        x = np.random.default_rng(2).standard_normal((B, H, N, D)).astype(np.float32)
        cos, sin = rope_cos_sin(N, D, layout="half")
        got = np.asarray(apply_rope_deepseek(jnp.asarray(x), cos, sin))

        xt = torch.tensor(x)
        b, h, s_, d = xt.shape
        xt = xt.view(b, h, s_, d // 2, 2).transpose(4, 3).reshape(b, h, s_, d)
        inv = 1.0 / (10000 ** (torch.arange(0, D, 2).float() / D))
        fr = torch.outer(torch.arange(N).float(), inv)
        emb = torch.cat((fr, fr), dim=-1)
        x1, x2 = xt[..., : D // 2], xt[..., D // 2 :]
        rot = torch.cat((-x2, x1), dim=-1)
        expected = (xt * emb.cos() + rot * emb.sin()).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-5)

    def test_yarn_scaling_applies_mscale(self):
        cfg = RopeScalingConfig(
            type="yarn", factor=4.0, original_max_position_embeddings=16,
            mscale=1.0, mscale_all_dim=0.0,
        )
        cos_plain, _ = rope_cos_sin(8, 16)
        cos_yarn, _ = rope_cos_sin(8, 16, scaling=cfg)
        ms = 0.1 * 1.0 * np.log(4.0) + 1.0
        np.testing.assert_allclose(np.asarray(cos_yarn[0, 0]), ms, rtol=1e-6)
        assert not np.allclose(np.asarray(cos_plain), np.asarray(cos_yarn))

    def test_dynamic_ntk_only_kicks_in_past_window(self):
        cfg = RopeScalingConfig(type="dynamic", factor=2.0,
                                original_max_position_embeddings=32)
        c_short, _ = rope_cos_sin(16, 8, scaling=cfg)
        c_plain, _ = rope_cos_sin(16, 8)
        np.testing.assert_allclose(np.asarray(c_short), np.asarray(c_plain))
        c_long, _ = rope_cos_sin(64, 8, scaling=cfg)
        c_plain_long, _ = rope_cos_sin(64, 8)
        assert not np.allclose(np.asarray(c_long), np.asarray(c_plain_long))

    def test_linear_scaling_divides_positions(self):
        cfg = RopeScalingConfig(type="linear", factor=2.0)
        c2, s2 = rope_cos_sin(8, 8, scaling=cfg)
        c1, s1 = rope_cos_sin(4, 8)
        # scaled index 2j sits at unscaled position j
        np.testing.assert_allclose(np.asarray(c2[::2]), np.asarray(c1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(s2[::2]), np.asarray(s1), atol=1e-6)


class TestAttention:
    def test_matches_torch_sdpa(self):
        B, H, N, D = 2, 4, 10, 16
        rng = np.random.default_rng(3)
        q, k, v = (rng.standard_normal((B, H, N, D)).astype(np.float32) for _ in range(3))
        scale = D ** -0.5
        got = np.asarray(
            dot_product_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale=scale
            )
        )
        qt, kt, vt = (torch.tensor(a) for a in (q, k, v))
        expected = torch.nn.functional.scaled_dot_product_attention(
            qt, kt, vt, scale=scale
        ).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)

    def test_key_mask(self):
        B, H, N, D = 1, 1, 4, 8
        rng = np.random.default_rng(4)
        q, k, v = (rng.standard_normal((B, H, N, D)).astype(np.float32) for _ in range(3))
        mask = jnp.array([[True, True, False, False]])
        out = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scale=D ** -0.5, key_mask=mask,
        )
        # masked keys contribute nothing: recompute with only first two keys
        out2 = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k[:, :, :2]), jnp.asarray(v[:, :, :2]),
            scale=D ** -0.5,
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2), rtol=1e-5, atol=1e-6)

    def test_causal(self):
        B, H, N, D = 1, 1, 5, 4
        rng = np.random.default_rng(5)
        q, k, v = (rng.standard_normal((B, H, N, D)).astype(np.float32) for _ in range(3))
        out = dot_product_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            scale=D ** -0.5, is_causal=True,
        )
        qt, kt, vt = (torch.tensor(a) for a in (q, k, v))
        expected = torch.nn.functional.scaled_dot_product_attention(
            qt, kt, vt, scale=D ** -0.5, is_causal=True
        ).numpy()
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)

    def test_fully_masked_row_is_finite(self):
        B, H, N, D = 1, 1, 3, 4
        q = jnp.ones((B, H, N, D))
        mask = jnp.zeros((B, N), dtype=bool)
        out = dot_product_attention(q, q, q, scale=1.0, key_mask=mask)
        assert np.isfinite(np.asarray(out)).all()


class TestRMSNorm:
    def test_matches_torch_reference(self):
        x = np.random.default_rng(6).standard_normal((4, 16)).astype(np.float32)
        mod = RMSNorm(eps=1e-6)
        params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        got = np.asarray(mod.apply(params, jnp.asarray(x)))
        xt = torch.tensor(x)
        var = xt.pow(2).mean(-1, keepdim=True)
        expected = (xt * torch.rsqrt(var + 1e-6)).numpy()
        np.testing.assert_allclose(got, expected, rtol=1e-4, atol=2e-5)


class TestMoEGate:
    def _torch_reference_gate(self, logits, bias, top_k, n_group, topk_group,
                              norm_topk_prob, scaling):
        """Inline re-implementation of MoEGate.forward
        (modeling_deepseek.py:422-473)."""
        scores = torch.tensor(logits).sigmoid()
        n, e = scores.shape
        sfc = scores + torch.tensor(bias).unsqueeze(0)
        group_scores = sfc.view(n, n_group, -1).topk(min(2, e // n_group), dim=-1)[0].sum(dim=-1)
        group_idx = torch.topk(group_scores, k=topk_group, dim=-1, sorted=False)[1]
        group_mask = torch.zeros_like(group_scores)
        group_mask.scatter_(1, group_idx, 1)
        score_mask = group_mask.unsqueeze(-1).expand(n, n_group, e // n_group).reshape(n, -1)
        tmp = sfc.masked_fill(~score_mask.bool(), float("-inf"))
        _, topk_idx = torch.topk(tmp, k=top_k, dim=-1, sorted=False)
        topk_w = scores.gather(1, topk_idx)
        if top_k > 1 and norm_topk_prob:
            topk_w = topk_w / (topk_w.sum(dim=-1, keepdim=True) + 1e-20)
        return topk_idx.numpy(), (topk_w * scaling).numpy()

    def test_matches_reference_selection_and_weights(self):
        rng = np.random.default_rng(7)
        n, e = 32, 16
        logits = rng.standard_normal((n, e)).astype(np.float32)
        bias = rng.standard_normal(e).astype(np.float32) * 0.1
        kwargs = dict(top_k=4, n_group=4, topk_group=2,
                      norm_topk_prob=True, routed_scaling_factor=1.5)
        res = moe_gate(jnp.asarray(logits), jnp.asarray(bias), **kwargs)
        ref_idx, ref_w = self._torch_reference_gate(
            logits, bias, 4, 4, 2, True, 1.5
        )
        got_idx, got_w = np.asarray(res.topk_idx), np.asarray(res.topk_weight)
        # top-k order may differ (sorted=False in torch); compare as sets w/ weights
        for i in range(n):
            gs = dict(zip(got_idx[i].tolist(), got_w[i].tolist()))
            rs = dict(zip(ref_idx[i].tolist(), ref_w[i].tolist()))
            assert set(gs) == set(rs), f"row {i}: {gs} vs {rs}"
            for key in gs:
                assert gs[key] == pytest.approx(rs[key], rel=1e-5)

    def test_no_group_limit(self):
        logits = jnp.asarray(
            np.random.default_rng(8).standard_normal((8, 4)).astype(np.float32)
        )
        res = moe_gate(
            logits, jnp.zeros(4), top_k=2, n_group=1, topk_group=1,
            norm_topk_prob=True, routed_scaling_factor=1.0,
        )
        w = np.asarray(res.topk_weight)
        np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)


class TestDispatch:
    def test_dispatch_combine_reconstruction(self):
        """With ample capacity, dense dispatch == weighted sum of expert outputs."""
        rng = np.random.default_rng(9)
        n, d, e, k, c = 16, 8, 4, 2, 16
        x = rng.standard_normal((n, d)).astype(np.float32)
        logits = rng.standard_normal((n, e)).astype(np.float32)
        res = moe_gate(
            jnp.asarray(logits), jnp.zeros(e), top_k=k, n_group=1, topk_group=1,
            norm_topk_prob=True, routed_scaling_factor=1.0,
        )
        dispatch, combine, load = make_dispatch_combine(
            res.topk_idx, res.topk_weight, n_experts=e, capacity=c
        )
        # identity "experts": y should equal sum_k w_k * x
        expert_in = jnp.einsum("nec,nd->ecd", dispatch, jnp.asarray(x))
        y = np.asarray(jnp.einsum("nec,ecd->nd", combine, expert_in))
        expected = np.asarray(res.topk_weight).sum(-1, keepdims=True) * x
        np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)
        assert np.asarray(load).sum() == n * k

    def test_capacity_drops_overflow(self):
        # all tokens pick expert 0
        idx = jnp.zeros((8, 1), jnp.int32)
        w = jnp.ones((8, 1), jnp.float32)
        dispatch, combine, _ = make_dispatch_combine(idx, w, n_experts=2, capacity=4)
        assert float(dispatch.sum()) == 4.0  # only 4 slots available
        # each slot used at most once
        assert float(dispatch.max()) == 1.0

    def test_expert_ffn_shapes(self):
        e, c, d, f = 4, 8, 16, 32
        rng = jax.random.PRNGKey(0)
        keys = jax.random.split(rng, 4)
        ein = jax.random.normal(keys[0], (e, c, d))
        wg = jax.random.normal(keys[1], (e, d, f)) * 0.02
        wu = jax.random.normal(keys[2], (e, d, f)) * 0.02
        wd = jax.random.normal(keys[3], (e, f, d)) * 0.02
        out = expert_ffn(ein, wg, wu, wd)
        assert out.shape == (e, c, d)

    def test_expert_ffn_bf16_intermediate_tolerance(self):
        """Pin the bf16-intermediate precision of expert_ffn (ADVICE r2).

        expert_ffn deliberately drops preferred_element_type=float32 on its
        einsums (fp32 accumulation stays inside the MXU; f32 *outputs* only
        add HBM traffic). The cost is bf16 rounding of gate/up/h between
        matmuls. This asserts that, at realistic weight scales, bf16
        intermediates stay within bf16-rounding distance (measured ~1e-2
        mean rel err — exactly bf16 eps territory, and the same rounding
        torch bf16 autocast applies to MLP intermediates) of an
        fp32-intermediate oracle over IDENTICAL bf16 inputs — the tolerance
        every bf16 dispatch path inherits."""
        e, c, d, f = 4, 32, 64, 128
        rng = np.random.default_rng(11)
        # SAME bf16 inputs for both paths — isolates the intermediate
        # rounding (the actual change) from input quantization
        ein = jnp.asarray(rng.standard_normal((e, c, d)), jnp.bfloat16)
        wg = jnp.asarray(rng.standard_normal((e, d, f)) * 0.05, jnp.bfloat16)
        wu = jnp.asarray(rng.standard_normal((e, d, f)) * 0.05, jnp.bfloat16)
        wd = jnp.asarray(rng.standard_normal((e, f, d)) * 0.05, jnp.bfloat16)

        # fp32-intermediate oracle over identical bf16 inputs
        gate = jnp.einsum("ecd,edf->ecf", ein, wg,
                          preferred_element_type=jnp.float32)
        up = jnp.einsum("ecd,edf->ecf", ein, wu,
                        preferred_element_type=jnp.float32)
        h = jax.nn.silu(gate) * up
        oracle = np.asarray(
            jnp.einsum("ecf,efd->ecd", h, wd.astype(jnp.float32),
                       preferred_element_type=jnp.float32)
        )

        out_bf16 = np.asarray(expert_ffn(ein, wg, wu, wd).astype(jnp.float32))
        err = np.abs(out_bf16 - oracle)
        rel = err / (np.abs(oracle) + 1e-3)
        rms = float(np.sqrt((oracle ** 2).mean()))
        # measured: mean rel ~1.0e-2 (CPU and v5e), max err ~3% of output
        # RMS. Pointwise rel err has heavy tails only where the output is
        # itself near zero, so the max is bounded against the RMS instead.
        assert rel.mean() < 2e-2, f"mean rel err {rel.mean():.2e}"
        assert err.max() / rms < 8e-2, f"max err/rms {err.max()/rms:.2e}"

    def test_scatter_matches_dense_dispatch(self):
        """Scatter dispatch reproduces the one-hot einsum path exactly —
        same k-major capacity priority, same drops — across ample and tight
        capacities and at 64 experts (the 'ultra'-scale path)."""
        from deepearth_tpu.ops.moe import scatter_dispatch_ffn

        rng = np.random.default_rng(3)
        for (n, d, e, k, f), cap in [
            ((32, 16, 8, 2, 32), 16),   # ample
            ((32, 16, 8, 2, 32), 2),    # tight → drops
            ((128, 16, 64, 4, 8), 3),   # many experts
        ]:
            x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
            logits = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)
            wg = jnp.asarray(rng.standard_normal((e, d, f)) * 0.1, jnp.float32)
            wu = jnp.asarray(rng.standard_normal((e, d, f)) * 0.1, jnp.float32)
            wd = jnp.asarray(rng.standard_normal((e, f, d)) * 0.1, jnp.float32)
            res = moe_gate(
                logits, jnp.zeros(e), top_k=k, n_group=1, topk_group=1,
                norm_topk_prob=True, routed_scaling_factor=1.0,
            )
            dispatch, combine, load_d = make_dispatch_combine(
                res.topk_idx, res.topk_weight, n_experts=e, capacity=cap
            )
            expert_in = jnp.einsum("nec,nd->ecd", dispatch, x)
            eo = expert_ffn(expert_in, wg, wu, wd)
            y_dense = np.asarray(jnp.einsum("nec,ecd->nd", combine, eo))

            y_sc, load_s = scatter_dispatch_ffn(
                x, res.topk_idx, res.topk_weight, wg, wu, wd, cap
            )
            np.testing.assert_allclose(
                np.asarray(y_sc), y_dense, rtol=2e-4, atol=2e-5
            )
            np.testing.assert_allclose(np.asarray(load_s), np.asarray(load_d))

    def test_scatter_dispatch_differentiable(self):
        from deepearth_tpu.ops.moe import scatter_dispatch_ffn

        rng = np.random.default_rng(4)
        n, d, e, k, f = 16, 8, 4, 2, 16
        x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
        logits = jnp.asarray(rng.standard_normal((n, e)), jnp.float32)
        res = moe_gate(
            logits, jnp.zeros(e), top_k=k, n_group=1, topk_group=1,
            norm_topk_prob=True, routed_scaling_factor=1.0,
        )

        def loss(ws):
            y, _ = scatter_dispatch_ffn(
                x, res.topk_idx, res.topk_weight, ws["g"], ws["u"], ws["d"], 8
            )
            return (y ** 2).mean()

        ws = {
            "g": jnp.asarray(rng.standard_normal((e, d, f)) * 0.1, jnp.float32),
            "u": jnp.asarray(rng.standard_normal((e, d, f)) * 0.1, jnp.float32),
            "d": jnp.asarray(rng.standard_normal((e, f, d)) * 0.1, jnp.float32),
        }
        grads = jax.grad(loss)(ws)
        for g in jax.tree_util.tree_leaves(grads):
            assert np.isfinite(np.asarray(g)).all()
            assert float(jnp.abs(g).max()) > 0

    def test_aux_loss_balanced_is_one(self):
        # perfectly uniform routing → loss ≈ 1
        n, e = 64, 4
        scores = jnp.ones((n, e)) * 0.5
        idx = jnp.asarray(np.arange(n) % e, jnp.int32)[:, None]
        loss = load_balance_aux_loss(scores, idx, e)
        assert float(loss) == pytest.approx(1.0, rel=1e-5)


class TestShardHint:
    """ops/sharding.py shard_hint: semantics-neutral layout pinning."""

    def test_noop_without_mesh(self):
        from deepearth_tpu.ops.sharding import shard_hint

        x = jnp.ones((8, 16))
        y = jax.jit(lambda x: shard_hint(x, "data", "model") * 1.0)(x)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(x))

    def test_meshed_equals_unmeshed(self):
        from jax.sharding import Mesh

        from deepearth_tpu.ops.sharding import shard_hint

        mesh = Mesh(
            np.array(jax.devices()).reshape(2, 2, 2),
            ("data", "expert", "model"),
        )
        x = jnp.arange(8 * 16, dtype=jnp.float32).reshape(8, 16)

        def f(x):
            return (shard_hint(x, "data", "model") ** 2).sum(axis=1)

        ref = jax.jit(f)(x)
        with jax.set_mesh(mesh):
            out = jax.jit(f)(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_indivisible_axis_dropped(self):
        from jax.sharding import Mesh

        from deepearth_tpu.ops.sharding import shard_hint

        mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
        x = jnp.ones((7, 5))  # 7 % 8 != 0 → axis dropped, no error
        with jax.set_mesh(mesh):
            y = jax.jit(lambda x: shard_hint(x, "data", "absent") + 0.0)(x)
        assert y.shape == (7, 5)
