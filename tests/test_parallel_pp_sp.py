"""Pipeline parallelism (GPipe over a 'pipe' mesh axis) and ring attention
(sequence parallelism) — both absent from the reference (SURVEY.md §2.6);
validated against their sequential/full-attention equivalents on the
8-device CPU mesh, forward AND gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.ops.attention import dot_product_attention
from deepearth_tpu.parallel import (
    create_mesh,
    pipeline_apply,
    ring_attention,
    stack_stage_params,
)


# ---------------------------------------------------------------------------
# Ring attention
# ---------------------------------------------------------------------------


class TestRingAttention:
    def _qkv(self, key, b=2, h=4, n=32, d=16):
        kq, kk, kv = jax.random.split(key, 3)
        return (
            jax.random.normal(kq, (b, h, n, d)),
            jax.random.normal(kk, (b, h, n, d)),
            jax.random.normal(kv, (b, h, n, d)),
        )

    def test_matches_full_attention(self):
        mesh = create_mesh(jax.devices(), axis_names=("sequence",))
        q, k, v = self._qkv(jax.random.PRNGKey(0))
        scale = 1.0 / np.sqrt(q.shape[-1])
        ref = dot_product_attention(q, k, v, scale=scale)
        out = jax.jit(
            lambda q, k, v: ring_attention(
                q, k, v, scale=scale, mesh=mesh, axis_name="sequence"
            )
        )(q, k, v)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_causal(self):
        mesh = create_mesh(jax.devices(), axis_names=("sequence",))
        q, k, v = self._qkv(jax.random.PRNGKey(1), n=64)
        scale = 0.25
        ref = dot_product_attention(q, k, v, scale=scale, is_causal=True)
        out = ring_attention(
            q, k, v, scale=scale, mesh=mesh, is_causal=True,
            axis_name="sequence",
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_key_mask(self):
        mesh = create_mesh(jax.devices(), axis_names=("sequence",))
        q, k, v = self._qkv(jax.random.PRNGKey(2))
        mask = jax.random.bernoulli(
            jax.random.PRNGKey(3), 0.7, (q.shape[0], q.shape[2])
        )
        mask = mask.at[:, 0].set(True)  # never fully masked
        scale = 0.3
        ref = dot_product_attention(q, k, v, scale=scale, key_mask=mask)
        out = ring_attention(
            q, k, v, scale=scale, mesh=mesh, key_mask=mask,
            axis_name="sequence",
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_fully_masked_rows_zero(self):
        """Batch rows whose key_mask is all-False across EVERY ring shard
        output exact zero (never the uniform mean of v), matching
        dot_product_attention's pinned convention."""
        mesh = create_mesh(jax.devices(), axis_names=("sequence",))
        q, k, v = self._qkv(jax.random.PRNGKey(7))
        mask = jnp.ones((q.shape[0], q.shape[2]), bool).at[0].set(False)
        scale = 0.3
        ref = dot_product_attention(q, k, v, scale=scale, key_mask=mask)
        out = ring_attention(
            q, k, v, scale=scale, mesh=mesh, key_mask=mask,
            axis_name="sequence",
        )
        assert bool((np.asarray(out)[0] == 0.0).all())
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_gradients_match(self):
        mesh = create_mesh(jax.devices(), axis_names=("sequence",))
        q, k, v = self._qkv(jax.random.PRNGKey(4), n=16)
        scale = 0.5

        def loss_ref(q, k, v):
            o = dot_product_attention(q, k, v, scale=scale)
            return (o * jnp.cos(o)).sum()

        def loss_ring(q, k, v):
            o = ring_attention(
                q, k, v, scale=scale, mesh=mesh, axis_name="sequence"
            )
            return (o * jnp.cos(o)).sum()

        g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        g_ring = jax.jit(jax.grad(loss_ring, argnums=(0, 1, 2)))(q, k, v)
        for a, b in zip(g_ring, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5
            )

    def test_2d_mesh_with_data_axis(self):
        """Batch over 'data', sequence over 'sequence' — SP composes with DP."""
        mesh = create_mesh(jax.devices(), mesh_shape=(2, 4),
                           axis_names=("data", "sequence"))
        q, k, v = self._qkv(jax.random.PRNGKey(5), b=4, n=16)
        scale = 0.25
        ref = dot_product_attention(q, k, v, scale=scale)
        out = ring_attention(
            q, k, v, scale=scale, mesh=mesh, axis_name="sequence"
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_uneven_sequence_rejected(self):
        mesh = create_mesh(jax.devices(), axis_names=("sequence",))
        q, k, v = self._qkv(jax.random.PRNGKey(6), n=30)
        with pytest.raises(ValueError):
            ring_attention(q, k, v, scale=1.0, mesh=mesh,
                           axis_name="sequence")


# ---------------------------------------------------------------------------
# Pipeline parallelism
# ---------------------------------------------------------------------------


def _mlp_stage(params, x):
    h = jnp.tanh(x @ params["w1"] + params["b1"])
    return x + h @ params["w2"]  # residual keeps shapes equal


def _make_stage_params(key, d, hidden):
    k1, k2 = jax.random.split(key)
    return {
        "w1": jax.random.normal(k1, (d, hidden)) * 0.1,
        "b1": jnp.zeros((hidden,)),
        "w2": jax.random.normal(k2, (hidden, d)) * 0.1,
    }


class TestPipeline:
    def _setup(self, n_stages, d=8, hidden=16):
        keys = jax.random.split(jax.random.PRNGKey(0), n_stages)
        per_stage = [_make_stage_params(k, d, hidden) for k in keys]
        return per_stage, stack_stage_params(per_stage)

    def _sequential(self, per_stage, x):
        for p in per_stage:
            x = _mlp_stage(p, x)
        return x

    def test_matches_sequential(self):
        mesh = create_mesh(jax.devices(), axis_names=("pipe",))
        per_stage, stacked = self._setup(8)
        x = jax.random.normal(jax.random.PRNGKey(1), (32, 8))
        ref = self._sequential(per_stage, x)
        out = jax.jit(
            lambda p, x: pipeline_apply(
                _mlp_stage, p, x, mesh=mesh, n_microbatches=8
            )
        )(stacked, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5
        )

    def test_microbatch_counts(self):
        mesh = create_mesh(jax.devices(), axis_names=("pipe",))
        per_stage, stacked = self._setup(8)
        x = jax.random.normal(jax.random.PRNGKey(2), (24, 8))
        ref = self._sequential(per_stage, x)
        for m in (1, 2, 4, 6, 12, 24):
            out = pipeline_apply(
                _mlp_stage, stacked, x, mesh=mesh, n_microbatches=m
            )
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=1e-5,
                err_msg=f"microbatches={m}",
            )

    def test_gradients_match(self):
        """Pipeline backward == sequential backward, for params AND input."""
        mesh = create_mesh(jax.devices(), axis_names=("pipe",))
        per_stage, stacked = self._setup(8)
        x = jax.random.normal(jax.random.PRNGKey(3), (16, 8))

        def loss_seq(stacked, x):
            ps = [
                jax.tree_util.tree_map(lambda l, i=i: l[i], stacked)
                for i in range(8)
            ]
            return jnp.sum(self._sequential(ps, x) ** 2)

        def loss_pipe(stacked, x):
            y = pipeline_apply(
                _mlp_stage, stacked, x, mesh=mesh, n_microbatches=4
            )
            return jnp.sum(y ** 2)

        g_ref = jax.grad(loss_seq, argnums=(0, 1))(stacked, x)
        g_pipe = jax.jit(jax.grad(loss_pipe, argnums=(0, 1)))(stacked, x)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            ),
            g_pipe, g_ref,
        )

    def test_pp_composes_with_dp_training_step(self):
        """One adamw step over a (data=2, pipe=4) mesh: stage weights sharded
        over 'pipe', loss averaged over a 'data'-sharded batch."""
        import optax

        mesh = create_mesh(jax.devices(), mesh_shape=(2, 4),
                           axis_names=("data", "pipe"))
        per_stage, stacked = self._setup(4)
        x = jax.random.normal(jax.random.PRNGKey(4), (16, 8))
        y = jax.random.normal(jax.random.PRNGKey(5), (16, 8))
        tx = optax.adamw(1e-2)
        opt = tx.init(stacked)

        def loss_fn(stacked, x, y):
            pred = pipeline_apply(
                _mlp_stage, stacked, x, mesh=mesh, axis_name="pipe",
                n_microbatches=4,
            )
            return jnp.mean((pred - y) ** 2)

        @jax.jit
        def step(stacked, opt, x, y):
            l, g = jax.value_and_grad(loss_fn)(stacked, x, y)
            updates, opt = tx.update(g, opt, stacked)
            return optax.apply_updates(stacked, updates), opt, l

        l0 = None
        for _ in range(5):
            stacked, opt, l = step(stacked, opt, x, y)
            l0 = l0 if l0 is not None else float(l)
        assert float(l) < l0, "pipeline training step must reduce loss"

    def test_deepseek_block_stages(self):
        """Pipeline a real 4-layer DeepSeek stack (one block per stage) and
        match the sequential transformer output."""
        from deepearth_tpu.configs import DeepSeekBlockConfig, MLAConfig
        from deepearth_tpu.models.deepseek import DeepSeekBlock

        cfg = DeepSeekBlockConfig(
            hidden_dim=32, n_layers=4, intermediate_size=64,
            mla=MLAConfig(
                hidden_dim=32, n_heads=4, kv_lora_rank=16,
                qk_rope_head_dim=4, qk_nope_head_dim=8, v_head_dim=8,
            ),
            first_k_dense_replace=4,  # all-dense: homogeneous stage trees
        )
        block = DeepSeekBlock(cfg)
        x = jax.random.normal(jax.random.PRNGKey(6), (8, 6, 32))
        keys = jax.random.split(jax.random.PRNGKey(7), 4)
        per_stage = [block.init(k, x)["params"] for k in keys]
        stacked = stack_stage_params(per_stage)

        ref = x
        for p in per_stage:
            ref = block.apply({"params": p}, ref)

        mesh = create_mesh(jax.devices(), mesh_shape=(2, 4),
                           axis_names=("data", "pipe"))
        out = jax.jit(
            lambda stacked, x: pipeline_apply(
                lambda p, a: block.apply({"params": p}, a),
                stacked, x, mesh=mesh, axis_name="pipe", n_microbatches=4,
            )
        )(stacked, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_bad_shapes_rejected(self):
        mesh = create_mesh(jax.devices(), axis_names=("pipe",))
        _, stacked = self._setup(8)
        x = jnp.zeros((12, 8))
        with pytest.raises(ValueError):
            pipeline_apply(_mlp_stage, stacked, x, mesh=mesh,
                           n_microbatches=5)
        _, stacked3 = self._setup(3)
        with pytest.raises(ValueError):
            pipeline_apply(_mlp_stage, stacked3, x, mesh=mesh,
                           n_microbatches=4)


# ---------------------------------------------------------------------------
# Model-level wiring (round 4): DeepSeekTransformer pipeline_stages knob and
# MLAttention's ring-attention sequence_axis knob — the product features that
# consume the primitives above.
# ---------------------------------------------------------------------------


class TestPipelinedTransformer:
    """cfg.pipeline_stages > 1 runs the stack as an in-model GPipe pipeline
    (models/deepseek.py _PipeTick); exact equality with the sequential
    stack, forward and gradients."""

    def _cfg(self, **kw):
        import dataclasses

        from deepearth_tpu.configs import (
            DeepSeekBlockConfig, MLAConfig, MoEConfig,
        )

        base = DeepSeekBlockConfig(
            hidden_dim=64, n_layers=4, intermediate_size=128,
            mla=MLAConfig(
                hidden_dim=64, n_heads=4, kv_lora_rank=32,
                qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
            ),
            moe=MoEConfig(
                n_routed_experts=4, num_experts_per_tok=2, hidden_dim=64,
                moe_intermediate_size=64,
            ),
            first_k_dense_replace=0, moe_layer_freq=1,
        )
        return dataclasses.replace(base, **kw)

    @staticmethod
    def _stack_from_seq(p0, n_stages, k):
        stages = {
            f"layer_{i}": jax.tree_util.tree_map(
                lambda *ls: jnp.stack(ls),
                *[p0[f"layer_{s * k + i}"] for s in range(n_stages)],
            )
            for i in range(k)
        }
        return {"pipe": {"stages": stages}, "norm": p0["norm"]}

    def test_matches_sequential_fwd_and_grad(self):
        from deepearth_tpu.models.deepseek import DeepSeekTransformer

        cfg0 = self._cfg()
        cfg_pp = self._cfg(pipeline_stages=2, pipeline_microbatches=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 64))
        m0, mp = DeepSeekTransformer(cfg0), DeepSeekTransformer(cfg_pp)
        p0 = m0.init(jax.random.PRNGKey(1), x)["params"]
        pp = self._stack_from_seq(p0, 2, 2)
        assert jax.tree_util.tree_structure(pp) == (
            jax.tree_util.tree_structure(mp.init(jax.random.PRNGKey(1), x)["params"])
        )
        o0 = m0.apply({"params": p0}, x)
        op = mp.apply({"params": pp}, x)
        np.testing.assert_allclose(
            np.asarray(op), np.asarray(o0), atol=1e-5
        )
        g0 = jax.grad(lambda p: (m0.apply({"params": p}, x) ** 2).sum())(p0)
        gp = jax.grad(lambda p: (mp.apply({"params": p}, x) ** 2).sum())(pp)
        errs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            gp, self._stack_from_seq(g0, 2, 2),
        )
        assert max(jax.tree_util.tree_leaves(errs)) < 1e-4

    def test_stage_params_shard_over_pipe(self):
        """parallel/mesh.py assigns P('pipe', ...) to the stacked stage
        leaves; each device holds 1/P of the stack."""
        from deepearth_tpu.models.deepseek import DeepSeekTransformer
        from deepearth_tpu.parallel import make_param_shardings

        cfg_pp = self._cfg(pipeline_stages=2, pipeline_microbatches=4)
        x = jnp.zeros((4, 6, 64))
        params = DeepSeekTransformer(cfg_pp).init(
            jax.random.PRNGKey(0), x
        )["params"]
        mesh = create_mesh(jax.devices(), mesh_shape=(4, 2),
                           axis_names=("data", "pipe"))
        sh = make_param_shardings(params, mesh)
        kernel_sh = sh["pipe"]["stages"]["layer_0"]["self_attn"][
            "kv_a_proj_with_mqa"
        ]["kernel"]
        assert kernel_sh.spec[0] == "pipe", kernel_sh.spec
        norm_sh = sh["norm"]["weight"]
        assert norm_sh.spec == ()  # unstacked leaves stay replicated

    @staticmethod
    def _stack_from_seq_prefix(p0, n_stages, k, prefix):
        out = {f"layer_{i}": p0[f"layer_{i}"] for i in range(prefix)}
        out["pipe"] = {
            "stages": {
                f"layer_{i}": jax.tree_util.tree_map(
                    lambda *ls: jnp.stack(ls),
                    *[p0[f"layer_{prefix + s * k + i}"] for s in range(n_stages)],
                )
                for i in range(k)
            }
        }
        out["norm"] = p0["norm"]
        return out

    def test_first_k_dense_prefix_matches_sequential(self):
        """first_k_dense_replace=1 (the flagship default) pipelines via a
        sequential alignment prefix: layers 0..p-1 replicated, the uniform
        MoE remainder pipelined (round-5, VERDICT r4 #2)."""
        from deepearth_tpu.models.deepseek import (
            DeepSeekTransformer, _pipeline_split,
        )

        cfg0 = self._cfg(first_k_dense_replace=1)
        cfg_pp = self._cfg(
            first_k_dense_replace=1, pipeline_stages=2,
            pipeline_microbatches=4,
        )
        prefix, pattern = _pipeline_split(cfg_pp, 2)
        assert (prefix, pattern) == (2, (True,))
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 64))
        m0, mp = DeepSeekTransformer(cfg0), DeepSeekTransformer(cfg_pp)
        p0 = m0.init(jax.random.PRNGKey(1), x)["params"]
        pp = self._stack_from_seq_prefix(p0, 2, 1, prefix)
        assert jax.tree_util.tree_structure(pp) == jax.tree_util.tree_structure(
            mp.init(jax.random.PRNGKey(1), x)["params"]
        )
        np.testing.assert_allclose(
            np.asarray(mp.apply({"params": pp}, x)),
            np.asarray(m0.apply({"params": p0}, x)),
            atol=1e-5,
        )
        g0 = jax.grad(lambda p: (m0.apply({"params": p}, x) ** 2).sum())(p0)
        gp = jax.grad(lambda p: (mp.apply({"params": p}, x) ** 2).sum())(pp)
        errs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            gp, self._stack_from_seq_prefix(g0, 2, 1, prefix),
        )
        assert max(jax.tree_util.tree_leaves(errs)) < 1e-4

    def test_key_mask_matches_sequential(self):
        """key_mask rides the pipeline in a lockstep-rotating buffer
        (round-5, VERDICT r4 #2: _PipeTick mask threading)."""
        from deepearth_tpu.models.deepseek import DeepSeekTransformer

        cfg0 = self._cfg()
        cfg_pp = self._cfg(pipeline_stages=2, pipeline_microbatches=4)
        x = jax.random.normal(jax.random.PRNGKey(0), (8, 6, 64))
        mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.7, (8, 6))
        mask = mask.at[:, 0].set(True)  # keep >=1 visible key per row
        m0, mp = DeepSeekTransformer(cfg0), DeepSeekTransformer(cfg_pp)
        p0 = m0.init(jax.random.PRNGKey(1), x, mask)["params"]
        pp = self._stack_from_seq(p0, 2, 2)
        np.testing.assert_allclose(
            np.asarray(mp.apply({"params": pp}, x, mask)),
            np.asarray(m0.apply({"params": p0}, x, mask)),
            atol=1e-5,
        )

    def test_impossible_pattern_rejected(self):
        """moe_layer_freq=2 with one layer per stage alternates dense/MoE
        stage patterns — no prefix alignment exists."""
        from deepearth_tpu.models.deepseek import DeepSeekTransformer

        cfg = self._cfg(moe_layer_freq=2, pipeline_stages=4)
        x = jnp.zeros((4, 6, 64))
        with pytest.raises(ValueError, match="no prefix split"):
            DeepSeekTransformer(cfg).init(jax.random.PRNGKey(0), x)


class TestRingAttentionKnob:
    """MLAConfig.sequence_axis routes MLAttention through ring attention
    when the ambient mesh (jax.set_mesh) carries the axis."""

    def _mla_cfg(self, **kw):
        from deepearth_tpu.configs import MLAConfig

        return MLAConfig(
            hidden_dim=64, n_heads=4, kv_lora_rank=32,
            qk_rope_head_dim=8, qk_nope_head_dim=16, v_head_dim=16,
            **kw,
        )

    def test_ring_equals_dense_inside_model(self):
        from deepearth_tpu.models.deepseek import MLAttention

        x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 64))
        m_ref = MLAttention(self._mla_cfg())
        m_ring = MLAttention(
            self._mla_cfg(sequence_axis="sequence", ring_min_seq=8)
        )
        params = m_ref.init(jax.random.PRNGKey(1), x)["params"]
        ref = m_ref.apply({"params": params}, x)
        mesh = create_mesh(jax.devices(), mesh_shape=(2, 4),
                           axis_names=("data", "sequence"))
        with jax.set_mesh(mesh):
            out = jax.jit(
                lambda p, x: m_ring.apply({"params": p}, x)
            )(params, x)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=2e-5
        )

    def test_no_mesh_falls_back(self):
        """Without an ambient mesh the knob is inert (same params, same
        output, no error)."""
        from deepearth_tpu.models.deepseek import MLAttention

        x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 64))
        m_ring = MLAttention(
            self._mla_cfg(sequence_axis="sequence", ring_min_seq=8)
        )
        m_ref = MLAttention(self._mla_cfg())
        params = m_ref.init(jax.random.PRNGKey(1), x)["params"]
        out = m_ring.apply({"params": params}, x)
        ref = m_ref.apply({"params": params}, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)
