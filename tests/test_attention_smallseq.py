"""Token-major small-sequence attention (ops/attention_smallseq.py):
equivalence with the standard BHND path, RoPE identity, and the fusion
stack's layout switch (token-major == batch-major with identical params)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from deepearth_tpu.configs import FusionConfig
from deepearth_tpu.models.fusion import CrossModalFusion
from deepearth_tpu.ops.attention import dot_product_attention
from deepearth_tpu.ops.attention_smallseq import (
    pairwise_token_attention,
    rope_token_major,
)
from deepearth_tpu.ops.rope import apply_rope_half, rope_cos_sin

B, N, H, Dh = 8, 3, 12, 64
D = H * Dh


def _qkv(key):
    return tuple(
        jax.random.normal(jax.random.fold_in(key, i), (B, N, D))
        for i in range(3)
    )


def _ref(q, k, v, key_mask=None, rope=False):
    """The standard batch-major BHND formulation."""
    to4 = lambda x: x.reshape(B, N, H, Dh).transpose(0, 2, 1, 3)  # noqa: E731
    q4, k4, v4 = to4(q), to4(k), to4(v)
    if rope:
        cos, sin = rope_cos_sin(N, Dh, layout="half")
        q4 = apply_rope_half(q4, cos, sin)
        k4 = apply_rope_half(k4, cos, sin)
    o = dot_product_attention(q4, k4, v4, scale=Dh**-0.5, key_mask=key_mask)
    return o.transpose(0, 2, 1, 3).reshape(B, N, D)


def _tm(x):
    return x.transpose(1, 0, 2)


class TestPairwiseTokenAttention:
    def test_matches_bhnd(self):
        q, k, v = _qkv(jax.random.PRNGKey(0))
        out = pairwise_token_attention(
            _tm(q), _tm(k), _tm(v), n_heads=H, scale=Dh**-0.5
        )
        np.testing.assert_allclose(
            np.asarray(_tm(out)), np.asarray(_ref(q, k, v)), atol=5e-6
        )

    def test_key_mask(self):
        q, k, v = _qkv(jax.random.PRNGKey(1))
        mask = jax.random.bernoulli(
            jax.random.PRNGKey(2), 0.6, (B, N)
        ).at[:, 0].set(True)
        out = pairwise_token_attention(
            _tm(q), _tm(k), _tm(v), n_heads=H, scale=Dh**-0.5, key_mask=mask
        )
        np.testing.assert_allclose(
            np.asarray(_tm(out)),
            np.asarray(_ref(q, k, v, key_mask=mask)),
            atol=5e-6,
        )

    def test_fully_masked_rows_zero(self):
        """All-False key_mask rows output EXACT zero (the convention every
        backend pins, tests/test_attention_vmem.py) and match the batch-major
        dot_product_attention path under the same mask."""
        q, k, v = _qkv(jax.random.PRNGKey(3))
        mask = jnp.zeros((B, N), bool)
        out = pairwise_token_attention(
            _tm(q), _tm(k), _tm(v), n_heads=H, scale=Dh**-0.5, key_mask=mask
        )
        assert bool((out == 0.0).all())
        np.testing.assert_allclose(
            np.asarray(_tm(out)),
            np.asarray(_ref(q, k, v, key_mask=mask)),
            atol=5e-6,
        )

    def test_some_rows_fully_masked(self):
        """Mixed batch: masked-out rows zero, visible rows exact."""
        q, k, v = _qkv(jax.random.PRNGKey(7))
        mask = jnp.ones((B, N), bool).at[::2].set(False)
        out = pairwise_token_attention(
            _tm(q), _tm(k), _tm(v), n_heads=H, scale=Dh**-0.5, key_mask=mask
        )
        out_bm = _tm(out)
        assert bool((out_bm[::2] == 0.0).all())
        np.testing.assert_allclose(
            np.asarray(out_bm),
            np.asarray(_ref(q, k, v, key_mask=mask)),
            atol=5e-6,
        )

    def test_rope_identity(self):
        """rope_token_major == apply_rope_half through the layout change."""
        q, k, v = _qkv(jax.random.PRNGKey(4))
        qr = rope_token_major(_tm(q), H)
        kr = rope_token_major(_tm(k), H)
        out = pairwise_token_attention(
            qr, kr, _tm(v), n_heads=H, scale=Dh**-0.5
        )
        np.testing.assert_allclose(
            np.asarray(_tm(out)),
            np.asarray(_ref(q, k, v, rope=True)),
            atol=5e-6,
        )

    def test_gradients_match(self):
        q, k, v = _qkv(jax.random.PRNGKey(5))

        def l_new(q, k, v):
            o = pairwise_token_attention(
                _tm(q), _tm(k), _tm(v), n_heads=H, scale=Dh**-0.5
            )
            return jnp.sum(jnp.sin(o))

        def l_old(q, k, v):
            return jnp.sum(jnp.sin(_tm(_ref(q, k, v))))

        g1 = jax.grad(l_new, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(l_old, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_rectangular_cross_attention(self):
        """Nq != Nk (cross-attention shape)."""
        key = jax.random.PRNGKey(6)
        q = jax.random.normal(jax.random.fold_in(key, 0), (B, 2, D))
        k = jax.random.normal(jax.random.fold_in(key, 1), (B, 5, D))
        v = jax.random.normal(jax.random.fold_in(key, 2), (B, 5, D))
        to4 = lambda x, n: x.reshape(B, n, H, Dh).transpose(0, 2, 1, 3)  # noqa: E731
        ref = dot_product_attention(
            to4(q, 2), to4(k, 5), to4(v, 5), scale=Dh**-0.5
        ).transpose(0, 2, 1, 3).reshape(B, 2, D)
        out = pairwise_token_attention(
            _tm(q), _tm(k), _tm(v), n_heads=H, scale=Dh**-0.5
        )
        np.testing.assert_allclose(
            np.asarray(_tm(out)), np.asarray(ref), atol=5e-6
        )


class TestPairwiseKernel:
    """The Pallas pairwise core (interpret mode on CPU) == the XLA path."""

    def _qkv(self, key, nq=3, nk=3, b=256):
        return (
            jax.random.normal(jax.random.fold_in(key, 0), (nq, b, D)),
            jax.random.normal(jax.random.fold_in(key, 1), (nk, b, D)),
            jax.random.normal(jax.random.fold_in(key, 2), (nk, b, D)),
        )

    def test_forward_matches_xla(self):
        q, k, v = self._qkv(jax.random.PRNGKey(0))
        ref = pairwise_token_attention(
            q, k, v, n_heads=H, scale=Dh**-0.5, use_kernel=False
        )
        out = pairwise_token_attention(
            q, k, v, n_heads=H, scale=Dh**-0.5, use_kernel=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)

    def test_gradients_match_xla(self):
        q, k, v = self._qkv(jax.random.PRNGKey(1))

        def loss(use_kernel):
            def f(q, k, v):
                o = pairwise_token_attention(
                    q, k, v, n_heads=H, scale=Dh**-0.5, use_kernel=use_kernel
                )
                return jnp.sum(jnp.sin(o))

            return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

        for a, b in zip(loss(True), loss(False)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_rectangular(self):
        q, k, v = self._qkv(jax.random.PRNGKey(2), nq=2, nk=4)
        ref = pairwise_token_attention(
            q, k, v, n_heads=H, scale=0.3, use_kernel=False
        )
        out = pairwise_token_attention(
            q, k, v, n_heads=H, scale=0.3, use_kernel=True
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)

    def test_unsupported_shapes_fall_back(self):
        # B not a multiple of 256 → XLA path even when requested
        q, k, v = self._qkv(jax.random.PRNGKey(3), b=100)
        out = pairwise_token_attention(
            q, k, v, n_heads=H, scale=0.3, use_kernel=True
        )
        ref = pairwise_token_attention(
            q, k, v, n_heads=H, scale=0.3, use_kernel=False
        )
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-6)


class TestFusionLayoutSwitch:
    def _setup(self):
        cfg = FusionConfig(universal_dim=96, num_fusion_layers=4, num_heads=6)
        names = ("species", "vision")
        k = jax.random.PRNGKey(0)
        toks = {
            "species": jax.random.normal(jax.random.fold_in(k, 1), (4, 1, 96)),
            "vision": jax.random.normal(jax.random.fold_in(k, 2), (4, 2, 96)),
        }
        sp = {
            "species": jax.random.uniform(jax.random.fold_in(k, 3), (4, 1, 2)),
            "vision": jax.random.uniform(jax.random.fold_in(k, 4), (4, 2, 2)),
        }
        tp = {
            "species": jax.random.uniform(jax.random.fold_in(k, 5), (4, 1, 1)),
            "vision": jax.random.uniform(jax.random.fold_in(k, 6), (4, 2, 1)),
        }
        return cfg, names, toks, sp, tp

    def test_token_major_equals_batch_major(self):
        cfg, names, toks, sp, tp = self._setup()
        m_tm = CrossModalFusion(cfg, names)  # 4 tokens <= threshold 8
        m_bm = CrossModalFusion(
            dataclasses.replace(cfg, token_major_max_tokens=0), names
        )
        params = m_tm.init(jax.random.PRNGKey(0), toks, sp, tp)["params"]
        # identical param trees: the layout is activation-only
        p_bm = m_bm.init(jax.random.PRNGKey(0), toks, sp, tp)["params"]
        assert jax.tree_util.tree_structure(params) == (
            jax.tree_util.tree_structure(p_bm)
        )
        o1 = m_tm.apply({"params": params}, toks, sp, tp)
        o2 = m_bm.apply({"params": params}, toks, sp, tp)
        np.testing.assert_allclose(
            np.asarray(o1["all_tokens"]), np.asarray(o2["all_tokens"]),
            atol=2e-5,
        )

    def test_gradients_equal_across_layouts(self):
        cfg, names, toks, sp, tp = self._setup()
        m_tm = CrossModalFusion(cfg, names)
        m_bm = CrossModalFusion(
            dataclasses.replace(cfg, token_major_max_tokens=0), names
        )
        params = m_tm.init(jax.random.PRNGKey(0), toks, sp, tp)["params"]

        def g(m):
            return jax.grad(
                lambda p: jnp.sum(
                    m.apply({"params": p}, toks, sp, tp)["all_tokens"] ** 2
                )
            )(params)

        errs = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), g(m_tm), g(m_bm)
        )
        assert max(jax.tree_util.tree_leaves(errs)) < 5e-4
