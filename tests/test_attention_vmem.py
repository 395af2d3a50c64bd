"""VMEM-resident attention kernel (ops/attention_vmem.py) must match the XLA
einsum formulation — outputs AND gradients — including key masks, unequal
q/k lengths (cross-attention), and non-128 head dims (zero-pad path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deepearth_tpu.ops.attention import dot_product_attention
from deepearth_tpu.ops.attention_vmem import supported, vmem_attention


def _ref(q, k, v, scale, key_mask=None):
    return dot_product_attention(q, k, v, scale=scale, key_mask=key_mask)


def _make(b, h, nq, nk, dh, dv, dtype=jnp.float32, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (b, h, nq, dh), dtype)
    k = jax.random.normal(ks[1], (b, h, nk, dh), dtype)
    v = jax.random.normal(ks[2], (b, h, nk, dv), dtype)
    return q, k, v


@pytest.mark.parametrize(
    "shape",
    [
        (2, 2, 576, 576, 128, 128),  # the flagship vision shape
        (2, 2, 16, 576, 128, 128),   # query-token cross-attention
        (1, 2, 320, 384, 64, 64),    # non-128 head dim → zero-pad
        (1, 1, 100, 260, 48, 80),    # everything unaligned
    ],
)
def test_forward_matches_xla(shape):
    b, h, nq, nk, dh, dv = shape
    q, k, v = _make(b, h, nq, nk, dh, dv)
    scale = dh ** -0.5
    out = vmem_attention(q, k, v, scale=scale, interpret=True)
    ref = _ref(q, k, v, scale)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_key_mask_matches_xla():
    b, h, nq, nk, dh = 2, 2, 64, 300, 64
    q, k, v = _make(b, h, nq, nk, dh, dh, seed=1)
    key_mask = jax.random.bernoulli(jax.random.PRNGKey(9), 0.7, (b, nk))
    key_mask = key_mask.at[:, 0].set(True)  # no fully-masked rows
    scale = dh ** -0.5
    out = vmem_attention(q, k, v, scale=scale, key_mask=key_mask,
                         interpret=True)
    ref = _ref(q, k, v, scale, key_mask=key_mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fully_masked_row_is_zero_on_all_backends():
    """A batch row whose key_mask is entirely False (a fully-padded
    sequence in a bucketed batch) outputs ZERO on every backend — the
    einsum path, the vmem kernel, and the flash SegmentIds route all
    agree, so CPU tests and TPU runs see identical semantics."""
    b, h, nq, nk, dh = 2, 2, 64, 300, 64
    q, k, v = _make(b, h, nq, nk, dh, dh, seed=5)
    key_mask = jnp.ones((b, nk), bool).at[1, :].set(False)
    scale = dh ** -0.5
    ref = _ref(q, k, v, scale, key_mask=key_mask)
    np.testing.assert_array_equal(np.asarray(ref[1]), 0.0)
    assert np.abs(np.asarray(ref[0])).max() > 0
    out = vmem_attention(q, k, v, scale=scale, key_mask=key_mask,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(out[1]), 0.0)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("with_mask", [False, True])
def test_gradients_match_xla(with_mask):
    b, h, nq, nk, dh = 1, 2, 288, 288, 64
    q, k, v = _make(b, h, nq, nk, dh, dh, seed=2)
    key_mask = None
    if with_mask:
        key_mask = jax.random.bernoulli(jax.random.PRNGKey(3), 0.8, (b, nk))
        key_mask = key_mask.at[:, 0].set(True)
    scale = dh ** -0.5

    def loss_kernel(q, k, v):
        o = vmem_attention(q, k, v, scale=scale, key_mask=key_mask,
                           interpret=True)
        return jnp.sum(o * jnp.cos(o))

    def loss_ref(q, k, v):
        o = _ref(q, k, v, scale, key_mask=key_mask)
        return jnp.sum(o * jnp.cos(o))

    g_k = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_k, g_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=5e-5, rtol=5e-4)


def test_bf16_grad_close():
    """bf16 inputs: fp32 on-chip softmax keeps grads within bf16 rounding."""
    b, h, n, dh = 1, 1, 256, 128
    q, k, v = _make(b, h, n, n, dh, dh, dtype=jnp.bfloat16, seed=4)
    scale = dh ** -0.5

    def loss(f, q, k, v):
        return jnp.sum(f(q, k, v).astype(jnp.float32) ** 2)

    gk = jax.grad(
        lambda q: loss(lambda *a: vmem_attention(*a, scale=scale,
                                                 interpret=True), q, k, v)
    )(q)
    gr = jax.grad(lambda q: loss(lambda *a: _ref(*a, scale), q, k, v))(q)
    gk, gr = np.asarray(gk, np.float32), np.asarray(gr, np.float32)
    denom = np.abs(gr).max() + 1e-9
    assert np.abs(gk - gr).max() / denom < 0.05


def test_supported_gate():
    assert supported(576, 576, 128, 128, False, False)
    assert supported(16, 576, 128, 128, False, False)
    assert not supported(576, 576, 128, 128, True, False)   # causal
    assert not supported(576, 576, 128, 128, False, True)   # bias
    assert not supported(16, 128, 128, 128, False, False)   # short keys
    assert not supported(2048, 2048, 128, 128, False, False)  # flash regime
    assert not supported(576, 576, 256, 128, False, False)  # wide head
