"""Token-major attention for tiny static sequences (the fusion stack's 3-22
universal tokens).

Why this exists (measured, PROFILE_ASTACK_BUCKETS.json): at the A-stack
headline shape (B=1024, N=3, D=768, H=12) the standard (B, H, N, Dh)
attention is an op-count/padding storm — 16.3 ms of the 42 ms train step.
Every tensor with N or Dh in the minor-two dims pads sublanes 3→8 and lanes
3→128 / 64→128 (the same lane-padding pathology as the hash gather,
ops/hash_encoding.py), and the per-(head) 3×64×3 matmuls waste >99% of each
MXU pass. ~2000 tiny kernels/step × ~5 µs ≈ the whole attention bucket.

The TPU-native formulation keeps everything TOKEN-MAJOR (N, B, D):

* minor dims are always (B, D) = (1024, 768) — zero padding anywhere;
* per-token slices q[i] are contiguous (B, D) slabs (free);
* the head structure is handled by a constant one-hot segment matrix
  SEG (D, H): ``scores[i,j] = (q_i ⊙ k_j) @ SEG`` collapses each head's
  Dh lanes with one well-shaped MXU matmul, and ``probs @ SEGᵀ`` expands
  head weights back to lanes for the value combine;
* rotate_half RoPE becomes a constant ±1 permutation matmul
  ``x @ R`` (exact in any dtype), so no (N, H, Dh)-layout tensor is ever
  formed;
* softmax runs on (Nq, Nk, B, H) where the padded minor (B, H) tensor is
  ~0.5 MB — noise.

Total: ~15 fused XLA ops per attention site instead of ~45 padded ones, no
transposes. Equivalent to ops.attention.dot_product_attention to float
tolerance (tests/test_attention_smallseq.py pins it, and the fusion parity
suite covers it end-to-end vs the reference's torch module).

(reference: models/cross_modal_fusion.py:185-270 — the module whose
attention this accelerates)
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30  # same finite -inf as ops/attention.py


# --------------------------------------------------------------------------- #
# constant matrices (host numpy, cached; become folded XLA constants)
# --------------------------------------------------------------------------- #


@functools.lru_cache(maxsize=32)
def _seg_np(n_heads: int, head_dim: int) -> np.ndarray:
    """(D, H) one-hot: column h marks head h's lanes."""
    d = n_heads * head_dim
    seg = np.zeros((d, n_heads), np.float32)
    for h in range(n_heads):
        seg[h * head_dim : (h + 1) * head_dim, h] = 1.0
    return seg


@functools.lru_cache(maxsize=32)
def _rotate_half_matrix_np(n_heads: int, head_dim: int) -> np.ndarray:
    """(D, D) ±1 permutation: x @ R == per-head rotate_half(x)."""
    d = n_heads * head_dim
    hd2 = head_dim // 2
    r = np.zeros((d, d), np.float32)
    for h in range(n_heads):
        o = h * head_dim
        for i in range(hd2):
            r[o + hd2 + i, o + i] = -1.0  # out[:hd2] = -x[hd2:]
            r[o + i, o + hd2 + i] = 1.0   # out[hd2:] =  x[:hd2]
    return r


@functools.lru_cache(maxsize=64)
def _rope_tables_np(
    n: int, n_heads: int, head_dim: int, theta: float
) -> Tuple[np.ndarray, np.ndarray]:
    """cos/sin tables tiled to the flat layout: (N, 1, D), half convention
    (matches ops.rope.rope_cos_sin(layout='half') with no scaling)."""
    inv = 1.0 / (theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim))
    ang = np.arange(n)[:, None] * np.concatenate([inv, inv])[None, :]  # (N, Dh)
    cos = np.tile(np.cos(ang), (1, n_heads)).astype(np.float32)
    sin = np.tile(np.sin(ang), (1, n_heads)).astype(np.float32)
    return cos[:, None, :], sin[:, None, :]


def rope_token_major(
    x: jnp.ndarray, n_heads: int, theta: float = 10000.0
) -> jnp.ndarray:
    """Half-layout RoPE on a token-major (N, B, D) tensor, positions 0..N-1.

    Equivalent to ops.rope.apply_rope_half on the (B, H, N, Dh) layout, but
    rotate_half is the constant ±1 matmul — no head-split reshape/transpose.
    """
    n, _, d = x.shape
    head_dim = d // n_heads
    cos, sin = _rope_tables_np(n, n_heads, head_dim, theta)
    r = jnp.asarray(_rotate_half_matrix_np(n_heads, head_dim), x.dtype)
    rotated = x @ r
    return (
        x * jnp.asarray(cos, x.dtype) + rotated * jnp.asarray(sin, x.dtype)
    ).astype(x.dtype)


# --------------------------------------------------------------------------- #
# Pallas kernel: the whole pairwise core in one fused pass
# --------------------------------------------------------------------------- #
#
# The XLA formulation below still materializes the (Nq, Nk, B, D) outer
# products and probability expansions in HBM (~4·Nq·Nk·B·D bytes of traffic
# per site). This kernel keeps them in VMEM: one grid step per batch tile
# computes all Nq·Nk products, head-collapse dots against an in-register
# one-hot SEG, the softmax, and the value combine — HBM traffic drops to the
# unavoidable q/k/v reads + out write. Backward recomputes probabilities
# (flash-style) and emits dq/dk/dv in one pass.


def _seg_iota(d: int, n_heads: int) -> jnp.ndarray:
    """(D, H) one-hot built from iotas (in-kernel constant)."""
    head_dim = d // n_heads
    lane = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (d, n_heads), 1)
    return (lane // head_dim == head).astype(jnp.float32)


def _pw_probs(q_ref, k_ref, seg, scale):
    """Per-query lists of (Bt, H) f32 probabilities (softmax over keys)."""
    nq, nk = q_ref.shape[0], k_ref.shape[0]
    kf = [k_ref[j].astype(jnp.float32) for j in range(nk)]
    probs = []
    for i in range(nq):
        qi = q_ref[i].astype(jnp.float32)
        row = [
            jax.lax.dot(qi * kf[j], seg, preferred_element_type=jnp.float32)
            * scale
            for j in range(nk)
        ]
        m = functools.reduce(jnp.maximum, row)
        es = [jnp.exp(s - m) for s in row]
        l = functools.reduce(jnp.add, es)
        probs.append([e / l for e in es])
    return probs


def _expand(p, seg):
    """(Bt, H) head weights -> (Bt, D) lane weights (p @ SEGᵀ as one dot)."""
    return jax.lax.dot_general(
        p, seg, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


def _pw_fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_heads):
    nq, _, d = q_ref.shape
    nk = k_ref.shape[0]
    seg = _seg_iota(d, n_heads)
    probs = _pw_probs(q_ref, k_ref, seg, scale)
    for i in range(nq):
        acc = functools.reduce(
            jnp.add,
            [
                _expand(probs[i][j], seg) * v_ref[j].astype(jnp.float32)
                for j in range(nk)
            ],
        )
        o_ref[i] = acc.astype(o_ref.dtype)


def _pw_bwd_kernel(
    q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *, scale, n_heads
):
    nq, bt, d = q_ref.shape
    nk = k_ref.shape[0]
    seg = _seg_iota(d, n_heads)
    probs = _pw_probs(q_ref, k_ref, seg, scale)
    qf = [q_ref[i].astype(jnp.float32) for i in range(nq)]
    kf = [k_ref[j].astype(jnp.float32) for j in range(nk)]
    vf = [v_ref[j].astype(jnp.float32) for j in range(nk)]
    dk_acc = [jnp.zeros((bt, d), jnp.float32) for _ in range(nk)]
    dv_acc = [jnp.zeros((bt, d), jnp.float32) for _ in range(nk)]
    for i in range(nq):
        doi = do_ref[i].astype(jnp.float32)
        dp = []
        for j in range(nk):
            dv_acc[j] = dv_acc[j] + _expand(probs[i][j], seg) * doi
            dp.append(
                jax.lax.dot(
                    doi * vf[j], seg, preferred_element_type=jnp.float32
                )
            )
        delta = functools.reduce(
            jnp.add, [probs[i][j] * dp[j] for j in range(nk)]
        )
        dq_i = jnp.zeros((bt, d), jnp.float32)
        for j in range(nk):
            ds = probs[i][j] * (dp[j] - delta) * scale
            da = _expand(ds, seg)
            dq_i = dq_i + da * kf[j]
            dk_acc[j] = dk_acc[j] + da * qf[i]
        dq_ref[i] = dq_i.astype(dq_ref.dtype)
    for j in range(nk):
        dk_ref[j] = dk_acc[j].astype(dk_ref.dtype)
        dv_ref[j] = dv_acc[j].astype(dv_ref.dtype)


def _pw_spec(n, bt, d):
    return pl.BlockSpec((n, bt, d), lambda i: (0, i, 0))


def _pw_run_fwd(q, k, v, scale, n_heads, bt, interpret):
    nq, b, d = q.shape
    nk = k.shape[0]
    return pl.pallas_call(
        functools.partial(_pw_fwd_kernel, scale=scale, n_heads=n_heads),
        grid=(b // bt,),
        in_specs=[_pw_spec(nq, bt, d), _pw_spec(nk, bt, d),
                  _pw_spec(nk, bt, d)],
        out_specs=_pw_spec(nq, bt, d),
        out_shape=jax.ShapeDtypeStruct((nq, b, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q, k, v)


def _pw_run_bwd(q, k, v, do, scale, n_heads, bt, interpret):
    nq, b, d = q.shape
    nk = k.shape[0]
    return pl.pallas_call(
        functools.partial(_pw_bwd_kernel, scale=scale, n_heads=n_heads),
        grid=(b // bt,),
        in_specs=[_pw_spec(nq, bt, d), _pw_spec(nk, bt, d),
                  _pw_spec(nk, bt, d), _pw_spec(nq, bt, d)],
        out_specs=[_pw_spec(nq, bt, d), _pw_spec(nk, bt, d),
                   _pw_spec(nk, bt, d)],
        out_shape=[
            jax.ShapeDtypeStruct((nq, b, d), q.dtype),
            jax.ShapeDtypeStruct((nk, b, d), k.dtype),
            jax.ShapeDtypeStruct((nk, b, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _pw_attend(q, k, v, scale, n_heads, bt, interpret):
    return _pw_run_fwd(q, k, v, scale, n_heads, bt, interpret)


def _pw_attend_fwd(q, k, v, scale, n_heads, bt, interpret):
    return _pw_run_fwd(q, k, v, scale, n_heads, bt, interpret), (q, k, v)


def _pw_attend_bwd(scale, n_heads, bt, interpret, res, do):
    q, k, v = res
    # much smaller batch tile in backward: it holds 7 IO blocks plus the
    # dk/dv f32 accumulators live at once (bt=128 measured 17.3 MB > the
    # 16 MB scoped-vmem budget at N=3, D=768)
    return _pw_run_bwd(q, k, v, do, scale, n_heads, max(bt // 4, 64),
                       interpret)


_pw_attend.defvjp(_pw_attend_fwd, _pw_attend_bwd)


def _kernel_supported(nq: int, nk: int, b: int, d: int) -> bool:
    return nq * nk <= 64 and d % 128 == 0 and b % 256 == 0


# --------------------------------------------------------------------------- #
# attention core
# --------------------------------------------------------------------------- #


def pairwise_token_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    n_heads: int,
    scale: float,
    key_mask: Optional[jnp.ndarray] = None,
    use_kernel: Optional[bool] = None,
) -> jnp.ndarray:
    """Multi-head attention, token-major, tiny static N.

    Args:
        q: (Nq, B, D); k, v: (Nk, B, D) — flat head layout, D = H·Dh.
        key_mask: optional (B, Nk) bool, True = visible (same semantics as
            dot_product_attention).
        use_kernel: force the Pallas core on/off; default routes to it on
            TPU for unmasked qualifying shapes (interpret mode elsewhere
            only when forced, for tests).

    Returns (Nq, B, D) in q's dtype; softmax in float32.
    """
    nq, b, d = q.shape
    nk = k.shape[0]
    head_dim = d // n_heads

    if use_kernel is None:
        use_kernel = (
            key_mask is None
            and _kernel_supported(nq, nk, b, d)
            and jax.default_backend() == "tpu"
        )
    if use_kernel and key_mask is None and _kernel_supported(nq, nk, b, d):
        interpret = jax.default_backend() != "tpu"
        return _pw_attend(
            q, k, v, float(scale), int(n_heads), 256, bool(interpret)
        )

    seg = jnp.asarray(_seg_np(n_heads, head_dim))

    # scores[i,j,b,h] = Σ_{d∈h} q[i,b,d]·k[j,b,d] — outer product over the
    # tiny token pair grid, head-collapse as ONE (Nq·Nk·B, D)@(D, H) matmul.
    a = q[:, None, :, :].astype(jnp.float32) * k[None, :, :, :].astype(
        jnp.float32
    )  # (Nq, Nk, B, D)
    scores = jax.lax.dot_general(
        a,
        seg,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * jnp.float32(scale)  # (Nq, Nk, B, H)

    if key_mask is not None:
        scores = jnp.where(
            key_mask.T[None, :, :, None], scores, NEG_INF
        )

    m = jnp.max(scores, axis=1, keepdims=True)
    e = jnp.exp(scores - m)
    probs = e / jnp.sum(e, axis=1, keepdims=True)  # (Nq, Nk, B, H)

    # combine: expand head weights to lanes (one (Nq·Nk·B, H)@(H, D) matmul),
    # multiply by v, reduce over the key tokens.
    pv = jax.lax.dot_general(
        probs,
        seg.T,
        (((3,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Nq, Nk, B, D)
    out = jnp.sum(pv * v[None, :, :, :].astype(jnp.float32), axis=1)
    if key_mask is not None:
        # A row with NO visible key must output ZERO (the convention pinned
        # by tests/test_attention_vmem.py for every backend). Without this,
        # all-NEG_INF scores softmax to uniform weights -> mean of v.
        out = jnp.where(key_mask.any(axis=1)[None, :, None], out, 0.0)
    return out.astype(q.dtype)
