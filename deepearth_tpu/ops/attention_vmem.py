"""Full-softmax-in-VMEM attention kernel for mid-length sequences.

Why this exists: the trainable flagship's dominant attention is the vision
encoder at S=576 (B=32, H=8, dh=128). Profiling the train step
(PROFILE_TRAIN_OPS.json) shows the *matmuls* there already run near peak —
what drags the step is everything around them: the materialized fp32 scores
tensor (B·H·S² = 340 MB/layer) making several HBM round trips through the
softmax chain, its bf16 re-cast, and the mask/where ops, in forward AND
backward. The library flash kernel is the wrong tool at this length — its
online-softmax pipeline overhead loses to the materialized path below
~1024 tokens (BENCH_FLASH576.json: 0.62×).

At S ≤ 1024 the whole (Sq, Sk) score tile fits VMEM, so this kernel runs
one grid step per (batch, head): QK^T on the MXU, numerically-stable
softmax entirely in registers/VMEM (fp32), PV on the MXU — scores never
touch HBM. The backward kernel recomputes the probabilities (flash-style,
cheaper than storing them) and emits dq/dk/dv in one pass. HBM traffic per
(b,h) drops from ~14·S² bytes to the unavoidable 8·S·dh.

Semantics match :func:`deepearth_tpu.ops.attention.dot_product_attention`
(reference A-stack key-mask semantics: models/transformers.py:98-100) for
the non-causal, no-bias case; `dot_product_attention` routes here
automatically on TPU when shapes qualify.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shapes import pad_axis_to as _pad_to

NEG_BIG = -0.7 * float(jnp.finfo(jnp.float32).max)

# bwd holds ~3 fp32 (Sq, Sk) buffers + IO in VMEM; 1024² keeps it under the
# 16 MB budget, anything longer belongs to the flash kernel anyway.
MAX_SEQ = 1024




def _scores(q_ref, k_ref, mask_ref, scale):
    """(Sq, Sk) fp32 masked scores for one (b, h)."""
    s = jax.lax.dot_general(
        q_ref[0, 0], k_ref[0, 0],
        (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale
    return s + mask_ref[0]  # additive: 0 valid, NEG_BIG masked/pad


def _softmax(s):
    m = jnp.maximum(jnp.max(s, axis=-1, keepdims=True), -1e30)
    p = jnp.exp(s - m)
    l = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-30)
    return p / l


def _fwd_kernel(q_ref, k_ref, v_ref, mask_ref, o_ref, *, scale):
    p = _softmax(_scores(q_ref, k_ref, mask_ref, scale))
    o_ref[0, 0] = jax.lax.dot(
        p.astype(v_ref.dtype), v_ref[0, 0],
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, mask_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale):
    p = _softmax(_scores(q_ref, k_ref, mask_ref, scale))
    do = do_ref[0, 0]
    pb = p.astype(do.dtype)
    # dv = pᵀ @ do
    dv_ref[0, 0] = jax.lax.dot_general(
        pb, do, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dv_ref.dtype)
    # dp = do @ vᵀ ; ds = p ∘ (dp − rowsum(dp ∘ p))
    dp = jax.lax.dot_general(
        do, v_ref[0, 0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    delta = jnp.sum(dp * p, axis=-1, keepdims=True)
    ds = (p * (dp - delta) * scale).astype(q_ref.dtype)
    # dq = ds @ k ; dk = dsᵀ @ q
    dq_ref[0, 0] = jax.lax.dot(
        ds, k_ref[0, 0], preferred_element_type=jnp.float32
    ).astype(dq_ref.dtype)
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q_ref[0, 0], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dk_ref.dtype)


def _spec4(sq, dh):
    return pl.BlockSpec((1, 1, sq, dh), lambda b, h: (b, h, 0, 0))


def _mask_spec(sk):
    return pl.BlockSpec((1, 1, sk), lambda b, h: (b, 0, 0))


def _run_fwd(q, k, v, mask, scale, interpret):
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    return pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[_spec4(sq, dh), _spec4(sk, dh), _spec4(sk, dh),
                  _mask_spec(sk)],
        out_specs=_spec4(sq, dh),
        out_shape=jax.ShapeDtypeStruct((b, h, sq, dh), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, mask)


def _run_bwd(q, k, v, mask, do, scale, interpret):
    b, h, sq, dh = q.shape
    sk = k.shape[2]
    return pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale),
        grid=(b, h),
        in_specs=[_spec4(sq, dh), _spec4(sk, dh), _spec4(sk, dh),
                  _mask_spec(sk), _spec4(sq, dh)],
        out_specs=[_spec4(sq, dh), _spec4(sk, dh), _spec4(sk, dh)],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, dh), q.dtype),
            jax.ShapeDtypeStruct((b, h, sk, dh), k.dtype),
            jax.ShapeDtypeStruct((b, h, sk, dh), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(q, k, v, mask, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _attend(q, k, v, mask, scale, interpret):
    return _run_fwd(q, k, v, mask, scale, interpret)


def _attend_fwd(q, k, v, mask, scale, interpret):
    return _run_fwd(q, k, v, mask, scale, interpret), (q, k, v, mask)


def _attend_bwd(scale, interpret, res, do):
    q, k, v, mask = res
    dq, dk, dv = _run_bwd(q, k, v, mask, do, scale, interpret)
    return dq, dk, dv, None


_attend.defvjp(_attend_fwd, _attend_bwd)


def supported(nq: int, nk: int, dh: int, dv: int,
              is_causal: bool, has_bias: bool) -> bool:
    """Shape gate used by dot_product_attention's router."""
    return (
        not is_causal and not has_bias
        and nk >= 256 and nk <= MAX_SEQ and nq <= MAX_SEQ
        and dh <= 128 and dv <= 128
    )


def vmem_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    key_mask: Optional[jnp.ndarray] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Non-causal multi-head attention, scores resident in VMEM.

    Args:
        q: (B, H, Nq, Dk); k: (B, H, Nk, Dk); v: (B, H, Nk, Dv).
        key_mask: optional (B, Nk) bool, False = masked out.

    Returns:
        (B, H, Nq, Dv) in q's dtype; softmax in fp32 on-chip.
    """
    b, h, nq, dh = q.shape
    nk, dv = k.shape[2], v.shape[3]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    # lane/sublane padding: dh→128 (zero-pad leaves QKᵀ unchanged), seqs→
    # multiples of 128/8; pad keys are masked with NEG_BIG, pad q rows are
    # sliced off (their grads are zero because do is zero-padded).
    qp = _pad_to(_pad_to(q, 3, 128), 2, 16)
    kp = _pad_to(_pad_to(k, 3, 128), 2, 128)
    vp = _pad_to(_pad_to(v, 3, 128), 2, 128)
    sk = kp.shape[2]

    if key_mask is not None:
        valid = key_mask
    else:
        valid = jnp.ones((b, nk), bool)
    valid = _pad_to(valid, 1, 128)  # pads are False → NEG_BIG
    mask = jnp.where(valid, 0.0, NEG_BIG).astype(jnp.float32)
    mask = mask.reshape(b, 1, sk)

    out = _attend(qp, kp, vp, mask, float(scale), bool(interpret))
    return out[:, :, :nq, :dv]
