"""Rotary position embeddings: base, linear, dynamic-NTK, and YaRN scaling,
with the three application conventions the reference uses.

Conventions (each reproduced exactly for per-module parity):

* ``interleaved`` — the A-stack complex-multiplication form
  (reference: models/transformers.py:57-71): pairs ``(x[2i], x[2i+1])``.
* ``half`` — rotate_half on a half-split layout
  (reference: models/cross_modal_fusion.py:81-96).
* ``deepseek`` — MLA's variant: de-interleave ``(b,h,s,d)`` into half layout,
  then rotate_half (reference: encoders/modeling_deepseek.py:339-371).

Everything is a pure function of a static table; no mutable caches — the
caller sizes the table to its (static) sequence length, which is what XLA
wants.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax.numpy as jnp

from ..configs import RopeScalingConfig


def rope_inv_freq(dim: int, theta: float = 10000.0) -> jnp.ndarray:
    """Base inverse frequencies, shape (dim/2,)."""
    return 1.0 / (
        theta ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim)
    )


# --------------------------------------------------------------------------- #
# YaRN helpers (reference: encoders/modeling_deepseek.py:226-259)
# --------------------------------------------------------------------------- #


def yarn_find_correction_dim(
    num_rotations: float, dim: int, base: float, max_pos: int
) -> float:
    return (dim * math.log(max_pos / (num_rotations * 2 * math.pi))) / (
        2 * math.log(base)
    )


def yarn_find_correction_range(
    low_rot: float, high_rot: float, dim: int, base: float, max_pos: int
) -> Tuple[int, int]:
    low = math.floor(yarn_find_correction_dim(low_rot, dim, base, max_pos))
    high = math.ceil(yarn_find_correction_dim(high_rot, dim, base, max_pos))
    return max(low, 0), min(high, dim - 1)


def yarn_get_mscale(scale: float = 1.0, mscale: float = 1.0) -> float:
    if scale <= 1:
        return 1.0
    return 0.1 * mscale * math.log(scale) + 1.0


def _yarn_linear_ramp(lo: float, hi: float, n: int) -> jnp.ndarray:
    if lo == hi:
        hi += 0.001
    ramp = (jnp.arange(n, dtype=jnp.float32) - lo) / (hi - lo)
    return jnp.clip(ramp, 0.0, 1.0)


# --------------------------------------------------------------------------- #
# cos/sin tables
# --------------------------------------------------------------------------- #


def rope_cos_sin(
    seq_len: int,
    dim: int,
    theta: float = 10000.0,
    scaling: Optional[RopeScalingConfig] = None,
    layout: str = "half",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build cos/sin tables of shape (seq_len, dim) [half layout] or
    (seq_len, dim/2) [interleaved layout].

    scaling.type:
      'none'    — plain RoPE
      'linear'  — positions divided by factor (modeling_deepseek.py:158-183)
      'dynamic' — NTK-aware base rescale when seq_len exceeds the original
                  window (modeling_deepseek.py:187-222)
      'yarn'    — per-dim interpolation ramp + attention mscale
                  (modeling_deepseek.py:262-327)
    """
    scaling = scaling or RopeScalingConfig()
    t = jnp.arange(seq_len, dtype=jnp.float32)
    mscale = 1.0

    if scaling.type == "none":
        inv_freq = rope_inv_freq(dim, theta)
    elif scaling.type == "linear":
        inv_freq = rope_inv_freq(dim, theta)
        t = t / scaling.factor
    elif scaling.type == "dynamic":
        base = theta
        max_pos = scaling.original_max_position_embeddings
        if seq_len > max_pos:
            base = theta * (
                (scaling.factor * seq_len / max_pos) - (scaling.factor - 1)
            ) ** (dim / (dim - 2))
        inv_freq = rope_inv_freq(dim, base)
    elif scaling.type == "yarn":
        freq_extra = rope_inv_freq(dim, theta)
        freq_inter = freq_extra / scaling.factor
        lo, hi = yarn_find_correction_range(
            scaling.beta_fast,
            scaling.beta_slow,
            dim,
            theta,
            scaling.original_max_position_embeddings,
        )
        extra_mask = 1.0 - _yarn_linear_ramp(lo, hi, dim // 2)
        inv_freq = freq_inter * (1.0 - extra_mask) + freq_extra * extra_mask
        mscale = yarn_get_mscale(scaling.factor, scaling.mscale) / yarn_get_mscale(
            scaling.factor, scaling.mscale_all_dim
        )
    else:
        raise ValueError(f"unknown rope scaling type {scaling.type!r}")

    freqs = jnp.outer(t, inv_freq)  # (seq, dim/2)
    if layout == "half":
        emb = jnp.concatenate((freqs, freqs), axis=-1)  # (seq, dim)
    elif layout == "interleaved":
        emb = freqs
    else:
        raise ValueError(f"unknown rope layout {layout!r}")
    return jnp.cos(emb) * mscale, jnp.sin(emb) * mscale


# --------------------------------------------------------------------------- #
# application
# --------------------------------------------------------------------------- #


def rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    x1 = x[..., : x.shape[-1] // 2]
    x2 = x[..., x.shape[-1] // 2 :]
    return jnp.concatenate((-x2, x1), axis=-1)


def apply_rope_half(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """rotate_half convention. x: (..., seq, dim); cos/sin: (seq, dim)."""
    return x * cos + rotate_half(x) * sin


def apply_rope_interleaved(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """Complex-pair convention (A-stack parity,
    reference: models/transformers.py:57-71).

    x: (..., seq, dim) with pairs (x[2i], x[2i+1]); cos/sin: (seq, dim/2).
    """
    x_even = x[..., 0::2]
    x_odd = x[..., 1::2]
    out_even = x_even * cos - x_odd * sin
    out_odd = x_even * sin + x_odd * cos
    # re-interleave
    out = jnp.stack((out_even, out_odd), axis=-1)
    return out.reshape(x.shape)


def apply_rope_deepseek(
    x: jnp.ndarray, cos: jnp.ndarray, sin: jnp.ndarray
) -> jnp.ndarray:
    """MLA convention: de-interleave to half layout, then rotate_half
    (reference: encoders/modeling_deepseek.py:360-371).

    x: (..., seq, dim); cos/sin: (seq, dim).
    """
    d = x.shape[-1]
    x = x.reshape(*x.shape[:-1], d // 2, 2)
    x = jnp.swapaxes(x, -1, -2).reshape(*x.shape[:-2], d)
    return x * cos + rotate_half(x) * sin
