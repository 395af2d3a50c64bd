"""Shared shape/tiling arithmetic for the TPU kernels.

Every kernel in ops/ (and the flash gate in models/deepseek.py) needs
"round this dim up to a sublane/lane multiple" — one definition here so an
alignment-rule change (e.g. fp32 sublane 8 vs bf16 16) has one home.
"""

from __future__ import annotations

import jax.numpy as jnp


def round_up(n: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``n``."""
    return (n + m - 1) // m * m


def pad_axis_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    """Zero-pad ``axis`` of ``x`` up to the next multiple of ``mult``."""
    n = x.shape[axis]
    p = (-n) % mult
    if p == 0:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, p)
    return jnp.pad(x, pads)
