"""Weight-only int8 quantization with a Pallas fused-dequant matmul.

Why this exists (VERDICT r2 item 8): decode at small batch is weight-bound —
every step streams the full parameter set through HBM while the MXU idles.
Halving weight bytes should approach 2× on that path, but XLA cannot get
there on v5e (measured, round 2): ``dequant-then-matmul`` materializes the
bf16 weight tensor first (1.05×), and ``int8×int8 dot_general`` with dynamic
activation quant is 0.96× at decode shapes. The unlock is a Pallas kernel
that keeps weights int8 all the way into VMEM and widens to bf16
*in-register*, tile by tile, so HBM only ever sees int8 bytes.

Scheme: symmetric per-output-channel absmax (scale = max|w|/127 over the
reduction axis), the standard weight-only recipe. Works for the 2D decode
projections (MLA q/kv/o, dense+shared SwiGLU, lm_head) and the 3D batched
expert weights — which hold ~2.15 B of the 2.42 B decode-bench parameters,
so quantizing MLA alone would leave the win on the table.

Serving-efficiency parity target: the reference's llama.cpp-quantized
language service (reference: README.md:29, encoders/language/server.py).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .shapes import round_up as _ceil_to




def _pick_block(n: int, cands) -> Optional[int]:
    for c in cands:
        if n % c == 0:
            return c
    return None


def _pick_tiles(
    dh: int, fp: int, cp: int, int4: bool, budget: int = 13 * 2**20
):
    """Largest-area (bd, bf) weight tile under a VMEM budget.

    Per-tile fixed cost, not unpack ALU, dominates the fused-dequant
    GEMV residual (tools/exp_int4_tiles.py, profiler busy-sums: 2048x1024
    tiles are 1.53x over the old 512x512 default; the 3-dot
    reduced-ALU kernel variant measured SLOWER). So: maximize bd*bf
    subject to divisibility and the scratch estimate fitting VMEM
    (streamed inputs double-buffered; int4 additionally materializes two
    bf16 half-tiles in-register). Pure function of shapes — safe under
    the SPMD determinism convention.
    """
    best = None
    for bd in (2048, 1024, 512, 256, 128):
        if dh % bd:
            continue
        for bf in (1024, 512, 256, 128):
            if fp % bf:
                continue
            if int4:
                vmem = 6 * bd * bf + 8 * cp * bd + 6 * cp * bf
            else:
                vmem = 4 * bd * bf + 4 * cp * bd + 6 * cp * bf
            if vmem > budget:
                continue
            key = (bd * bf, bd)
            if best is None or key > best[0]:
                best = (key, bd, bf)
    if best is None:
        return None, None
    return best[1], best[2]


# --------------------------------------------------------------------------- #
# quantization
# --------------------------------------------------------------------------- #

def quantize_int8(w: jnp.ndarray, pad_cols_to: int = 128):
    """Symmetric per-out-channel int8 quantization of (…, D, F) weights.

    Returns ``(w_q, scale)`` with ``w_q`` int8, last dim padded to a
    multiple of ``pad_cols_to`` (lane alignment for the Pallas kernel), and
    ``scale`` float32 of shape (…, 1, F) — UNPADDED width, which is how the
    matmul recovers the true output size.
    """
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    f = q.shape[-1]
    fp = _ceil_to(f, pad_cols_to)
    if fp != f:
        pad = [(0, 0)] * (q.ndim - 1) + [(0, fp - f)]
        q = jnp.pad(q, pad)
    return q, scale


def dequantize(w_q: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Reference dequantization (fp32): inverse of :func:`quantize_int8`."""
    f = scale.shape[-1]
    return w_q[..., :f].astype(jnp.float32) * scale


def quantize_int4(w: jnp.ndarray, pad_cols_to: int = 128):
    """Symmetric per-out-channel int4 quantization of (…, D, F) weights.

    Packs two 4-bit values per byte along the REDUCTION dim with the
    split-half layout the Pallas kernel wants: byte ``i`` holds row ``i``
    in its low nibble and row ``i + D/2`` in its high nibble, so a packed
    tile expands to one contiguous block from each half of ``x`` — no
    in-kernel interleave. Returns ``(w_p, scale)`` with ``w_p`` int8 of
    shape (…, D/2, Fp) and ``scale`` float32 (…, 1, F) = absmax/7.
    Requires even D.
    """
    d = w.shape[-2]
    if d % 2:
        raise ValueError(f"int4 packing needs even reduction dim, got {d}")
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    lo, hi = q[..., : d // 2, :], q[..., d // 2 :, :]
    packed = jax.lax.bitcast_convert_type(
        ((lo & 0xF) | ((hi & 0xF) << 4)).astype(jnp.uint8), jnp.int8
    )
    f = packed.shape[-1]
    fp = _ceil_to(f, pad_cols_to)
    if fp != f:
        pad = [(0, 0)] * (packed.ndim - 1) + [(0, fp - f)]
        packed = jnp.pad(packed, pad)
    return packed, scale


def _unpack_int4(w_p: jnp.ndarray):
    """(…, D/2, Fp) packed bytes → sign-extended (lo, hi) int32 nibbles."""
    wi = w_p.astype(jnp.int32)  # sign-extended byte
    lo = (wi << 28) >> 28       # low nibble, sign-extended
    hi = wi >> 4                # arithmetic shift: high nibble, sign-extended
    return lo, hi


def dequantize_int4(w_p: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Reference dequantization (fp32): inverse of :func:`quantize_int4`."""
    lo, hi = _unpack_int4(w_p)
    f = scale.shape[-1]
    q = jnp.concatenate([lo, hi], axis=-2)[..., :f]
    return q.astype(jnp.float32) * scale


# --------------------------------------------------------------------------- #
# Pallas fused-dequant matmul
# --------------------------------------------------------------------------- #

def _bmm_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref):
    """One (expert, f-tile, d-tile) grid step: widen int8→bf16 in-register,
    MXU matmul with fp32 accumulation, scale on the last reduction step."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[0], w_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_f", "block_d", "interpret")
)
def int8_bmm(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    block_f: Optional[int] = None,
    block_d: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched ``x @ dequant(w_q)``: (E, C, D) × (E, D, Fp) → (E, C, F).

    Weights stay int8 through HBM→VMEM; the kernel widens tiles in-register.
    Tile sizes auto-maximize under the VMEM budget (``_pick_tiles``) unless
    block_f/block_d are given. Falls back to the XLA dequant path when
    shapes don't tile (non-128 D).
    """
    e, c, d = x.shape
    fp = w_q.shape[-1]
    f = scale.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cp0 = max(_ceil_to(c, 16), 16)
    if block_d is None and block_f is None:
        bd, bf = _pick_tiles(d, fp, cp0, int4=False)
    else:
        bd = _pick_block(d, (block_d or 512, 256, 128))
        bf = _pick_block(fp, (block_f or 512, 256, 128))
    if bd is None or bf is None:
        return jnp.einsum(
            "ecd,edf->ecf", x, dequantize(w_q, scale).astype(x.dtype)
        ).astype(out_dtype)

    # sublane alignment for the bf16 x tile
    cp = max(_ceil_to(c, 16), 16)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    sp = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, 0), (0, fp - f)))

    grid = (e, fp // bf, d // bd)
    out = pl.pallas_call(
        _bmm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cp, bd), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, bd, bf), lambda b, i, j: (b, j, i)),
            pl.BlockSpec((1, 1, bf), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, cp, bf), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((e, cp, fp), out_dtype),
        scratch_shapes=[pltpu.VMEM((cp, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(x.astype(jnp.bfloat16), w_q, sp)
    return out[:, :c, :f]


def _bmm4_kernel(xlo_ref, xhi_ref, w_ref, s_ref, o_ref, acc_ref):
    """int4 twin of :func:`_bmm_kernel`: each packed byte tile carries one
    reduction block from EACH half of x (split-half layout), unpacked to
    two bf16 tiles in-register — HBM only ever sees half the int8 bytes."""
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wi = w_ref[0].astype(jnp.int32)
    lo = ((wi << 28) >> 28).astype(jnp.bfloat16)
    hi = (wi >> 4).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(
        xlo_ref[0], lo, preferred_element_type=jnp.float32
    ) + jax.lax.dot(
        xhi_ref[0], hi, preferred_element_type=jnp.float32
    )

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block_f", "block_d", "interpret")
)
def int4_bmm(
    x: jnp.ndarray,
    w_p: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    block_f: Optional[int] = None,
    block_d: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Batched ``x @ dequant(w_p)`` over split-half int4 packed weights:
    (E, C, D) × (E, D/2, Fp) → (E, C, F).

    Streams HALF the weight bytes of :func:`int8_bmm`; the unpack (two
    shifts + widen per nibble pair) rides the VPU. Tile sizes
    auto-maximize under the VMEM budget (``_pick_tiles``) unless
    block_f/block_d are given. Falls back to the XLA dequant path when
    the packed reduction dim doesn't tile.
    """
    e, c, d = x.shape
    dh = d // 2
    fp = w_p.shape[-1]
    f = scale.shape[-1]
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    cp0 = max(_ceil_to(c, 16), 16)
    if block_d is None and block_f is None:
        bd, bf = _pick_tiles(dh, fp, cp0, int4=True)
    else:
        bd = _pick_block(dh, (block_d or 512, 256, 128))
        bf = _pick_block(fp, (block_f or 512, 256, 128))
    if bd is None or bf is None or d % 2 or w_p.shape[-2] != dh:
        return jnp.einsum(
            "ecd,edf->ecf", x, dequantize_int4(w_p, scale).astype(x.dtype)
        ).astype(out_dtype)

    cp = max(_ceil_to(c, 16), 16)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    sp = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, 0), (0, fp - f)))

    n_dblk = dh // bd
    grid = (e, fp // bf, n_dblk)
    xb = x.astype(jnp.bfloat16)
    out = pl.pallas_call(
        _bmm4_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, cp, bd), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec(
                (1, cp, bd), lambda b, i, j, n=n_dblk: (b, 0, j + n)
            ),
            pl.BlockSpec((1, bd, bf), lambda b, i, j: (b, j, i)),
            pl.BlockSpec((1, 1, bf), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, cp, bf), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((e, cp, fp), out_dtype),
        scratch_shapes=[pltpu.VMEM((cp, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, xb, w_p, sp)
    return out[:, :c, :f]


def int4_matmul(
    x: jnp.ndarray,
    w_p: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    **kw,
) -> jnp.ndarray:
    """``x @ dequant(w_p)`` for 2D int4-packed weights; any leading dims."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    y = int4_bmm(
        x.reshape(1, -1, d), w_p[None], scale[None], out_dtype=out_dtype, **kw
    )
    return y.reshape(*lead, y.shape[-1])


def int8_matmul(
    x: jnp.ndarray,
    w_q: jnp.ndarray,
    scale: jnp.ndarray,
    out_dtype=jnp.bfloat16,
    **kw,
) -> jnp.ndarray:
    """``x @ dequant(w_q)`` for 2D weights; x may have any leading dims."""
    lead = x.shape[:-1]
    d = x.shape[-1]
    y = int8_bmm(
        x.reshape(1, -1, d), w_q[None], scale[None], out_dtype=out_dtype, **kw
    )
    return y.reshape(*lead, y.shape[-1])


# --------------------------------------------------------------------------- #
# param-tree quantization + apply helpers for the decode path
# --------------------------------------------------------------------------- #

_EXPERT_KEYS = ("w_gate", "w_up", "w_down")

# kv_b_proj's kernel is reshaped into per-head W_k/W_v for projection
# absorption (models/mla_decode.py) — it never feeds a plain matmul, so it
# stays bf16.
_SKIP_NAMES = frozenset({"kv_b_proj"})


def quantize_decoder_params(
    params: Dict[str, Any], min_dim: int = 256, bits: int = 8
) -> Dict[str, Any]:
    """Walk a DeepSeekForCausalLM param tree, replacing large matmul weights
    with int8 (or split-half-packed int4, ``bits=4``) + scale pairs that
    :func:`linear_p` / :func:`expert_ffn_q` consume. Embeddings, norms,
    routers, biases and small kernels stay bf16. int4 additionally needs the
    reduction dim divisible by 256 (128-lane tiles per packed half);
    non-conforming kernels fall back to int8.
    """
    if bits not in (4, 8):
        raise ValueError(f"bits must be 4 or 8, got {bits}")

    def quant_one(w):
        if bits == 4 and w.shape[-2] % 256 == 0:
            q, s = quantize_int4(w)
            return q, s, "_q4"
        q, s = quantize_int8(w)
        return q, s, "_q"

    def conv(node, name=""):
        if not isinstance(node, dict):
            return node
        out = {}
        done = set()
        if all(k in node for k in _EXPERT_KEYS):
            for k in _EXPERT_KEYS:
                w = node[k]
                if w.ndim == 3 and min(w.shape[-2:]) >= min_dim \
                        and w.shape[-2] % 128 == 0:
                    q, s, tag = quant_one(w)
                    out[k + tag], out[k + "_scale"] = q, s
                    done.add(k)
        if "kernel" in node and getattr(node["kernel"], "ndim", 0) == 2 \
                and name not in _SKIP_NAMES:
            w = node["kernel"]
            if min(w.shape) >= min_dim and w.shape[0] % 128 == 0:
                q, s, tag = quant_one(w)
                out["kernel" + tag], out["scale"] = q, s  # s: (1, F)
                done.add("kernel")
        for k, v in node.items():
            if k in done:
                continue
            out[k] = conv(v, k) if isinstance(v, dict) else v
        return out

    return conv(params)


def linear_p(p: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    """Dense layer from a param dict holding bf16, int8 or int4 weights."""
    if "kernel_q4" in p:
        y = int4_matmul(x, p["kernel_q4"], p["scale"], out_dtype=x.dtype)
    elif "kernel_q" in p:
        y = int8_matmul(x, p["kernel_q"], p["scale"], out_dtype=x.dtype)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _bmm_p(p: Dict[str, Any], key: str, x: jnp.ndarray) -> jnp.ndarray:
    if key + "_q4" in p:
        return int4_bmm(x, p[key + "_q4"], p[key + "_scale"],
                        out_dtype=x.dtype)
    return int8_bmm(x, p[key + "_q"], p[key + "_scale"], out_dtype=x.dtype)


def expert_ffn_q(p: Dict[str, Any], expert_in: jnp.ndarray) -> jnp.ndarray:
    """Batched SwiGLU expert MLP over int8/int4 weights (decode path twin
    of ops.moe.expert_ffn)."""
    gate = _bmm_p(p, "w_gate", expert_in)
    up = _bmm_p(p, "w_up", expert_in)
    h = jax.nn.silu(gate) * up
    return _bmm_p(p, "w_down", h)


def quantized_bytes(params: Dict[str, Any]) -> Dict[str, int]:
    """Weight-byte accounting: how much of the tree the int8 path covers."""
    tot = q = 0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        if not hasattr(leaf, "nbytes"):
            continue
        name = str(path[-1])
        tot += leaf.nbytes
        if "_q" in name or "kernel_q" in name:
            q += leaf.nbytes
    return {"total_bytes": int(tot), "int8_bytes": int(q)}
