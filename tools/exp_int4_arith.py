"""In-program micro-bench: split-half bit-packed int4 kernel (shipping)
vs arithmetic-decomposition packing.

The int4 decode residual (PROFILE_DECODE_OPS_INT4.json) is in-kernel VPU
nibble unpack: int32 widen + 2 shifts + 2 bf16 converts per byte (~6
VPU ops/byte) serialized against the MXU dots, putting the kernel at
1.70x its weight-stream DMA time. Arithmetic packing stores
``p = 16*a + b`` (a, b in [-7, 7], p in [-119, 119] fits int8) so the
kernel needs only ``p_bf = convert(p); a_bf = round(p_bf * 0.0625)``
(~3 ops/byte) and computes

    y = x_b @ b + x_a @ a  =  x_b @ p + (x_a - 16*x_b) @ a

with ``u = x_a - 16*x_b`` precomputed OUTSIDE the kernel (it only
depends on x). Timing is a lax.scan of K back-to-back kernel calls in
ONE program — single-op wall times over the tunnel are dispatch-floor
noise (tools/exp_int4_unpack.py measured a flat ~0.51 ms for 8-33 MB
weights).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_int4_arith.py
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepearth_tpu.ops.quant import int4_bmm, quantize_int4, dequantize_int4

V5E_HBM_GBS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- arithmetic packing ------------------------------------------------------ #

def quantize_int4_arith(w, pad_cols_to=128):
    d = w.shape[-2]
    wf = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.maximum(absmax, 1e-12) / 7.0
    q = jnp.clip(jnp.round(wf / scale), -7, 7).astype(jnp.int32)
    b, a = q[..., : d // 2, :], q[..., d // 2 :, :]
    packed = (16 * a + b).astype(jnp.int8)
    f = packed.shape[-1]
    fp = -(-f // pad_cols_to) * pad_cols_to
    if fp != f:
        pad = [(0, 0)] * (packed.ndim - 1) + [(0, fp - f)]
        packed = jnp.pad(packed, pad)
    return packed, scale


def _k_arith(xb_ref, u_ref, w_ref, s_ref, o_ref, acc_ref):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # a = (p + 8) >> 4 recovers the high half exactly for signed b in
    # [-7, 7] (floor division; Mosaic cannot legalize math.roundeven, and
    # int8-domain shifts crash the compiler — stay in int32).
    wi = w_ref[0].astype(jnp.int32)
    p_bf = wi.astype(jnp.bfloat16)
    a_bf = ((wi + 8) >> 4).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(
        xb_ref[0], p_bf, preferred_element_type=jnp.float32
    ) + jax.lax.dot(u_ref[0], a_bf, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bd", "bf", "interpret"))
def int4a_bmm(x, w_p, scale, bd=512, bf=512, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e, c, d = x.shape
    dh = d // 2
    fp = w_p.shape[-1]
    f = scale.shape[-1]
    cp = max(-(-c // 16) * 16, 16)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    xf = x.astype(jnp.float32)
    xb = xf[..., :dh].astype(jnp.bfloat16)
    u = (xf[..., dh:] - 16.0 * xf[..., :dh]).astype(jnp.bfloat16)
    sp = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, 0), (0, fp - f)))
    out = pl.pallas_call(
        _k_arith,
        grid=(e, fp // bf, dh // bd),
        in_specs=[
            pl.BlockSpec((1, cp, bd), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, cp, bd), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, bd, bf), lambda b, i, j: (b, j, i)),
            pl.BlockSpec((1, 1, bf), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, cp, bf), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((e, cp, fp), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((cp, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xb, u, w_p, sp)
    return out[:, :c, :f]


# ---- in-program scan timing --------------------------------------------------- #

def scan_time(kernel_fn, xs, reps=3):
    """One jit program: scan kernel over K inputs, return summed output."""

    @jax.jit
    def run(xs_stack):
        def body(carry, x):
            y = kernel_fn(x)
            return carry + jnp.sum(y.astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), xs_stack)
        return tot

    out = run(xs)  # compile + warm
    float(np.asarray(out))
    best = np.inf
    for _ in range(reps):
        t0 = time.time()
        out = run(xs)
        float(np.asarray(out))
        best = min(best, time.time() - t0)
    return best / xs.shape[0] * 1e3


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    K = 48
    shapes = [
        ("mlp_gate 2048x8192", 1, 1, 2048, 8192),
        ("lm_head 2048x32000", 1, 1, 2048, 32000),
        ("moe_experts E16 2048x1024", 16, 1, 2048, 1024),
        ("mlp_gate B32 2048x8192", 1, 32, 2048, 8192),
    ]
    for name, e, c, d, f in shapes:
        w = jnp.asarray(
            rng.standard_normal((e, d, f)).astype(np.float32) * 0.02
        )
        w_p, scale = quantize_int4(w)
        w_a, scale_a = quantize_int4_arith(w)
        xs = jnp.asarray(
            rng.standard_normal((K, e, c, d)).astype(np.float32)
        ).astype(jnp.bfloat16)
        # correctness vs fp32 dequant reference
        x0 = xs[0]
        ref = jnp.einsum(
            "ecd,edf->ecf", x0.astype(jnp.float32),
            dequantize_int4(w_p, scale),
        )
        y_ship = int4_bmm(x0, w_p, scale).astype(jnp.float32)
        y_arith = int4a_bmm(x0, w_a, scale_a).astype(jnp.float32)
        denom = float(jnp.abs(ref).max())
        err_s = float(jnp.abs(y_ship - ref).max()) / denom
        err_a = float(jnp.abs(y_arith - ref).max()) / denom
        packed_bytes = w_p.size
        floor_ms = packed_bytes / (V5E_HBM_GBS * 1e9) * 1e3
        t_ship = scan_time(lambda x: int4_bmm(x, w_p, scale), xs)
        print(
            f"\n{name}  packed {packed_bytes/1e6:.1f} MB  floor {floor_ms:.3f} ms"
        )
        print(
            f"  shipping           {t_ship:7.3f} ms  {floor_ms/t_ship*100:5.1f}% of floor  rel_err {err_s:.2e}"
        )
        t_arith = scan_time(lambda x: int4a_bmm(x, w_a, scale_a), xs)
        print(
            f"  arith              {t_arith:7.3f} ms  {floor_ms/t_arith*100:5.1f}% of floor  rel_err {err_a:.2e}  speedup {t_ship/t_arith:.2f}x"
        )
        # block-size sweep on both kernels (bigger tiles amortize per-tile
        # fixed cost; VMEM: int8 tile + two bf16 expansions must fit).
        # One shape only — each config is a 20-60 s remote compile.
        dh = d // 2
        sweep = (
            ((512, 1024), (1024, 512), (256, 1024))
            if name.startswith("mlp_gate 2048")
            else ()
        )
        for bd, bf in sweep:
            if dh % bd or (w_p.shape[-1]) % bf:
                continue
            try:
                t1 = scan_time(
                    lambda x, bd=bd, bf=bf: int4_bmm(
                        x, w_p, scale, block_d=bd, block_f=bf
                    ),
                    xs,
                )
                print(f"  shipping {bd}x{bf:5d} {t1:7.3f} ms  {floor_ms/t1*100:5.1f}% of floor")
            except Exception as ex:
                print(f"  shipping {bd}x{bf:5d} FAIL {str(ex)[:70]}")
            try:
                t2 = scan_time(
                    lambda x, bd=bd, bf=bf: int4a_bmm(
                        x, w_a, scale_a, bd=bd, bf=bf
                    ),
                    xs,
                )
                print(f"  arith    {bd}x{bf:5d} {t2:7.3f} ms  {floor_ms/t2*100:5.1f}% of floor")
            except Exception as ex:
                print(f"  arith    {bd}x{bf:5d} FAIL {str(ex)[:70]}")


if __name__ == "__main__":
    main()
