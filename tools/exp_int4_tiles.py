"""Profiler-based int4 kernel variant race (device busy time, not wall).

tools/exp_int4_arith.py's wall-clock scan numbers were sync-floor noise
(~30 ms tunnel sync / 48 steps dominates sub-ms kernels). This version
times a lax.scan of K kernel calls with jax.profiler device busy-sums.

Hypotheses under test for the int4 decode residual (kernel at 1.70x its
DMA floor, PROFILE_DECODE_OPS_INT4.json):
  H1 fixed per-tile overhead — int8 and int4 kernels both measure
     ~0.5 us/tile vs 0.32 us DMA, so HALVING the tile count via bigger
     blocks should cut the gap. Sweep (bd, bf).
  H2 VPU unpack ALU — the arith3 variant cuts nibble extraction from 6
     to ~4 ops/byte using p = 16a + b packing and
     y = xb@p - 16*(xb@a) + xa@a (three dots, NO cancellation
     amplification — the 2-dot u-trick measured 7x worse rounding).

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_int4_tiles.py
"""

from __future__ import annotations

import functools
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepearth_tpu.ops.quant import dequantize_int4, int4_bmm, quantize_int4

V5E_HBM_GBS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


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
        packed = jnp.pad(
            packed, [(0, 0)] * (packed.ndim - 1) + [(0, fp - f)]
        )
    return packed, scale


def _k_arith3(xb_ref, xa_ref, w_ref, s_ref, o_ref, acc_ref):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    wi = w_ref[0].astype(jnp.int32)
    p_bf = wi.astype(jnp.bfloat16)
    a_bf = ((wi + 8) >> 4).astype(jnp.bfloat16)  # exact floor((p+8)/16) = a
    acc_ref[...] += (
        jax.lax.dot(xb_ref[0], p_bf, preferred_element_type=jnp.float32)
        + jax.lax.dot(xa_ref[0], a_bf, preferred_element_type=jnp.float32)
        - 16.0
        * jax.lax.dot(xb_ref[0], a_bf, preferred_element_type=jnp.float32)
    )

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bd", "bf", "interpret"))
def int4a3_bmm(x, w_p, scale, bd=512, bf=512, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    e, c, d = x.shape
    dh = d // 2
    fp = w_p.shape[-1]
    f = scale.shape[-1]
    cp = max(-(-c // 16) * 16, 16)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    xb = x[..., :dh].astype(jnp.bfloat16)
    xa = x[..., dh:].astype(jnp.bfloat16)
    sp = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, 0), (0, fp - f)))
    out = pl.pallas_call(
        _k_arith3,
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
    )(xb, xa, w_p, sp)
    return out[:, :c, :f]


def busy_ms(kernel_fn, xs, reps=2):
    import profile_train_buckets as ptb

    @jax.jit
    def run(xs_stack):
        def body(carry, x):
            return carry + jnp.sum(kernel_fn(x).astype(jnp.float32)), None

        tot, _ = jax.lax.scan(body, jnp.float32(0), xs_stack)
        return tot

    t0 = time.time()
    float(np.asarray(run(xs)))  # compile + warm
    t_compile = time.time() - t0
    best = np.inf
    for _ in range(reps):
        with tempfile.TemporaryDirectory() as td:
            with jax.profiler.trace(td):
                float(np.asarray(run(xs)))
            total, _ = ptb.parse_device_events(td)
        best = min(best, total)
    return best / xs.shape[0], t_compile


def main():
    import os

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    K = 32
    e, c, d, f = 1, 1, 4096, 16384  # packed 33.6 MB, dh=2048

    # ONE jitted setup program — eager quantize/dequant/einsum here costs
    # many separate remote compiles (the v1 run spent its whole timeout
    # before the first variant).
    @jax.jit
    def setup(w, x0):
        w_p, scale = quantize_int4(w)
        w_a, scale_a = quantize_int4_arith(w)
        ref = jnp.einsum(
            "ecd,edf->ecf",
            x0.astype(jnp.float32),
            dequantize_int4(w_p, scale),
        )
        return w_p, scale, w_a, scale_a, ref, jnp.abs(ref).max()

    w = jnp.asarray(rng.standard_normal((e, d, f)).astype(np.float32) * 0.02)
    xs = jnp.asarray(
        rng.standard_normal((K, e, c, d)).astype(np.float32)
    ).astype(jnp.bfloat16)
    t0 = time.time()
    w_p, scale, w_a, scale_a, ref, dn = setup(w, xs[0])
    dn = float(dn)
    log(f"setup {time.time()-t0:.0f}s")
    packed_bytes = w_p.size
    floor_ms = packed_bytes / (V5E_HBM_GBS * 1e9) * 1e3
    print(f"packed {packed_bytes/1e6:.1f} MB  floor {floor_ms:.3f} ms  K={K}", flush=True)

    variants = [
        ("ship 512x512", lambda x: int4_bmm(x, w_p, scale)),
        ("ship 512x1024", lambda x: int4_bmm(x, w_p, scale, block_d=512, block_f=1024)),
        ("ship 1024x1024", lambda x: int4_bmm(x, w_p, scale, block_d=1024, block_f=1024)),
        ("ship 2048x1024", lambda x: int4_bmm(x, w_p, scale, block_d=2048, block_f=1024)),
        ("arith3 512x512", lambda x: int4a3_bmm(x, w_a, scale_a)),
        ("arith3 1024x1024", lambda x: int4a3_bmm(x, w_a, scale_a, bd=1024, bf=1024)),
    ]
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    if only:
        variants = [v for v in variants if any(o in v[0] for o in only)]
    for name, fn in variants:
        try:
            err = float("nan")
            if name.endswith("512x512"):  # accuracy is block-size independent
                err = float(
                    jax.jit(
                        lambda x: jnp.abs(fn(x).astype(jnp.float32) - ref).max()
                    )(xs[0])
                ) / dn
            ms, t_c = busy_ms(fn, xs)
            print(
                f"  {name:17s} {ms:7.4f} ms busy  {floor_ms/ms*100:5.1f}% of floor  rel_err {err:.2e}  (compile {t_c:.0f}s)",
                flush=True,
            )
        except Exception as ex:
            print(f"  {name:17s} FAIL {str(ex)[:110]}")


if __name__ == "__main__":
    main()
