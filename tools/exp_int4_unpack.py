"""Micro-bench: int4 weight-streaming GEMV variants at decode shapes.

SUPERSEDED by tools/exp_int4_tiles.py — the wall-clock numbers here are
dispatch/sync-floor noise (flat ~0.5 ms for 8-33 MB of weights), and the
60-rep loop cycles 8 inputs so most calls repeat identical args, which
the relay can serve from cache (CLAUDE.md). Kept for the negative
results it established: Mosaic rejects int8-domain shifts, and the axon
backend recurses on any S4-dtype dispatch.

PROFILE_DECODE_OPS_INT4.json attributes 85.3% of the 3.37 ms B=1 decode
step to the Pallas int4 kernels, which run at 1.70x their weight-stream
time — the residual is the in-kernel nibble unpack (int32 widen + two
shifts + two bf16 converts per byte, all VPU). This script races the
shipping split-half kernel against candidate cheaper unpacks at the three
dominant decode shapes, printing ms and effective weight GB/s per variant:

  pallas_splithalf   ops/quant.py int4_bmm (shipping)
  pallas_int8dom     same kernel but nibble split in int8 domain (no widen)
  xla_native_int4    jnp.einsum over a jnp.int4 array (XLA native S4)
  pallas_native_int4 kernel loading an int4-typed ref directly (Mosaic S4)

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/exp_int4_unpack.py
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

from deepearth_tpu.ops.quant import int4_bmm, quantize_int4

V5E_HBM_GBS = 819.0


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---- variant kernels -------------------------------------------------------- #

def _k_int8dom(xlo_ref, xhi_ref, w_ref, s_ref, o_ref, acc_ref):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    w8 = w_ref[0]
    lo = ((w8 << 4) >> 4).astype(jnp.bfloat16)  # int8-domain arithmetic shifts
    hi = (w8 >> 4).astype(jnp.bfloat16)
    acc_ref[...] += jax.lax.dot(
        xlo_ref[0], lo, preferred_element_type=jnp.float32
    ) + jax.lax.dot(xhi_ref[0], hi, preferred_element_type=jnp.float32)

    @pl.when(j == pl.num_programs(2) - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


def _k_native4(x_ref, w_ref, s_ref, o_ref, acc_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        x_ref[0], w_ref[0].astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == pl.num_programs(1) - 1)
    def _finish():
        o_ref[0] = (acc_ref[...] * s_ref[0]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bd", "bf"))
def bmm_int8dom(x, w_p, scale, bd=512, bf=512):
    e, c, d = x.shape
    dh = d // 2
    fp = w_p.shape[-1]
    f = scale.shape[-1]
    cp = max(-(-c // 16) * 16, 16)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    sp = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, 0), (0, fp - f)))
    n_dblk = dh // bd
    xb = x.astype(jnp.bfloat16)
    out = pl.pallas_call(
        _k_int8dom,
        grid=(e, fp // bf, n_dblk),
        in_specs=[
            pl.BlockSpec((1, cp, bd), lambda b, i, j: (b, 0, j)),
            pl.BlockSpec((1, cp, bd), lambda b, i, j, n=n_dblk: (b, 0, j + n)),
            pl.BlockSpec((1, bd, bf), lambda b, i, j: (b, j, i)),
            pl.BlockSpec((1, 1, bf), lambda b, i, j: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, cp, bf), lambda b, i, j: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct((e, cp, fp), jnp.bfloat16),
        scratch_shapes=[pltpu.VMEM((cp, bf), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(xb, xb, w_p, sp)
    return out[:, :c, :f]


@functools.partial(jax.jit, static_argnames=("bd", "bf"))
def bmm_native4(x, w4, scale, bd=512, bf=512):
    e, c, d = x.shape
    fp = w4.shape[-1]
    f = scale.shape[-1]
    cp = max(-(-c // 16) * 16, 16)
    if cp != c:
        x = jnp.pad(x, ((0, 0), (0, cp - c), (0, 0)))
    sp = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, 0), (0, fp - f)))
    out = pl.pallas_call(
        _k_native4,
        grid=(e, fp // bf, d // bd),
        in_specs=[
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
    )(x.astype(jnp.bfloat16), w4, sp)
    return out[:, :c, :f]


@jax.jit
def xla_native4(x, w4, scale):
    return jnp.einsum(
        "ecd,edf->ecf", x.astype(jnp.bfloat16), w4.astype(jnp.bfloat16)
    ) * scale.astype(jnp.bfloat16)


# ---- timing ------------------------------------------------------------------ #

def timeit(fn, args_list, reps=60):
    out = fn(*args_list[0])
    jax.block_until_ready(out)
    t0 = time.time()
    for i in range(reps):
        out = fn(*args_list[i % len(args_list)])
    float(np.asarray(out).reshape(-1)[0])  # force full completion
    return (time.time() - t0) / reps * 1e3


def main():
    log(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)
    shapes = [
        ("mlp_gate 2048x8192", 1, 2048, 8192),
        ("lm_head 2048x32000", 1, 2048, 32000),
        ("moe_experts E16 2048x1024", 16, 2048, 1024),
    ]
    for name, e, d, f in shapes:
        w = jnp.asarray(rng.standard_normal((e, d, f)).astype(np.float32) * 0.02)
        w_p, scale = quantize_int4(w)
        w_p, scale = jax.device_put(w_p), jax.device_put(scale)
        # native int4: same values, int4 dtype, unpacked layout
        lo = ((np.asarray(w_p).astype(np.int32) << 28) >> 28)
        hi = (np.asarray(w_p).astype(np.int32) >> 4)
        q = np.concatenate([lo, hi], axis=-2)
        # S4 host->device transfer recurses on the axon backend; upload as
        # int8 and cast on device instead.
        try:
            w4 = jax.jit(lambda a: a.astype(jnp.int4))(
                jax.device_put(q.astype(np.int8))
            )
            jax.block_until_ready(w4)
        except Exception as ex:
            log(f"native-int4 setup failed for {name}: {str(ex)[:120]}")
            w4 = None
        packed_bytes = w_p.size  # one byte per packed pair
        floor_ms = packed_bytes / (V5E_HBM_GBS * 1e9) * 1e3
        xs = [
            jax.device_put(
                jnp.asarray(rng.standard_normal((e, 1, d)).astype(np.float32))
            )
            for _ in range(8)
        ]
        rows = {}
        rows["pallas_splithalf"] = timeit(
            lambda x, wp=w_p, s=scale: int4_bmm(x, wp, s), [(x,) for x in xs]
        )
        try:
            rows["pallas_int8dom"] = timeit(
                lambda x, wp=w_p, s=scale: bmm_int8dom(x, wp, s),
                [(x,) for x in xs],
            )
        except Exception as ex:
            rows["pallas_int8dom"] = f"FAIL {str(ex)[:90]}"
        if w4 is not None:
            try:
                rows["pallas_native_int4"] = timeit(
                    lambda x, w4=w4, s=scale: bmm_native4(x, w4, s),
                    [(x,) for x in xs],
                )
            except Exception as ex:
                rows["pallas_native_int4"] = f"FAIL {str(ex)[:90]}"
            try:
                rows["xla_native_int4"] = timeit(
                    lambda x, w4=w4, s=scale: xla_native4(x, w4, s),
                    [(x,) for x in xs],
                )
            except Exception as ex:
                rows["xla_native_int4"] = f"FAIL {str(ex)[:90]}"
        print(f"\n{name}  packed {packed_bytes/1e6:.1f} MB, floor {floor_ms:.3f} ms")
        for k, v in rows.items():
            if isinstance(v, float):
                print(f"  {k:20s} {v:7.3f} ms  {packed_bytes/v/1e6:7.1f} GB/s  {floor_ms/v*100:5.1f}% of floor")
            else:
                print(f"  {k:20s} {v}")


if __name__ == "__main__":
    main()
